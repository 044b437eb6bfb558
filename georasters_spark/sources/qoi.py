"""QOI codec ("Quite OK Image" format), pure numpy + stdlib.

QOI is a fully public one-page spec (qoiformat.org, qoi-specification
-1.0). GDAL and the imageio stack both grew QOI drivers, so a media
lake built for the reference's gdal.Open ingest path (georasters.py:
281-291) meets QOI files in the wild; the format carries no entropy
tables and is byte-deterministic, so roundtrips gate hash-exact.

  header: magic "qoif", width u32 BE, height u32 BE,
          channels u8 (3=RGB, 4=RGBA), colorspace u8 (0 sRGB, 1 linear)
  stream: QOI_OP_RGB   11111110 r g b
          QOI_OP_RGBA  11111111 r g b a
          QOI_OP_INDEX 00iiiiii      (64-slot array, hash
                                      (3r+5g+7b+11a) % 64)
          QOI_OP_DIFF  01drdgdb      (per-channel -2..1, bias 2,
                                      alpha unchanged, wrapping)
          QOI_OP_LUMA  10gggggg (dr-dg+8)<<4 | (db-dg+8)
                                      (dg -32..31 bias 32, dr-dg /
                                      db-dg -8..7 bias 8, wrapping)
          QOI_OP_RUN   11rrrrrr      (run 1..62, bias -1; 63/64
                                      reserved for the 8-bit tags)
  trailer: seven 0x00 bytes then 0x01

Previous pixel starts at (0, 0, 0, 255); every decoded pixel is
written into the index array at its hash slot. The encoder here is
the canonical greedy one from the spec reference implementation
(run > index > diff > luma > rgb/rgba), so outputs are byte-identical
across engines. Decode walks the chunk stream in Python, bounded per
FILE inside one Arrow task (the GIF-LZW scale pattern: the cluster
parallelism unit is files). Failure modes raise ValueError("qoi: ...").
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_TRAILER = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode(img: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode (h, w, 3) RGB or (h, w, 4) RGBA uint8 to QOI bytes."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"qoi: need (h, w, 3|4), got {img.shape}")
    if img.dtype != np.uint8:
        raise ValueError(f"qoi: need uint8, got {img.dtype}")
    if colorspace not in (0, 1):
        raise ValueError(f"qoi: colorspace {colorspace}")
    h, w, nch = img.shape
    if h == 0 or w == 0:
        raise ValueError("qoi: empty image")
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">IIBB", w, h, nch, colorspace)

    px = img.reshape(-1, nch)
    if nch == 3:
        px = np.concatenate(
            [px, np.full((len(px), 1), 255, np.uint8)], axis=1)
    flat = [tuple(int(v) for v in row) for row in px]

    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for cur in flat:
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hi = _hash(*cur)
        if index[hi] == cur:
            out.append(hi)
        else:
            index[hi] = cur
            r, g, b, a = cur
            pr, pg, pb, pa = prev
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                               | (db + 2))
                elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                      and -8 <= db - dg <= 7):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(0xFE)
                    out += bytes((r, g, b))
            else:
                out.append(0xFF)
                out += bytes((r, g, b, a))
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _TRAILER
    return bytes(out)


def decode(buf: bytes):
    """Decode QOI bytes. Returns ((h, w, channels) uint8, meta) where
    channels matches the header (3 or 4)."""
    if len(buf) < 14 + len(_TRAILER):
        raise ValueError("qoi: truncated")
    if buf[:4] != _MAGIC:
        raise ValueError("qoi: bad magic")
    w, h, nch, colorspace = struct.unpack_from(">IIBB", buf, 4)
    if nch not in (3, 4):
        raise ValueError(f"qoi: channels {nch}")
    if colorspace not in (0, 1):
        raise ValueError(f"qoi: colorspace {colorspace}")
    if w == 0 or h == 0:
        raise ValueError("qoi: empty image")
    n = w * h
    out = np.empty((n, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(buf) - len(_TRAILER)
    i = 0
    while i < n:
        if pos >= end:
            raise ValueError("qoi: chunk stream ends before last pixel")
        tag = buf[pos]
        pos += 1
        if tag == 0xFE:
            r, g, b = buf[pos], buf[pos + 1], buf[pos + 2]
            pos += 3
        elif tag == 0xFF:
            r, g, b, a = buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
            pos += 4
        else:
            op = tag >> 6
            if op == 0:  # INDEX
                r, g, b, a = index[tag]
            elif op == 1:  # DIFF
                r = (r + ((tag >> 4) & 3) - 2) % 256
                g = (g + ((tag >> 2) & 3) - 2) % 256
                b = (b + (tag & 3) - 2) % 256
            elif op == 2:  # LUMA
                dg = (tag & 0x3F) - 32
                nb2 = buf[pos]
                pos += 1
                r = (r + dg + ((nb2 >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nb2 & 0x0F) - 8) % 256
            else:  # RUN
                run = (tag & 0x3F) + 1
                if i + run > n:
                    raise ValueError("qoi: run overflows pixel count")
                out[i:i + run] = (r, g, b, a)
                index[_hash(r, g, b, a)] = (r, g, b, a)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if buf[pos:pos + len(_TRAILER)] != _TRAILER:
        raise ValueError("qoi: bad end marker")
    img = out.reshape(h, w, 4)
    if nch == 3:
        img = img[:, :, :3].copy()
    meta = {"w": int(w), "h": int(h), "channels": int(nch),
            "colorspace": int(colorspace)}
    return img, meta
