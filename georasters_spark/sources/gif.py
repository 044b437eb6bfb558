"""GIF codec (GIF87a/89a), pure numpy + stdlib — no PIL.

The reference's raster stack is GDAL-backed and GDAL ships a GIF driver
(georasters.py:281-291 accepts any gdal.Open-able file); this engine
implements the format from the public specification (GIF89a spec,
CompuServe 1990 — the document is public domain):

  decoder: header + logical screen descriptor, global/local color
           tables, graphic-control / application / comment extensions
           (sub-block walk), image descriptors, the GIF variant of LZW
           (LSB-first bit packing, dynamic code width 3..12 bits, CLEAR
           and END codes, deferred-clear tolerant), 4-pass interlace,
           and full animation compositing: disposal methods 0/1
           (leave), 2 (restore to background) and 3 (restore to
           previous) with per-frame transparency -> RGBA canvas frames
  encoder: GIF89a writer with real LZW compression (dictionary reset
           via CLEAR when the 12-bit table fills), optional interlace,
           global color table, and multi-frame animation (graphic
           control extension per frame, loop via the Netscape
           application extension)

GIF is LOSSLESS on indexed data: decode(encode(frames)) is
bit-identical, which the png_roundtrip-style exact gate relies on.
All failure modes raise ValueError("gif: ..."), never a silent wrong
frame. Per-frame work is vectorized numpy; the LZW inner loop is
per-CODE (amortized ~pixels/2 iterations), inside one Arrow task.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, dynamic width, CLEAR/END)
# --------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Decode a GIF LZW stream to `expected` pixel indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary as arrays: prefix link + appended byte, roots are -1
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.int32)
    suffix[:clear] = np.arange(clear)
    next_code = end + 1

    out = np.empty(expected + 4096, dtype=np.uint8)
    npx = 0
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    prev = -1
    buf = np.frombuffer(data, dtype=np.uint8)

    def emit(code: int) -> int:
        # walk the prefix chain, write reversed
        stack = []
        c = code
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        k = len(stack)
        out[npx : npx + k] = stack[::-1]
        return k

    while npx < expected:
        while bitcnt < width:
            if pos >= n:
                raise ValueError("gif: LZW stream truncated")
            bitbuf |= int(buf[pos]) << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("gif: first LZW code is not a root")
            out[npx] = code
            npx += 1
            prev = code
            continue
        if code < next_code:
            k = emit(code)
        elif code == next_code:
            # KwKwK case: string = prev + first(prev)
            k = emit(prev)
            out[npx + k] = out[npx]  # first byte of prev's expansion
            k += 1
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        if next_code < 4096:
            # new entry = prev's string + FIRST byte emitted this step
            prefix[next_code] = prev
            suffix[next_code] = out[npx]
            next_code += 1
            if next_code < 4096 and next_code == (1 << width):
                width += 1
        npx += k
        prev = code
    if npx < expected:
        raise ValueError(f"gif: LZW produced {npx} of {expected} pixels")
    return out[:expected]


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encode (dictionary reset via CLEAR at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict = {}
    next_code = end + 1

    outbits = bytearray()
    bitbuf = 0
    bitcnt = 0

    def put(code: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            outbits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    put(clear)
    px = indices.ravel()
    if px.size == 0:
        put(end)
    else:
        cur = int(px[0])
        for v in px[1:].tolist():
            key = (cur, v)
            nxt = table.get(key)
            if nxt is not None:
                cur = nxt
                continue
            put(cur)
            if next_code < 4096:
                table[key] = next_code
                # canonical GIF asymmetry: the ENCODER grows the width
                # when it defines the first id that does not fit the
                # current width (id == 1<<width); the DECODER — which
                # lags one entry behind — grows when its added id ==
                # (1<<width)-1. Both sides then read/write code number
                # (1<<width)-end at the old width and the next one at
                # the new width.
                if next_code == (1 << width):
                    width += 1
                next_code += 1
            else:
                put(clear)
                table.clear()
                next_code = end + 1
                width = min_code_size + 1
            cur = v
        put(cur)
        put(end)
    if bitcnt:
        outbits.append(bitbuf & 0xFF)
    return bytes(outbits)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


def _subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; returns (data, new pos
    past the 0-terminator)."""
    parts = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-block chain")
        k = buf[pos]
        pos += 1
        if k == 0:
            return b"".join(parts), pos
        if pos + k > n:
            raise ValueError("gif: truncated sub-block")
        parts.append(buf[pos : pos + k])
        pos += k


def _emit_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def parse(buf: bytes) -> dict:
    """Parse a GIF into {w, h, version, frames: [...]} where each frame
    has {left, top, w, h, indices (np.uint8 h x w), palette (n x 3),
    transparent (index | None), delay_cs, disposal, interlace}."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    if len(buf) < 13:
        raise ValueError("gif: truncated header")
    version = buf[3:6].decode()
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(buf):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(buf[pos : pos + 3 * size], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * size

    frames = []
    gce = {"transparent": None, "delay_cs": 0, "disposal": 0}
    n = len(buf)
    while pos < n:
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            return {"w": w, "h": h, "version": version, "frames": frames}
        if b0 == 0x21:  # extension
            if pos >= n:
                raise ValueError("gif: truncated extension")
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                data, pos = _subblocks(buf, pos)
                if len(data) != 4:
                    raise ValueError("gif: bad graphic control block")
                flags, delay, tidx = struct.unpack("<BHB", data)
                gce = {
                    "transparent": tidx if flags & 1 else None,
                    "delay_cs": delay,
                    "disposal": (flags >> 2) & 0x07,
                }
            else:  # application / comment / plain text: skip
                _, pos = _subblocks(buf, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b0:02x}")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise ValueError("gif: frame rectangle outside logical screen")
        pal = gct
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            if pos + 3 * size > n:
                raise ValueError("gif: truncated local color table")
            pal = np.frombuffer(buf[pos : pos + 3 * size], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * size
        if pal is None:
            raise ValueError("gif: frame has no color table")
        interlace = bool(fpacked & 0x40)
        if pos >= n:
            raise ValueError("gif: truncated before LZW min code size")
        mincode = buf[pos]
        pos += 1
        data, pos = _subblocks(buf, pos)
        flat = lzw_decode(data, mincode, fw * fh)
        if int(flat.max(initial=0)) >= len(pal):
            raise ValueError("gif: pixel index outside color table")
        idx = np.empty((fh, fw), dtype=np.uint8)
        if interlace:
            rows = np.concatenate(
                [np.arange(start, fh, step) for start, step in _INTERLACE_PASSES])
            idx[rows] = flat.reshape(fh, fw)
        else:
            idx[:] = flat.reshape(fh, fw)
        frames.append({
            "left": left, "top": top, "w": fw, "h": fh,
            "indices": idx, "palette": pal,
            "transparent": gce["transparent"],
            "delay_cs": gce["delay_cs"], "disposal": gce["disposal"],
            "interlace": interlace,
        })
        gce = {"transparent": None, "delay_cs": 0, "disposal": 0}
    raise ValueError("gif: missing trailer")


def decode_frames(buf: bytes, parsed: dict | None = None) -> list[np.ndarray]:
    """Composite all frames onto the logical screen per the disposal
    rules; returns a list of (h, w, 4) uint8 RGBA canvases (one per
    frame, as an animation player would show them). Pass `parsed`
    (a parse() result for the same bytes) to avoid re-walking the
    container + LZW — the dominant per-file cost."""
    g = parsed if parsed is not None else parse(buf)
    w, h = g["w"], g["h"]
    canvas = np.zeros((h, w, 4), dtype=np.uint8)  # transparent background
    out = []
    for fr in g["frames"]:
        saved = canvas.copy() if fr["disposal"] == 3 else None
        idx = fr["indices"]
        pal = fr["palette"]
        rgba = np.dstack([pal[idx], np.full(idx.shape, 255, dtype=np.uint8)])
        if fr["transparent"] is not None:
            mask = idx == fr["transparent"]
            rgba[mask] = canvas[fr["top"] : fr["top"] + fr["h"],
                                fr["left"] : fr["left"] + fr["w"]][mask]
        canvas[fr["top"] : fr["top"] + fr["h"],
               fr["left"] : fr["left"] + fr["w"]] = rgba
        out.append(canvas.copy())
        if fr["disposal"] == 2:  # restore to background (transparent)
            canvas[fr["top"] : fr["top"] + fr["h"],
                   fr["left"] : fr["left"] + fr["w"]] = 0
        elif fr["disposal"] == 3:
            canvas = saved
    return out


def encode(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    transparent: int | None = None,
    delays_cs: list[int] | None = None,
    disposal: int | list[int] = 1,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode indexed frames (each (h, w) uint8, same size) + a shared
    global color table into a GIF89a. Single-frame input may be a bare
    2-D array."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("gif: no frames")
    h, w = frames[0].shape
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= len(pal) <= 256:
        raise ValueError("gif: palette must be (2..256, 3) uint8")
    # color table size must be a power of two >= 2
    bits = max(1, int(len(pal) - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    mincode = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i, fr in enumerate(frames):
        a = np.ascontiguousarray(fr, dtype=np.uint8)
        if a.shape != (h, w):
            raise ValueError("gif: all frames must share the screen size")
        if int(a.max(initial=0)) >= len(pal):
            raise ValueError("gif: index outside color table")
        delay = delays_cs[i] if delays_cs else 4
        disp = disposal[i] if isinstance(disposal, (list, tuple)) else disposal
        flags = ((disp & 7) << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9" + _emit_subblocks(
            struct.pack("<BHB", flags, delay,
                        transparent if transparent is not None else 0))
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        if interlace:
            rows = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES])
            a = a[rows]
        out.append(mincode)
        out += _emit_subblocks(lzw_encode(a, mincode))
    out.append(0x3B)
    return bytes(out)
