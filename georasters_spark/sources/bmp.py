"""BMP codec (Windows BITMAPINFOHEADER), pure numpy + stdlib struct.

GDAL ships a BMP driver (the reference's gdal.Open accepts BMP rasters,
georasters.py:281-291); the format is fully specified in public
Windows documentation and carries no entropy tables at all:

  decoder: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte) — 8-bit
           palettized (BGRA quads, BI_RGB or BI_RLE8 run-length with
           all three escapes: end-of-line, end-of-bitmap, delta),
           24-bit BGR and 32-bit BGRX, bottom-up AND top-down
           (negative height) row order, 4-byte row padding
  encoder: 8-bit palette (optionally RLE8), 24-bit RGB, 32-bit RGBA

Lossless — decode(encode(x)) is bit-identical, gate-able hash-exact.
Failure modes raise ValueError("bmp: ...")."""

from __future__ import annotations

import struct

import numpy as np


def decode(buf: bytes):
    """Decode a BMP. Returns (h, w) uint8 palette indices + meta with
    the palette for 8-bit files, (h, w, 3) RGB for 24-bit, (h, w, 4)
    RGBA for 32-bit. Rows returned top-down regardless of file order."""
    if buf[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    if len(buf) < 54:
        raise ValueError("bmp: truncated header")
    (_fsz, _r1, _r2, data_off) = struct.unpack_from("<IHHI", buf, 2)
    (hsz, w, h_raw, planes, bpp, comp, _isz, _xp, _yp, ncolors,
     _imp) = struct.unpack_from("<IiihHIIiiII", buf, 14)
    if hsz < 40:
        raise ValueError(f"bmp: header size {hsz} (need BITMAPINFOHEADER)")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("bmp: bad dimensions")
    if planes != 1:
        raise ValueError(f"bmp: planes {planes}")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"bmp: {bpp} bpp not supported")
    if comp not in (0, 1) or (comp == 1 and bpp != 8):
        raise NotImplementedError(f"bmp: compression {comp} at {bpp} bpp")

    palette = None
    if bpp == 8:
        n = ncolors or 256
        quad_off = 14 + hsz
        quads = np.frombuffer(buf, dtype=np.uint8,
                              count=n * 4, offset=quad_off).reshape(n, 4)
        palette = quads[:, [2, 1, 0]].copy()  # BGRA -> RGB

    if comp == 1:  # RLE8
        img = _decode_rle8(buf[data_off:], w, h)
    else:
        rowbytes = (w * (bpp // 8) + 3) & ~3
        need = rowbytes * h
        if data_off + need > len(buf):
            raise ValueError("bmp: truncated pixel data")
        rows = np.frombuffer(buf, dtype=np.uint8, count=need,
                             offset=data_off).reshape(h, rowbytes)
        if bpp == 8:
            img = rows[:, :w].copy()
        elif bpp == 24:
            img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
        else:
            bgrx = rows[:, : w * 4].reshape(h, w, 4)
            img = bgrx[:, :, [2, 1, 0, 3]].copy()
    if not top_down:
        img = img[::-1].copy()
    if palette is not None:
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("bmp: pixel index outside palette")
        return img, {"palette": palette, "bpp": bpp, "w": w, "h": h}
    return img, {"palette": None, "bpp": bpp, "w": w, "h": h}


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8: (count, value) runs; escapes 00 00 EOL / 00 01 EOB /
    00 02 dx dy delta / 00 n absolute (word-aligned). Rows bottom-up."""
    img = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:
            if y >= h or x + cnt > w:
                raise ValueError("bmp: RLE run outside bitmap")
            img[y, x : x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return img
        elif val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("bmp: truncated RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal bytes, padded to word
            if pos + val > n:
                raise ValueError("bmp: truncated RLE absolute run")
            if y >= h or x + val > w:
                raise ValueError("bmp: RLE absolute run outside bitmap")
            img[y, x : x + val] = np.frombuffer(data, np.uint8, val, pos)
            x += val
            pos += val + (val & 1)
    raise ValueError("bmp: RLE stream missing end-of-bitmap")


def _encode_rle8(img: np.ndarray) -> bytes:
    """Simple run-length encoder: maximal (count<=255, value) runs per
    row + EOL, EOB at the end."""
    out = bytearray()
    h, w = img.shape
    for y in range(h):
        row = img[y]
        x = 0
        while x < w:
            v = row[x]
            run = 1
            while x + run < w and row[x + run] == v and run < 255:
                run += 1
            out += bytes((run, int(v)))
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def encode(
    img: np.ndarray,
    palette: np.ndarray | None = None,
    rle: bool = False,
    top_down: bool = False,
) -> bytes:
    """Encode to BMP: 2-D uint8 + palette -> 8-bit palettized (rle=True
    for BI_RLE8); (h, w, 3) -> 24-bit; (h, w, 4) -> 32-bit."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        if palette is None:
            raise ValueError("bmp: 2-D input needs a palette")
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError("bmp: palette must be (n<=256, 3) uint8")
        if int(a.max(initial=0)) >= len(pal):
            raise ValueError("bmp: index outside palette")
        bpp = 8
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        if rle:
            raise ValueError("bmp: RLE8 is for 8-bit palettized only")
        bpp = 8 * a.shape[2]
        pal = None
    else:
        raise ValueError("bmp: input must be (h,w) indices or (h,w,3|4)")
    h, w = a.shape[:2]

    rows = a if top_down else a[::-1]
    if bpp == 8:
        if rle:
            pix = _encode_rle8(np.ascontiguousarray(rows))
        else:
            rowbytes = (w + 3) & ~3
            padded = np.zeros((h, rowbytes), dtype=np.uint8)
            padded[:, :w] = rows
            pix = padded.tobytes()
    else:
        nch = bpp // 8
        rowbytes = (w * nch + 3) & ~3
        padded = np.zeros((h, rowbytes), dtype=np.uint8)
        if nch == 3:
            padded[:, : w * 3] = rows[:, :, ::-1].reshape(h, w * 3)
        else:
            padded[:, : w * 4] = rows[:, :, [2, 1, 0, 3]].reshape(h, w * 4)
        pix = padded.tobytes()

    quads = b""
    ncolors = 0
    if pal is not None:
        ncolors = len(pal)
        q = np.zeros((ncolors, 4), dtype=np.uint8)
        q[:, :3] = pal[:, ::-1]  # RGB -> BGR0
        quads = q.tobytes()
    data_off = 14 + 40 + len(quads)
    info = struct.pack(
        "<IiihHIIiiII", 40, w, -h if top_down else h, 1, bpp,
        1 if rle else 0, len(pix), 2835, 2835, ncolors, 0)
    fhdr = struct.pack("<2sIHHI", b"BM", data_off + len(pix), 0, 0, data_off)
    return fhdr + info + quads + pix
