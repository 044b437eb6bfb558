"""Real GeoTIFF codec — pure numpy + stdlib zlib, no GDAL/PIL.

This closes the engine's biggest declared codec boundary: the reference
library's core entry points are ``load_tiff``/``from_file`` and
``create_geotiff``/``to_tiff`` (georasters.py:281-291, :179-205,
:535-557, :1548-1566), all GDAL-backed. The TIFF 6.0 container and the
GeoTIFF 1.1 key set are public specifications, and a single-band raster
TIFF is a simple enough format to implement exactly:

Reader (``parse_tiff``) — accepts what GDAL commonly writes:
  * classic TIFF (magic 42) AND BigTIFF (magic 43, 8-byte offsets,
    LONG8/SLONG8/IFD8 field types), little- OR big-endian
  * strip- or tile-organized data
  * compression: none (1), LZW (5), DEFLATE (8 / 32946), PackBits (32773)
  * horizontal-differencing predictor (317 = 2), incl. multi-sample rows,
    AND the floating-point byte-plane predictor (317 = 3, TechNote 3)
  * sample types: u1/i1/u2/i2/u4/i4/f4/f8 (BitsPerSample x SampleFormat)
  * single-band → (h, w); multi-band → (bands, h, w) for BOTH chunky
    (PlanarConfig 1) and band-sequential (PlanarConfig 2) layouts
  * georeferencing: ModelPixelScale + ModelTiepoint, or an axis-aligned
    ModelTransformation; EPSG from GeoKeyDirectory (geographic 2048 or
    projected 3072); nodata from the GDAL_NODATA ASCII tag (42113)

Writer (``write_tiff``) — emits files GDAL/QGIS can open:
  * single-band, strip or tiled layout, LE or BE, classic or BigTIFF
    (``bigtiff=True``: 16-byte header, 20-byte entries, LONG8 chunk
    offsets — the layout large rasters need past 4 GiB)
  * compression none/DEFLATE/LZW (+ predictor 2 for integer dtypes)
  * GeoTIFF keys (model type, raster-is-area, geographic/projected EPSG),
    ModelPixelScale/ModelTiepoint, GDAL_NODATA

The LZW codec is the TIFF variant (MSB-first packing, 9→12 bit codes
with *early change*, Clear=256/EOI=257) implemented from the TIFF 6.0
spec §13; PackBits decode from spec §9.

Scale notes: one FILE is the unit of parallelism (``load_tiff`` maps a
``binaryFile`` scan, one task per file — the right shape for a lake of
many rasters). A single file must fit in one task's memory; a 100-TB
dataset should be many files, not one. ``assemble_tiff`` (one giant
output array) is the documented small-raster path matching the
reference's eager ``to_tiff``; the distributed sink is
``tiles_to_tiff`` — every tile becomes a standalone, correctly
georeferenced GeoTIFF part-file, the COG-tile layout a real pipeline
would use.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF type id -> (struct char, byte size); 16/17/18 are the BigTIFF
# LONG8/SLONG8/IFD8 types
_TYPES = {
    1: ("B", 1), 2: ("s", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8), 16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8),
}

_T_SUBFILE = 254
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMP, _T_PHOTO = 256, 257, 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_JPEG_TABLES = 347
_T_TILE_W, _T_TILE_H, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_SAMPLE_FMT = 339
_T_PIXEL_SCALE, _T_TIEPOINT, _T_TRANSFORM = 33550, 33922, 34264
_T_GEO_KEYS, _T_GEO_DOUBLES, _T_GEO_ASCII = 34735, 34736, 34737
_T_GDAL_NODATA = 42113

_GK_MODEL_TYPE, _GK_RASTER_TYPE = 1024, 1025
_GK_GEOGRAPHIC, _GK_PROJECTED = 2048, 3072


# --------------------------------------------------------------------------
# LZW (TIFF variant, spec §13): MSB-first, early change, Clear/EOI codes
# --------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    """TIFF LZW decode (MSB-first bit order, early code-width change)."""
    out = bytearray()
    table: list[bytes] = []
    nbits = 9
    prev: bytes | None = None
    acc = 0
    acc_bits = 0
    pos = 0
    n = len(data)
    while True:
        while acc_bits < nbits:
            if pos >= n:
                return bytes(out)  # no EOI: tolerate truncated tail
            acc = (acc << 8) | data[pos]
            pos += 1
            acc_bits += 8
        code = (acc >> (acc_bits - nbits)) & ((1 << nbits) - 1)
        acc_bits -= nbits
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
            out += entry
            prev = entry
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table size")
        table.append(prev + entry[:1])
        out += entry
        prev = entry
        # early change: widen when the table reaches 2^nbits - 1
        if len(table) == (1 << nbits) - 1 and nbits < 12:
            nbits += 1


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encode — pairs exactly with lzw_decode (early change,
    Clear emitted at start and whenever the table fills at 4094)."""
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, nbits: int):
        nonlocal acc, acc_bits
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8
        acc &= (1 << acc_bits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    emit(_CLEAR, nbits)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], nbits)
        table[wc] = next_code
        next_code += 1
        # width change in lockstep with the decoder: the decoder (which
        # appends AFTER reading, one entry behind this table) widens at
        # len == 2^n - 1, which corresponds to next_code == 2^n here
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
        if next_code == 4094:
            emit(_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        w = bytes([byte])
    if w:
        emit(table[w], nbits)
        # the decoder APPENDS an entry for this final code too and may
        # widen before reading EOI — mirror that bookkeeping (without
        # it, an unlucky stream ending exactly at a width boundary has
        # EOI written one bit narrower than the decoder reads it:
        # silent corruption, fuzz-confirmed)
        next_code += 1
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
    emit(_EOI, nbits)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    """PackBits RLE decode (TIFF spec §9 / Apple)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


# --------------------------------------------------------------------------
# Reader
# --------------------------------------------------------------------------


def _read_ifd(buf: bytes, bo: str, off: int,
              big: bool = False) -> tuple[dict[int, tuple], int]:
    """One IFD -> {tag: (type, count, value-field position, big)} plus
    the next-IFD pointer.  Classic: H count, 12-byte entries, I next;
    BigTIFF: Q count, 20-byte entries (value field 8 bytes), Q next."""
    if big:
        (n,) = struct.unpack_from(bo + "Q", buf, off)
        entries = {}
        for i in range(n):
            tag, typ, cnt = struct.unpack_from(bo + "HHQ", buf, off + 8 + 20 * i)
            entries[tag] = (typ, cnt, off + 8 + 20 * i + 12, True)
        (nxt,) = struct.unpack_from(bo + "Q", buf, off + 8 + 20 * n)
        return entries, nxt
    (n,) = struct.unpack_from(bo + "H", buf, off)
    entries = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off + 2 + 12 * i)
        entries[tag] = (typ, cnt, off + 2 + 12 * i + 8, False)
    (nxt,) = struct.unpack_from(bo + "I", buf, off + 2 + 12 * n)
    return entries, nxt


def _tag_values(buf: bytes, bo: str, entry: tuple):
    typ, cnt, vpos, big = entry
    ch, size = _TYPES.get(typ, (None, None))
    if ch is None:
        raise ValueError(f"unsupported TIFF field type {typ}")
    total = size * cnt
    pos = vpos
    if total > (8 if big else 4):
        (pos,) = struct.unpack_from(bo + ("Q" if big else "I"), buf, vpos)
    if typ == 2:  # ASCII
        return buf[pos : pos + cnt].split(b"\x00")[0].decode("ascii", "replace")
    if typ in (5, 10):  # RATIONAL: return floats
        raw = struct.unpack_from(bo + ("Ii"[typ == 10] * 2 * cnt), buf, pos)
        return [raw[2 * i] / (raw[2 * i + 1] or 1) for i in range(cnt)]
    vals = struct.unpack_from(bo + ch * cnt, buf, pos)
    return list(vals)


def _tag_bytes(buf: bytes, bo: str, entry: tuple) -> bytes:
    """Raw byte payload of an UNDEFINED/BYTE tag (e.g. JPEGTables)."""
    typ, cnt, vpos, big = entry
    pos = vpos
    if cnt > (8 if big else 4):
        (pos,) = struct.unpack_from(bo + ("Q" if big else "I"), buf, vpos)
    return buf[pos : pos + cnt]


def _first(entries, buf, bo, tag, default=None):
    if tag not in entries:
        return default
    v = _tag_values(buf, bo, entries[tag])
    return v[0] if isinstance(v, list) else v


_DTYPES = {
    (8, 1): "u1", (8, 2): "i1", (16, 1): "u2", (16, 2): "i2",
    (32, 1): "u4", (32, 2): "i4", (32, 3): "f4", (64, 3): "f8",
}


def _decompress(chunk: bytes, comp: int) -> bytes:
    if comp == 1:
        return chunk
    if comp in (8, 32946):
        return zlib.decompress(chunk)
    if comp == 5:
        return lzw_decode(chunk)
    if comp == 32773:
        return packbits_decode(chunk)
    raise NotImplementedError(
        f"TIFF compression {comp} not supported (have: none/LZW/DEFLATE/PackBits)"
    )


def _undo_predictor2(block: np.ndarray, spp: int) -> np.ndarray:
    """Horizontal differencing inverse: cumsum per scanline per sample,
    in the sample's native modular arithmetic. block: (rows, w, spp)."""
    return np.cumsum(block, axis=1, dtype=block.dtype)


def _undo_predictor3(raw: bytes, rows: int, wpx: int, spp: int,
                     itemsize: int) -> np.ndarray:
    """Floating-point predictor (TIFF Technical Note 3, predictor=3)
    inverse: each scanline stores the float bytes split into byte
    planes (most-significant plane first, regardless of file byte
    order) and horizontally differenced as uint8.  Inverse = per-row
    modular uint8 cumsum, de-plane, reinterpret big-endian."""
    n = wpx * spp
    b = np.frombuffer(raw, dtype=np.uint8, count=rows * n * itemsize).reshape(
        rows, n * itemsize)
    b = np.cumsum(b, axis=1, dtype=np.uint8)
    interleaved = b.reshape(rows, itemsize, n).transpose(0, 2, 1)
    be = np.ascontiguousarray(interleaved).reshape(rows, n * itemsize)
    dt = np.dtype(">f4" if itemsize == 4 else ">f8")
    return np.frombuffer(be.tobytes(), dtype=dt).reshape(rows, wpx, spp)


def parse_dims(buf: bytes) -> tuple[int, int]:
    """(w, h) of page 0 from the IFD ONLY — no pixel decode (the
    media-ingest header probe)."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 43:
        (off,) = struct.unpack_from(bo + "Q", buf, 8)
        entries, _ = _read_ifd(buf, bo, off, True)
    elif magic == 42:
        (off,) = struct.unpack_from(bo + "I", buf, 4)
        entries, _ = _read_ifd(buf, bo, off, False)
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    return (int(_first(entries, buf, bo, _T_WIDTH)),
            int(_first(entries, buf, bo, _T_HEIGHT)))


def tiff_dims(path: str, page: int = 0) -> tuple[int, int]:
    """TRUE raster dims (h, w) of one page via header+IFD seeks only —
    no strip/tile decode, no full-file read.  Classic and BigTIFF, both
    byte orders; ImageWidth/ImageLength (tags 256/257) are count-1
    SHORT/LONG values and therefore always inline in the entry."""
    with open(path, "rb") as f:
        head = f.read(16)
        if head[:2] == b"II":
            bo = "<"
        elif head[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError("not a TIFF (bad byte-order mark)")
        (magic,) = struct.unpack_from(bo + "H", head, 2)
        big = magic == 43
        if big:
            osize, pad = struct.unpack_from(bo + "HH", head, 4)
            if osize != 8 or pad != 0:
                raise ValueError(f"BigTIFF with offset size {osize} (must be 8)")
            (off,) = struct.unpack_from(bo + "Q", head, 8)
        elif magic == 42:
            (off,) = struct.unpack_from(bo + "I", head, 4)
        else:
            raise ValueError(f"not a TIFF (magic {magic})")
        for _ in range(page + 1):
            if off == 0:
                raise ValueError(f"TIFF has no page {page}")
            f.seek(off)
            if big:
                (n,) = struct.unpack(bo + "Q", f.read(8))
                ent = f.read(20 * n + 8)
                esz, vofs = 20, 12
                nxt = struct.unpack_from(bo + "Q", ent, 20 * n)[0]
            else:
                (n,) = struct.unpack(bo + "H", f.read(2))
                ent = f.read(12 * n + 4)
                esz, vofs = 12, 8
                nxt = struct.unpack_from(bo + "I", ent, 12 * n)[0]
            off = nxt
        w = h = None
        for i in range(n):
            tag, typ = struct.unpack_from(bo + "HH", ent, esz * i)
            if tag in (_T_WIDTH, _T_HEIGHT):
                if typ == 3:  # SHORT
                    (v,) = struct.unpack_from(bo + "H", ent, esz * i + vofs)
                elif typ == 4:  # LONG
                    (v,) = struct.unpack_from(bo + "I", ent, esz * i + vofs)
                elif typ == 16:  # LONG8 (BigTIFF)
                    (v,) = struct.unpack_from(bo + "Q", ent, esz * i + vofs)
                else:
                    raise ValueError(f"tiff: dims tag {tag} has type {typ}")
                if tag == _T_WIDTH:
                    w = int(v)
                else:
                    h = int(v)
        if w is None or h is None:
            raise ValueError("tiff: missing ImageWidth/ImageLength")
        return h, w


def parse_tiff(buf: bytes, page: int = 0):
    """Parse one page of a classic TIFF. Returns ``(array, meta)`` where
    array is (h, w) for single-band or (bands, h, w) for chunky
    multi-band, and meta has x0/y0/cellx/celly/epsg/model_type/ndv/dtype.
    """
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    big = magic == 43
    if big:
        osize, pad = struct.unpack_from(bo + "HH", buf, 4)
        if osize != 8 or pad != 0:
            raise ValueError(f"BigTIFF with offset size {osize} (must be 8)")
        (off,) = struct.unpack_from(bo + "Q", buf, 8)
    elif magic == 42:
        (off,) = struct.unpack_from(bo + "I", buf, 4)
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    for _ in range(page + 1):
        if off == 0:
            raise ValueError(f"TIFF has no page {page}")
        entries, nxt = _read_ifd(buf, bo, off, big)
        off = nxt

    w = int(_first(entries, buf, bo, _T_WIDTH))
    h = int(_first(entries, buf, bo, _T_HEIGHT))
    spp = int(_first(entries, buf, bo, _T_SPP, 1))
    comp = int(_first(entries, buf, bo, _T_COMP, 1))
    planar = int(_first(entries, buf, bo, _T_PLANAR, 1))
    predictor = int(_first(entries, buf, bo, _T_PREDICTOR, 1))
    bits = _tag_values(buf, bo, entries[_T_BITS]) if _T_BITS in entries else [1]
    sfmt = (
        _tag_values(buf, bo, entries[_T_SAMPLE_FMT])
        if _T_SAMPLE_FMT in entries
        else [1] * spp
    )
    if len(set(bits)) != 1 or len(set(sfmt)) != 1:
        raise NotImplementedError("mixed per-sample types not supported")
    key = (int(bits[0]), int(sfmt[0]))
    if key not in _DTYPES:
        raise NotImplementedError(f"sample type bits={key[0]} fmt={key[1]}")
    dt = np.dtype(bo + _DTYPES[key])
    if planar not in (1, 2):
        raise ValueError(f"unknown planar configuration {planar}")
    if predictor == 3 and sfmt[0] != 3:
        raise ValueError("floating-point predictor (3) on non-float samples")
    if predictor not in (1, 2, 3):
        raise ValueError(f"unknown predictor {predictor}")
    jpegtables = None
    if comp == 7:
        # new-style TIFF-JPEG (Technical Note 2): each strip/tile is a
        # JPEG stream; shared tables may live in JPEGTables (347) as an
        # abbreviated SOI..EOI stream to prepend
        if key != (8, 1):
            raise NotImplementedError("TIFF-JPEG requires 8-bit unsigned samples")
        if spp not in (1, 3):
            raise NotImplementedError(
                "TIFF-JPEG supports 1 (gray) or 3 (YCbCr/RGB) samples")
        if spp == 3 and planar != 1:
            raise NotImplementedError("TIFF-JPEG color must be chunky")
        if predictor != 1:
            raise ValueError("predictor is invalid with JPEG compression")
        if _T_JPEG_TABLES in entries:
            jpegtables = _tag_bytes(buf, bo, entries[_T_JPEG_TABLES])
            if jpegtables[:2] != b"\xff\xd8" or jpegtables[-2:] != b"\xff\xd9":
                raise ValueError("JPEGTables is not an SOI..EOI stream")
    # planar=2: chunks are band-sequential (all of band 0 first); each
    # chunk then carries ONE sample per pixel
    nplanes = spp if (planar == 2 and spp > 1) else 1
    cspp = 1 if nplanes > 1 else spp

    out = np.zeros((h, w, spp), dtype=dt.newbyteorder("="))

    def undo_pred(raw: bytes, rows: int, wpx: int):
        if predictor == 3:
            return _undo_predictor3(raw, rows, wpx, cspp, dt.itemsize)
        block = np.frombuffer(raw, dtype=dt, count=rows * wpx * cspp).reshape(
            rows, wpx, cspp)
        if predictor == 2:
            block = _undo_predictor2(block, cspp)
        return block

    def read_block(chunk: bytes, rows: int, wpx: int):
        if comp == 7:
            from . import jpeg as _jpeg

            stream = chunk
            if jpegtables is not None:
                if chunk[:2] != b"\xff\xd8":
                    raise ValueError("TIFF-JPEG chunk missing SOI")
                # tables stream minus its EOI + chunk minus its SOI
                stream = jpegtables[:-2] + chunk[2:]
            img = _jpeg.decode(stream)
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] != spp:
                raise ValueError(
                    f"TIFF-JPEG chunk has {img.shape[2]} components, "
                    f"IFD declares {spp}")
            # JPEG pads UP to MCU multiples; a stream SMALLER than the
            # declared strip/tile is corrupt — raise, never zero-fill
            if img.shape[0] < rows or img.shape[1] < wpx:
                raise ValueError(
                    f"TIFF-JPEG chunk decodes {img.shape} < declared "
                    f"({rows}, {wpx})")
            return img[:rows, :wpx].astype(dt.newbyteorder("="))
        return undo_pred(_decompress(chunk, comp), rows, wpx)

    if _T_TILE_OFF in entries:  # tiled layout
        tw = int(_first(entries, buf, bo, _T_TILE_W))
        th = int(_first(entries, buf, bo, _T_TILE_H))
        offs = _tag_values(buf, bo, entries[_T_TILE_OFF])
        cnts = _tag_values(buf, bo, entries[_T_TILE_CNT])
        tiles_x = (w + tw - 1) // tw
        tiles_per_band = tiles_x * ((h + th - 1) // th)
        for i, (o, c) in enumerate(zip(offs, cnts)):
            band, ti = divmod(i, tiles_per_band) if nplanes > 1 else (0, i)
            ty, tx = divmod(ti, tiles_x)
            block = read_block(buf[o : o + c], th, tw)
            r0, c0 = ty * th, tx * tw
            rr, cc = min(th, h - r0), min(tw, w - c0)
            if nplanes > 1:
                out[r0 : r0 + rr, c0 : c0 + cc, band] = block[:rr, :cc, 0]
            else:
                out[r0 : r0 + rr, c0 : c0 + cc] = block[:rr, :cc]
    else:  # strips
        rps = int(_first(entries, buf, bo, _T_RPS, h))
        offs = _tag_values(buf, bo, entries[_T_STRIP_OFF])
        cnts = _tag_values(buf, bo, entries[_T_STRIP_CNT])
        strips_per_band = (h + rps - 1) // rps
        for i, (o, c) in enumerate(zip(offs, cnts)):
            band, si = divmod(i, strips_per_band) if nplanes > 1 else (0, i)
            r0 = si * rps
            rows = min(rps, h - r0)
            block = read_block(buf[o : o + c], rows, w)
            if nplanes > 1:
                out[r0 : r0 + rows, :, band] = block[:, :, 0]
            else:
                out[r0 : r0 + rows] = block

    meta = {"dtype": str(out.dtype), "bands": spp}
    # --- georeferencing -----------------------------------------------
    if _T_PIXEL_SCALE in entries and _T_TIEPOINT in entries:
        sx, sy = _tag_values(buf, bo, entries[_T_PIXEL_SCALE])[:2]
        tp = _tag_values(buf, bo, entries[_T_TIEPOINT])
        i, j, _, x, y = tp[0], tp[1], tp[2], tp[3], tp[4]
        meta.update(x0=x - i * sx, y0=y + j * sy, cellx=sx, celly=-sy)
    elif _T_TRANSFORM in entries:
        m = _tag_values(buf, bo, entries[_T_TRANSFORM])
        if m[1] != 0 or m[4] != 0:
            raise NotImplementedError("rotated ModelTransformation not supported")
        meta.update(x0=m[3], y0=m[7], cellx=m[0], celly=m[5])
    if _T_GEO_KEYS in entries:
        gk = _tag_values(buf, bo, entries[_T_GEO_KEYS])
        nkeys = gk[3]
        for k in range(nkeys):
            kid, loc, cnt, val = gk[4 + 4 * k : 8 + 4 * k]
            if loc == 0:
                if kid == _GK_MODEL_TYPE:
                    meta["model_type"] = val
                elif kid in (_GK_GEOGRAPHIC, _GK_PROJECTED):
                    meta["epsg"] = val
    nd = _first(entries, buf, bo, _T_GDAL_NODATA)
    if nd is not None:
        meta["ndv"] = float(nd)
    arr = out[:, :, 0] if spp == 1 else np.moveaxis(out, 2, 0)
    return arr, meta


# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------

_WFMT = {
    "uint8": (8, 1), "int8": (8, 2), "uint16": (16, 1), "int16": (16, 2),
    "uint32": (32, 1), "int32": (32, 2), "float32": (32, 3), "float64": (64, 3),
}


def _apply_predictor2(block: np.ndarray) -> np.ndarray:
    d = block.copy()
    d[:, 1:] = block[:, 1:] - block[:, :-1]  # modular wrap is correct for ints
    return d


def write_tiff(
    arr: np.ndarray,
    *,
    x0: float = 0.0,
    y0: float = 0.0,
    cellx: float = 1.0,
    celly: float = -1.0,
    ndv: float | None = None,
    epsg: int = 4326,
    compression: str = "deflate",
    predictor: bool = False,
    jpeg_quality: int = 90,
    jpeg_tables: bool = False,
    jpeg_subsampling: str = "420",
    rows_per_strip: int | None = None,
    tiled: bool = False,
    tile_size: int = 256,
    byteorder: str = "<",
    overviews: list | None = None,
    bigtiff: bool = False,
) -> bytes:
    """Write a GeoTIFF — single-band (h, w) or multi-band (bands, h, w)
    chunky-interleaved (PlanarConfiguration=1; 3-band uint8 is labeled
    photometric RGB per GDAL convention). ``celly`` is negative (north-up),
    matching the engine's georef convention; the file stores |celly|
    in ModelPixelScale per the GeoTIFF spec.

    ``overviews``: optional reduced-resolution arrays (e.g. from
    pixels.build_overviews) appended as chained NewSubfileType=1 IFD
    pages with level-scaled ModelPixelScale — the Cloud-Optimized
    GeoTIFF overview layout; read back via parse_tiff(buf, page=n)."""
    a = np.ascontiguousarray(arr)
    if a.ndim == 3:
        # (bands, h, w) -> chunky interleaved (h, w, spp), the
        # PlanarConfiguration=1 layout parse_tiff returns for spp>1
        a = np.ascontiguousarray(np.moveaxis(a, 0, 2))
    elif a.ndim == 2:
        a = a[:, :, None]
    else:
        raise ValueError("write_tiff: (h, w) or (bands, h, w) arrays only")
    dname = str(a.dtype)
    if dname not in _WFMT:
        raise NotImplementedError(f"dtype {dname} not writable")
    bits, sfmt = _WFMT[dname]
    if predictor and sfmt == 3:
        raise ValueError("predictor=2 is for integer dtypes (use False for floats)")
    comp_id = {"none": 1, "deflate": 8, "lzw": 5, "jpeg": 7}.get(compression)
    if comp_id is None:
        raise ValueError(f"compression {compression!r}: none|deflate|lzw|jpeg")
    if comp_id == 7:
        if dname != "uint8":
            raise NotImplementedError("TIFF-JPEG writes uint8 arrays only")
        if predictor:
            raise ValueError("predictor is invalid with JPEG compression")
        if a.shape[2] not in (1, 3):
            raise NotImplementedError(
                "TIFF-JPEG writes 1-band (gray) or 3-band (RGB) arrays")
    bo = byteorder
    if bo not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    a = a.astype(np.dtype(bo + _DTYPES[(bits, sfmt)]))
    opts = dict(bits=bits, sfmt=sfmt, comp_id=comp_id, predictor=predictor,
                tiled=tiled, tile_size=tile_size, rows_per_strip=rows_per_strip,
                bo=bo, ndv=ndv, epsg=epsg, bigtiff=bigtiff,
                jpeg_quality=jpeg_quality, jpeg_tables=jpeg_tables,
                jpeg_subsampling=jpeg_subsampling)
    pages = [(a, x0, y0, cellx, celly, False)]
    for ov in overviews or []:
        o = np.ascontiguousarray(ov).astype(a.dtype)
        if o.ndim == 3:
            o = np.ascontiguousarray(np.moveaxis(o, 0, 2))
        else:
            o = o[:, :, None]
        lvl = max(1, round(a.shape[1] / o.shape[1]))
        # overview pages carry the SAME origin with level-scaled cells
        # and NewSubfileType=1 (reduced-resolution), the COG layout
        pages.append((o, x0, y0, cellx * lvl, celly * lvl, True))
    # BigTIFF: 16-byte header (magic 43, offset size 8), 8-byte pointers
    out = bytearray(16 if bigtiff else 8)  # header patched at the end
    ptr = "Q" if bigtiff else "I"
    ifd_offs = []
    next_ptr_pos = []
    for pa, px0, py0, pcx, pcy, reduced in pages:
        blob, ifd_off = _encode_page(
            pa, x0=px0, y0=py0, cellx=pcx, celly=pcy, reduced=reduced,
            base=len(out), **opts)
        ifd_offs.append(ifd_off)
        next_ptr_pos.append(len(out) + len(blob) - struct.calcsize(ptr))
        out += blob
    for i in range(len(pages) - 1):  # chain page i -> page i+1
        struct.pack_into(bo + ptr, out, next_ptr_pos[i], ifd_offs[i + 1])
    mark = b"II" if bo == "<" else b"MM"
    if bigtiff:
        struct.pack_into(bo + "2sHHHQ", out, 0, mark, 43, 8, 0, ifd_offs[0])
    else:
        struct.pack_into(bo + "2sHI", out, 0, mark, 42, ifd_offs[0])
    return bytes(out)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG stream into (tables, body): tables is an
    abbreviated SOI + DQT/DHT + EOI stream (the JPEGTables payload,
    TIFF Technical Note 2), body is the stream with those segments
    removed.  Everything from SOS on is entropy data, copied as is."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray(b"\xff\xd8")
    body = bytearray(b"\xff\xd8")
    pos = 2
    n = len(stream)
    while pos + 4 <= n:
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = stream[pos + 1]
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT -> shared tables
            tables += seg
        else:
            body += seg
        pos += 2 + seglen
        if marker == 0xDA:  # SOS: rest is entropy-coded data + EOI
            body += stream[pos:]
            break
    tables += b"\xff\xd9"
    return bytes(tables), bytes(body)


def _encode_page(a: np.ndarray, *, bits, sfmt, comp_id, predictor, tiled,
                 tile_size, rows_per_strip, bo, x0, y0, cellx, celly, ndv,
                 epsg, base: int, reduced: bool, jpeg_quality: int = 90,
                 jpeg_tables: bool = False, jpeg_subsampling: str = "420",
                 bigtiff: bool = False) -> tuple[bytes, int]:
    """Encode ONE IFD page (chunk data | ext values | IFD) positioned
    at absolute offset `base`; returns (blob, absolute ifd offset).
    The IFD's next-page pointer is the blob's last 4 (classic) or 8
    (BigTIFF) bytes (0).  BigTIFF pages use 20-byte entries with 8-byte
    inline values and LONG8 chunk offsets/counts, so files can exceed
    4 GiB."""
    h, w, spp = a.shape

    def pack_block(block: np.ndarray) -> bytes:
        if comp_id == 7:
            from . import jpeg as _jpeg

            if spp == 3:
                return _jpeg.encode_color(
                    np.ascontiguousarray(block, dtype=np.uint8),
                    jpeg_quality, subsampling=jpeg_subsampling)
            return _jpeg.encode_gray(
                np.ascontiguousarray(block[:, :, 0], dtype=np.uint8),
                jpeg_quality)
        if predictor:
            block = _apply_predictor2(block)
        raw = block.tobytes()
        if comp_id == 8:
            return zlib.compress(raw, 6)
        if comp_id == 5:
            return lzw_encode(raw)
        return raw

    chunks: list[bytes] = []
    if tiled:
        ts = tile_size
        if ts % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        tiles_x, tiles_y = (w + ts - 1) // ts, (h + ts - 1) // ts
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                block = np.zeros((ts, ts, spp), dtype=a.dtype)
                sub = a[ty * ts : ty * ts + ts, tx * ts : tx * ts + ts]
                block[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(pack_block(block))
    else:
        rps = rows_per_strip or max(
            1, min(h, (1 << 16) // max(w * spp * bits // 8, 1) or 1))
        for r0 in range(0, h, rps):
            chunks.append(pack_block(a[r0 : r0 + rps]))

    jpegtables_blob = None
    if comp_id == 7 and jpeg_tables:
        # GDAL-style shared tables: identical across chunks (same
        # quality + Annex-K Huffman), factored into tag 347
        split = [_split_jpeg_tables(c) for c in chunks]
        jpegtables_blob = split[0][0]
        if any(t != jpegtables_blob for t, _ in split):
            raise AssertionError("TIFF-JPEG chunks produced differing tables")
        chunks = [b for _, b in split]

    # page layout: chunk data | external tag values | IFD
    # TIFF 6.0 requires tag values and the IFD to begin on a word (2-byte)
    # boundary, so odd-length compressed chunks and ASCII values are padded
    # to even length before offsets are assigned.  The recorded byte counts
    # stay at the true compressed lengths; only the layout gets the pad.
    chunk_lens = [len(c) for c in chunks]
    chunks = [c + b"\x00" * (len(c) & 1) for c in chunks]
    offsets = []
    pos = base
    for c in chunks:
        offsets.append(pos)
        pos += len(c)
    ext = bytearray()  # external tag value area, starts at `pos`
    ext_base = pos

    def ext_put(fmt: str, vals) -> int:
        o = ext_base + len(ext)
        ext.extend(struct.pack(bo + fmt * len(vals), *vals))
        if len(ext) & 1:
            ext.append(0)
        return o

    tags: list[tuple[int, int, int, int]] = []  # (tag, type, count, value)
    cap = 8 if bigtiff else 4           # inline value-field capacity
    vfmt = "Q" if bigtiff else "I"
    t_off = 16 if bigtiff else 4        # chunk offset/count tag type

    def tag_arr(tag: int, typ: int, vals: list):
        if bigtiff and typ == 4:
            typ = t_off if tag in (_T_STRIP_OFF, _T_STRIP_CNT,
                                   _T_TILE_OFF, _T_TILE_CNT) else typ
        ch, size = _TYPES[typ]
        if size * len(vals) <= cap:
            packed = struct.pack(bo + ch * len(vals), *vals)
            packed += b"\x00" * (cap - len(packed))
            (v,) = struct.unpack(bo + vfmt, packed)
            tags.append((tag, typ, len(vals), v))
        else:
            tags.append((tag, typ, len(vals), ext_put(ch, vals)))

    def tag_ascii(tag: int, s: str):
        b = s.encode("ascii") + b"\x00"
        if len(b) <= cap:
            (v,) = struct.unpack(bo + vfmt, b + b"\x00" * (cap - len(b)))
            tags.append((tag, 2, len(b), v))
        else:
            o = ext_base + len(ext)
            ext.extend(b)
            if len(ext) & 1:
                ext.append(0)
            tags.append((tag, 2, len(b), o))

    if reduced:
        tag_arr(_T_SUBFILE, 4, [1])  # reduced-resolution (overview) page
    tag_arr(_T_WIDTH, 4, [w])
    tag_arr(_T_HEIGHT, 4, [h])
    tag_arr(_T_BITS, 3, [bits] * spp)
    tag_arr(_T_COMP, 3, [comp_id])
    # 3-band uint8 is labeled RGB (GDAL convention); JPEG-compressed
    # color streams hold YCbCr internally -> photometric 6 (TechNote 2)
    if comp_id == 7 and spp == 3:
        photo = 6
    elif spp == 3 and bits == 8 and sfmt == 1:
        photo = 2
    else:
        photo = 1
    tag_arr(_T_PHOTO, 3, [photo])
    if tiled:
        tag_arr(_T_SPP, 3, [spp])
        tag_arr(_T_TILE_W, 3, [tile_size])
        tag_arr(_T_TILE_H, 3, [tile_size])
        tag_arr(_T_TILE_OFF, 4, offsets)
        tag_arr(_T_TILE_CNT, 4, chunk_lens)
    else:
        tag_arr(_T_STRIP_OFF, 4, offsets)
        tag_arr(_T_SPP, 3, [spp])
        tag_arr(_T_RPS, 4, [rps])
        tag_arr(_T_STRIP_CNT, 4, chunk_lens)
    tag_arr(_T_PLANAR, 3, [1])
    if jpegtables_blob is not None:
        tags.append((_T_JPEG_TABLES, 7, len(jpegtables_blob),
                     ext_base + len(ext)))
        ext.extend(jpegtables_blob)
        if len(ext) & 1:
            ext.append(0)
    if predictor:
        tag_arr(_T_PREDICTOR, 3, [2])
    tag_arr(_T_SAMPLE_FMT, 3, [sfmt] * spp)
    tag_arr(_T_PIXEL_SCALE, 12, [cellx, abs(celly), 0.0])
    tag_arr(_T_TIEPOINT, 12, [0.0, 0.0, 0.0, x0, y0, 0.0])
    # GeoKey choice: geographic-2D codes go under GeographicTypeGeoKey,
    # projected under ProjectedCSTypeGeoKey.  The 4xxx block is NOT purely
    # geographic (EPSG:4647 is projected, EPSG:4978 geocentric), so the
    # decision uses an explicit allowlist of the geographic codes this
    # writer can actually receive from parse_crs (WGS84/NAD83/ETRS89/NAD27
    # and the WGS84 sphere), falling back to projected for everything else.
    _GEOGRAPHIC_EPSG = {4326, 4269, 4258, 4267, 4277, 4230, 4047, 4035}
    model = 2 if epsg in _GEOGRAPHIC_EPSG else 1  # geographic vs projected
    geo = [1, 1, 0, 3,
           _GK_MODEL_TYPE, 0, 1, model,
           _GK_RASTER_TYPE, 0, 1, 1,  # RasterPixelIsArea
           (_GK_GEOGRAPHIC if model == 2 else _GK_PROJECTED), 0, 1, epsg]
    tag_arr(_T_GEO_KEYS, 3, geo)
    if ndv is not None:
        nd = float(ndv)
        tag_ascii(_T_GDAL_NODATA, str(int(nd)) if nd == int(nd) else repr(nd))

    tags.sort()
    ifd_off = ext_base + len(ext)
    if bigtiff:
        ifd = struct.pack(bo + "Q", len(tags))
        for tag, typ, cnt, val in tags:
            ifd += struct.pack(bo + "HHQQ", tag, typ, cnt, val)
        ifd += struct.pack(bo + "Q", 0)  # next-IFD pointer, patched by caller
    else:
        ifd = struct.pack(bo + "H", len(tags))
        for tag, typ, cnt, val in tags:
            ifd += struct.pack(bo + "HHII", tag, typ, cnt, val)
        ifd += struct.pack(bo + "I", 0)  # next-IFD pointer, patched by caller

    return b"".join(chunks) + bytes(ext) + ifd, ifd_off


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

def _images_tiff_schema() -> str:
    """Canonical images schema + provenance column — composed, not
    re-declared, so a synth.IMAGES_SCHEMA change can't drift."""
    from .synth import IMAGES_SCHEMA

    return IMAGES_SCHEMA + ", source_path string"


def load_tiff(spark, path: str, tile: int = 256, cell_res: int = 3,
              default_ndv: float = -9999.0):
    """Read a directory/glob of GeoTIFF files into the standard images
    table (reference load_tiff/from_file, georasters.py:281-291,
    :1548-1566). One Spark task per FILE (binaryFile source); each file
    is parsed executor-side and re-cut into ``tile`` x ``tile`` raw
    tiles, so every downstream operator (zonal, terrain, reproject,
    knn, ...) runs unchanged on real .tif input."""
    import pandas as pd

    from ..functions import cells
    from . import codec

    def gen(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                arr, meta = parse_tiff(bytes(rec.content))
                if arr.ndim == 3:  # multi-band: band 0 (reference band=1 default)
                    arr = arr[0]
                ndv = float(meta.get("ndv", default_ndv))
                x0 = float(meta.get("x0", 0.0))
                y0 = float(meta.get("y0", 0.0))
                cx = float(meta.get("cellx", 1.0))
                cy = float(meta.get("celly", -1.0))
                epsg = int(meta.get("epsg", 0))
                # LOSSLESS storage fmt by value range: i1/u1/i2 fit
                # int16; u2/i4 need int32; u4 is exact in float64
                # (every uint32 < 2^53); floats keep their width
                k, sz = arr.dtype.kind, arr.dtype.itemsize
                if k == "f":
                    fmt = "rawf32" if sz <= 4 else "rawf64"
                    store = arr.astype(np.float32 if sz <= 4 else np.float64)
                elif (k == "i" and sz <= 2) or (k == "u" and sz == 1):
                    fmt, store = "raw16", arr.astype(np.int16)
                elif (k == "u" and sz == 2) or (k == "i" and sz == 4):
                    fmt, store = "rawi32", arr.astype(np.int32)
                else:  # u4
                    fmt, store = "rawf64", arr.astype(np.float64)
                name = rec.path.rsplit("/", 1)[-1]
                h, w = arr.shape
                for ty in range((h + tile - 1) // tile):
                    for tx in range((w + tile - 1) // tile):
                        block = np.full((tile, tile), ndv, dtype=store.dtype)
                        sub = store[ty * tile : ty * tile + tile,
                                    tx * tile : tx * tile + tile]
                        block[: sub.shape[0], : sub.shape[1]] = sub
                        xmin = x0 + tx * tile * cx
                        ymax = y0 + ty * tile * cy
                        cid = int(cells.cell_of(
                            xmin + tile * cx / 2, ymax + tile * cy / 2, cell_res
                        ))
                        rows.append({
                            "image_id": f"{name}:r{ty}c{tx}",
                            "bytes": codec.encode_tile(block, fmt, ndv),
                            "w": tile, "h": tile, "fmt": fmt,
                            "caption": name,
                            "phash": codec.average_hash(block, ndv),
                            "tile_row": ty, "tile_col": tx,
                            "xmin": xmin, "ymax": ymax,
                            "cellx": cx, "celly": cy,
                            "crs": f"EPSG:{epsg}" if epsg else "unknown",
                            "ndv": ndv, "dtype": str(arr.dtype),
                            "cell_id": cid, "source_path": rec.path,
                        })
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "tile_row", "tile_col", "xmin", "ymax", "cellx", "celly",
                "crs", "ndv", "dtype", "cell_id", "source_path",
            ])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(gen, schema=_images_tiff_schema())


def tiles_to_tiff(images, *, epsg: int = 4326, compression: str = "deflate",
                  predictor: bool = True):
    """Distributed GeoTIFF sink: every tile row becomes a standalone,
    correctly georeferenced single-band GeoTIFF (the COG-tile layout).
    Fully executor-side — the scale path for writing a 100-TB mosaic as
    many part files (reference to_tiff writes ONE file from one eager
    array, georasters.py:535-557; see assemble_tiff for that shape)."""
    import pandas as pd

    from . import codec

    def gen(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.bytes), t.fmt, int(t.w),
                                        int(t.h), float(t.ndv))
                a = np.asarray(arr)
                pred = predictor and a.dtype.kind in "iu"
                rows.append({
                    "tile_row": int(t.tile_row), "tile_col": int(t.tile_col),
                    "tiff": write_tiff(
                        a, x0=float(t.xmin), y0=float(t.ymax),
                        cellx=float(t.cellx), celly=float(t.celly),
                        ndv=float(t.ndv), epsg=epsg,
                        compression=compression, predictor=pred,
                    ),
                })
            yield pd.DataFrame(rows, columns=["tile_row", "tile_col", "tiff"])

    cols = ["bytes", "fmt", "w", "h", "ndv", "tile_row", "tile_col",
            "xmin", "ymax", "cellx", "celly"]
    return images.select(*cols).mapInPandas(
        gen, schema="tile_row int, tile_col int, tiff binary"
    )


def assemble_tiff(images, *, origin, cellsize, shape, ndv: float,
                  epsg: int = 4326, compression: str = "deflate",
                  overview_levels: tuple = ()) -> bytes:
    """Assemble ALL tiles into one GeoTIFF byte string on the driver —
    the reference's eager to_tiff shape (georasters.py:535-557).
    DOCUMENTED small-raster path: the whole array is materialized
    driver-side; use tiles_to_tiff for anything big.

    ``overview_levels`` (e.g. (2, 4)): append COG-style reduced-
    resolution pages, each the ndv-aware block mean at that level."""
    h, w = shape
    from . import codec

    full = np.full((h, w), ndv)
    for t in images.select("bytes", "fmt", "w", "h", "ndv",
                           "tile_row", "tile_col").collect():
        arr = codec.decode_tile(bytes(t["bytes"]), t["fmt"], t["w"], t["h"],
                                t["ndv"])
        r0, c0 = t["tile_row"] * t["h"], t["tile_col"] * t["w"]
        rr = min(t["h"], h - r0)
        cc = min(t["w"], w - c0)
        if rr > 0 and cc > 0:
            full[r0 : r0 + rr, c0 : c0 + cc] = np.asarray(arr)[:rr, :cc]
    is_int = np.all(full == np.floor(full)) and np.abs(full).max() < 2**31 - 1
    out = full.astype(np.int32) if is_int else full.astype(np.float64)

    def block_mean(a: np.ndarray, lvl: int) -> np.ndarray:
        hh = a.shape[0] // lvl * lvl
        ww = a.shape[1] // lvl * lvl
        b = a[:hh, :ww].astype(np.float64).reshape(hh // lvl, lvl, ww // lvl, lvl)
        valid = b != ndv
        n = valid.sum(axis=(1, 3))
        sm = np.where(valid, b, 0.0).sum(axis=(1, 3))
        with np.errstate(invalid="ignore"):
            m = np.where(n > 0, sm / np.maximum(n, 1), ndv)
        return np.round(m).astype(a.dtype) if a.dtype.kind in "iu" else m.astype(a.dtype)

    ovs = [block_mean(out, int(lvl)) for lvl in overview_levels]
    return write_tiff(out, x0=origin[0], y0=origin[1], cellx=cellsize[0],
                      celly=cellsize[1], ndv=ndv, epsg=epsg,
                      compression=compression,
                      predictor=bool(out.dtype.kind in "iu"),
                      overviews=ovs)
