"""GeoTIFF codec tests — reader/writer matrix, hand-built spec fixtures
(independent of our writer), LZW/PackBits codecs, and the Spark
load_tiff / tiles_to_tiff / assemble_tiff surfaces.

Reference parity: load_tiff/from_file (georasters.py:281-291,
:1548-1566), create_geotiff/to_tiff (:179-205, :535-557).
"""

import struct
import zlib

import numpy as np
import pytest

from georasters_spark.sources import geotiff as GT


def _grid(h, w, seed=7, dtype=np.int16):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return (((r * 7919 + c * 104729 + seed) % 1997).astype(np.int64)).astype(dtype)


# --------------------------------------------------------------------------
# LZW / PackBits
# --------------------------------------------------------------------------


def test_lzw_roundtrip_small():
    data = b"\x07\x07\x07\x08\x08\x07\x07\x06\x06"
    assert GT.lzw_decode(GT.lzw_encode(data)) == data


def test_lzw_roundtrip_large_forces_width_changes_and_reset():
    rng = np.random.default_rng(0)
    # diverse bytes -> table grows past 511/1023/2047 and hits the 4094
    # reset; then a long constant run exercises the KwKwK case
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes() + b"\xaa" * 5000
    enc = GT.lzw_encode(data)
    assert GT.lzw_decode(enc) == data
    # incompressible data stays near 1.07x (9->12 bit codes over bytes)
    assert len(enc) < len(data) * 1.6


def test_lzw_known_bitstream_decodes():
    # hand-packed stream for "07 07 07 08": codes CLEAR,7,258,8,EOI at
    # 9 bits each, MSB-first -- packed here independently of lzw_encode
    codes = [256, 7, 258, 8, 257]
    acc = accbits = 0
    out = bytearray()
    for code in codes:
        acc = (acc << 9) | code
        accbits += 9
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8
        acc &= (1 << accbits) - 1
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    assert GT.lzw_decode(bytes(out)) == b"\x07\x07\x07\x08"
    assert GT.lzw_encode(b"\x07\x07\x07\x08") == bytes(out)


def test_packbits_spec_example():
    # the worked example from the TIFF 6.0 spec / Apple PackBits docs
    enc = bytes.fromhex("FEAA0280002AFDAA038000 2A22F7AA".replace(" ", ""))
    want = (b"\xaa" * 3 + bytes.fromhex("80002A") + b"\xaa" * 4
            + bytes.fromhex("80002A22") + b"\xaa" * 10)
    assert GT.packbits_decode(enc) == want


# --------------------------------------------------------------------------
# Writer -> reader roundtrip matrix
# --------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32", "float32", "float64"])
@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
def test_roundtrip_dtypes_compressions(dtype, compression):
    arr = _grid(37, 53, dtype=np.dtype(dtype))
    pred = np.dtype(dtype).kind in "iu"
    buf = GT.write_tiff(
        arr, x0=-180.0, y0=90.0, cellx=0.5, celly=-0.25, ndv=-9999.0,
        compression=compression, predictor=pred, rows_per_strip=11,
    )
    out, meta = GT.parse_tiff(buf)
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, arr)
    assert (meta["x0"], meta["y0"]) == (-180.0, 90.0)
    assert (meta["cellx"], meta["celly"]) == (0.5, -0.25)
    assert meta["ndv"] == -9999.0
    assert meta["epsg"] == 4326 and meta["model_type"] == 2


@pytest.mark.parametrize("byteorder", ["<", ">"])
@pytest.mark.parametrize("tiled", [False, True])
def test_roundtrip_layout_byteorder(byteorder, tiled):
    arr = _grid(70, 41, dtype=np.int16)
    buf = GT.write_tiff(
        arr, compression="deflate", predictor=True, byteorder=byteorder,
        tiled=tiled, tile_size=32, rows_per_strip=13, epsg=3857,
    )
    assert buf[:2] == (b"II" if byteorder == "<" else b"MM")
    out, meta = GT.parse_tiff(buf)
    np.testing.assert_array_equal(out, arr)
    assert meta["epsg"] == 3857 and meta["model_type"] == 1  # projected


def test_roundtrip_non_integer_nodata_and_default_georef():
    arr = _grid(9, 9, dtype=np.float32)
    buf = GT.write_tiff(arr, ndv=-1.5, compression="none")
    out, meta = GT.parse_tiff(buf)
    assert meta["ndv"] == -1.5
    np.testing.assert_array_equal(out, arr)


def test_writer_rejects_bad_input():
    # (bands, h, w) is now VALID multi-band input; 4-D is not
    with pytest.raises(ValueError):
        GT.write_tiff(np.zeros((2, 2, 2, 2), dtype=np.int16))
    with pytest.raises(ValueError):
        GT.write_tiff(np.zeros((4, 4), np.float32), predictor=True)
    with pytest.raises(ValueError):
        GT.write_tiff(np.zeros((4, 4), np.int16), tiled=True, tile_size=20)
    with pytest.raises(NotImplementedError):
        GT.write_tiff(np.zeros((4, 4), np.complex64))


# --------------------------------------------------------------------------
# Hand-built fixtures (constructed WITHOUT the writer)
# --------------------------------------------------------------------------


def _entry(bo, tag, typ, cnt, val):
    # inline values are LEFT-justified in the 4-byte field (TIFF spec),
    # which matters for SHORTs in big-endian fixtures
    if typ == 3 and cnt == 1:
        return struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(bo + "H2x", val)
    return struct.pack(bo + "HHII", tag, typ, cnt, val)


def test_parse_handbuilt_minimal_le():
    # 2x3 uint8, one uncompressed strip at offset 8, IFD after data
    data = bytes([1, 2, 3, 4, 5, 6])
    ifd_off = 8 + len(data)
    n = 8
    ifd = struct.pack("<H", n)
    ifd += _entry("<", 256, 3, 1, 3)        # width (SHORT inline)
    ifd += _entry("<", 257, 3, 1, 2)        # height
    ifd += _entry("<", 258, 3, 1, 8)        # bits
    ifd += _entry("<", 259, 3, 1, 1)        # no compression
    ifd += _entry("<", 262, 3, 1, 1)
    ifd += _entry("<", 273, 4, 1, 8)        # strip offset
    ifd += _entry("<", 278, 4, 1, 2)        # rows per strip
    ifd += _entry("<", 279, 4, 1, len(data))
    ifd += struct.pack("<I", 0)
    buf = struct.pack("<2sHI", b"II", 42, ifd_off) + data + ifd
    out, meta = GT.parse_tiff(buf)
    np.testing.assert_array_equal(out, np.array([[1, 2, 3], [4, 5, 6]], np.uint8))
    assert meta["bands"] == 1


def test_parse_handbuilt_bigendian_16bit_deflate_predictor():
    arr = np.array([[100, 107, 103], [9, 9, 9]], dtype=">i2")
    diff = arr.copy()
    diff[:, 1:] = arr[:, 1:] - arr[:, :-1]
    comp = zlib.compress(diff.tobytes())
    ifd_off = 8 + len(comp)
    ents = [
        (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 16), (259, 3, 1, 8),
        (262, 3, 1, 1), (273, 4, 1, 8), (278, 4, 1, 2),
        (279, 4, 1, len(comp)), (317, 3, 1, 2), (339, 3, 1, 2),
    ]
    ifd = struct.pack(">H", len(ents))
    for e in ents:
        ifd += _entry(">", *e)
    ifd += struct.pack(">I", 0)
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off) + comp + ifd
    out, _ = GT.parse_tiff(buf)
    np.testing.assert_array_equal(out, arr.astype(np.int16))


def test_parse_handbuilt_multiband_chunky():
    # 2x2, 3 samples interleaved RGB-style, uint8
    h, w, s = 2, 2, 3
    px = np.arange(h * w * s, dtype=np.uint8).reshape(h, w, s)
    data = px.tobytes()
    # BitsPerSample needs 3 SHORTs -> external area right after data
    bits_off = 8 + len(data)
    ifd_off = bits_off + 6
    ents = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, bits_off),
        (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 1, 8), (277, 3, 1, s),
        (278, 4, 1, h), (279, 4, 1, len(data)), (284, 3, 1, 1),
    ]
    ifd = struct.pack("<H", len(ents))
    for e in ents:
        ifd += _entry("<", *e)
    ifd += struct.pack("<I", 0)
    buf = (struct.pack("<2sHI", b"II", 42, ifd_off) + data
           + struct.pack("<HHH", 8, 8, 8) + ifd)
    out, meta = GT.parse_tiff(buf)
    assert out.shape == (3, 2, 2) and meta["bands"] == 3
    np.testing.assert_array_equal(out, np.moveaxis(px, 2, 0))


def test_parse_rejects_non_tiff_and_bad_bigtiff():
    with pytest.raises(ValueError):
        GT.parse_tiff(b"PK\x03\x04junkjunk")
    # BigTIFF must declare 8-byte offsets; anything else is malformed
    with pytest.raises(ValueError, match="offset size"):
        GT.parse_tiff(struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16))


def test_parse_model_transformation_fallback():
    data = bytes([5])
    m_off = 8 + 1
    ifd_off = m_off + 16 * 8
    m = [2.0, 0.0, 0.0, 10.0,
         0.0, -3.0, 0.0, 50.0,
         0.0, 0.0, 0.0, 0.0,
         0.0, 0.0, 0.0, 1.0]
    ents = [
        (256, 3, 1, 1), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
        (273, 4, 1, 8), (278, 4, 1, 1), (279, 4, 1, 1),
        (34264, 12, 16, m_off),
    ]
    ifd = struct.pack("<H", len(ents))
    for e in ents:
        ifd += _entry("<", *e)
    ifd += struct.pack("<I", 0)
    buf = (struct.pack("<2sHI", b"II", 42, ifd_off) + data
           + struct.pack("<16d", *m) + ifd)
    out, meta = GT.parse_tiff(buf)
    assert out[0, 0] == 5
    assert (meta["x0"], meta["y0"], meta["cellx"], meta["celly"]) == (10.0, 50.0, 2.0, -3.0)


def test_parse_packbits_strip():
    # 1x8 uint8 row, PackBits-compressed: literal 3 bytes + run of 5
    row = bytes([1, 2, 3]) + bytes([9] * 5)
    comp = bytes([2, 1, 2, 3, 252, 9])  # 252 = 257-5 repeats
    assert GT.packbits_decode(comp) == row
    ifd_off = 8 + len(comp)
    ents = [
        (256, 3, 1, 8), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 32773),
        (273, 4, 1, 8), (278, 4, 1, 1), (279, 4, 1, len(comp)),
    ]
    ifd = struct.pack("<H", len(ents))
    for e in ents:
        ifd += _entry("<", *e)
    ifd += struct.pack("<I", 0)
    buf = struct.pack("<2sHI", b"II", 42, ifd_off) + comp + ifd
    out, _ = GT.parse_tiff(buf)
    np.testing.assert_array_equal(out[0], np.frombuffer(row, np.uint8))


# --------------------------------------------------------------------------
# Spark surfaces
# --------------------------------------------------------------------------


def test_load_tiff_spark(spark, tmp_path):
    h, w = 100, 130
    specs = [("none", False, "<", False), ("deflate", True, ">", False),
             ("lzw", True, "<", True)]
    arrs = {}
    for i, (comp, pred, bo, tiled) in enumerate(specs):
        arr = _grid(h, w, seed=i, dtype=np.int16)
        arr[arr % 11 == 0] = -9999  # carve nodata
        arrs[f"f{i}.tif"] = arr
        buf = GT.write_tiff(
            arr, x0=-180.0 + i, y0=90.0, cellx=0.1, celly=-0.1, ndv=-9999,
            compression=comp, predictor=pred, byteorder=bo, tiled=tiled,
            tile_size=64, rows_per_strip=17,
        )
        (tmp_path / f"f{i}.tif").write_bytes(buf)

    imgs = GT.load_tiff(spark, str(tmp_path), tile=64)
    pdf = imgs.toPandas()
    assert set(pdf["caption"]) == set(arrs)
    assert (pdf["crs"] == "EPSG:4326").all()
    from georasters_spark.operators import pixels as PX

    px = PX.pixel_table(imgs, valid_only=True, with_coords=False).toPandas()
    meta = pdf[["image_id", "caption"]]
    for name, arr in arrs.items():
        ids = set(meta[meta["caption"] == name]["image_id"])
        sub = px[px["image_id"].isin(ids)]
        valid = arr[arr != -9999]
        assert sub["value"].sum() == valid.astype(np.int64).sum()
        assert len(sub) == valid.size


def test_tiles_to_tiff_roundtrip(spark, images_t1):
    from georasters_spark.sources import codec

    parts = GT.tiles_to_tiff(images_t1, compression="lzw").toPandas()
    raw = images_t1.select("bytes", "fmt", "w", "h", "ndv", "tile_row",
                           "tile_col", "xmin", "ymax").toPandas()
    assert len(parts) == len(raw)
    raw = raw.set_index(["tile_row", "tile_col"])
    for t in parts.itertuples(index=False):
        src = raw.loc[(t.tile_row, t.tile_col)]
        want = codec.decode_tile(bytes(src["bytes"]), src["fmt"],
                                 int(src["w"]), int(src["h"]), float(src["ndv"]))
        out, meta = GT.parse_tiff(bytes(t.tiff))
        np.testing.assert_array_equal(out, np.asarray(want))
        assert meta["x0"] == src["xmin"] and meta["y0"] == src["ymax"]


def test_images_table_with_tiff_fmt(spark):
    """fmt='tiff' tile bytes flow through the whole images-table stack:
    build_images encodes every tile as a standalone GeoTIFF and
    pixel_table decodes them back bit-exactly vs the raw16 build."""
    from pyspark.sql import functions as F

    from georasters_spark.operators import pixels as PX
    from georasters_spark.sources import synth

    spec = synth.GridSpec(grid_id="tiffgrid", width=192, height=128, tile=64)
    a = PX.pixel_table(synth.build_images(spark, spec, fmt="tiff"),
                       valid_only=True, with_coords=False)
    b = PX.pixel_table(synth.build_images(spark, spec, fmt="raw16"),
                       valid_only=True, with_coords=False)
    stats = lambda df: df.agg(  # noqa: E731
        F.count("value").alias("n"), F.sum("value").alias("s"),
        F.min("value").alias("lo"), F.max("value").alias("hi")).first()
    assert stats(a) == stats(b)
    assert a.exceptAll(b).isEmpty()


def test_assemble_tiff_matches_pixels(spark, images_t1):
    from georasters_spark.sources import synth

    spec = synth.T1
    buf = GT.assemble_tiff(
        images_t1, origin=(spec.x0, spec.y0),
        cellsize=(spec.cellx, spec.celly),
        shape=(spec.height, spec.width), ndv=spec.ndv,
    )
    out, meta = GT.parse_tiff(buf)
    assert out.shape == (spec.height, spec.width)
    want = np.stack([
        synth.tile_array(spec, ty, tx)
        for ty in range(spec.tiles_y) for tx in range(spec.tiles_x)
    ])
    # reassemble expectation from synth tiles
    full = np.full((spec.tiles_y * spec.tile, spec.tiles_x * spec.tile),
                   spec.ndv)
    i = 0
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            full[ty * spec.tile:(ty + 1) * spec.tile,
                 tx * spec.tile:(tx + 1) * spec.tile] = want[i]
            i += 1
    np.testing.assert_array_equal(out, full[: spec.height, : spec.width])
    assert meta["x0"] == spec.x0 and meta["cellx"] == spec.cellx


def test_load_tiff_preserves_wide_dtypes(spark, tmp_path):
    """uint16/int32/uint32 rasters survive load_tiff LOSSLESSLY (the
    int16 cast would wrap 40000 to -25536) via rawi32/rawf64 storage;
    geographic non-4326 EPSG stays under the geographic GeoKey."""
    cases = {
        "u16.tif": (np.array([[40000, 1], [70, 0]], np.uint16), 4269),
        "i32.tif": (np.array([[2**30, -5], [7, 0]], np.int32), 32633),
        "u32.tif": (np.array([[2**31 + 9, 3], [1, 0]], np.uint32), 4326),
    }
    for name, (arr, epsg) in cases.items():
        (tmp_path / name).write_bytes(GT.write_tiff(
            arr.astype(arr.dtype), x0=0.0, y0=2.0, cellx=1.0, celly=-1.0,
            ndv=-9999, epsg=epsg, compression="deflate"))
    # geokey model-type: 4269 (NAD83, geographic) must read back as 2
    _, meta = GT.parse_tiff((tmp_path / "u16.tif").read_bytes())
    assert meta["epsg"] == 4269 and meta["model_type"] == 2
    _, meta32 = GT.parse_tiff((tmp_path / "i32.tif").read_bytes())
    assert meta32["model_type"] == 1

    from georasters_spark.operators import pixels as PX

    imgs = GT.load_tiff(spark, str(tmp_path), tile=2)
    px = PX.pixel_table(imgs, valid_only=True, with_coords=False).toPandas()
    meta_df = imgs.select("image_id", "caption", "fmt").toPandas()
    fmts = dict(zip(meta_df["caption"], meta_df["fmt"]))
    assert fmts["u16.tif"] == "rawi32" and fmts["i32.tif"] == "rawi32"
    assert fmts["u32.tif"] == "rawf64"
    for name, (arr, _e) in cases.items():
        ids = set(meta_df[meta_df["caption"] == name]["image_id"])
        sub = px[px["image_id"].isin(ids)]
        assert sub["value"].astype(np.int64).sum() == int(arr.astype(np.int64).sum())


def test_multipage_cog_overviews():
    """write_tiff(overviews=[...]) chains NewSubfileType=1 IFD pages
    with level-scaled ModelPixelScale; parse_tiff(page=n) reads each
    back bit-exactly and page-out-of-range raises."""
    a = ((np.arange(64)[:, None] * 7 + np.arange(96)[None, :]) % 1997).astype(np.int16)
    ov2 = a.reshape(32, 2, 48, 2).mean(axis=(1, 3)).round().astype(np.int16)
    ov4 = a.reshape(16, 4, 24, 4).mean(axis=(1, 3)).round().astype(np.int16)
    buf = GT.write_tiff(a, x0=-10.0, y0=20.0, cellx=0.5, celly=-0.5,
                        ndv=-9999, compression="lzw", predictor=True,
                        overviews=[ov2, ov4])
    for page, (want, cx) in enumerate([(a, 0.5), (ov2, 1.0), (ov4, 2.0)]):
        got, meta = GT.parse_tiff(buf, page=page)
        np.testing.assert_array_equal(got, want)
        assert meta["cellx"] == cx and meta["x0"] == -10.0 and meta["y0"] == 20.0
    with pytest.raises(ValueError, match="no page"):
        GT.parse_tiff(buf, page=3)


def test_assemble_tiff_with_overview_pages(spark, images_t1):
    from georasters_spark.sources import synth

    spec = synth.T1
    buf = GT.assemble_tiff(
        images_t1, origin=(spec.x0, spec.y0),
        cellsize=(spec.cellx, spec.celly),
        shape=(spec.height, spec.width), ndv=spec.ndv,
        overview_levels=(2, 4),
    )
    full, m0 = GT.parse_tiff(buf, page=0)
    ov2, m1 = GT.parse_tiff(buf, page=1)
    ov4, m2 = GT.parse_tiff(buf, page=2)
    assert full.shape == (spec.height, spec.width)
    assert ov2.shape == (spec.height // 2, spec.width // 2)
    assert ov4.shape == (spec.height // 4, spec.width // 4)
    assert m1["cellx"] == spec.cellx * 2 and m2["cellx"] == spec.cellx * 4
    # overview page 1 == ndv-aware block mean of the full page
    b = full[: 135 * 2, : 270 * 2].astype(np.float64).reshape(135, 2, 270, 2)
    valid = b != spec.ndv
    n = valid.sum(axis=(1, 3))
    m = np.where(valid, b, 0.0).sum(axis=(1, 3)) / np.maximum(n, 1)
    want = np.where(n > 0, np.round(m), spec.ndv).astype(full.dtype)
    np.testing.assert_array_equal(ov2, want)


def _classic_header(bo, ifd_off):
    return struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)


def _classic_ifd(bo, tags, nxt=0):
    out = struct.pack(bo + "H", len(tags))
    for t in sorted(tags):
        out += struct.pack(bo + "HHII", *t)
    return out + struct.pack(bo + "I", nxt)


def test_parse_handbuilt_bigtiff():
    """Minimal spec-built BigTIFF (magic 43, 16-byte header, 20-byte
    IFD entries, LONG8 offsets) — fixture independent of the writer."""
    a = np.arange(9, dtype=np.uint16).reshape(3, 3)
    data = a.tobytes()
    data_off = 16
    ifd_off = data_off + len(data)

    def btag(tag, typ, cnt, val):
        return struct.pack("<HHQQ", tag, typ, cnt, val)

    entries = [
        btag(256, 4, 1, 3), btag(257, 4, 1, 3), btag(258, 3, 1, 16),
        btag(259, 3, 1, 1), btag(262, 3, 1, 1),
        btag(273, 16, 1, data_off), btag(277, 3, 1, 1),
        btag(278, 4, 1, 3), btag(279, 16, 1, len(data)),
        btag(339, 3, 1, 1),
    ]
    buf = (struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_off) + data
           + struct.pack("<Q", len(entries)) + b"".join(entries)
           + struct.pack("<Q", 0))
    arr, meta = GT.parse_tiff(buf)
    np.testing.assert_array_equal(arr, a)


@pytest.mark.parametrize("byteorder", ["<", ">"])
@pytest.mark.parametrize("tiled", [False, True])
def test_bigtiff_writer_roundtrip(byteorder, tiled):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 60000, (37, 53)).astype(np.uint16)
    buf = GT.write_tiff(a, x0=1.0, y0=2.0, cellx=0.25, celly=-0.25,
                        epsg=32633, compression="deflate", predictor=True,
                        tiled=tiled, tile_size=16, byteorder=byteorder,
                        bigtiff=True)
    assert buf[:4] in (b"II+\x00", b"MM\x00+")
    arr, meta = GT.parse_tiff(buf)
    np.testing.assert_array_equal(arr, a)
    assert meta["epsg"] == 32633 and abs(meta["x0"] - 1.0) < 1e-12


def test_bigtiff_overview_chain_roundtrip():
    a = np.arange(40 * 24, dtype=np.float32).reshape(40, 24)
    ov = a[::2, ::2].copy()
    buf = GT.write_tiff(a, overviews=[ov], bigtiff=True)
    a0, _ = GT.parse_tiff(buf, page=0)
    a1, m1 = GT.parse_tiff(buf, page=1)
    np.testing.assert_array_equal(a0, a)
    np.testing.assert_array_equal(a1, ov)
    assert m1["cellx"] == 2.0


def test_parse_handbuilt_planar_two_band():
    """PlanarConfig=2 (band-sequential): StripOffsets carries all of
    band 0's strips first (TIFF 6.0 §'PlanarConfiguration')."""
    h, w, spp = 6, 4, 2
    band0 = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    band1 = (band0 * 3 + 7).astype(np.uint8)
    strips = [band0[:3].tobytes(), band0[3:].tobytes(),
              band1[:3].tobytes(), band1[3:].tobytes()]
    bo = "<"
    offs, pos = [], 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ext = struct.pack(bo + "4I", *offs)
    cnt_off = pos + len(ext)
    ext += struct.pack(bo + "4I", *[len(s) for s in strips])
    ifd_off = pos + len(ext)
    tags = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 2, 8 | (8 << 16)),
        (259, 3, 1, 1), (262, 3, 1, 1),
        (273, 4, 4, pos), (277, 3, 1, spp), (278, 4, 1, 3),
        (279, 4, 4, cnt_off), (284, 3, 1, 2),
    ]
    buf = _classic_header(bo, ifd_off) + b"".join(strips) + ext + _classic_ifd(bo, tags)
    arr, meta = GT.parse_tiff(buf)
    assert arr.shape == (2, h, w)
    np.testing.assert_array_equal(arr[0], band0)
    np.testing.assert_array_equal(arr[1], band1)


def test_parse_handbuilt_float_predictor3():
    """Predictor 3 (TIFF TechNote 3): big-endian byte planes per
    scanline, horizontally differenced — forward transform built here
    from the spec, decoder must invert it exactly."""
    h, w = 5, 7
    vals = np.linspace(-3.5, 9.25, h * w).astype(np.float32).reshape(h, w)
    rowbytes = []
    for r in range(h):
        be = vals[r].astype(">f4").tobytes()
        planes = np.frombuffer(be, np.uint8).reshape(w, 4).T.copy().reshape(-1)
        diff = np.diff(planes.astype(np.int16),
                       prepend=planes[0].astype(np.int16)).astype(np.uint8)
        diff[0] = planes[0]
        rowbytes.append(diff.tobytes())
    comp = zlib.compress(b"".join(rowbytes))
    data_off = 8
    ifd_off = data_off + len(comp) + (len(comp) & 1)
    tags = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 32), (259, 3, 1, 8),
        (262, 3, 1, 1), (273, 4, 1, data_off), (277, 3, 1, 1),
        (278, 4, 1, h), (279, 4, 1, len(comp)), (317, 3, 1, 3),
        (339, 3, 1, 3),
    ]
    buf = (_classic_header("<", ifd_off) + comp + b"\x00" * (len(comp) & 1)
           + _classic_ifd("<", tags))
    arr, meta = GT.parse_tiff(buf)
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr, vals)


def test_predictor3_on_int_samples_rejected():
    h, w = 2, 2
    tags = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, 8), (317, 3, 1, 3), (339, 3, 1, 1),
    ]
    data = np.zeros((h, w), np.uint16).tobytes()
    buf = _classic_header("<", 8 + len(data)) + data + _classic_ifd("<", tags)
    with pytest.raises(ValueError, match="predictor"):
        GT.parse_tiff(buf)


# --------------------------------------------------------------------------
# TIFF-JPEG (compression 7, TIFF Technical Note 2)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("tables", [False, True])
def test_tiff_jpeg_roundtrip(tiled, tables):
    """compression='jpeg' composes the TIFF container with the real
    JPEG codec (sources/jpeg.py): bounded-error roundtrip + georef
    survives; jpeg_tables=True factors shared DQT/DHT into tag 347
    (the GDAL layout) and must decode to the SAME pixels."""
    from georasters_spark.sources import jpeg as J

    r = np.arange(70)[:, None]
    c = np.arange(90)[None, :]
    img = (128 + 90 * np.sin(r / 5.0) * np.cos(c / 6.0)).astype(np.uint8)
    buf = GT.write_tiff(img, compression="jpeg", jpeg_quality=90,
                        jpeg_tables=tables, tiled=tiled, tile_size=48,
                        rows_per_strip=16, x0=3.5, y0=7.25, cellx=0.1,
                        celly=-0.1, epsg=32633)
    arr, meta = GT.parse_tiff(buf)
    assert arr.shape == img.shape and arr.dtype == np.uint8
    assert J.psnr_u8(img, arr.astype(np.uint8)) >= 40
    assert np.abs(arr.astype(float) - img.astype(float)).mean() <= 2
    assert meta["epsg"] == 32633 and abs(meta["x0"] - 3.5) < 1e-9
    assert abs(meta["y0"] - 7.25) < 1e-9


def test_tiff_jpeg_tables_pixels_identical():
    """The abbreviated-stream (JPEGTables) file and the full-stream
    file hold the SAME entropy data: decoded pixels are bit-equal."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    full = GT.parse_tiff(GT.write_tiff(img, compression="jpeg"))[0]
    abbr = GT.parse_tiff(
        GT.write_tiff(img, compression="jpeg", jpeg_tables=True))[0]
    assert (full == abbr).all()
    # and the tables file is strictly smaller with multiple strips
    big = rng.integers(0, 256, (128, 64), dtype=np.uint8)
    b_full = GT.write_tiff(big, compression="jpeg", rows_per_strip=16)
    b_abbr = GT.write_tiff(big, compression="jpeg", rows_per_strip=16,
                           jpeg_tables=True)
    assert len(b_abbr) < len(b_full)


def test_tiff_jpeg_guards():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        GT.write_tiff(img, compression="jpeg", predictor=True)
    with pytest.raises(NotImplementedError, match="uint8"):
        GT.write_tiff(img.astype(np.int16), compression="jpeg")


# --------------------------------------------------------------------------
# multi-band write (reference create_geotiff writes n-band via GDAL)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("bands", [2, 3, 4])
@pytest.mark.parametrize("comp", ["none", "deflate", "lzw"])
def test_multiband_write_roundtrip(bands, comp):
    rng = np.random.default_rng(bands * 10 + len(comp))
    m = rng.integers(-30000, 30000, (bands, 41, 53)).astype(np.int16)
    for tiled in (False, True):
        buf = GT.write_tiff(m, compression=comp, predictor=True,
                            tiled=tiled, tile_size=32, rows_per_strip=13,
                            epsg=3857, x0=1.5, y0=9.0, cellx=0.25,
                            celly=-0.25)
        arr, meta = GT.parse_tiff(buf)
        assert arr.shape == m.shape and (arr == m).all()
        assert meta["bands"] == bands and meta["epsg"] == 3857


def test_multiband_write_float_bigtiff_be_overviews():
    rng = np.random.default_rng(7)
    f32 = rng.uniform(-5, 5, (2, 33, 29)).astype(np.float32)
    arr, _ = GT.parse_tiff(GT.write_tiff(f32, compression="deflate"))
    assert (arr == f32).all()
    u16 = rng.integers(0, 65535, (3, 33, 29)).astype(np.uint16)
    assert (GT.parse_tiff(GT.write_tiff(u16, byteorder=">", predictor=True))[0] == u16).all()
    assert (GT.parse_tiff(GT.write_tiff(u16, bigtiff=True, compression="lzw"))[0] == u16).all()
    ov = u16[:, ::2, ::2]
    buf = GT.write_tiff(u16, overviews=[ov])
    assert (GT.parse_tiff(buf, page=0)[0] == u16).all()
    assert (GT.parse_tiff(buf, page=1)[0] == ov).all()


def test_tiff_jpeg_undersized_stream_rejected():
    """A strip/tile JPEG stream smaller than the declared block must
    raise, never zero-fill (code-review fix): hand-built TIFF declares
    a 16-row strip but embeds a perfectly valid 8-row JPEG."""
    from georasters_spark.sources import jpeg as J

    small = J.encode_gray(np.zeros((8, 32), dtype=np.uint8), 90)
    ifd_off = 8 + len(small) + (len(small) & 1)
    ents = [
        (256, 3, 1, 32), (257, 3, 1, 16), (258, 3, 1, 8), (259, 3, 1, 7),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 16),
        (279, 4, 1, len(small)),
    ]
    ifd = struct.pack("<H", len(ents))
    for e in ents:
        ifd += _entry("<", *e)
    ifd += struct.pack("<I", 0)
    buf = (struct.pack("<2sHI", b"II", 42, ifd_off) + small
           + b"\x00" * (len(small) & 1) + ifd)
    with pytest.raises(ValueError, match="decodes"):
        GT.parse_tiff(buf)


@pytest.mark.parametrize("ss", ["444", "422", "420"])
def test_tiff_jpeg_color_roundtrip(ss):
    """3-band TIFF-JPEG (photometric 6 YCbCr) through the real color
    JPEG codec, strip AND tiled, full-stream AND shared JPEGTables."""
    from georasters_spark.sources import jpeg as J

    r = np.arange(64)[:, None]
    c = np.arange(80)[None, :]
    base = 128 + 90 * np.sin(r / 5.0) * np.cos(c / 6.0)
    rgb = np.stack([np.clip(base, 0, 255), np.clip(0.8 * base + 20, 0, 255),
                    np.clip(255 - base, 0, 255)]).astype(np.uint8)
    for tiled in (False, True):
        for tables in (False, True):
            buf = GT.write_tiff(rgb, compression="jpeg", jpeg_quality=90,
                                jpeg_subsampling=ss, jpeg_tables=tables,
                                tiled=tiled, tile_size=48, rows_per_strip=16)
            arr, meta = GT.parse_tiff(buf)
            assert arr.shape == rgb.shape and meta["bands"] == 3
            psnr = J.psnr_u8(rgb.ravel(), arr.astype(np.uint8).ravel())
            assert psnr >= 28
            assert np.abs(arr.astype(float) - rgb.astype(float)).mean() <= 8


def test_tiff_jpeg_two_band_refused():
    with pytest.raises(NotImplementedError, match="1-band|3-band"):
        GT.write_tiff(np.zeros((2, 16, 16), dtype=np.uint8),
                      compression="jpeg")
