"""Property-based tests (hypothesis): codec roundtrips, cell-index
roundtrips, PIP vs half-plane on random convex polygons, affine
row/col roundtrip. Pure numpy — no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from georasters_spark.functions import cells, geometry as geom
from georasters_spark.sources import codec

NDV = -9999.0


@settings(max_examples=40, deadline=None)
@given(
    arrays(np.int16, (16, 16), elements=st.integers(-30000, 30000)),
    st.sampled_from(["raw16", "png"]),
)
def test_lossless_codec_roundtrip(arr, fmt):
    dec = codec.decode_tile(codec.encode_tile(arr, fmt, NDV), fmt, 16, 16, NDV)
    assert np.array_equal(np.asarray(dec, dtype=np.int16), arr)


@settings(max_examples=40, deadline=None)
@given(arrays(np.int16, (16, 16), elements=st.integers(0, 2000)))
def test_q8_mask_and_psnr(arr):
    a = arr.copy()
    a[a % 7 == 0] = int(NDV)  # sprinkle nodata
    dec = codec.decode_tile(codec.encode_tile(a, "q8", NDV), "q8", 16, 16, NDV)
    assert np.array_equal(dec == NDV, a == int(NDV))
    assert codec.psnr(a, dec, NDV) >= 40.0


@settings(max_examples=60, deadline=None)
@given(
    st.floats(-180, 179.999999),
    st.floats(-90, 89.999999),
    st.integers(0, 29),
)
def test_cell_roundtrip_property(lon, lat, res):
    cid = int(cells.cell_of(np.float64(lon), np.float64(lat), res))
    assert cid >= 0
    ix, iy, r = cells.decode(cid)
    ex, ey = cells.lonlat_to_ixiy(np.float64(lon), np.float64(lat), res)
    assert int(ix) == int(ex) and int(iy) == int(ey) and int(r) == res
    if res > 0:
        # boundary coords can round into the adjacent cell by one ulp
        # of (coord+180) — allow that absolute slack
        x0, y0, x1, y1 = cells.cell_bounds(cid)
        tol = 1e-7
        assert x0 - tol <= lon <= x1 + tol and y0 - tol <= lat <= y1 + tol


@settings(max_examples=30, deadline=None)
@given(st.integers(3, 9), st.integers(0, 10_000))
def test_pip_convex_random(nverts, seed):
    rng = np.random.default_rng(seed)
    # random convex polygon: sorted angles on a random ellipse
    ang = np.sort(rng.uniform(0, 2 * np.pi, nverts))
    if len(np.unique(np.round(ang, 6))) < 3:
        return
    cx, cy = rng.uniform(-90, 90, 2)
    rx, ry = rng.uniform(5, 40, 2)
    verts = [(cx + rx * np.cos(a), cy + ry * np.sin(a)) for a in ang]
    px = rng.uniform(cx - 60, cx + 60, 3000)
    py = rng.uniform(cy - 60, cy + 60, 3000)
    rings = [np.asarray(verts)]
    inside = geom.points_in_rings(px, py, rings)
    hp = np.ones(3000, bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        hp &= ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) > 0
    # boundary-ulp points can disagree; require near-total agreement
    assert (inside == hp).mean() > 0.999


@settings(max_examples=60, deadline=None)
@given(
    st.integers(-10_000, 10_000),
    st.floats(0.001, 10),
    st.floats(-1000, 1000),
)
def test_affine_roundtrip_property(col, cellx, x0):
    x = x0 + col * cellx
    back = int(np.round((x - x0) / cellx))
    assert back == col


# --- round-4 codec fuzz (the round-3 LZW bug was found exactly here) ---

from georasters_spark.sources import flac as _flac
from georasters_spark.sources import geotiff as _gt
from georasters_spark.sources import jpeg as _jpeg
from georasters_spark.sources import mp4 as _mp4


@settings(max_examples=30, deadline=None)
@given(
    arrays(np.int16, st.integers(1, 2200).map(lambda n: (n,)),
           elements=st.integers(-32768, 32767)),
    st.sampled_from([256, 1024, 4096]),
)
def test_flac_mono_roundtrip_fuzz(samples, block_size):
    out, _ = _flac.decode_flac(_flac.encode_flac(samples, 8000,
                                                 block_size=block_size))
    assert np.array_equal(out[:, 0], samples)


@settings(max_examples=20, deadline=None)
@given(
    arrays(np.int16, st.integers(2, 900).map(lambda n: (n, 2)),
           elements=st.integers(-32768, 32767)),
    st.sampled_from(["indep", "mid_side", "left_side", "right_side"]),
)
def test_flac_stereo_roundtrip_fuzz(samples, mode):
    out, _ = _flac.decode_flac(
        _flac.encode_flac(samples, 44100, block_size=576, stereo_mode=mode))
    assert np.array_equal(out, samples)


@settings(max_examples=20, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40)),
           elements=st.integers(0, 255)),
    st.sampled_from([30, 75, 95]),
)
def test_progressive_jpeg_equals_baseline_fuzz(img, quality):
    base = _jpeg.decode_gray(_jpeg.encode_gray(img, quality))
    prog = _jpeg.decode_gray(_jpeg.encode_gray_progressive(img, quality))
    assert np.array_equal(prog, base)


@settings(max_examples=12, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 33), st.integers(1, 33),
                               st.just(3)),
           elements=st.integers(0, 255)),
    st.sampled_from(["444", "422", "420"]),
)
def test_color_progressive_equals_baseline_fuzz(img, ss):
    base = _jpeg.decode(_jpeg.encode_color(img, 85, subsampling=ss))
    prog = _jpeg.decode(_jpeg.encode_color_progressive(img, 85, subsampling=ss))
    assert np.array_equal(prog, base)


@settings(max_examples=25, deadline=None)
@given(
    arrays(np.uint16, st.tuples(st.integers(1, 60), st.integers(1, 60)),
           elements=st.integers(0, 65535)),
    st.sampled_from(["none", "deflate", "lzw"]),
    st.booleans(),
    st.booleans(),
)
def test_bigtiff_roundtrip_fuzz(arr, compression, tiled, bigtiff):
    buf = _gt.write_tiff(arr, compression=compression, predictor=True,
                         tiled=tiled, tile_size=16, bigtiff=bigtiff)
    out, _meta = _gt.parse_tiff(buf)
    assert np.array_equal(out, arr)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=300), min_size=1, max_size=40),
    st.integers(1, 9),
)
def test_mp4_sample_table_fuzz(payloads, spc):
    buf = _mp4.build_minimal_mp4(payloads, samples_per_chunk=spc)
    _info, samples = _mp4.extract_samples(buf)
    assert len(samples) == len(payloads)
    pos = _mp4.MDAT_PAYLOAD_START
    for i, (si, off, size, _pts, _sync, payload) in enumerate(samples):
        assert (si, off) == (i, pos) and payload == payloads[i]
        pos += size


# --- round-5 session-2 codecs: PNG / GIF / G.711 / BMP -------------------


@given(
    arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24)),
           elements=st.integers(0, 255)),
    st.sampled_from(["none", "sub", "up", "average", "paeth", "adaptive"]),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_png_gray_roundtrip_fuzz(img, strategy, interlace):
    from georasters_spark.sources import png

    back = png.decode(png.encode(img, filter_strategy=strategy,
                                 interlace=interlace))
    assert back.shape == img.shape and (back == img).all()


@given(
    arrays(np.uint16, st.tuples(st.integers(1, 16), st.integers(1, 16),
                                st.just(4)),
           elements=st.integers(0, 65535)),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_png_rgba16_roundtrip_fuzz(img, interlace):
    from georasters_spark.sources import png

    back = png.decode(png.encode(img, interlace=interlace))
    assert back.dtype == np.uint16 and (back == img).all()


@given(
    arrays(np.uint8, st.tuples(st.integers(1, 30), st.integers(1, 30)),
           elements=st.integers(0, 255)),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_fuzz(idx, interlace):
    from georasters_spark.sources import gif

    pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3)
    fr = gif.parse(gif.encode(idx, pal, interlace=interlace))["frames"][0]
    assert (fr["indices"] == idx).all()


@given(arrays(np.int16, st.integers(1, 400),
              elements=st.integers(-32768, 32767)),
       st.sampled_from(["ulaw", "alaw"]))
@settings(max_examples=40, deadline=None)
def test_g711_wav_roundtrip_fuzz(samples, law):
    from georasters_spark.sources import g711

    y, rate = g711.decode_wav_any(g711.encode_wav_g711(samples, 8000, law))
    enc = getattr(g711, f"{law}_encode")(samples)
    assert rate == 8000 and (y == getattr(g711, f"{law}_decode")(enc)).all()
    # double roundtrip is a fixed point: codes are idempotent
    assert (getattr(g711, f"{law}_encode")(y)
            == np.where(enc == 0x7F, 0xFF, enc)).all() if law == "ulaw" \
        else (getattr(g711, f"{law}_encode")(y) == enc).all()


@given(
    arrays(np.uint8, st.tuples(st.integers(1, 20), st.integers(1, 20)),
           elements=st.integers(0, 15)),
    st.booleans(), st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_bmp_palettized_roundtrip_fuzz(idx, rle, top_down):
    from georasters_spark.sources import bmp

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    img, _ = bmp.decode(bmp.encode(idx, pal, rle=rle, top_down=top_down))
    assert (img == idx).all()
