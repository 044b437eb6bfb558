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
