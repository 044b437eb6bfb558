"""gdal_viewshed role (operators/viewshed.py): numpy ray-march mirror
plus hand-built wall/tie scenarios."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georasters_spark.operators import viewshed as VS


def _px_df(spark, dem, drop=()):
    h, w = dem.shape
    rows = [(r, c, int(dem[r, c])) for r in range(h) for c in range(w)
            if (r, c) not in drop]
    return spark.createDataFrame(rows, "row long, col long, value long")


def _numpy_viewshed(dem, obs, radius, eye=0, drop=()):
    h, w = dem.shape
    r0, c0 = obs
    z0 = dem[r0, c0] + eye
    out = {}
    for r in range(max(0, r0 - radius), min(h, r0 + radius + 1)):
        for c in range(max(0, c0 - radius), min(w, c0 + radius + 1)):
            if (r, c) in drop:
                continue
            dr, dc = r - r0, c - c0
            d = max(abs(dr), abs(dc))
            blocked = 0
            for s in range(1, d):
                sr = r0 + (2 * s * dr + d) // (2 * d)
                sc = c0 + (2 * s * dc + d) // (2 * d)
                if (sr, sc) in drop:
                    continue
                if (dem[sr, sc] - z0) * d > (dem[r, c] - z0) * s:
                    blocked += 1
            out[(r, c)] = (d, blocked, blocked == 0)
    return out


def test_viewshed_matches_numpy_ray_march(spark):
    rng = np.random.default_rng(5)
    dem = rng.integers(0, 100, size=(21, 25)).astype(np.int64)
    drop = {(3, 4), (10, 12), (15, 15)}  # nodata holes
    got = {(r["row"], r["col"]): (r["d_cheb"], r["blocked_steps"], r["visible"])
           for r in VS.viewshed(_px_df(spark, dem, drop), (10, 11), 8,
                                eye_height=5).collect()}
    exp = _numpy_viewshed(dem, (10, 11), 8, eye=5, drop=drop)
    assert got == exp


def test_wall_blocks_and_tie_is_visible(spark):
    dem = np.zeros((5, 9), dtype=np.int64)
    dem[2, 4] = 10          # a wall east of the observer at (2, 2)
    px = _px_df(spark, dem)
    got = {(r["row"], r["col"]): r["visible"]
           for r in VS.viewshed(px, (2, 2), 6).collect()}
    assert got[(2, 4)]            # the wall crest itself is visible
    assert not got[(2, 5)] and not got[(2, 6)]   # shadow behind it
    assert got[(2, 3)] and got[(2, 1)]           # in front / other side
    # tie: a target exactly ON the sight line over the crest is visible
    # (2,6) at z 20 has slope (20-0)/4 = wall's (10-0)/2 — grazing
    dem2 = dem.copy()
    dem2[2, 6] = 20
    got2 = {(r["row"], r["col"]): r["visible"]
            for r in VS.viewshed(_px_df(spark, dem2), (2, 2), 6).collect()}
    assert got2[(2, 6)]


def test_adjacent_cells_always_visible(spark):
    dem = np.full((3, 3), 7, dtype=np.int64)
    dem[1, 1] = 0
    got = {(r["row"], r["col"]): r["visible"]
           for r in VS.viewshed(_px_df(spark, dem), (1, 1), 1).collect()}
    assert len(got) == 9 and all(got.values())


def test_invalid_observer_raises(spark):
    dem = np.zeros((4, 4), dtype=np.int64)
    px = _px_df(spark, dem, drop={(1, 1)})
    with pytest.raises(ValueError, match="observer"):
        VS.viewshed(px, (1, 1), 2)         # nodata observer
    with pytest.raises(ValueError, match="observer"):
        VS.viewshed(px, (9, 9), 2)         # outside the raster
