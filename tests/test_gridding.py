"""gdal_grid role (operators/gridding.py): bucket-join radius search vs
brute force, exact algorithms vs numpy, invdist vs the classic formula."""

import numpy as np
import pytest

from georasters_spark.operators import gridding as GR

ORIGIN = (0.0, 10.0)
CELL = (2.0, -2.0)
SHAPE = (5, 6)       # 5 rows x 6 cols, y from 10 down to 0, x 0..12
RADIUS = 1.7
N = 120


def _pts_np():
    rng = np.random.default_rng(11)
    x = np.round(rng.uniform(0, 12, N), 1)
    y = np.round(rng.uniform(0, 10, N), 1)
    v = rng.integers(0, 100, N)
    return x, y, v


def _pts_df(spark):
    x, y, v = _pts_np()
    return spark.createDataFrame(
        [(i, float(x[i]), float(y[i]), int(v[i])) for i in range(N)],
        "pid long, x double, y double, value long")


def _centers():
    th, tw = SHAPE
    cxc = ORIGIN[0] + (np.arange(tw) + 0.5) * CELL[0]
    cyc = ORIGIN[1] + (np.arange(th) + 0.5) * CELL[1]
    return cxc, cyc


def test_grid_points_matches_brute_force(spark):
    x, y, v = _pts_np()
    cxc, cyc = _centers()
    got = {(r["trow"], r["tcol"]): r
           for r in GR.grid_points(_pts_df(spark), ORIGIN, CELL, SHAPE,
                                   RADIUS).collect()}
    n_cells = 0
    for tr in range(SHAPE[0]):
        for tc in range(SHAPE[1]):
            d2 = (x - cxc[tc]) ** 2 + (y - cyc[tr]) ** 2
            sel = d2 <= RADIUS * RADIUS
            if not sel.any():
                assert (tr, tc) not in got
                continue
            n_cells += 1
            r = got[(tr, tc)]
            assert r["n_pts"] == int(sel.sum())
            assert r["avg_value"] == pytest.approx(
                round(v[sel].sum() / sel.sum(), 6))
            assert r["vmin"] == v[sel].min() and r["vmax"] == v[sel].max()
            # nearest: min d2, ties by min pid
            cand = np.where(sel)[0]
            best = cand[np.lexsort((cand, d2[cand]))][0]
            assert r["nearest_value"] == v[best]
    assert len(got) == n_cells


def test_invdist_formula(spark):
    x, y, v = _pts_np()
    cxc, cyc = _centers()
    got = {(r["trow"], r["tcol"]): r["value"]
           for r in GR.grid_points_invdist(_pts_df(spark), ORIGIN, CELL,
                                           SHAPE, RADIUS, power=2.0).collect()}
    for (tr, tc), gv in got.items():
        d2 = (x - cxc[tc]) ** 2 + (y - cyc[tr]) ** 2
        sel = d2 <= RADIUS * RADIUS
        assert sel.any()
        if (d2[sel] == 0).any():
            exp = float(v[sel][d2[sel] == 0][0])
        else:
            w = 1.0 / d2[sel]
            exp = float((w * v[sel]).sum() / w.sum())
        assert gv == pytest.approx(exp, rel=1e-12)


def test_point_on_cell_center_short_circuits(spark):
    # one point exactly on a cell center, another nearby: invdist must
    # return the on-center value exactly, not inf/nan
    pts = spark.createDataFrame(
        [(0, 1.0, 9.0, 42), (1, 1.3, 9.0, 7)],
        "pid long, x double, y double, value long")
    rows = {(r["trow"], r["tcol"]): r["value"]
            for r in GR.grid_points_invdist(pts, ORIGIN, CELL, SHAPE,
                                            RADIUS).collect()}
    assert rows[(0, 0)] == 42.0
