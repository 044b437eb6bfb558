"""Hierarchical cell index: roundtrip, hierarchy, rings, SQL parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from georasters_spark.functions import cells


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    return rng.uniform(-180, 180, 2000), rng.uniform(-90, 90, 2000)


@pytest.mark.parametrize("res", [0, 1, 3, 6, 15, 29])
def test_roundtrip(pts, res):
    lon, lat = pts
    cid = cells.cell_of(lon, lat, res)
    ix, iy, r = cells.decode(cid)
    ex, ey = cells.lonlat_to_ixiy(lon, lat, res)
    assert np.array_equal(ix, ex) and np.array_equal(iy, ey)
    assert np.all(r == res)
    assert np.all(np.asarray(cid) >= 0), "ids must stay positive BIGINTs"


def test_parent_hierarchy(pts):
    lon, lat = pts
    fine = cells.cell_of(lon, lat, 12)
    assert np.array_equal(np.asarray(cells.parent(fine)), np.asarray(cells.cell_of(lon, lat, 11)))
    assert np.array_equal(
        np.asarray(cells.parent(fine, 3)), np.asarray(cells.cell_of(lon, lat, 9))
    )


def test_kring_and_ring():
    c = int(cells.cell_of(10.0, 10.0, 6))
    assert len(cells.kring(c, 0)) == 1
    assert len(cells.kring(c, 1)) == 9
    assert len(cells.ring(c, 1)) == 8
    assert len(cells.kring(c, 2)) == 25
    # boundary clamp: corner cell has only 4 in its 1-ring block
    corner = int(cells.encode(np.int64(0), np.int64(0), 6))
    assert len(cells.kring(corner, 1)) == 4


def test_cell_bounds_contains_point():
    for lon, lat in [(12.3, 45.6), (-170.0, -80.0), (0.01, 0.01)]:
        c = int(cells.cell_of(lon, lat, 8))
        x0, y0, x1, y1 = cells.cell_bounds(c)
        assert x0 <= lon <= x1 and y0 <= lat <= y1


def test_morton_sql_duckdb_parity(pts):
    lon, lat = pts
    res = 7
    ix, iy = cells.lonlat_to_ixiy(lon, lat, res)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"ix": ix, "iy": iy}))
    got = con.sql(
        f"SELECT {cells.morton_sql('ix', 'iy', res)} AS cid FROM t"
    ).df()["cid"].to_numpy()
    assert np.array_equal(got, np.asarray(cells.encode(ix, iy, res)))


def test_zorder_locality():
    """Sorting by cell id must cluster spatial neighbors (file-skipping
    design property): the mean |Δcell| of adjacent lon cells is far
    smaller than for random pairs."""
    res = 8
    lon = np.linspace(-179, 179, 512)
    lat = np.full(512, 33.0)
    cid = np.sort(np.asarray(cells.cell_of(lon, lat, res)))
    adj = np.abs(np.diff(cid)).mean()
    rng = np.random.default_rng(0)
    rand = np.abs(np.diff(rng.permutation(cid))).mean()
    assert adj < rand / 10
