"""Exact Euclidean distance transform vs brute-force numpy."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from georasters_spark.operators import proximity as PR


def _grid_df(spark, h, w, seed=7):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 500, (h, w))
    return spark.createDataFrame(
        pd.DataFrame([(r, c, int(vals[r, c])) for r in range(h) for c in range(w)],
                     columns=["row", "col", "value"]),
        "row long, col long, value long",
    ), vals


def test_proximity_matches_bruteforce(spark):
    h, w = 40, 55
    df, vals = _grid_df(spark, h, w)
    got = PR.proximity(df, F.col("value") < 8).toPandas()
    tr, tc = np.nonzero(vals < 8)
    assert len(tr) > 3
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d2 = ((rr[..., None] - tr) ** 2 + (cc[..., None] - tc) ** 2).min(axis=2)
    assert len(got) == h * w
    for t in got.itertuples(index=False):
        assert t.dist2 == d2[t.row, t.col], (t.row, t.col)
        assert abs(t.dist - round(float(np.sqrt(d2[t.row, t.col])), 6)) < 1e-9
    # targets themselves are at distance 0
    assert (got.set_index(["row", "col"]).loc[list(zip(tr, tc))]["dist2"] == 0).all()


def test_proximity_no_targets_is_null(spark):
    df, _ = _grid_df(spark, 10, 10)
    got = PR.proximity(df, F.lit(False)).toPandas()
    assert got["dist2"].isna().all() and got["dist"].isna().all()


def test_fillnodata_matches_numpy(spark):
    """Nearest-valid fill with the canonical (d², row, col) tie-break
    vs a brute-force numpy mirror; valid cells keep value at dist2=0."""
    from georasters_spark.operators.proximity import fillnodata

    rng = np.random.default_rng(17)
    h, w = 20, 26
    v = rng.integers(0, 300, (h, w)).astype(np.int64)
    ok = (v % 5) != 0  # ~20% holes
    rows = [(int(r), int(c), int(v[r, c])) for r in range(h) for c in range(w)]
    grid = spark.createDataFrame(rows, "row long, col long, value long")
    got = fillnodata(grid, (F.col("value") % 5) != 0).toPandas()
    assert len(got) == h * w
    vr, vc = np.nonzero(ok)
    for t in got.itertuples(index=False):
        if ok[t.row, t.col]:
            assert t.dist2 == 0 and int(t.value) == v[t.row, t.col]
            continue
        d2 = (vr - t.row) ** 2 + (vc - t.col) ** 2
        key = d2 * 10**12 + vr * 10**6 + vc
        j = int(np.argmin(key))
        assert t.dist2 == int(d2[j])
        assert int(t.value) == int(v[vr[j], vc[j]])


def test_fillnodata_no_valid_cells(spark):
    from georasters_spark.operators.proximity import fillnodata

    rows = [(r, c, 0) for r in range(3) for c in range(3)]
    grid = spark.createDataFrame(rows, "row long, col long, value long")
    got = fillnodata(grid, F.lit(False)).toPandas()
    assert len(got) == 9
    assert got["value"].isna().all() and got["dist2"].isna().all()
