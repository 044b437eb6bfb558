"""Autocorrelation: row-standardized Moran vs numpy oracle on the 5x5
gradient fixture (FIXTURES.md §4.3, reference tests/test_georasters.py:
408-445), plus lattice-weights structural checks."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from georasters_spark.operators import autocorr as AC

GRAD = np.array(
    [
        [10, 12, 11, 13, 10],
        [20, 22, 21, 23, 20],
        [30, 32, 31, 33, 30],
        [40, 42, 41, 43, 40],
        [50, 52, 51, 53, 50],
    ],
    dtype=np.float64,
)


def _moran_numpy_rowstd(a: np.ndarray) -> float:
    """Direct reimplementation of esda Moran with row-standardized
    queen weights (georasters.py:1740-1775 + pysal formulas)."""
    h, w = a.shape
    n = a.size
    z = a.ravel() - a.mean()
    num = 0.0
    s0 = 0.0
    for r in range(h):
        for c in range(w):
            i = r * w + c
            nbrs = [
                (r + dr) * w + (c + dc)
                for dr in (-1, 0, 1)
                for dc in (-1, 0, 1)
                if not (dr == 0 and dc == 0)
                and 0 <= r + dr < h
                and 0 <= c + dc < w
            ]
            wgt = 1.0 / len(nbrs)
            s0 += wgt * len(nbrs)
            num += z[i] * wgt * sum(z[j] for j in nbrs)
    return (n / s0) * num / (z @ z)


def _px_df(spark, a):
    h, w = a.shape
    rows = [(int(r), int(c), float(a[r, c])) for r in range(h) for c in range(w)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_moran_rowstd_matches_numpy(spark):
    px = _px_df(spark, GRAD)
    got = AC.moran_rowstd(px)
    exp = _moran_numpy_rowstd(GRAD)
    assert abs(got - exp) < 1e-9, (got, exp)


def test_global_autocorr_rowstd_matches_numpy(spark):
    """The gated exact-integer 840-scaled plan equals the float
    reference implementation (values are integers here so both are
    exact up to final float ops)."""
    a = GRAD.astype(np.int64).astype(np.float64)
    px = _px_df(spark, a).select("row", "col", F.col("value").cast("long").alias("value"))
    row = AC.global_autocorr_rowstd(px).collect()[0]
    exp = _moran_numpy_rowstd(a)
    assert abs(row["moran_r"] - exp) < 1e-9, (row["moran_r"], exp)
    assert row["n"] == 25 and row["nw"] == 25
    # Geary rowstd vs direct numpy
    h, w = a.shape
    z = a.ravel() - a.mean()
    num = s0 = 0.0
    for r in range(h):
        for c in range(w):
            nbrs = [(r + dr, c + dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                    if (dr, dc) != (0, 0) and 0 <= r + dr < h and 0 <= c + dc < w]
            wgt = 1.0 / len(nbrs)
            s0 += 1.0
            num += wgt * sum((a[r, c] - a[p, q]) ** 2 for p, q in nbrs)
    exp_c = ((a.size - 1) / (2.0 * s0)) * num / (z @ z)
    assert abs(row["geary_r"] - exp_c) < 1e-9, (row["geary_r"], exp_c)


def test_gstar_local_matches_numpy(spark):
    """z-form Getis-Ord G*_i vs direct numpy on the gradient fixture."""
    import math

    a = GRAD
    px = _px_df(spark, a).select("row", "col", F.col("value").cast("long").alias("value"))
    got = AC.gstar_local(px).toPandas().set_index(["row", "col"])
    n = a.size
    mean = a.mean()
    s_h = math.sqrt((a * a).mean() - mean * mean)
    h, w = a.shape
    for r in range(h):
        for c in range(w):
            nb = [a[r + dr, c + dc] for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                  if 0 <= r + dr < h and 0 <= c + dc < w]
            wi = len(nb)
            z = (sum(nb) - mean * wi) / (s_h * math.sqrt((n * wi - wi * wi) / (n - 1)))
            assert abs(got.loc[(r, c), "z_gstar"] - z) < 1e-9


def test_neighbor_pairs_degree_structure(spark):
    px = _px_df(spark, GRAD)
    deg = (
        AC.neighbor_pairs(px)
        .groupBy("row", "col")
        .count()
        .toPandas()
        .sort_values(["row", "col"])
    )
    # queen lattice 5x5: corners 3, edges 5, interior 8
    counts = deg["count"].value_counts().to_dict()
    assert counts == {8: 9, 5: 12, 3: 4}
    rook = AC.neighbor_pairs(px, rook=True).groupBy("row", "col").count().toPandas()
    assert rook["count"].value_counts().to_dict() == {4: 9, 3: 12, 2: 4}


def test_masked_cells_drop_out(spark):
    """Masked cells removed from the lattice like raster_weights deletes
    masked nodes (georasters.py:1758-1767)."""
    a = GRAD.copy()
    px = _px_df(spark, a).filter(~((F.col("row") == 2) & (F.col("col") == 2)))
    deg = AC.neighbor_pairs(px).groupBy("row", "col").count().toPandas()
    center_nbrs = deg[(deg.row.isin([1, 2, 3])) & (deg.col.isin([1, 2, 3]))]
    # the 8 cells around the hole each lost exactly one neighbor
    assert (center_nbrs["count"] == 7).all()


def test_focal_stats_exact(spark):
    px = _px_df(spark, GRAD).withColumn("value", F.col("value").cast("long"))
    got = AC.focal_stats(px, include_self=True).toPandas().set_index(["row", "col"])
    # center cell: sum of the full 3x3 block
    assert got.loc[(2, 2), "nsum"] == int(GRAD[1:4, 1:4].sum())
    assert got.loc[(2, 2), "ncnt"] == 9
    # corner: 2x2 block
    assert got.loc[(0, 0), "nsum"] == int(GRAD[0:2, 0:2].sum())
    assert got.loc[(0, 0), "ncnt"] == 4
