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
