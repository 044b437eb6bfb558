"""map_pixel affine math: Spark bround == np.round (HALF_EVEN) — the
rounding gate from georasters.py:101-126 (SURVEY §1.4.1)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from georasters_spark.functions import grid as G


def test_bround_matches_numpy_half_even(spark):
    # points exactly on cell boundaries: (x - x0)/cs hits k + 0.5
    x0, cs = -180.0, 0.5
    cols = np.arange(-4, 60)
    xs = x0 + (cols + 0.5) * cs  # exact .5 offsets
    xs = np.concatenate([xs, x0 + cols * cs, x0 + (cols + 0.25) * cs])
    expected = np.round((xs - x0) / cs).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (
        df.select(G.col_of_x(F.col("x"), x0, cs).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    assert np.array_equal(got, expected)


def test_floor_mode(spark):
    x0, cs = 0.0, 1.0
    xs = np.array([0.0, 0.49, 0.5, 0.51, 1.0, 1.5, 2.49, -0.5, -0.49])
    expected = np.floor(xs).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (
        df.select(G.col_of_x(F.col("x"), x0, cs, floor=True).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    assert np.array_equal(got, expected)


def test_map_pixel_inv_roundtrip(spark):
    """row/col -> x/y -> row/col is identity (corner convention,
    georasters.py:128-150)."""
    x0, y0, cx, cy = -180.0, 90.0, 2.0 / 3.0, -2.0 / 3.0
    df = spark.range(500).select(
        (F.col("id") % 100).alias("col"), (F.col("id") % 77).alias("row")
    )
    out = df.select(
        "row",
        "col",
        G.col_of_x(G.x_of_col(F.col("col"), x0, cx), x0, cx).alias("col2"),
        G.row_of_y(G.y_of_row(F.col("row"), y0, cy), y0, cy).alias("row2"),
    ).toPandas()
    assert (out["col"] == out["col2"]).all()
    assert (out["row"] == out["row2"]).all()


def test_assert_same_grid():
    import pytest

    a = dict(xmin=0.0, ymax=1.0, cellx=0.5, celly=-0.5, crs="EPSG:4326")
    G.assert_same_grid(a, dict(a))
    with pytest.raises(ValueError):
        G.assert_same_grid(a, {**a, "cellx": 0.25})
