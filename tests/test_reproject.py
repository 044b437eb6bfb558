"""Reproject differential test vs an independent numpy warp
(mirrors reference tests/test_georasters.py:315-397: same shape,
identical masks, values within tolerance)."""

import numpy as np
from pyspark.sql import functions as F

from georasters_spark.operators import pixels as PX
from georasters_spark.operators import reproject as RP
from georasters_spark.sources import synth


def test_wgs84_to_cea_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (180, 360)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid(
        px,
        src_origin=(spec.x0, spec.y0),
        src_cellsize=(spec.cellx, spec.celly),
        src_shape=(spec.height, spec.width),
        out_shape=out_shape,
    ).toPandas()
    grid = np.full(out_shape, spec.ndv)
    vals = got.dropna(subset=["value"])
    grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()

    full = synth.stitched_array(spec).astype(np.float64)
    exp = RP.warp_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape
    )
    # masked-source cells land as NULL -> ndv in grid; oracle writes the
    # source value (incl. ndv) — harmonize: oracle ndv stays ndv.
    mismatch = (grid != exp).sum()
    # JVM vs libm trig may differ 1 ulp → floor flips on a measure-zero
    # set of boundary cells; reference itself compares with atol=1.0.
    assert mismatch / grid.size < 0.005, mismatch
    # shape + roundtrip sanity: equator-adjacent rows keep values
    assert grid.shape == out_shape
    assert (grid != spec.ndv).sum() > 0.5 * (exp != spec.ndv).sum()


def test_wgs84_to_webmercator_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (128, 128)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_webmercator_grid(
        px,
        src_origin=(spec.x0, spec.y0),
        src_cellsize=(spec.cellx, spec.celly),
        src_shape=(spec.height, spec.width),
        out_shape=out_shape,
    ).toPandas()
    grid = np.full(out_shape, spec.ndv)
    vals = got.dropna(subset=["value"])
    grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
    full = synth.stitched_array(spec).astype(np.float64)
    exp = RP.webmercator_numpy_oracle(
        full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape
    )
    mismatch = (grid != exp).sum()
    assert mismatch / grid.size < 0.005, mismatch


def test_cea_bilinear_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (90, 180)
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid_bilinear(
        px, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
    ).toPandas()
    exp, cnt = RP.cea_bilinear_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    vals = got.dropna(subset=["value"])
    assert len(vals) == int(np.isfinite(exp).sum())
    for t in vals.itertuples(index=False):
        assert abs(t.value - round(float(exp[t.trow, t.tcol]), 6)) < 1e-6
        assert t.n_contrib == cnt[t.trow, t.tcol]
    # weight renormalization: cells fed by <4 valid neighbors exist
    assert (vals.n_contrib < 4).any() and (vals.n_contrib == 4).any()


def test_cea_average_matches_numpy(spark, images_t1):
    spec = synth.T1
    out_shape = (45, 90)  # strong downsample: many sources per target
    px = PX.pixel_table(images_t1, valid_only=True).select("row", "col", "value")
    got = RP.wgs84_to_cea_grid_average(
        px, (spec.x0, spec.y0), (spec.cellx, spec.celly),
        (spec.height, spec.width), out_shape,
    ).toPandas()
    s, n = RP.cea_average_numpy_oracle(
        synth.stitched_array(spec).astype(np.float64), spec.ndv,
        (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape,
    )
    assert len(got) == int((n > 0).sum())
    for t in got.itertuples(index=False):
        assert t.n_contrib == n[t.trow, t.tcol]
        assert abs(t.value - round(float(s[t.trow, t.tcol] / n[t.trow, t.tcol]), 6)) < 1e-6
    assert got.n_contrib.max() > 10  # really aggregating many cells


def test_webmercator_inverse_roundtrip():
    import math

    for lat in [0.0, 45.5, -60.2, 80.0]:
        Y = RP.R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
        back = math.degrees(2 * math.atan(math.exp(Y / RP.R)) - math.pi / 2)
        assert abs(lat - back) < 1e-10


def test_cea_bounds_monotone():
    x0, y0, x1, y1 = RP.cea_bounds(-180, -90, 180, 90)
    assert x0 < x1 and y0 < y1
    assert abs(x1 - RP.R * np.pi) < 1e-6


def test_cea_inverse_roundtrip():
    """forward(inverse(X, Y)) == (X, Y) numerically."""
    import math

    k = 1.0
    for lon, lat in [(12.3, 45.6), (-170.0, -80.0), (0.0, 0.0)]:
        X = RP.R * math.radians(lon) * k
        Y = RP.R * math.sin(math.radians(lat)) / k
        lon2 = math.degrees(X / (RP.R * k))
        lat2 = math.degrees(math.asin(Y * k / RP.R))
        assert abs(lon - lon2) < 1e-12 and abs(lat - lat2) < 1e-12
