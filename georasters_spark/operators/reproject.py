"""Reprojection (georasters.py:559-667) — closed-form warps, Spark-first.

The reference shells out to GDAL WarpedVRT; its own test suite only
exercises WGS84 <-> cylindrical-equal-area (tests/test_georasters.py:
315-397), both of which have closed-form transforms:

  CEA  forward: X = R·λ·cos(φs),        Y = R·sin(φ)/cos(φs)
       inverse: λ = X/(R·cos(φs)),      φ = asin(Y·cos(φs)/R)
  (λ, φ in radians; φs = standard parallel; R = 6378137)

The warp is an inverse-projection *gather*, exactly like resize: build
the target grid (spark.range × spark.range), compute each target cell
center's source (row, col) with JVM trig Column expressions, equi-join
the source pixel table. Resampling = nearest (the reference default).
No UDF anywhere — the whole plan is Catalyst-visible, so the join
strategy/pruning come free.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R = 6378137.0


def cea_bounds(lon0: float, lat0: float, lon1: float, lat1: float, phi_s: float = 0.0):
    """Projected bbox of a geographic bbox (monotone transform)."""
    k = math.cos(math.radians(phi_s))
    x0 = R * math.radians(lon0) * k
    x1 = R * math.radians(lon1) * k
    y0 = R * math.sin(math.radians(lat0)) / k
    y1 = R * math.sin(math.radians(lat1)) / k
    return x0, y0, x1, y1


def wgs84_to_cea_grid(
    px: DataFrame,
    src_origin: tuple[float, float],
    src_cellsize: tuple[float, float],
    src_shape: tuple[int, int],
    out_shape: tuple[int, int],
    phi_s: float = 0.0,
) -> DataFrame:
    """Warp a WGS84 pixel table onto a CEA target grid (nearest).

    Returns (trow, tcol, xm, ym, value) — xm/ym are the target cell
    centers in projected meters; value NULL where the source is masked
    or out of range.
    """
    spark = px.sparkSession
    h, w = src_shape
    th, tw = out_shape
    x0g, y0g = src_origin
    cx, cy = src_cellsize
    # target grid covers the projected source extent
    X0, Y1, X1, Y0 = cea_bounds(x0g, y0g + h * cy, x0g + w * cx, y0g, phi_s)
    # (lon0, lat_min, lon1, lat_max) ordering: Y0 = north edge
    tcx = (X1 - X0) / tw
    tcy = (Y1 - Y0) / th  # negative (north-up)
    k = math.cos(math.radians(phi_s))

    target = (
        spark.range(th)
        .select(F.col("id").alias("trow"))
        .crossJoin(spark.range(tw).select(F.col("id").alias("tcol")))
    )
    xm = F.lit(X0) + (F.col("tcol") + F.lit(0.5)) * F.lit(tcx)
    ym = F.lit(Y0) + (F.col("trow") + F.lit(0.5)) * F.lit(tcy)
    lon = F.degrees(xm / F.lit(R * k))
    lat = F.degrees(F.asin(ym * F.lit(k / R)))
    srow = F.floor((lat - F.lit(y0g)) / F.lit(cy)).cast("long")
    scol = F.floor((lon - F.lit(x0g)) / F.lit(cx)).cast("long")
    tgt = target.select(
        "trow",
        "tcol",
        xm.alias("xm"),
        ym.alias("ym"),
        srow.alias("row"),
        scol.alias("col"),
    )
    src = px.select("row", "col", "value")
    return tgt.join(src, ["row", "col"], "left").select(
        "trow", "tcol", F.round("xm", 6).alias("xm"), F.round("ym", 6).alias("ym"), "value"
    )


def wgs84_to_webmercator_grid(
    px: DataFrame,
    src_origin: tuple[float, float],
    src_cellsize: tuple[float, float],
    src_shape: tuple[int, int],
    out_shape: tuple[int, int],
    lat_clip: float = 85.05112878,
) -> DataFrame:
    """Warp onto a Web-Mercator (EPSG:3857) target grid — same
    inverse-gather shape as CEA with Y = R·ln(tan(π/4 + φ/2)),
    φ = 2·atan(exp(Y/R)) − π/2. Latitudes clipped to the Mercator
    square per convention."""
    spark = px.sparkSession
    h, w = src_shape
    th, tw = out_shape
    x0g, y0g = src_origin
    cx, cy = src_cellsize
    lon0, lon1 = x0g, x0g + w * cx
    lat_top = min(y0g, lat_clip)
    lat_bot = max(y0g + h * cy, -lat_clip)
    X0 = R * math.radians(lon0)
    X1 = R * math.radians(lon1)
    Y0 = R * math.log(math.tan(math.pi / 4 + math.radians(lat_top) / 2))
    Y1 = R * math.log(math.tan(math.pi / 4 + math.radians(lat_bot) / 2))
    tcx = (X1 - X0) / tw
    tcy = (Y1 - Y0) / th  # negative (north-up)

    target = (
        spark.range(th)
        .select(F.col("id").alias("trow"))
        .crossJoin(spark.range(tw).select(F.col("id").alias("tcol")))
    )
    xm = F.lit(X0) + (F.col("tcol") + F.lit(0.5)) * F.lit(tcx)
    ym = F.lit(Y0) + (F.col("trow") + F.lit(0.5)) * F.lit(tcy)
    lon = F.degrees(xm / F.lit(R))
    lat = F.degrees(F.lit(2.0) * F.atan(F.exp(ym / F.lit(R))) - F.lit(math.pi / 2))
    srow = F.floor((lat - F.lit(y0g)) / F.lit(cy)).cast("long")
    scol = F.floor((lon - F.lit(x0g)) / F.lit(cx)).cast("long")
    tgt = target.select(
        "trow", "tcol", xm.alias("xm"), ym.alias("ym"),
        srow.alias("row"), scol.alias("col"),
    )
    return tgt.join(px.select("row", "col", "value"), ["row", "col"], "left").select(
        "trow", "tcol", F.round("xm", 6).alias("xm"), F.round("ym", 6).alias("ym"), "value"
    )


def webmercator_numpy_oracle(
    full: np.ndarray,
    ndv: float,
    src_origin: tuple[float, float],
    src_cellsize: tuple[float, float],
    out_shape: tuple[int, int],
    lat_clip: float = 85.05112878,
) -> np.ndarray:
    h, w = full.shape
    th, tw = out_shape
    x0g, y0g = src_origin
    cx, cy = src_cellsize
    lat_top = min(y0g, lat_clip)
    lat_bot = max(y0g + h * cy, -lat_clip)
    X0 = R * math.radians(x0g)
    X1 = R * math.radians(x0g + w * cx)
    Y0 = R * math.log(math.tan(math.pi / 4 + math.radians(lat_top) / 2))
    Y1 = R * math.log(math.tan(math.pi / 4 + math.radians(lat_bot) / 2))
    tcx = (X1 - X0) / tw
    tcy = (Y1 - Y0) / th
    tr, tc = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    xm = X0 + (tc + 0.5) * tcx
    ym = Y0 + (tr + 0.5) * tcy
    lon = np.degrees(xm / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(ym / R)) - np.pi / 2)
    srow = np.floor((lat - y0g) / cy).astype(np.int64)
    scol = np.floor((lon - x0g) / cx).astype(np.int64)
    out = np.full(out_shape, ndv)
    ok = (srow >= 0) & (srow < h) & (scol >= 0) & (scol < w)
    out[ok] = full[srow[ok], scol[ok]]
    return out


def warp_numpy_oracle(
    full: np.ndarray,
    ndv: float,
    src_origin: tuple[float, float],
    src_cellsize: tuple[float, float],
    out_shape: tuple[int, int],
    phi_s: float = 0.0,
) -> np.ndarray:
    """Independent numpy implementation of the same warp (pytest
    differential oracle, mirroring tests/test_georasters.py:315-397)."""
    h, w = full.shape
    th, tw = out_shape
    x0g, y0g = src_origin
    cx, cy = src_cellsize
    X0, Y1, X1, Y0 = cea_bounds(x0g, y0g + h * cy, x0g + w * cx, y0g, phi_s)
    tcx = (X1 - X0) / tw
    tcy = (Y1 - Y0) / th
    k = math.cos(math.radians(phi_s))
    tr, tc = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    xm = X0 + (tc + 0.5) * tcx
    ym = Y0 + (tr + 0.5) * tcy
    lon = np.degrees(xm / (R * k))
    lat = np.degrees(np.arcsin(ym * (k / R)))
    srow = np.floor((lat - y0g) / cy).astype(np.int64)
    scol = np.floor((lon - x0g) / cx).astype(np.int64)
    out = np.full(out_shape, ndv)
    ok = (srow >= 0) & (srow < h) & (scol >= 0) & (scol < w)
    out[ok] = full[srow[ok], scol[ok]]
    return out
