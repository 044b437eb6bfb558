"""Terrain derivatives: slope / aspect / hillshade (Horn 1981 — the
gdaldem algorithm; the reference reaches these through its numpy-array
escape hatch `gr.raster` + scipy/gdaldem, SURVEY §2.6's free-ufunc
family, georasters.py README:70-76).

Spark-first plan: Horn's 3×3 weighted differences are LINEAR in the
neighbors, so both directional sums come from ONE 8-offset neighbor
equi-join with per-offset integer weights:

    wx(dr, dc) = dc · (2 if dr == 0 else 1)      (east − west)
    wy(dr, dc) = dr · (2 if dc == 0 else 1)      (south − north)
    dz/dx = Σ wx·z_n / (8·xres),   dz/dy = Σ wy·z_n / (8·yres)

The weighted sums are EXACT BIGINTs for integer rasters (the usual
oracle contract), the derivative/trig chain is pure whole-stage-codegen
Column math, and the per-cell shuffle is a single hash aggregate on
(row, col) — the same shape as focal_stats/local_moran.

Conventions (documented, deterministic):
  * cells missing any of their 8 neighbors (raster edge or adjacent
    nodata) emit NULL derivatives — gdaldem likewise skips edges.
  * aspect: compass degrees [0, 360), 0 = north, clockwise —
    aspect = pmod(90 − degrees(atan2(dzdy, −dzdx)), 360); FLAT cells
    (both weighted sums exactly 0 — an integer test, engine-stable)
    get NULL aspect (gdaldem emits -9999 there).
  * hillshade: 255·max(0, cos(zen)cos(s) + sin(zen)sin(s)cos(az−asp)),
    azimuth/altitude in degrees (defaults 315/45), flat cells get the
    constant 255·cos(zen)·1 (sin(s)=0 kills the aspect term).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HORN_OFFSETS = [
    (dr, dc, dc * (2 if dr == 0 else 1), dr * (2 if dc == 0 else 1))
    for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)
]


def horn_sums(px: DataFrame) -> DataFrame:
    """(row, col, value, sx, sy, ncnt): exact-integer Horn weighted
    neighbor sums; ONE neighbor join + one (row, col) aggregate."""
    spark = px.sparkSession
    offs = spark.createDataFrame(HORN_OFFSETS, "dr int, dc int, wx int, wy int")
    a = px.select("row", "col", F.col("value").cast("long").alias("value"))
    b = px.select(
        F.col("row").alias("r2"), F.col("col").alias("c2"),
        F.col("value").cast("long").alias("vb"),
    )
    cand = (
        a.crossJoin(F.broadcast(offs))
        .select(
            "row", "col", "value",
            (F.col("row") + F.col("dr")).alias("r2"),
            (F.col("col") + F.col("dc")).alias("c2"),
            "wx", "wy",
        )
        .join(b, ["r2", "c2"])
    )
    return cand.groupBy("row", "col").agg(
        F.first("value").alias("value"),
        F.sum(F.col("wx") * F.col("vb")).alias("sx"),
        F.sum(F.col("wy") * F.col("vb")).alias("sy"),
        F.count(F.lit(1)).alias("ncnt"),
    )


def slope_aspect_hillshade(
    px: DataFrame,
    cellsize: tuple[float, float],
    zfactor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    round_dp: int = 6,
) -> DataFrame:
    """Per-cell (row, col, value, slope_deg, aspect_deg, hillshade) —
    NULL derivatives on cells without a full 3×3 window."""
    cx, cy = cellsize
    sums = horn_sums(px)
    full = F.col("ncnt") == 8
    dzdx = F.col("sx") * F.lit(float(zfactor)) / F.lit(8.0 * abs(cx))
    dzdy = F.col("sy") * F.lit(float(zfactor)) / F.lit(8.0 * abs(cy))
    slope_rad = F.atan(F.sqrt(dzdx * dzdx + dzdy * dzdy))
    slope_deg = slope_rad * F.lit(180.0) / F.lit(math.pi)
    flat = (F.col("sx") == 0) & (F.col("sy") == 0)
    a_deg = F.atan2(dzdy, -dzdx) * F.lit(180.0) / F.lit(math.pi)
    aspect = F.pmod(F.lit(90.0) - a_deg, F.lit(360.0))
    zen = math.radians(90.0 - altitude)
    az = math.radians(azimuth)
    asp_rad = F.when(flat, F.lit(0.0)).otherwise(aspect * F.lit(math.pi) / F.lit(180.0))
    hs = F.lit(255.0) * F.greatest(
        F.lit(0.0),
        F.lit(math.cos(zen)) * F.cos(slope_rad)
        + F.lit(math.sin(zen)) * F.sin(slope_rad) * F.cos(F.lit(az) - asp_rad),
    )
    return sums.select(
        "row", "col", "value",
        F.when(full, F.round(slope_deg, round_dp)).alias("slope_deg"),
        F.when(full & ~flat, F.round(aspect, round_dp)).alias("aspect_deg"),
        F.when(full, F.round(hs, round_dp)).alias("hillshade"),
    )


def terrain_sql(px_cte: str, cellsize: tuple[float, float], zfactor: float = 1.0,
                azimuth: float = 315.0, altitude: float = 45.0,
                round_dp: int = 6) -> str:
    """DuckDB oracle emitting the identical expression chain (exact
    BIGINT weighted sums → the same double math term-for-term)."""
    from .reproject import dlit

    cx, cy = cellsize
    offsets = ", ".join(f"({dr}, {dc}, {wx}, {wy})" for dr, dc, wx, wy in HORN_OFFSETS)
    zen = math.radians(90.0 - altitude)
    az = math.radians(azimuth)
    return f"""WITH {px_cte},
offs(dr, dc, wx, wy) AS (VALUES {offsets}),
cand AS (
  SELECT a.row, a.col, a.value, a.row + o.dr AS r2, a.col + o.dc AS c2, o.wx, o.wy
  FROM px a CROSS JOIN offs o),
sums AS (
  SELECT cand.row, cand.col,
         CAST(MIN(cand.value) AS BIGINT) AS value,
         CAST(SUM(cand.wx * b.value) AS BIGINT) AS sx,
         CAST(SUM(cand.wy * b.value) AS BIGINT) AS sy,
         COUNT(*) AS ncnt
  FROM cand JOIN px b ON b.row = cand.r2 AND b.col = cand.c2
  GROUP BY 1, 2),
d AS (
  SELECT row, col, value, ncnt, sx, sy,
         sx * {dlit(float(zfactor))} / {dlit(8.0 * abs(cx))} AS dzdx,
         sy * {dlit(float(zfactor))} / {dlit(8.0 * abs(cy))} AS dzdy
  FROM sums),
t AS (
  SELECT row, col, value, ncnt, sx, sy, dzdx, dzdy,
         atan(sqrt(dzdx * dzdx + dzdy * dzdy)) AS slope_rad,
         ((90.0 - atan2(dzdy, -dzdx) * 180.0 / pi()) % 360.0 + 360.0) % 360.0 AS aspect_raw
  FROM d)
SELECT row, col, value,
  CASE WHEN ncnt = 8 THEN ROUND(slope_rad * 180.0 / pi(), {round_dp}) END AS slope_deg,
  CASE WHEN ncnt = 8 AND NOT (sx = 0 AND sy = 0) THEN ROUND(aspect_raw, {round_dp}) END AS aspect_deg,
  CASE WHEN ncnt = 8 THEN ROUND(255.0 * GREATEST(0.0,
       {dlit(math.cos(zen))} * cos(slope_rad)
       + {dlit(math.sin(zen))} * sin(slope_rad)
         * cos({dlit(az)} - CASE WHEN sx = 0 AND sy = 0 THEN 0.0
                                 ELSE aspect_raw * pi() / 180.0 END)), {round_dp}) END AS hillshade
FROM t"""


def terrain_numpy_oracle(full: np.ndarray, ndv: float, cellsize: tuple[float, float],
                         zfactor: float = 1.0, azimuth: float = 315.0,
                         altitude: float = 45.0):
    """Independent numpy Horn implementation (array shifts) for pytest:
    returns (slope_deg, aspect_deg, hillshade) with nan where NULL."""
    cx, cy = cellsize
    h, w = full.shape
    valid = full != ndv
    sx = np.zeros((h, w))
    sy = np.zeros((h, w))
    cnt = np.zeros((h, w), dtype=np.int64)
    for dr, dc, wx, wy in HORN_OFFSETS:
        # cell (r, c) gathers neighbor (r+dr, c+dc): dst = the cells,
        # src = the +offset-shifted slice (direction matters — sx/sy
        # are SIGNED; a flipped shift negates both and rotates the
        # aspect by 180°)
        dst = (slice(max(0, -dr), h - max(0, dr)), slice(max(0, -dc), w - max(0, dc)))
        src = (slice(max(0, dr), h + min(0, dr) if dr < 0 else h),
               slice(max(0, dc), w + min(0, dc) if dc < 0 else w))
        ok = valid[dst] & valid[src]
        sx[dst] += np.where(ok, wx * full[src], 0.0)
        sy[dst] += np.where(ok, wy * full[src], 0.0)
        cnt[dst] += ok
    full8 = valid & (cnt == 8)
    dzdx = sx * zfactor / (8.0 * abs(cx))
    dzdy = sy * zfactor / (8.0 * abs(cy))
    slope_rad = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    slope = np.where(full8, np.degrees(slope_rad), np.nan)
    a = np.degrees(np.arctan2(dzdy, -dzdx))
    aspect = np.mod(90.0 - a, 360.0)
    flat = (sx == 0) & (sy == 0)
    aspect = np.where(full8 & ~flat, aspect, np.nan)
    zen = math.radians(90.0 - altitude)
    az = math.radians(azimuth)
    asp_rad = np.where(flat, 0.0, np.radians(np.mod(90.0 - a, 360.0)))
    hs = 255.0 * np.maximum(
        0.0,
        math.cos(zen) * np.cos(slope_rad)
        + math.sin(zen) * np.sin(slope_rad) * np.cos(az - asp_rad),
    )
    hs = np.where(full8, hs, np.nan)
    return slope, aspect, hs
