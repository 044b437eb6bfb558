"""Point gridding — the gdal_grid role.

GDAL's ``gdal_grid`` interpolates a raster from scattered points; its
algorithms are ``average`` (moving-window mean), ``nearest``,
``invdist`` (inverse-distance-weighted) and the ``metrics`` family
(count/min/max...).  This module re-expresses them Spark-first:

* The target lattice is generated from two ``spark.range`` calls (no
  data scan) — same shape as every warp plan.
* The radius search is a BUCKET JOIN, never lattice x points: points
  land in radius-sized square buckets keyed by floor((x−x0)/radius),
  each target cell explodes its 3x3 neighbor bucket keys, and one
  equi-join + a true-distance filter yields the candidate pairs.  Pair
  count is bounded by local point density, not |points| · |cells| —
  the plan that survives 10^9 points x 10^9 cells.
* ``average``/count/min/max aggregate exact integer sums (one hash
  aggregate); ``nearest`` resolves via min-d² then min-point-id — a
  deterministic tie-break both engines compute identically; ``invdist``
  is the classic Σv/d^p / Σ1/d^p (floating-point; pytest-gated against
  numpy, not hash-gated — the only non-exact algorithm, as documented).

Cells with no point inside the radius emit NULL stats (GDAL nodata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _candidates(points: DataFrame, origin: tuple[float, float],
                cellsize: tuple[float, float], out_shape: tuple[int, int],
                radius: float) -> DataFrame:
    """(trow, tcol, pid, value, d2) pairs within ``radius`` of each
    target cell center, via the 3x3 bucket join."""
    spark = points.sparkSession
    th, tw = out_shape
    x0, y0 = origin
    cx, cy = cellsize

    lattice = (
        spark.range(th).select(F.col("id").alias("trow"))
        .crossJoin(spark.range(tw).select(F.col("id").alias("tcol")))
        .select(
            "trow", "tcol",
            (F.lit(x0) + (F.col("tcol") + F.lit(0.5)) * F.lit(cx)).alias("cxc"),
            (F.lit(y0) + (F.col("trow") + F.lit(0.5)) * F.lit(cy)).alias("cyc"),
        )
    )
    pts = points.select(
        "pid", "value",
        F.col("x"), F.col("y"),
        F.floor((F.col("x") - F.lit(x0)) / F.lit(radius)).alias("bx"),
        F.floor((F.col("y") - F.lit(y0)) / F.lit(radius)).alias("by"),
    )
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])).alias("_o")
    keyed = lattice.select(
        "trow", "tcol", "cxc", "cyc", off,
    ).select(
        "trow", "tcol", "cxc", "cyc",
        (F.floor((F.col("cxc") - F.lit(x0)) / F.lit(radius))
         + F.col("_o.dx")).alias("bx"),
        (F.floor((F.col("cyc") - F.lit(y0)) / F.lit(radius))
         + F.col("_o.dy")).alias("by"),
    )
    d2 = ((F.col("x") - F.col("cxc")) * (F.col("x") - F.col("cxc"))
          + (F.col("y") - F.col("cyc")) * (F.col("y") - F.col("cyc")))
    return keyed.join(pts, ["bx", "by"]).select(
        "trow", "tcol", "pid", "value", d2.alias("d2"),
    ).filter(F.col("d2") <= F.lit(radius * radius))


def grid_points(points: DataFrame, origin: tuple[float, float],
                cellsize: tuple[float, float], out_shape: tuple[int, int],
                radius: float, round_dp: int = 6) -> DataFrame:
    """Exact gdal_grid algorithms in one pass: (trow, tcol, n_pts,
    avg_value, nearest_value, vmin, vmax) for every cell with >= 1
    point in radius.  ``points``: (pid, x, y, value)."""
    cand = _candidates(points, origin, cellsize, out_shape, radius)
    # ONE aggregate: nearest = min_by on the lexicographic (d2, pid)
    # struct — the same min-d²-then-min-pid tie-break as a second pass,
    # without re-executing the bucket-join subtree and re-joining
    return cand.groupBy("trow", "tcol").agg(
        F.count("*").alias("n_pts"),
        F.round(F.sum("value").cast("double") / F.count("*"), round_dp)
         .alias("avg_value"),
        F.min_by("value", F.struct("d2", "pid")).alias("nearest_value"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    ).select("trow", "tcol", "n_pts", "avg_value", "nearest_value",
             "vmin", "vmax")


def grid_points_invdist(points: DataFrame, origin: tuple[float, float],
                        cellsize: tuple[float, float],
                        out_shape: tuple[int, int], radius: float,
                        power: float = 2.0,
                        smoothing: float = 0.0) -> DataFrame:
    """gdal_grid invdist: Σ v/(d²+s²)^(p/2) / Σ 1/(d²+s²)^(p/2); a
    point exactly on the cell center (d²+s² == 0) short-circuits to its
    value (GDAL convention).  Floating-point accumulation — gated by
    the numpy-mirror pytest, not the hash oracle."""
    cand = _candidates(points, origin, cellsize, out_shape, radius)
    dd = F.col("d2") + F.lit(smoothing * smoothing)
    w = F.pow(dd, F.lit(-power / 2.0))
    agg = cand.groupBy("trow", "tcol").agg(
        F.min_by("value", "d2").alias("_exact"),
        F.min("d2").alias("_mind2"),
        F.sum(F.when(dd != 0, w * F.col("value"))).alias("_num"),
        F.sum(F.when(dd != 0, w)).alias("_den"),
    )
    hit = (F.col("_mind2") + F.lit(smoothing * smoothing)) == 0
    return agg.select(
        "trow", "tcol",
        F.when(hit, F.col("_exact").cast("double"))
         .otherwise(F.col("_num") / F.col("_den")).alias("value"))


def grid_points_sql(points_cte: str, origin: tuple[float, float],
                    cellsize: tuple[float, float],
                    out_shape: tuple[int, int], radius: float,
                    round_dp: int = 6) -> str:
    """DuckDB oracle for grid_points: brute lattice x points filter
    (the oracle may be O(n·m); the engine may not), identical center /
    distance arithmetic, arg_min(value, pid) at min d² for nearest.
    ``points_cte`` must define ``pts(pid, x, y, value)``."""
    th, tw = out_shape
    x0, y0 = origin
    cx, cy = cellsize
    from .reproject import dlit

    r2 = dlit(radius * radius)
    return f"""WITH {points_cte},
lattice AS (
  SELECT CAST(tr.range AS BIGINT) AS trow, CAST(tc.range AS BIGINT) AS tcol,
         {dlit(x0)} + (tc.range + 0.5) * {dlit(cx)} AS cxc,
         {dlit(y0)} + (tr.range + 0.5) * {dlit(cy)} AS cyc
  FROM range({th}) tr CROSS JOIN range({tw}) tc),
cand AS (
  SELECT trow, tcol, pid, value,
         (x - cxc) * (x - cxc) + (y - cyc) * (y - cyc) AS d2
  FROM lattice CROSS JOIN pts
  WHERE (x - cxc) * (x - cxc) + (y - cyc) * (y - cyc) <= {r2}),
stats AS (
  SELECT trow, tcol, CAST(COUNT(*) AS BIGINT) AS n_pts,
         ROUND(CAST(SUM(value) AS DOUBLE) / COUNT(*), {round_dp}) AS avg_value,
         CAST(MIN(value) AS BIGINT) AS vmin, CAST(MAX(value) AS BIGINT) AS vmax,
         MIN(d2) AS mind2
  FROM cand GROUP BY trow, tcol),
near AS (
  SELECT c.trow, c.tcol, CAST(ARG_MIN(c.value, c.pid) AS BIGINT) AS nearest_value
  FROM cand c JOIN stats s ON s.trow = c.trow AND s.tcol = c.tcol
  WHERE c.d2 = s.mind2
  GROUP BY c.trow, c.tcol)
SELECT s.trow, s.tcol, s.n_pts, s.avg_value, n.nearest_value, s.vmin, s.vmax
FROM stats s JOIN near n ON n.trow = s.trow AND n.tcol = s.tcol"""
