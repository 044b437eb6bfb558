"""Viewshed — the gdal_viewshed role, exact-gateable semantics.

GDAL's ``gdal_viewshed`` computes which cells are visible from an
observer over a DEM.  This module implements the classic R3 family
(sample the sight line at every dominant-axis step, nearest-cell
sampling) with semantics chosen so the whole test is INTEGER-exact:

* Observer at the center of cell (r0, c0), eye elevation
  z0 = DEM[r0, c0] + eye_height.
* A target cell t at Chebyshev offset (dr, dc), D = max(|dr|, |dc|),
  is BLOCKED iff any intermediate step s in 1..D-1 satisfies

      (DEM[step_s] - z0) * D  >  (DEM[t] + target_height - z0) * s

  which is the line-of-sight slope comparison
  (DEM_s - z0)/s > (z_t - z0)/D with the positive denominators
  cleared — every operand is an integer, so Spark and DuckDB agree
  bit-for-bit (ties graze the sight line and stay visible, the
  conventional rule).
* Step s samples the NEAREST cell on the minor axis via pure integer
  floor division: minor = (2*s*d_minor + D) // (2*D) relative to the
  observer (exact round-half-up of s*d_minor/D, no floating point).
* Nodata cells never block (they are absent from the valid pixel
  table) and nodata targets are not reported — mask ≅ NULL like every
  other operator.  No earth-curvature term (gdal_viewshed's -cc is a
  documented divergence; add the quadratic drop as a Column if needed).

Plan shape: targets = the valid cells of the radius window; one
``explode(sequence(1, D-1))`` builds the step table (O(radius³) rows —
bounded by the OBSERVER RADIUS, never the raster size), one equi-join
gathers the sampled DEM values, one (target) aggregate counts
blockers.  All comparisons are whole-stage-codegen integer Columns —
zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def viewshed(px: DataFrame, observer: tuple[int, int],
             radius: int, eye_height: int = 0,
             target_height: int = 0) -> DataFrame:
    """(row, col, d_cheb, visible, blocked_steps) for every valid cell
    within Chebyshev ``radius`` of ``observer`` (the observer cell
    itself is reported visible with d_cheb 0).  ``px``: valid-only
    (row, col, value) with integer values."""
    r0, c0 = int(observer[0]), int(observer[1])
    spark = px.sparkSession

    base = px.select("row", "col", F.col("value").cast("long").alias("z"))
    obs = base.filter((F.col("row") == r0) & (F.col("col") == c0)) \
              .select((F.col("z") + F.lit(int(eye_height))).alias("z0"))
    # gdal_viewshed errors on an invalid observer; a nodata/out-of-grid
    # observer would otherwise empty the cross join and return 0 rows —
    # indistinguishable from a legitimately empty window
    if obs.isEmpty():
        raise ValueError(
            f"viewshed: observer cell ({r0}, {c0}) is nodata or outside "
            "the raster")

    tgt = base.filter(
        (F.abs(F.col("row") - r0) <= radius)
        & (F.abs(F.col("col") - c0) <= radius)
    ).select(
        "row", "col",
        (F.col("z") + F.lit(int(target_height))).alias("zt"),
        (F.col("row") - r0).alias("dr"),
        (F.col("col") - c0).alias("dc"),
    ).withColumn(
        "d", F.greatest(F.abs(F.col("dr")), F.abs(F.col("dc")))
    ).crossJoin(F.broadcast(obs))

    steps = tgt.filter(F.col("d") >= 2).select(
        "row", "col", "zt", "dr", "dc", "d", "z0",
        F.explode(F.sequence(F.lit(1), F.col("d") - 1)).alias("s"),
    ).select(
        "row", "col", "zt", "d", "z0", "s",
        # exact round-half-up of s*dr/d and s*dc/d in integer math:
        # floor((2*s*dx + d) / (2*d)) — floor division, negatives included
        (F.lit(r0) + F.floor((2 * F.col("s") * F.col("dr") + F.col("d"))
                             / (2 * F.col("d"))).cast("long")).alias("srow"),
        (F.lit(c0) + F.floor((2 * F.col("s") * F.col("dc") + F.col("d"))
                             / (2 * F.col("d"))).cast("long")).alias("scol"),
    )
    sampled = steps.join(
        base.select(F.col("row").alias("srow"), F.col("col").alias("scol"),
                    F.col("z").alias("zs")),
        ["srow", "scol"],
    )
    blocked = sampled.groupBy("row", "col").agg(
        F.sum(
            F.when((F.col("zs") - F.col("z0")) * F.col("d")
                   > (F.col("zt") - F.col("z0")) * F.col("s"), 1)
            .otherwise(0)
        ).alias("blocked_steps")
    )
    return tgt.join(blocked, ["row", "col"], "left").select(
        "row", "col",
        F.col("d").alias("d_cheb"),
        F.coalesce(F.col("blocked_steps"), F.lit(0)).alias("blocked_steps"),
        (F.coalesce(F.col("blocked_steps"), F.lit(0)) == 0).alias("visible"),
    )


def viewshed_sql(px_cte: str, observer: tuple[int, int], radius: int,
                 eye_height: int = 0, target_height: int = 0) -> str:
    """DuckDB oracle mirroring viewshed() term for term over a
    ``px(row, col, value)`` CTE (integer-exact, so hash-comparable)."""
    r0, c0 = int(observer[0]), int(observer[1])
    return f"""WITH {px_cte},
base AS (SELECT row, col, CAST(value AS BIGINT) AS z FROM px),
obs AS (SELECT z + {int(eye_height)} AS z0 FROM base
        WHERE row = {r0} AND col = {c0}),
tgt AS (
  SELECT row, col, z + {int(target_height)} AS zt,
         row - {r0} AS dr, col - {c0} AS dc,
         GREATEST(ABS(row - {r0}), ABS(col - {c0})) AS d, z0
  FROM base CROSS JOIN obs
  WHERE ABS(row - {r0}) <= {radius} AND ABS(col - {c0}) <= {radius}),
steps AS (
  SELECT t.row, t.col, t.zt, t.d, t.z0, s.range AS s,
         {r0} + CAST(FLOOR(CAST(2 * s.range * t.dr + t.d AS DOUBLE)
                           / (2 * t.d)) AS BIGINT) AS srow,
         {c0} + CAST(FLOOR(CAST(2 * s.range * t.dc + t.d AS DOUBLE)
                           / (2 * t.d)) AS BIGINT) AS scol
  FROM tgt t CROSS JOIN range(1, {2 * radius}) s
  WHERE t.d >= 2 AND s.range < t.d),
blocked AS (
  SELECT st.row, st.col,
         SUM(CASE WHEN (b.z - st.z0) * st.d > (st.zt - st.z0) * st.s
                  THEN 1 ELSE 0 END) AS blocked_steps
  FROM steps st JOIN base b ON b.row = st.srow AND b.col = st.scol
  GROUP BY st.row, st.col)
SELECT t.row, t.col, CAST(t.d AS BIGINT) AS d_cheb,
       CAST(COALESCE(bl.blocked_steps, 0) AS BIGINT) AS blocked_steps,
       COALESCE(bl.blocked_steps, 0) = 0 AS visible
FROM tgt t LEFT JOIN blocked bl ON bl.row = t.row AND bl.col = t.col"""
