"""Proximity / exact Euclidean distance transform — the gdal_proximity
role: per-cell distance to the nearest TARGET cell.

Spark-first plan (exact, fully distributed): the 2-D EDT is SEPARABLE
(Felzenszwalb & Huttenlocher 2004 / Meijster 2000 — standard public
algorithms):

  phase 1 (groupBy col):  g(r, c) = |r − r'| to the nearest target in
                          the SAME column (one down-scan + one up-scan)
  phase 2 (groupBy row):  dist²(r, c) = min_c' ((c − c')² + g(r, c')²)
                          via the 1-D lower envelope of parabolas

Each phase is ONE grouped-map stage whose group is a single column /
row — task memory O(side length), never O(grid). Distances are exact:
dist2 is an INTEGER (sum of two squares), so the oracle (a brute-force
min over all (cell, target) pairs) hash-matches bit-for-bit; dist
ships as round(sqrt(int), 6).

The 1-D envelope scan is sequential by nature (a Python loop per
row/group). At ~10^5-cell rows that is milliseconds; for
10^6-cell-wide grids swap the inner loop for a compiled kernel — the
DataFrame plan is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel: farther than any real per-column distance. Caps the grid
# side at 2^24 cells per dimension (16.7M — beyond any raster tiling;
# document: real dist2 stays < 2^49 < the 2^50 no-target threshold).
_INF = np.int64(1) << 25


def _edt_1d_sq(g2: np.ndarray) -> np.ndarray:
    """Felzenszwalb 1-D squared distance transform of sampled function
    f(i) = g2[i]: out[i] = min_j ((i-j)^2 + g2[j])."""
    n = len(g2)
    out = np.empty(n, dtype=np.int64)
    v = np.empty(n, dtype=np.int64)      # locations of parabolas
    z = np.empty(n + 1, dtype=np.float64)  # boundaries
    k = 0
    v[0] = 0
    z[0] = -np.inf
    z[1] = np.inf
    for q in range(1, n):
        s = ((g2[q] + q * q) - (g2[v[k]] + v[k] * v[k])) / (2.0 * (q - v[k]))
        while s <= z[k]:
            k -= 1
            s = ((g2[q] + q * q) - (g2[v[k]] + v[k] * v[k])) / (2.0 * (q - v[k]))
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d = q - v[k]
        out[q] = d * d + g2[v[k]]
    return out


def proximity(px: DataFrame, target: F.Column) -> DataFrame:
    """(row, col, dist2, dist): exact Euclidean distance to the nearest
    cell where `target` (a boolean Column over px's columns) holds.
    Cells in rows/cols with no reachable target get NULL. px must be a
    DENSE grid table (row, col, value)."""
    marked = px.select("row", "col", target.cast("int").alias("is_t"))

    def col_pass(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("row")
        r = pdf["row"].to_numpy(np.int64)
        t = pdf["is_t"].to_numpy(np.int64)
        n = len(r)
        g = np.full(n, _INF, dtype=np.int64)
        last = None  # only real targets update g — the sentinel must
        for i in range(n):  # never leak in as a fake finite distance
            if t[i]:
                last = r[i]
            if last is not None:
                g[i] = min(g[i], r[i] - last)
        last = None
        for i in range(n - 1, -1, -1):  # up-scan
            if t[i]:
                last = r[i]
            if last is not None:
                g[i] = min(g[i], last - r[i])
        return pd.DataFrame({"row": r, "col": pdf["col"].to_numpy(np.int64), "g": g})

    g = marked.groupBy("col").applyInPandas(col_pass, schema="row long, col long, g long")

    def row_pass(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("col")
        c = pdf["col"].to_numpy(np.int64)
        gg = pdf["g"].to_numpy(np.int64)
        # dense columns assumed: positions = col index offsets
        c0 = c - c[0]
        g2 = gg * gg  # <= 2^50; exact in int64 AND in float64
        d2 = _edt_1d_sq_dense(c0, g2)
        return pd.DataFrame({"row": pdf["row"].to_numpy(np.int64), "col": c, "dist2": d2})

    out = g.groupBy("row").applyInPandas(row_pass, schema="row long, col long, dist2 long")
    far = 1 << 50  # >= this means "no target anywhere" (see _INF note)
    return out.select(
        "row", "col",
        F.when(F.col("dist2") < int(far), F.col("dist2")).alias("dist2"),
        F.when(F.col("dist2") < int(far),
               F.round(F.sqrt(F.col("dist2")), 6)).alias("dist"),
    )


def _edt_1d_sq_dense(pos: np.ndarray, g2: np.ndarray) -> np.ndarray:
    """Envelope over possibly-gappy positions: out[i] = min_j
    ((pos[i]-pos[j])^2 + g2[j]). Falls back to the dense-index
    algorithm when positions are contiguous."""
    n = len(pos)
    if n and pos[-1] - pos[0] == n - 1:
        return _edt_1d_sq(g2)
    out = np.empty(n, dtype=np.int64)
    v = np.empty(n, dtype=np.int64)
    z = np.empty(n + 1, dtype=np.float64)
    k = 0
    v[0] = 0
    z[0] = -np.inf
    z[1] = np.inf
    for q in range(1, n):
        pq = float(pos[q])
        s = ((g2[q] + pq * pq) - (g2[v[k]] + float(pos[v[k]]) ** 2)) / (
            2.0 * (pq - float(pos[v[k]]))
        )
        while s <= z[k]:
            k -= 1
            s = ((g2[q] + pq * pq) - (g2[v[k]] + float(pos[v[k]]) ** 2)) / (
                2.0 * (pq - float(pos[v[k]]))
            )
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf
    k = 0
    for q in range(n):
        while z[k + 1] < pos[q]:
            k += 1
        d = pos[q] - pos[v[k]]
        out[q] = d * d + g2[v[k]]
    return out


def proximity_sql(px_cte: str, target_sql: str) -> str:
    """Brute-force oracle: dist2 = MIN over all targets of the squared
    offset (exact integers) — independent of the separable algorithm."""
    return f"""WITH {px_cte},
tgt AS (SELECT row AS tr, col AS tc FROM px WHERE {target_sql}),
d AS (
  SELECT px.row, px.col,
         MIN((px.row - tgt.tr) * (px.row - tgt.tr)
             + (px.col - tgt.tc) * (px.col - tgt.tc)) AS dist2
  FROM px CROSS JOIN tgt
  GROUP BY 1, 2)
SELECT px.row, px.col, d.dist2,
       ROUND(SQRT(CAST(d.dist2 AS DOUBLE)), 6) AS dist
FROM px LEFT JOIN d ON d.row = px.row AND d.col = px.col"""


def _offsets_for(dist2s: list[int]) -> list[tuple[int, int, int]]:
    """(dist2, dr, dc) lattice offsets with dr² + dc² = dist2, for each
    requested squared distance — the sum-of-two-squares circle points."""
    out = []
    for d2 in dist2s:
        r = int(np.sqrt(d2))
        while (r + 1) * (r + 1) <= d2:
            r += 1
        for dr in range(-r, r + 1):
            rem = d2 - dr * dr
            if rem < 0:
                continue
            dc = int(np.sqrt(rem))
            while dc * dc < rem:
                dc += 1
            if dc * dc == rem:
                out.append((d2, dr, dc))
                if dc:
                    out.append((d2, dr, -dc))
    return out


def fillnodata(grid: DataFrame, valid: F.Column,
               value_col: str = "value") -> DataFrame:
    """gdal_fillnodata role: every nodata cell takes the VALUE of its
    nearest valid cell — exact Euclidean distance, ties broken
    canonically by smallest (row, col) of the candidate valid cell (an
    engine-independent rule; GDAL's own algorithm is inverse-distance
    smoothing, documented divergence). `grid` must be a DENSE lattice
    (row, col, value_col, ...); `valid` a boolean Column over it.
    Returns (row, col, value, dist2): valid cells keep their value at
    dist2 = 0; unfillable cells (no valid cell anywhere) keep NULL
    value with NULL dist2.

    Plan: the exact separable EDT (proximity) gives every hole its
    integer dist² in two grouped-map stages; the DISTINCT dist² values
    (metadata-scale: lattice distances, not cells) enumerate their
    sum-of-two-squares circle offsets driver-side; holes × broadcast
    offsets equi-join the valid cells and one min_by picks the
    canonical nearest — no radius search, no skewed range join."""
    spark = grid.sparkSession
    marked = grid.select("row", "col", F.col(value_col).alias("value"),
                         valid.alias("is_v"))
    d = proximity(marked, F.col("is_v"))
    # the two-stage EDT is the dominant cost: pin it once — the plan
    # below reads base for the distinct-dist2 job AND twice in the
    # final join tree
    base = marked.join(d, ["row", "col"]).localCheckpoint(eager=True)
    holes = base.filter(~F.col("is_v") & F.col("dist2").isNotNull())
    dist2s = [int(r["dist2"])
              for r in holes.select("dist2").distinct().collect()]
    if not dist2s:
        return base.select(
            "row", "col",
            F.when(F.col("is_v"), F.col("value")).alias("value"),
            F.when(F.col("is_v"), F.lit(0).cast("long")).alias("dist2"))
    offs = spark.createDataFrame(_offsets_for(dist2s),
                                 "dist2 long, dr int, dc int")
    vals = marked.filter(F.col("is_v")).select(
        F.col("row").alias("vr"), F.col("col").alias("vc"),
        F.col("value").alias("vv"))
    fill = (holes.select("row", "col", "dist2")
            .join(F.broadcast(offs), "dist2")
            .select("row", "col", "dist2",
                    (F.col("row") + F.col("dr")).alias("vr"),
                    (F.col("col") + F.col("dc")).alias("vc"))
            .join(vals, ["vr", "vc"])
            .groupBy("row", "col")
            .agg(F.expr("min_by(vv, struct(vr, vc))").alias("fv"),
                 F.min("dist2").alias("fd2")))
    return (base.join(fill, ["row", "col"], "left")
            .select("row", "col",
                    F.when(F.col("is_v"), F.col("value"))
                    .otherwise(F.col("fv")).alias("value"),
                    F.when(F.col("is_v"), F.lit(0).cast("long"))
                    .otherwise(F.col("fd2")).alias("dist2")))


def fillnodata_sql(px_cte: str, h: int, w: int) -> str:
    """Brute-force oracle: the dense lattice minus the valid px rows =
    holes; each hole's fill = arg-min over ALL valid cells of the
    composite key d2·10^12 + row·10^6 + col (exact BIGINT — the same
    (distance, row, col) lexicographic rule). The packing bounds the
    lattice: cols < 10^6 and h² + w² < 9.2·10^6 (else the key would
    collide/overflow int64) — far beyond any gate window, guarded
    explicitly."""
    if w >= 10**6 or h * h + w * w >= 92 * 10**5:
        raise ValueError(
            f"fillnodata_sql: lattice {h}x{w} exceeds the composite-key "
            "packing bounds (col < 1e6, h²+w² < 9.2e6)")
    return f"""WITH {px_cte},
grid AS (SELECT r.range AS row, c.range AS col
         FROM range({h}) r CROSS JOIN range({w}) c),
holes AS (SELECT g.row, g.col FROM grid g
          LEFT JOIN px ON px.row = g.row AND px.col = g.col
          WHERE px.row IS NULL),
fill AS (
  SELECT h.row, h.col,
         arg_min(px.value, ((h.row - px.row) * (h.row - px.row)
                            + (h.col - px.col) * (h.col - px.col)) * 1000000000000
                           + px.row * 1000000 + px.col) AS value,
         MIN((h.row - px.row) * (h.row - px.row)
             + (h.col - px.col) * (h.col - px.col)) AS dist2
  FROM holes h CROSS JOIN px
  GROUP BY 1, 2)
SELECT px.row, px.col, CAST(px.value AS BIGINT) AS value,
       CAST(0 AS BIGINT) AS dist2
FROM px
UNION ALL
SELECT row, col, CAST(value AS BIGINT) AS value, CAST(dist2 AS BIGINT) AS dist2
FROM fill"""
