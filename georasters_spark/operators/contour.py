"""Contour (isoline) extraction — the gdal_contour role (raster→vector
beyond polygonize; the reference reaches it via gr.raster + matplotlib/
gdal). Marching squares over 2×2 pixel-center blocks, fully
declarative: three shifted equi-joins assemble each block's corners,
a generated 16-case expression emits 0–2 segments per (block, level)
with linearly interpolated endpoints, one explode — no UDF anywhere,
so the whole plan is Catalyst-visible and the per-level shuffle is
just the final ordering the caller asks for.

Conventions (deterministic, shared with the SQL oracle via ONE case
table below):
  * inside := z >= level (strict crossings only: a used edge always
    has one corner >= level and one < level, so the interpolation
    denominator is never 0).
  * case index = (TL<<3) | (TR<<2) | (BR<<1) | BL.
  * saddles (5, 10) take the DISCONNECTED rule (two short segments),
    the gdal default without center disambiguation.
  * endpoint coords are in grid units (x = col + u, y = row + v,
    y growing with row); world coords are an affine away.
  * a level passing EXACTLY through a corner value emits a degenerate
    zero-length segment at that corner (t or r hits 0/1 on both used
    edges) — kept, since both engines derive it identically; filter
    seg_len > 0 downstream if undesired.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# edge ids: T(op) R(ight) B(ottom) L(eft) of the 2x2 block
# segments per marching-squares case (index bits: TL TR BR BL)
MS_CASES: dict[int, list[tuple[str, str]]] = {
    0: [], 15: [],
    1: [("L", "B")],
    2: [("B", "R")],
    3: [("L", "R")],
    4: [("T", "R")],
    5: [("T", "R"), ("L", "B")],     # saddle: disconnected rule
    6: [("T", "B")],
    7: [("L", "T")],
    8: [("L", "T")],
    9: [("T", "B")],
    10: [("L", "T"), ("B", "R")],    # saddle: disconnected rule
    11: [("T", "R")],
    12: [("L", "R")],
    13: [("B", "R")],
    14: [("L", "B")],
}

# edge -> (x expr in {t,r,b,l} interpolants, y expr) in block-local units
_EDGE_XY = {
    "T": ("t", "0"), "R": ("1", "r"), "B": ("b", "1"), "L": ("0", "l"),
}


def contour_segments(px: DataFrame, levels: list[float], round_dp: int = 6) -> DataFrame:
    """(brow, bcol, level, seg, x1, y1, x2, y2, seg_len): marching-
    squares segments per 2×2 block and level; only blocks with all 4
    corners valid participate (gdal skips nodata blocks too)."""
    z00 = px.select("row", "col", F.col("value").cast("double").alias("z00"))
    z01 = px.select((F.col("row")).alias("row"), (F.col("col") - 1).alias("col"),
                    F.col("value").cast("double").alias("z01"))
    z10 = px.select((F.col("row") - 1).alias("row"), (F.col("col")).alias("col"),
                    F.col("value").cast("double").alias("z10"))
    z11 = px.select((F.col("row") - 1).alias("row"), (F.col("col") - 1).alias("col"),
                    F.col("value").cast("double").alias("z11"))
    blocks = (
        z00.join(z01, ["row", "col"]).join(z10, ["row", "col"]).join(z11, ["row", "col"])
        .withColumnRenamed("row", "brow").withColumnRenamed("col", "bcol")
    )
    lv = F.explode(F.array(*[F.lit(float(x)) for x in levels])).alias("level")
    blocks = blocks.select("brow", "bcol", "z00", "z01", "z10", "z11", lv)
    idx = (
        (F.col("z00") >= F.col("level")).cast("int") * 8
        + (F.col("z01") >= F.col("level")).cast("int") * 4
        + (F.col("z11") >= F.col("level")).cast("int") * 2
        + (F.col("z10") >= F.col("level")).cast("int")
    )
    # interpolants along each edge (guarded: only evaluated on cases
    # that use the edge, where the denominator is provably nonzero)
    t = (F.col("level") - F.col("z00")) / (F.col("z01") - F.col("z00"))
    r = (F.col("level") - F.col("z01")) / (F.col("z11") - F.col("z01"))
    b = (F.col("level") - F.col("z10")) / (F.col("z11") - F.col("z10"))
    l = (F.col("level") - F.col("z00")) / (F.col("z10") - F.col("z00"))

    def edge_xy(e: str):
        xs, ys = _EDGE_XY[e]
        env = {"t": t, "r": r, "b": b, "l": l, "0": F.lit(0.0), "1": F.lit(1.0)}
        return env[xs], env[ys]

    # segments array per case, generated from MS_CASES (when-chain)
    chain = None
    for ci in sorted(MS_CASES):
        pairs = MS_CASES[ci]
        arr = F.array(*[
            F.struct(
                F.lit(si).alias("seg"),
                edge_xy(e1)[0].alias("x1"), edge_xy(e1)[1].alias("y1"),
                edge_xy(e2)[0].alias("x2"), edge_xy(e2)[1].alias("y2"),
            )
            for si, (e1, e2) in enumerate(pairs)
        ]) if pairs else F.array().cast(
            "array<struct<seg:int,x1:double,y1:double,x2:double,y2:double>>"
        )
        chain = F.when(idx == ci, arr) if chain is None else chain.when(idx == ci, arr)
    out = (
        blocks.select("brow", "bcol", "level", F.explode(chain).alias("s"))
        .select(
            "brow", "bcol", "level",
            F.col("s.seg").alias("seg"),
            (F.col("bcol") + F.col("s.x1")).alias("gx1"),
            (F.col("brow") + F.col("s.y1")).alias("gy1"),
            (F.col("bcol") + F.col("s.x2")).alias("gx2"),
            (F.col("brow") + F.col("s.y2")).alias("gy2"),
        )
    )
    dx = F.col("gx2") - F.col("gx1")
    dy = F.col("gy2") - F.col("gy1")
    return out.select(
        "brow", "bcol", "level", "seg",
        F.round("gx1", round_dp).alias("x1"), F.round("gy1", round_dp).alias("y1"),
        F.round("gx2", round_dp).alias("x2"), F.round("gy2", round_dp).alias("y2"),
        F.round(F.sqrt(dx * dx + dy * dy), round_dp).alias("seg_len"),
    )


def contour_sql(px_cte: str, levels: list[float], round_dp: int = 6) -> str:
    """DuckDB oracle generated from the SAME case table: corner joins
    (keys precomputed — no nested loop), the same interpolation and the
    same case→segment mapping, one row per emitted segment."""
    lv = ", ".join(f"({float(x)!r})" for x in levels)
    seg_rows = []
    for ci, pairs in sorted(MS_CASES.items()):
        for si, (e1, e2) in enumerate(pairs):
            x1, y1 = _EDGE_XY[e1]
            x2, y2 = _EDGE_XY[e2]
            seg_rows.append((ci, si, x1, y1, x2, y2))
    # encode the edge-coordinate selector as small ints:
    # 0->0.0, 1->1.0, 2->t, 3->r, 4->b, 5->l
    code = {"0": 0, "1": 1, "t": 2, "r": 3, "b": 4, "l": 5}
    segs = ", ".join(
        f"({ci}, {si}, {code[x1]}, {code[y1]}, {code[x2]}, {code[y2]})"
        for ci, si, x1, y1, x2, y2 in seg_rows
    )
    pick = ("CASE {c} WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN t "
            "WHEN 3 THEN r WHEN 4 THEN b WHEN 5 THEN l END")
    return f"""WITH {px_cte},
lvls(level) AS (VALUES {lv}),
segtab(ci, seg, cx1, cy1, cx2, cy2) AS (VALUES {segs}),
corners AS (
  SELECT a.row AS brow, a.col AS bcol,
         CAST(a.value AS DOUBLE) AS z00, CAST(b.value AS DOUBLE) AS z01,
         CAST(c.value AS DOUBLE) AS z10, CAST(d.value AS DOUBLE) AS z11
  FROM px a
  JOIN px b ON b.row = a.row AND b.col = a.col + 1
  JOIN px c ON c.row = a.row + 1 AND c.col = a.col
  JOIN px d ON d.row = a.row + 1 AND d.col = a.col + 1),
blk AS (
  SELECT brow, bcol, level, z00, z01, z10, z11,
         (CASE WHEN z00 >= level THEN 8 ELSE 0 END
          + CASE WHEN z01 >= level THEN 4 ELSE 0 END
          + CASE WHEN z11 >= level THEN 2 ELSE 0 END
          + CASE WHEN z10 >= level THEN 1 ELSE 0 END) AS ci,
         (level - z00) / (z01 - z00) AS t,
         (level - z01) / (z11 - z01) AS r,
         (level - z10) / (z11 - z10) AS b,
         (level - z00) / (z10 - z00) AS l
  FROM corners CROSS JOIN lvls),
emitted AS (
  SELECT blk.brow, blk.bcol, blk.level, segtab.seg,
         blk.bcol + {pick.format(c='segtab.cx1')} AS gx1,
         blk.brow + {pick.format(c='segtab.cy1')} AS gy1,
         blk.bcol + {pick.format(c='segtab.cx2')} AS gx2,
         blk.brow + {pick.format(c='segtab.cy2')} AS gy2
  FROM blk JOIN segtab ON segtab.ci = blk.ci)
SELECT brow, bcol, level, CAST(seg AS INT) AS seg,
       ROUND(gx1, {round_dp}) AS x1, ROUND(gy1, {round_dp}) AS y1,
       ROUND(gx2, {round_dp}) AS x2, ROUND(gy2, {round_dp}) AS y2,
       ROUND(sqrt((gx2 - gx1) * (gx2 - gx1) + (gy2 - gy1) * (gy2 - gy1)), {round_dp}) AS seg_len
FROM emitted"""
