"""Cost-distance / least-cost travel time (georasters.py:1396-1486).

The reference builds skimage.graph.MCP_Geometric over the raster as a
cost surface and loops over sources in Python (its scalability cliff,
SURVEY §3.3). Here the *per-source* loop is distributed: sources are
grouped and shipped to executors via applyInPandas; each task runs a
numpy/heapq Dijkstra against the broadcast cost surface.

Semantics matched to the reference:
  * MCP_Geometric edge cost: (cost[a] + cost[b]) / 2 * step_len,
    step_len = 1 (rook) or sqrt(2) (diagonal), in cell units.
  * cumulative costs divided by 7*24 (hours -> weeks)
    (georasters.py:1432, :1439-1441).
  * unreachable destinations (inf) are dropped (georasters.py:1437).
  * isolation = mean cumulative cost over all *reachable valid* cells
    / (7*24) (georasters.py:1438-1442).
  * masked cells are impassable (cost surface has no value there).

Scale path (documented, not needed at sandbox size): the broadcast
array becomes per-source tile neighborhoods fetched by cell_id, or a
fully distributed Bellman-Ford-style relaxation (driver loop of
join+min until fixpoint, checkpointed every N rounds).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOURS_PER_WEEK = 7 * 24


def dijkstra_grid(cost: np.ndarray, valid: np.ndarray, r0: int, c0: int) -> np.ndarray:
    """Full cumulative-cost surface from one source (MCP_Geometric edge
    rule). Returns float64 grid, inf = unreachable, nan on invalid."""
    h, w = cost.shape
    dist = np.full((h, w), np.inf)
    if not (0 <= r0 < h and 0 <= c0 < w) or not valid[r0, c0]:
        return dist
    dist[r0, c0] = 0.0
    pq = [(0.0, r0, c0)]
    steps = [
        (-1, -1, math.sqrt(2)), (-1, 0, 1.0), (-1, 1, math.sqrt(2)),
        (0, -1, 1.0), (0, 1, 1.0),
        (1, -1, math.sqrt(2)), (1, 0, 1.0), (1, 1, math.sqrt(2)),
    ]
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        base = cost[r, c]
        for dr, dc, sl in steps:
            nr, nc = r + dr, c + dc
            if 0 <= nr < h and 0 <= nc < w and valid[nr, nc]:
                nd = d + (base + cost[nr, nc]) / 2.0 * sl
                if nd < dist[nr, nc]:
                    dist[nr, nc] = nd
                    heapq.heappush(pq, (nd, nr, nc))
    return dist


def cost_distance_relaxation(
    px: DataFrame,
    source_row: int,
    source_col: int,
    checkpoint_every: int = 20,
    max_iters: int = 10000,
) -> DataFrame:
    """Fully distributed single-source cost distance: frontier-based
    Bellman-Ford relaxation over the 8-neighbor edge set — the scale
    path when the cost surface exceeds single-task memory (the
    broadcast-array path in cost_distance is the small/fast case).

    Each round relaxes only edges leaving the cells improved in the
    previous round (Dijkstra-like wavefront ⇒ ~grid-diameter rounds);
    lineage is truncated with localCheckpoint every `checkpoint_every`
    rounds. Returns (row, col, dist) in raw cost units (not /168).
    """
    spark = px.sparkSession

    # static edge set with MCP_Geometric weights, built once
    offsets = spark.createDataFrame(
        [(-1, -1, math.sqrt(2)), (-1, 0, 1.0), (-1, 1, math.sqrt(2)),
         (0, -1, 1.0), (0, 1, 1.0),
         (1, -1, math.sqrt(2)), (1, 0, 1.0), (1, 1, math.sqrt(2))],
        "dr int, dc int, sl double",
    )
    a = px.select("row", "col", F.col("value").alias("va"))
    b = px.select(
        F.col("row").alias("row2"), F.col("col").alias("col2"), F.col("value").alias("vb")
    )
    edges = (
        a.crossJoin(F.broadcast(offsets))
        .withColumn("row2", F.col("row") + F.col("dr"))
        .withColumn("col2", F.col("col") + F.col("dc"))
        .join(b, ["row2", "col2"])
        .select("row", "col", "row2", "col2",
                ((F.col("va") + F.col("vb")) / 2.0 * F.col("sl")).alias("w"))
        .persist()
    )
    edges.count()

    dist = spark.createDataFrame(
        [(int(source_row), int(source_col), 0.0)], "row long, col long, dist double"
    )
    frontier = dist
    it = 0
    while it < max_iters:
        it += 1
        cand = (
            edges.join(frontier, ["row", "col"])
            .select(
                F.col("row2").alias("row"),
                F.col("col2").alias("col"),
                (F.col("dist") + F.col("w")).alias("nd"),
            )
            .groupBy("row", "col")
            .agg(F.min("nd").alias("nd"))
        )
        joined = cand.join(dist, ["row", "col"], "left")
        improved = joined.filter(
            F.col("dist").isNull() | (F.col("nd") < F.col("dist") - 1e-12)
        ).select("row", "col", F.col("nd").alias("dist"))
        improved = improved.localCheckpoint(eager=True)
        if improved.isEmpty():
            break
        dist = (
            dist.unionByName(improved)
            .groupBy("row", "col")
            .agg(F.min("dist").alias("dist"))
        )
        if it % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
        frontier = improved
    edges.unpersist()
    return dist


def trace_route(dist: np.ndarray, valid: np.ndarray, r1: int, c1: int) -> list[tuple[int, int]]:
    """Greedy steepest-descent traceback on a cumulative-cost surface:
    the MCP route from (r1, c1) back to the source (dist == 0),
    returned source→destination. The reference's routes path dies on a
    NameError (georasters.py:1461 — SURVEY §1.4.7); we implement it
    properly and deliberately diverge."""
    h, w = dist.shape
    if not np.isfinite(dist[r1, c1]):
        return []
    path = [(int(r1), int(c1))]
    r, c = int(r1), int(c1)
    for _ in range(h * w):
        if dist[r, c] == 0.0:
            break
        best = None
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if 0 <= nr < h and 0 <= nc < w and valid[nr, nc]:
                    if best is None or dist[nr, nc] < best[0]:
                        best = (dist[nr, nc], nr, nc)
        if best is None or best[0] >= dist[r, c]:
            break
        _, r, c = best
        path.append((r, c))
    return list(reversed(path))


def cost_distance(
    images: DataFrame,
    sources: DataFrame,
    destinations: DataFrame,
    origin: tuple[float, float],
    cellsize: tuple[float, float],
    routes: bool = False,
) -> DataFrame:
    """All-pairs least-cost travel time.

    sources/destinations: (point_id, x, y). Returns
    (id1, id2, dist_weeks) for reachable pairs plus per-source
    isolation rows (id2 = -1, dist_weeks = isolation). With
    routes=True adds a `route` column: the least-cost path as
    [[row, col], ...] (the reference's routes path is unreachable —
    NameError, georasters.py:1461 — so this is a deliberate repair).
    """
    from ..operators import pixels as PX

    x0, y0 = origin
    cx, cy = cellsize

    px = PX.pixel_table(images, valid_only=True, with_coords=False).select(
        "row", "col", "value"
    )
    pdf = px.toPandas()
    h = int(pdf["row"].max()) + 1
    w = int(pdf["col"].max()) + 1
    cost = np.zeros((h, w))
    valid = np.zeros((h, w), dtype=bool)
    cost[pdf["row"], pdf["col"]] = pdf["value"]
    valid[pdf["row"], pdf["col"]] = True

    spark = images.sparkSession
    bc = spark.sparkContext.broadcast((cost, valid))

    dst_pdf = destinations.select("point_id", "x", "y").toPandas()
    drows = np.round((dst_pdf["y"].to_numpy() - y0) / cy).astype(np.int64)
    dcols = np.round((dst_pdf["x"].to_numpy() - x0) / cx).astype(np.int64)
    dids = dst_pdf["point_id"].to_numpy(dtype=np.int64)

    def per_source(pdf_src: pd.DataFrame) -> pd.DataFrame:
        cost_, valid_ = bc.value
        out = []
        for s in pdf_src.itertuples(index=False):
            r0 = int(np.round((s.y - y0) / cy))
            c0 = int(np.round((s.x - x0) / cx))
            dist = dijkstra_grid(cost_, valid_, r0, c0)
            inb = (drows >= 0) & (drows < dist.shape[0]) & (dcols >= 0) & (dcols < dist.shape[1])
            dd = np.full(len(dids), np.inf)
            dd[inb] = dist[drows[inb], dcols[inb]]
            ok = np.isfinite(dd)
            for i in np.flatnonzero(ok):
                rec = [int(s.point_id), int(dids[i]), float(dd[i] / HOURS_PER_WEEK)]
                if routes:
                    rec.append(
                        [[int(r), int(c)] for r, c in
                         trace_route(dist, valid_, int(drows[i]), int(dcols[i]))]
                    )
                out.append(tuple(rec))
            reach = dist[valid_ & np.isfinite(dist)]
            if reach.size:
                rec = [int(s.point_id), -1, float(reach.mean() / HOURS_PER_WEEK)]
                if routes:
                    rec.append([])
                out.append(tuple(rec))
        cols = ["id1", "id2", "dist_weeks"] + (["route"] if routes else [])
        return pd.DataFrame(out, columns=cols)

    schema = "id1 long, id2 long, dist_weeks double" + (
        ", route array<array<long>>" if routes else ""
    )
    src = sources.select("point_id", "x", "y").repartition(
        max(1, min(sources.count(), spark.sparkContext.defaultParallelism)),
        "point_id",
    )
    return src.groupBy("point_id").applyInPandas(
        lambda key, g: per_source(g), schema=schema
    ).withColumn("dist_weeks", F.round("dist_weeks", 6))
