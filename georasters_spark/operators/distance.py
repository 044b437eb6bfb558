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


def cost_distance(
    images: DataFrame,
    sources: DataFrame,
    destinations: DataFrame,
    origin: tuple[float, float],
    cellsize: tuple[float, float],
) -> DataFrame:
    """All-pairs least-cost travel time.

    sources/destinations: (point_id, x, y). Returns
    (id1, id2, dist_weeks) for reachable pairs plus per-source
    isolation rows (id2 = -1, dist_weeks = isolation).
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
                out.append((int(s.point_id), int(dids[i]), float(dd[i] / HOURS_PER_WEEK)))
            reach = dist[valid_ & np.isfinite(dist)]
            if reach.size:
                out.append((int(s.point_id), -1, float(reach.mean() / HOURS_PER_WEEK)))
        return pd.DataFrame(out, columns=["id1", "id2", "dist_weeks"])

    src = sources.select("point_id", "x", "y").repartition(
        max(1, min(sources.count(), spark.sparkContext.defaultParallelism)),
        "point_id",
    )
    return src.groupBy("point_id").applyInPandas(
        lambda key, g: per_source(g), schema="id1 long, id2 long, dist_weeks double"
    ).withColumn("dist_weeks", F.round("dist_weeks", 6))
