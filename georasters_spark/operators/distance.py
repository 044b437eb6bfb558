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

Three execution strategies, all proven equal to the numpy Dijkstra in
pytest:

* ``block_sssp``       — THE scale path and the gated plan: the grid is
  partitioned into B×B blocks (+1-cell halo); each round runs a full
  local multi-seed Dijkstra per dirty block in an Arrow task and
  exchanges only improved halo/boundary estimates. The surface never
  leaves the executors, state is (src, row, col, dist) rows, and the
  round count is bounded by the number of block-boundary crossings of
  the optimal paths (label-correcting block Dijkstra), not the grid
  diameter.
* ``cost_distance_relaxation`` — cell-granular frontier Bellman-Ford
  (one join per wavefront step); simplest fully-distributed form,
  O(grid diameter) rounds.
* ``cost_distance_broadcast``  — the small-grid fast path: collect the
  surface once, broadcast, per-source Dijkstra in executors. Driver
  memory-bound; kept for routes=True tracebacks and tiny grids.
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


def _dijkstra_seeded(
    cost: np.ndarray, valid: np.ndarray, seeds: list[tuple[int, int, float]]
) -> np.ndarray:
    """Multi-seed Dijkstra over a local window (MCP_Geometric edge
    rule). seeds: (r, c, dist0) already in window coordinates."""
    h, w = cost.shape
    dist = np.full((h, w), np.inf)
    pq = []
    for r, c, d in seeds:
        if 0 <= r < h and 0 <= c < w and valid[r, c] and d < dist[r, c]:
            dist[r, c] = d
            heapq.heappush(pq, (d, r, c))
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


def _halo_offsets(spark, b: int, include_center: bool):
    """(offsets df, membership predicate): a cell at (row, col) belongs
    to block (home + da, home + db) iff it sits on the corresponding
    border of its home block — shared by the halo replication and the
    dirty-block derivation (which additionally includes (0, 0))."""
    offsets = spark.createDataFrame(
        [(da, db) for da in (-1, 0, 1) for db in (-1, 0, 1)
         if include_center or (da, db) != (0, 0)],
        "da int, db int",
    )
    pred = (
        ((F.col("da") == -1) & (F.pmod(F.col("row"), b) == 0))
        | (F.col("da") == 0)
        | ((F.col("da") == 1) & (F.pmod(F.col("row"), b) == b - 1))
    ) & (
        ((F.col("db") == -1) & (F.pmod(F.col("col"), b) == 0))
        | (F.col("db") == 0)
        | ((F.col("db") == 1) & (F.pmod(F.col("col"), b) == b - 1))
    )
    return offsets, pred


def block_sssp(
    px: DataFrame,
    sources_rc: list[tuple[int, int, int]],
    block: int = 160,
    max_rounds: int = 10000,
) -> DataFrame:
    """Distributed multi-source SSSP over block-partitioned cost grid.

    px: (row, col, value) valid cells. sources_rc: (src_id, row, col).
    Returns (src, row, col, dist) in raw cost units for every cell
    reachable from each source — bit-identical to per-source
    dijkstra_grid (min-plus path sums are order-deterministic).

    Plan shape per round: [dirty-block filter] → one grouped-map Arrow
    stage (local Dijkstra per block, seeded from current estimates) →
    min-merge of improvements into the state. The full surface is never
    collected or broadcast; per-task memory is one (block+2)² window.
    """
    spark = px.sparkSession
    b = int(block)

    base = px.select(
        "row", "col", F.col("value").cast("double").alias("value"),
        (F.col("row") - F.pmod(F.col("row"), b)).alias("_hr"),  # home block origin
        (F.col("col") - F.pmod(F.col("col"), b)).alias("_hc"),
    ).select(
        "row", "col", "value",
        (F.col("_hr") / b).cast("long").alias("trow"),
        (F.col("_hc") / b).cast("long").alias("tcol"),
    )
    # halo replication: border pixels also belong to adjacent blocks so
    # each block task sees a 1-cell ring of out-of-block costs
    offsets, on_edge = _halo_offsets(spark, b, include_center=False)
    halo = (
        base.crossJoin(F.broadcast(offsets))
        .filter(on_edge)
        .select(
            "row", "col", "value",
            (F.col("trow") + F.col("da")).alias("trow"),
            (F.col("tcol") + F.col("db")).alias("tcol"),
        )
    )
    tiled = base.select("row", "col", "value", "trow", "tcol").unionByName(halo)
    tiled = tiled.repartition("trow", "tcol").persist()
    tiled.count()

    dist = spark.createDataFrame(
        [(int(s), int(r), int(c), 0.0) for s, r, c in sources_rc],
        "src long, row long, col long, dist double",
    ).join(px.select("row", "col"), ["row", "col"], "left_semi").persist()
    seed = dist  # released at the end (reassigned below)
    frontier = dist

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        r0, c0 = ty * b - 1, tx * b - 1  # window incl. halo ring
        cells = pdf.drop_duplicates(subset=["row", "col"])
        lr = cells["row"].to_numpy(np.int64) - r0
        lc = cells["col"].to_numpy(np.int64) - c0
        cost = np.zeros((b + 2, b + 2))
        valid = np.zeros((b + 2, b + 2), dtype=bool)
        cost[lr, lc] = cells["value"].to_numpy(np.float64)
        valid[lr, lc] = True
        outs = []
        seeded = pdf[pdf["src"].notna()]
        for src, g in seeded.groupby("src"):
            sr = g["row"].to_numpy(np.int64) - r0
            sc = g["col"].to_numpy(np.int64) - c0
            sd = g["dist"].to_numpy(np.float64)
            loc = _dijkstra_seeded(
                cost, valid, [(int(a), int(bb), float(d)) for a, bb, d in zip(sr, sc, sd)]
            )
            seed_arr = np.full((b + 2, b + 2), np.inf)
            seed_arr[sr, sc] = sd
            reach = np.isfinite(loc) & valid & (loc < seed_arr)  # strict improvement
            rr, cc = np.nonzero(reach)
            outs.append(
                pd.DataFrame(
                    {"src": np.full(len(rr), int(src), dtype=np.int64),
                     "row": rr.astype(np.int64) + r0,
                     "col": cc.astype(np.int64) + c0,
                     "dist": loc[rr, cc]}
                )
            )
        return pd.concat(outs) if outs else pd.DataFrame(
            {"src": pd.Series(dtype=np.int64), "row": pd.Series(dtype=np.int64),
             "col": pd.Series(dtype=np.int64), "dist": pd.Series(dtype=np.float64)}
        )

    # membership of a cell in block (home+da, home+db) is pure integer
    # arithmetic — dirty blocks come from the frontier WITHOUT touching
    # the (much larger) halo-replicated cost table
    offsets9, on_edge9 = _halo_offsets(spark, b, include_center=True)

    it = 0
    while it < max_rounds:
        it += 1
        dirty = (
            frontier.crossJoin(F.broadcast(offsets9))
            .filter(on_edge9)
            .select(
                (F.floor(F.col("row") / b) + F.col("da")).alias("trow"),
                (F.floor(F.col("col") / b) + F.col("db")).alias("tcol"),
            )
            .distinct()
        )
        seeds = (
            tiled.join(F.broadcast(dirty), ["trow", "tcol"])
            .join(dist, ["row", "col"], "left")
        )
        cand = seeds.groupBy("trow", "tcol").applyInPandas(
            kernel, schema="src long, row long, col long, dist double"
        ).groupBy("src", "row", "col").agg(F.min("dist").alias("nd"))
        joined = cand.join(dist, ["src", "row", "col"], "left")
        improved = joined.filter(
            F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
        ).select("src", "row", "col", F.col("nd").alias("dist"))
        improved = improved.localCheckpoint(eager=True)
        if improved.isEmpty():
            break
        dist = (
            dist.unionByName(improved)
            .groupBy("src", "row", "col")
            .agg(F.min("dist").alias("dist"))
        )
        # truncate the union/groupBy lineage chain periodically (every
        # round would double the per-round job count)
        if it % 3 == 0:
            dist = dist.localCheckpoint(eager=True)
        frontier = improved
    # sever lineage from the cached inputs, then release them
    dist = dist.localCheckpoint(eager=True)
    seed.unpersist()
    tiled.unpersist()
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
    block: int = 288,
    bbox: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """All-pairs least-cost travel time (the gated path).

    sources/destinations: (point_id, x, y). Returns (id1, id2,
    dist_weeks) for reachable pairs plus per-source isolation rows
    (id2 = -1, dist_weeks = mean reachable cumulative cost / 168,
    georasters.py:1438-1442).

    bbox = (r0, r1, c0, c1) half-open pixel window clips the cost
    surface first (clip-then-route; masked/outside cells impassable).

    The isolation mean is DETERMINISTIC by design: per-cell dists are
    quantized to exact micro-units (round(dist·1e6) as BIGINT) and
    summed as integers, so the result is identical on any partitioning
    or merge order — a reproducibility requirement at cluster scale,
    where a naive float avg() is partition-order-dependent. The
    quantization shifts the mean by < 5e-7/168 ≈ 3e-9 weeks, far below
    the 6-dp output rounding.

    Runs the distributed block SSSP — the cost surface is never
    collected to the driver or broadcast whole. routes=True needs the
    full per-source surface for the greedy traceback and delegates to
    the small-grid broadcast path.
    """
    if routes:
        return cost_distance_broadcast(
            images, sources, destinations, origin, cellsize, routes=True
        )
    from ..operators import pixels as PX

    spark = images.sparkSession
    x0, y0 = origin
    cx, cy = cellsize
    px = PX.pixel_table(images, valid_only=True, with_coords=False).select(
        "row", "col", "value"
    )
    if bbox is not None:
        r0, r1, c0, c1 = bbox
        px = px.filter(
            (F.col("row") >= r0) & (F.col("row") < r1)
            & (F.col("col") >= c0) & (F.col("col") < c1)
        )
    src_pdf = sources.select("point_id", "x", "y").toPandas()
    sources_rc = [
        (int(p.point_id), int(np.round((p.y - y0) / cy)), int(np.round((p.x - x0) / cx)))
        for p in src_pdf.itertuples(index=False)
    ]
    dist = block_sssp(px, sources_rc, block=block)

    dst_pdf = destinations.select("point_id", "x", "y").toPandas()
    dst_rows = [
        (int(p.point_id), int(np.round((p.y - y0) / cy)), int(np.round((p.x - x0) / cx)))
        for p in dst_pdf.itertuples(index=False)
    ]
    dstdf = spark.createDataFrame(dst_rows or [(-(1 << 40), -1, -1)],
                                  "id2 long, row long, col long")
    pairs = dist.join(F.broadcast(dstdf), ["row", "col"]).select(
        F.col("src").alias("id1"), "id2",
        (F.col("dist") / HOURS_PER_WEEK).alias("dist_weeks"),
    )
    # deterministic mean (see docstring): exact BIGINT micro-unit sum,
    # association-free; division chain (S/c)/1e6/168 mirrors the SQL
    # oracle token-for-token. Micro-units cap at ~9e18/1e6 = 9e12 raw
    # cost per cell — far above any real surface.
    micro = F.round(F.col("dist") * F.lit(1000000.0)).cast("long")
    iso = dist.groupBy("src").agg(
        (F.sum(micro).cast("double") / F.count(F.lit(1))
         / F.lit(1000000.0) / F.lit(168.0)).alias("dist_weeks")
    ).select(F.col("src").alias("id1"), F.lit(-1).cast("long").alias("id2"), "dist_weeks")
    return pairs.unionByName(iso).withColumn("dist_weeks", F.round("dist_weeks", 6))


def cost_distance_broadcast(
    images: DataFrame,
    sources: DataFrame,
    destinations: DataFrame,
    origin: tuple[float, float],
    cellsize: tuple[float, float],
    routes: bool = False,
) -> DataFrame:
    """Small-grid fast path: collect the surface once, broadcast it,
    run per-source Dijkstra in executor tasks (grouped applyInPandas).
    Driver-memory-bound by design — use cost_distance (block SSSP) when
    the surface doesn't comfortably fit one machine. Only this path
    supports routes=True (greedy traceback needs the full surface).
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
