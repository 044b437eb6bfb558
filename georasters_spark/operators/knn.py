"""kNN over the tile table via ring expansion on the cell index
(north rule; reference analog: nearest-cell lookups in extract/distance,
georasters.py:1016-1030, :1405-1486).

Algorithm (exact — candidate set provably contains the true top-k):

  1. A per-cell tile-count table (cell_id -> n_tiles) is aggregated once
     and collected (it is small: bounded by occupied cells at the index
     resolution; at planetary scale use a coarser parent level — counts
     are hierarchical by construction).
  2. Per query point (vectorized numpy): expand Chebyshev rings over
     the count table until cumulative count >= k at ring r_k, then set
     the safe radius  rho_max = floor((r_k + 1) * hypot(wx, wy) / min(wx, wy)) + 1
     — any cell farther than rho_max rings has min distance greater
     than the worst-case k-th candidate distance, so it can't hold a
     true neighbor (anisotropic-cell-safe bound).
  3. Explode (point_id, candidate_cell) pairs for rings <= rho_max,
     broadcast-join against the tile table on cell_id, compute exact
     distances, window top-k with deterministic tie-break (dist2,
     image_id).

Only step 3 touches the big table, and it's a broadcast hash join on
the clustered cell_id key — no shuffle of the tile table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import cells as C


def knn_tiles(
    images: DataFrame,
    points: DataFrame,
    res: int,
    k: int,
    max_count_cells: int = 1 << 20,
    count_res: int | None = None,
) -> DataFrame:
    """k nearest tiles (by center euclidean distance in lon/lat) per
    query point. points: (point_id, x, y). Returns
    (point_id, image_id, dist2, knn_rank).

    The broadcast count table is HIERARCHICAL: when the occupied cells
    at `res` exceed `max_count_cells`, counts are aggregated at the
    parent level count_res = res − s (cells are a Morton quadtree, so
    the parent id is pure integer arithmetic, computable JVM-side for
    the join key too). Ring expansion then runs in parent units and
    the radius bounds are widened by the child-per-parent factor
    S = 2^s — conservative (a slightly larger candidate set) but exact,
    since the final top-k rescores true distances. This bounds the
    driver/broadcast footprint at any data scale."""
    spark = images.sparkSession
    n = 1 << res
    wx, wy = 360.0 / n, 180.0 / n
    aspect = math.hypot(wx, wy) / min(wx, wy)

    tiles = images.select(
        "image_id",
        "cell_id",
        (F.col("xmin") + (F.col("w") * F.col("cellx")) / 2).alias("center_x"),
        (F.col("ymax") + (F.col("h") * F.col("celly")) / 2).alias("center_y"),
    )

    # 1. pick the count level: one cheap scalar aggregate; occupied
    #    parents shrink ~4x per step, so the step count is computed
    #    directly instead of probing level by level. Callers that know
    #    the index is small pass count_res explicitly and skip the job.
    if count_res is None:
        occ = tiles.select(F.countDistinct("cell_id")).collect()[0][0] or 0
        s = 0
        while occ > max_count_cells * (4 ** s) and (res - s) > 0:
            s += 1
        # the 4x-per-level shrink is optimistic for sparse layouts —
        # verify the occupied-parent count at the chosen level and
        # coarsen further until the cap actually holds (s == 0 needs no
        # check: occ itself is the exact count at res)
        while s > 0 and (res - s) > 0:
            probe = F.expr(
                f"CAST({res - s} AS BIGINT) * {1 << C.RES_SHIFT} + "
                f"(cell_id % {1 << C.RES_SHIFT}) DIV {1 << (2 * s)}"
            )
            if tiles.select(F.countDistinct(probe)).collect()[0][0] <= max_count_cells:
                break
            s += 1
        count_res = res - s
    s = res - count_res
    S = 1 << s
    na = 1 << count_res
    # parent cell id from the child id: res field swapped, morton >> 2s
    acell = F.expr(
        f"CAST({count_res} AS BIGINT) * {1 << C.RES_SHIFT} + "
        f"(cell_id % {1 << C.RES_SHIFT}) DIV {1 << (2 * s)}"
    )
    counts_pdf = tiles.groupBy(acell.alias("_acell")).count().toPandas()
    cnt: dict[int, int] = dict(
        zip(counts_pdf["_acell"].astype(np.int64), counts_pdf["count"].astype(np.int64))
    )
    bc_cnt = spark.sparkContext.broadcast(cnt)

    # 2. per-point ring expansion over the broadcast count table INSIDE
    #    an Arrow stage — the expansion distributes with the point
    #    table (a driver loop here would bottleneck at ~10^6 points).
    #    Rings are in PARENT units; the fine-unit radius bound follows
    #    from: a tile in a parent cell at parent-Chebyshev g sits at
    #    fine-Chebyshev <= (g+1)·S − 1 from the query's fine cell.
    def expand(batches):
        cnt_ = bc_cnt.value
        for pdf in batches:
            ax, ay = C.lonlat_to_ixiy(pdf["x"].to_numpy(), pdf["y"].to_numpy(), count_res)
            pair_pid: list[int] = []
            pair_cell: list[int] = []
            pair_qx: list[float] = []
            pair_qy: list[float] = []
            for pid, qx, qy, cx0, cy0 in zip(
                    pdf["point_id"].astype(np.int64),
                    pdf["x"].astype(np.float64), pdf["y"].astype(np.float64),
                    ax, ay):
                got = 0
                g_k = None
                g = 0
                g_max = 2 * na  # hard stop: whole index swept
                while g <= g_max:
                    ring_cells = _ring_cells(int(cx0), int(cy0), g, count_res, na)
                    got += sum(cnt_.get(c, 0) for c in ring_cells)
                    if g_k is None and got >= k:
                        g_k = g
                    if g_k is not None:
                        r_k_fine = (g_k + 1) * S - 1
                        rho_fine = int(math.floor((r_k_fine + 1) * aspect)) + 1
                        g_max_need = (rho_fine + S - 1) // S
                        if g >= g_max_need:
                            break
                    g += 1
                rho = g
                for gg in range(rho + 1):
                    for c in _ring_cells(int(cx0), int(cy0), gg, count_res, na):
                        if c in cnt_:  # only occupied cells join
                            pair_pid.append(int(pid))
                            pair_cell.append(int(c))
                            pair_qx.append(float(qx))
                            pair_qy.append(float(qy))
            yield pd.DataFrame({"point_id": pd.Series(pair_pid, dtype=np.int64),
                                "_acell": pd.Series(pair_cell, dtype=np.int64),
                                "qx": pd.Series(pair_qx, dtype=np.float64),
                                "qy": pd.Series(pair_qy, dtype=np.float64)})

    # the query coordinates ride the candidate rows (r7): one broadcast
    # and one join instead of a second broadcast join against the
    # points table — qx/qy are the same doubles the points row carried,
    # so the rounded-distance ranking is unchanged
    cand = points.select("point_id", "x", "y").mapInPandas(
        expand, schema="point_id long, _acell long, qx double, qy double"
    )

    # 3. broadcast candidate pairs into the tile table (hash join on the
    #    JVM-derived parent key), exact top-k
    joined = tiles.withColumn("_acell", acell).join(F.broadcast(cand), "_acell")
    # rank on the 6-dp-rounded distance with an id tie-break: engines may
    # constant-fold the center expressions 1 ulp apart, so raw-double
    # ordering is not reproducible across engines — rounded ordering is.
    scored = joined.withColumn(
        "dist2",
        F.round(
            (F.col("center_x") - F.col("qx")) * (F.col("center_x") - F.col("qx"))
            + (F.col("center_y") - F.col("qy")) * (F.col("center_y") - F.col("qy")),
            6,
        ),
    )
    w = W.partitionBy("point_id").orderBy("dist2", "image_id")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("point_id", "image_id", "dist2", "knn_rank")
    )


def knn_pixels(
    px: DataFrame,
    points: DataFrame,
    k: int,
    origin: tuple[float, float],
    cellsize: tuple[float, float],
    tile: int = 64,
    max_count_blocks: int = 1 << 20,
) -> DataFrame:
    """k nearest VALID pixels per query point — window expansion on the
    pixel lattice (the pixel grid is its own cell index; the reference
    analog is extract-radius growth, georasters.py:1016-1030).

    Coordination is fully executor-side (no driver-resident point set,
    no per-round jobs): per-(super-)tile valid-pixel counts are one
    aggregate over px, broadcast as a dict bounded by
    `max_count_blocks` (tiles collapse into S×S super-blocks when the
    occupied-tile count exceeds the cap — the hierarchical-counts
    mitigation, same as knn_tiles). ONE Arrow pass over the points then
    ring-expands each point over the broadcast counts to a radius
    guaranteed to contain >= k valid pixels, widened by the
    anisotropy-safe factor hypot(cx, cy)/min(cx, cy). The candidate
    probe replicates per tile key via a JVM explode and broadcast-HASH-
    joins into the pixel table on (tile_row, tile_col) — the big side
    is touched exactly twice (count aggregate + candidate join), never
    cached, never collected. Exact top-k on the rounded center-distance
    with (row, col) tie-break. px must carry (row, col, value, xc, yc).
    """
    import math

    import pandas as pd
    from pyspark.sql import Window as W

    cx, cy = cellsize
    x0, y0 = origin
    aspect = math.hypot(cx, cy) / min(abs(cx), abs(cy))
    spark = px.sparkSession

    px = px.withColumn("_trow", F.floor(F.col("row") / tile)).withColumn(
        "_tcol", F.floor(F.col("col") / tile)
    )
    # per-tile counts: the ONLY metadata pass over the big table; cached
    # briefly (it is small — occupied tiles), released before returning
    tcnt = px.groupBy("_trow", "_tcol").count().persist()
    occ = tcnt.count()
    s = 0
    while occ > max_count_blocks * (4 ** s):
        s += 1
    # the 4x-shrink-per-level estimate is optimistic for sparse layouts
    # (diagonal tiles merge ~2x per level): VERIFY the actual occupied
    # count at the chosen level and coarsen until the cap really holds
    # — each check is one cheap aggregate over the (small) tcnt table.
    # s == 0 needs no check: occ is already the exact tile count.
    while 0 < s < 40:
        S = 1 << s
        occ_s = (
            tcnt.select((F.col("_trow") - F.pmod("_trow", S)).alias("a"),
                        (F.col("_tcol") - F.pmod("_tcol", S)).alias("b"))
            .distinct().count()
        )
        if occ_s <= max_count_blocks:
            break
        s += 1
    S = 1 << s
    B = tile * S  # super-block edge in pixels
    sup = (
        tcnt.groupBy(
            (F.col("_trow") - F.pmod("_trow", S)).alias("_srow"),
            (F.col("_tcol") - F.pmod("_tcol", S)).alias("_scol"),
        )
        .agg(F.sum("count").alias("n"))
        .toPandas()
    )
    bnd = tcnt.agg(
        F.min("_trow").alias("t0"), F.max("_trow").alias("t1"),
        F.min("_tcol").alias("u0"), F.max("_tcol").alias("u1"),
    ).collect()[0]
    tcnt.unpersist()
    if bnd["t0"] is None:
        t0b = t1b = u0b = u1b = 0
    else:
        t0b, t1b, u0b, u1b = int(bnd["t0"]), int(bnd["t1"]), int(bnd["u0"]), int(bnd["u1"])
    # super-block counts keyed by block index (tile index // S)
    cnt: dict[tuple[int, int], int] = {
        (int(r) // S, int(c) // S): int(v)
        for r, c, v in zip(sup["_srow"], sup["_scol"], sup["n"])
    }
    bc_cnt = spark.sparkContext.broadcast(cnt)
    # ring-expansion hard stop: the occupied super-block span
    g_stop = max((t1b - t0b) // S, (u1b - u0b) // S, 0) + 2
    full_r = max(t1b - t0b + 1, u1b - u0b + 1, 1) * tile + tile  # whole grid

    def estimate(batches):
        """(point_id, x, y) -> (point_id, x, y, r0, c0, rad): one Arrow
        pass computing each point's safe candidate radius from the
        broadcast super-block counts. A block at super-Chebyshev g of
        the point's home block lies entirely within pixel-Chebyshev
        (g+1)·B of the point, so cum >= k at ring g_k gives the pixel
        radius bound (g_k+1)·B."""
        cnt_ = bc_cnt.value
        g_lo, g_hi = t0b // S, t1b // S
        h_lo, h_hi = u0b // S, u1b // S
        for pdf in batches:
            if len(pdf) == 0:
                continue
            r0 = np.round((pdf["y"].to_numpy() - y0) / cy).astype(np.int64)
            c0 = np.round((pdf["x"].to_numpy() - x0) / cx).astype(np.int64)
            rads = np.empty(len(pdf), dtype=np.int64)
            for i in range(len(pdf)):
                # expand from the home block CLAMPED into the occupied
                # span — a point far outside the raster would otherwise
                # sweep g_stop empty rings and silently get < k rows;
                # the clamp offset is added back into the radius bound
                gr = min(max(int(r0[i]) // B, g_lo), g_hi)
                gc = min(max(int(c0[i]) // B, h_lo), h_hi)
                # pixel Chebyshev distance from the point to the
                # clamped home block's rectangle (0 when inside it)
                dpix = max(
                    gr * B - int(r0[i]), int(r0[i]) - ((gr + 1) * B - 1),
                    gc * B - int(c0[i]), int(c0[i]) - ((gc + 1) * B - 1), 0,
                )
                got = 0
                need = None
                for g in range(g_stop + 1):
                    if g == 0:
                        ring = [(gr, gc)]
                    else:
                        ring = (
                            [(gr + dg, gc + dc) for dg in (-g, g)
                             for dc in range(-g, g + 1)]
                            + [(gr + dg, gc + dc) for dg in range(-g + 1, g)
                               for dc in (-g, g)]
                        )
                    got += sum(cnt_.get(b, 0) for b in ring)
                    if got >= k:
                        need = dpix + (g + 1) * B
                        break
                if need is None:
                    need = dpix + full_r  # fewer than k valid pixels on the grid
                rads[i] = int(math.ceil((need + 1) * aspect)) + 1
            out = pdf[["point_id", "x", "y"]].copy()
            out["r0"] = r0
            out["c0"] = c0
            out["rad"] = rads
            yield out

    est = points.select("point_id", "x", "y").mapInPandas(
        estimate, schema="point_id long, x double, y double, r0 long, c0 long, rad long"
    )

    # candidate tile keys via JVM sequence/explode (no driver-side pair
    # materialization), clipped to the occupied tile bounds
    tr_lo = F.greatest(F.floor((F.col("r0") - F.col("rad")) / tile), F.lit(t0b))
    tr_hi = F.least(F.floor((F.col("r0") + F.col("rad")) / tile), F.lit(t1b))
    tc_lo = F.greatest(F.floor((F.col("c0") - F.col("rad")) / tile), F.lit(u0b))
    tc_hi = F.least(F.floor((F.col("c0") + F.col("rad")) / tile), F.lit(u1b))
    probe = (
        est.withColumn("_tr_lo", tr_lo).withColumn("_tr_hi", tr_hi)
        .withColumn("_tc_lo", tc_lo).withColumn("_tc_hi", tc_hi)
        # windows entirely off-grid generate nothing (a descending
        # sequence() would otherwise emit bogus tiles)
        .filter((F.col("_tr_lo") <= F.col("_tr_hi"))
                & (F.col("_tc_lo") <= F.col("_tc_hi")))
        .withColumn("_trow", F.explode(F.sequence("_tr_lo", "_tr_hi")))
        .withColumn("_tcol", F.explode(F.sequence("_tc_lo", "_tc_hi")))
        .select("point_id", "x", "y", "r0", "c0", "rad", "_trow", "_tcol")
    )
    cand = (
        px.join(F.broadcast(probe), ["_trow", "_tcol"])
        .filter(
            (F.abs(F.col("row") - F.col("r0")) <= F.col("rad"))
            & (F.abs(F.col("col") - F.col("c0")) <= F.col("rad"))
        )
        .withColumn(
            "dist2",
            F.round(
                (F.col("xc") - F.col("x")) * (F.col("xc") - F.col("x"))
                + (F.col("yc") - F.col("y")) * (F.col("yc") - F.col("y")),
                6,
            ),
        )
    )
    w = W.partitionBy("point_id").orderBy("dist2", "row", "col")
    return (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("point_id", "row", "col",
                F.col("value").cast("long").alias("value"), "dist2", "knn_rank")
    )


def _ring_cells(cx0: int, cy0: int, r: int, res: int, n: int) -> list[int]:
    if r == 0:
        return [int(C.encode(np.int64(cx0), np.int64(cy0), res))]
    xs, ys = [], []
    for dx in range(-r, r + 1):
        for dy in (-r, r):
            xs.append(cx0 + dx)
            ys.append(cy0 + dy)
    for dy in range(-r + 1, r):
        for dx in (-r, r):
            xs.append(cx0 + dx)
            ys.append(cy0 + dy)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    if not ok.any():
        return []
    return [int(v) for v in np.asarray(C.encode(xs[ok], ys[ok], res))]
