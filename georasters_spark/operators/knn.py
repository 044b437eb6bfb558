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
) -> DataFrame:
    """k nearest tiles (by center euclidean distance in lon/lat) per
    query point. points: (point_id, x, y). Returns
    (point_id, image_id, dist2, knn_rank)."""
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

    # 1. per-cell counts: small metadata aggregate (bounded by occupied
    #    cells at the index resolution; hierarchical at scale),
    #    broadcast to the executors
    counts_pdf = tiles.groupBy("cell_id").count().toPandas()
    cnt: dict[int, int] = dict(
        zip(counts_pdf["cell_id"].astype(np.int64), counts_pdf["count"].astype(np.int64))
    )
    bc_cnt = spark.sparkContext.broadcast(cnt)

    # 2. per-point ring expansion over the broadcast count table INSIDE
    #    an Arrow stage — the expansion distributes with the point
    #    table (a driver loop here would bottleneck at ~10^6 points)
    def expand(batches):
        cnt_ = bc_cnt.value
        for pdf in batches:
            ix, iy = C.lonlat_to_ixiy(pdf["x"].to_numpy(), pdf["y"].to_numpy(), res)
            pair_pid: list[int] = []
            pair_cell: list[int] = []
            for pid, cx0, cy0 in zip(pdf["point_id"].astype(np.int64), ix, iy):
                got = 0
                r_k = None
                r = 0
                max_r = 2 * n  # hard stop: whole index swept
                while r <= max_r:
                    ring_cells = _ring_cells(int(cx0), int(cy0), r, res, n)
                    got += sum(cnt_.get(c, 0) for c in ring_cells)
                    if r_k is None and got >= k:
                        r_k = r
                    if r_k is not None:
                        rho_max = int(math.floor((r_k + 1) * aspect)) + 1
                        if r >= rho_max:
                            break
                    r += 1
                rho = r
                for rr in range(rho + 1):
                    for c in _ring_cells(int(cx0), int(cy0), rr, res, n):
                        if c in cnt_:  # only occupied cells join
                            pair_pid.append(int(pid))
                            pair_cell.append(int(c))
            yield pd.DataFrame({"point_id": pd.Series(pair_pid, dtype=np.int64),
                                "cell_id": pd.Series(pair_cell, dtype=np.int64)})

    cand = points.select("point_id", "x", "y").mapInPandas(
        expand, schema="point_id long, cell_id long"
    )

    # 3. broadcast candidate pairs into the tile table, exact top-k
    joined = tiles.join(F.broadcast(cand), "cell_id")
    pts = points.select(
        F.col("point_id"), F.col("x").alias("qx"), F.col("y").alias("qy")
    )
    # rank on the 6-dp-rounded distance with an id tie-break: engines may
    # constant-fold the center expressions 1 ulp apart, so raw-double
    # ordering is not reproducible across engines — rounded ordering is.
    scored = joined.join(F.broadcast(pts), "point_id").withColumn(
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
) -> DataFrame:
    """k nearest VALID pixels per query point — window expansion on the
    pixel lattice (the pixel grid is its own cell index; the reference
    analog is extract-radius growth, georasters.py:1016-1030).

    Tile-pruned probes: each expansion round derives the candidate
    (tile_row, tile_col) blocks covering every point's Chebyshev window
    (tiny driver-side metadata), broadcast-HASH-joins them into the
    pixel table on the tile keys, and only then applies the window
    predicate — the big side is touched only on matching tile keys,
    never full-scanned per round. Counts decide which radii double.
    The final candidate set is widened by the anisotropy-safe factor
    hypot(cx, cy)/min(cx, cy), then exact top-k on the rounded
    center-distance with (row, col) tie-break. px must carry
    (row, col, value, xc, yc)."""
    import math

    import pandas as pd
    from pyspark.sql import Window as W

    cx, cy = cellsize
    x0, y0 = origin
    aspect = math.hypot(cx, cy) / min(abs(cx), abs(cy))
    spark = px.sparkSession
    pts = points.select("point_id", "x", "y").toPandas()
    pts["r0"] = np.round((pts["y"].to_numpy() - y0) / cy).astype(np.int64)
    pts["c0"] = np.round((pts["x"].to_numpy() - x0) / cx).astype(np.int64)

    px = px.withColumn("_trow", F.floor(F.col("row") / tile)).withColumn(
        "_tcol", F.floor(F.col("col") / tile)
    ).cache()
    # occupied tile bounds: clips the candidate-tile explosion for huge
    # fallback radii (one tiny metadata aggregate)
    tb = px.agg(
        F.min("_trow").alias("t0"), F.max("_trow").alias("t1"),
        F.min("_tcol").alias("u0"), F.max("_tcol").alias("u1"),
    ).collect()[0]
    if tb["t0"] is None:
        t0b = t1b = u0b = u1b = 0
    else:
        t0b, t1b, u0b, u1b = int(tb["t0"]), int(tb["t1"]), int(tb["u0"]), int(tb["u1"])

    def probe_df(pdf: pd.DataFrame, rcol: str) -> DataFrame:
        """(point_id, window params) replicated per candidate tile key.
        Only per-point METADATA ships from the driver; the point×tile
        replication itself is a JVM sequence/explode (no driver-side
        pair materialization — the knn_tiles lesson applied here)."""
        base = spark.createDataFrame(
            pdf[["point_id", "x", "y", "r0", "c0", rcol]].rename(
                columns={rcol: "rad"}
            ),
            "point_id long, x double, y double, r0 long, c0 long, rad long",
        )
        tr_lo = F.greatest(F.floor((F.col("r0") - F.col("rad")) / tile), F.lit(t0b))
        tr_hi = F.least(F.floor((F.col("r0") + F.col("rad")) / tile), F.lit(t1b))
        tc_lo = F.greatest(F.floor((F.col("c0") - F.col("rad")) / tile), F.lit(u0b))
        tc_hi = F.least(F.floor((F.col("c0") + F.col("rad")) / tile), F.lit(u1b))
        return (
            base.withColumn("_tr_lo", tr_lo).withColumn("_tr_hi", tr_hi)
            .withColumn("_tc_lo", tc_lo).withColumn("_tc_hi", tc_hi)
            # windows entirely off-grid generate nothing (a descending
            # sequence() would otherwise emit bogus tiles)
            .filter((F.col("_tr_lo") <= F.col("_tr_hi"))
                    & (F.col("_tc_lo") <= F.col("_tc_hi")))
            .withColumn("_trow", F.explode(F.sequence("_tr_lo", "_tr_hi")))
            .withColumn("_tcol", F.explode(F.sequence("_tc_lo", "_tc_hi")))
            .select("point_id", "x", "y", "r0", "c0", "rad", "_trow", "_tcol")
        )

    need_r = pd.Series(np.zeros(len(pts), dtype=np.int64), index=pts.point_id)
    R = max(2 * k, 8)
    remaining = pts
    while len(remaining) and R < 1 << 20:
        probe = probe_df(remaining.assign(rad=R), "rad")
        counts = (
            px.join(F.broadcast(probe), ["_trow", "_tcol"])  # hash join on tile keys
            .filter(
                (F.abs(F.col("row") - F.col("r0")) <= F.col("rad"))
                & (F.abs(F.col("col") - F.col("c0")) <= F.col("rad"))
            )
            .groupBy("point_id")
            .count()
            .toPandas()
            .set_index("point_id")["count"]
        )
        done = [
            pid for pid in remaining.point_id
            if counts.get(pid, 0) >= k
        ]
        for pid in done:
            need_r[pid] = R
        remaining = remaining[~remaining.point_id.isin(done)]
        R *= 2
    for pid in remaining.point_id:
        need_r[pid] = 1 << 20  # fewer than k valid pixels on the grid

    pts["rsafe"] = [int(math.ceil((int(need_r[p]) + 1) * aspect)) + 1 for p in pts.point_id]
    probe = probe_df(pts, "rsafe")
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
