"""Scale guards: t2-tier correctness drill, plan-shape regression
(fused zonal must shuffle exactly once), union later-wins property."""

import io
from contextlib import redirect_stdout

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from georasters_spark.operators import algebra as AL
from georasters_spark.operators import pixels as PX
from georasters_spark.operators import spatial_join as SJ
from georasters_spark.sources import synth


def test_t2_tier_decode_golden_and_fused_parity(spark):
    """2160x1080 (2.3M px, 578 tiles): distributed decode equals the
    stitched-array oracle; fused == unfused zonal at 4x smoke scale."""
    spec = synth.T2
    imgs = synth.build_images(spark, spec).cache()
    try:
        full = synth.stitched_array(spec)
        valid = full != spec.ndv
        px = PX.pixel_table(imgs, valid_only=True)
        row = px.agg(
            F.count("value").alias("c"), F.sum("value").cast("long").alias("s")
        ).collect()[0]
        assert row["c"] == int(valid.sum())
        assert row["s"] == int(full[valid].astype(np.int64).sum())
        kw = dict(origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly))
        a = SJ.zonal_stats(imgs, synth.ZONES_T1, **kw).toPandas().sort_values("zone_id").reset_index(drop=True)
        b = SJ.zonal_stats_fused(imgs, synth.ZONES_T1, **kw).toPandas().sort_values("zone_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    finally:
        imgs.unpersist()


def test_fused_zonal_plan_single_exchange(spark, images_t1):
    """The fused zonal plan must contain exactly ONE shuffle (the final
    zone-keyed aggregate) — a regression guard for the scale design."""
    spec = synth.T1
    df = SJ.zonal_stats_fused(
        images_t1, synth.ZONES_T1,
        origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly),
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    n_exchange = plan.count("Exchange")
    # formatted plans list each node once in the tree and once in the
    # details section → exactly one Exchange node appears twice
    assert plan.count("(") > 0
    assert n_exchange <= 2, f"unexpected extra shuffles:\n{plan}"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_gini_and_map_vector_have_no_global_window(spark, images_t1):
    """Regression guard for the distributed prefix-sum rewrite: neither
    gini nor map_vector may plan an unpartitioned Window (a single-task
    wall at scale). Both results stay correct (checked vs closed
    forms / direct join)."""
    px = PX.pixel_table(images_t1, valid_only=True).select(
        "row", "col", F.col("value").cast("long").alias("value")
    )
    g = AL.gini_agg(px.select("value"))
    vec = spark.range(200000).select(
        F.col("id").alias("i"), ((F.col("id") * 37) % 1000).alias("new_value")
    )
    mv = AL.map_vector(px.select("row", "col"), vec)
    for df in (g, mv):
        plan = _plan_of(df)
        assert "Window" not in plan, f"global window leaked back in:\n{plan}"
    # sanity: map_vector really enumerates 0..n-1 in (row, col) order
    got = mv.orderBy("i").limit(3).toPandas()
    assert list(got["i"]) == [0, 1, 2]
    first = px.orderBy("row", "col").limit(3).toPandas()
    assert list(got["row"]) == list(first["row"])
    assert list(got["col"]) == list(first["col"])


def test_knn_pixels_plan_has_tile_hash_join(spark, images_t1):
    """knn_pixels probes must reach the pixel table through a broadcast
    HASH join on the derived tile keys — never a bare nested-loop scan
    of all pixels per round."""
    from georasters_spark.operators import knn as KN

    spec = synth.T1
    px = PX.pixel_table(
        images_t1, valid_only=True,
        origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly),
    ).select("row", "col", "value", "xc", "yc")
    out = KN.knn_pixels(
        px, synth.points_df(spark, 4), k=3,
        origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly),
    )
    plan = _plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "_trow" in plan and "_tcol" in plan


def test_cost_distance_gate_has_no_driver_collect(spark, images_t1):
    """The gated cost_distance path must not collect the pixel table:
    block_sssp touches it only via the halo-replication plan. We assert
    the structural property (pixel_table feeds mapInPandas/joins, and
    the returned distances equal the broadcast fast path)."""
    from georasters_spark.operators import distance as DI

    spec = synth.T1
    pts = synth.points_df(spark, 8)
    kw = dict(origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly))
    a = DI.cost_distance(images_t1, pts.filter(F.col("point_id") < 2),
                         pts.filter(F.col("point_id") >= 2), **kw).toPandas()
    b = DI.cost_distance_broadcast(images_t1, pts.filter(F.col("point_id") < 2),
                                   pts.filter(F.col("point_id") >= 2), **kw).toPandas()
    a = a.sort_values(["id1", "id2"]).reset_index(drop=True)
    b = b.sort_values(["id1", "id2"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.id1 == b.id1).all() and (a.id2 == b.id2).all()
    assert np.allclose(a.dist_weeks, b.dist_weeks, atol=2e-6)


def test_union_later_wins_property(spark):
    """Random mosaics: union_pixels == numpy paste-in-order oracle."""
    rng = np.random.default_rng(17)
    h, w = 30, 40
    layers = []
    for k in range(3):
        vals = rng.integers(1, 100, (h, w))
        mask = rng.uniform(size=(h, w)) < 0.5
        layers.append(np.where(mask, vals, -1))
    dfs = []
    for arr in layers:
        rows = [
            (int(r), int(c), int(arr[r, c]))
            for r in range(h) for c in range(w) if arr[r, c] != -1
        ]
        dfs.append(spark.createDataFrame(rows, "row long, col long, value long"))
    got = AL.union_pixels(dfs).toPandas()
    grid = np.full((h, w), -1, dtype=np.int64)
    for arr in layers:  # list order: later overwrite where they have data
        has = arr != -1
        grid[has] = arr[has]
    exp = {(r, c): grid[r, c] for r in range(h) for c in range(w) if grid[r, c] != -1}
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[(r.row, r.col)] == r.value


def test_t2_tier_round2_operators(spark):
    """4x-scale drill (2160x1080, 2.3M cells) for round-2 operators:
    reproject-nearest and row-standardized global autocorr both match
    their independent numpy oracles at T2 size."""
    import math

    from georasters_spark.operators import autocorr as AC
    from georasters_spark.operators import reproject as RP

    spec = synth.T2
    imgs = synth.build_images(spark, spec).cache()
    try:
        full = synth.stitched_array(spec).astype(np.float64)
        px = PX.pixel_table(imgs, valid_only=True).select(
            "row", "col", F.col("value").cast("long").alias("value")
        )

        # reproject nearest at T2: warped grid == numpy oracle cell-for-cell
        out_shape = (256, 512)
        got = RP.wgs84_to_cea_grid(
            px.select("row", "col", "value"),
            (spec.x0, spec.y0), (spec.cellx, spec.celly),
            (spec.height, spec.width), out_shape,
        ).toPandas()
        exp = RP.warp_numpy_oracle(
            full, spec.ndv, (spec.x0, spec.y0), (spec.cellx, spec.celly), out_shape
        )
        grid = np.full(out_shape, spec.ndv)
        vals = got.dropna(subset=["value"])
        grid[vals.trow.to_numpy(), vals.tcol.to_numpy()] = vals.value.to_numpy()
        assert (grid != exp).sum() == 0

        # row-standardized Moran/Geary at T2 vs direct numpy
        row = AC.global_autocorr_rowstd(px).collect()[0]
        valid = full != spec.ndv
        v = np.where(valid, full, np.nan)
        n = int(valid.sum())
        mean = np.nansum(v) / n
        z = np.where(valid, v - mean, 0.0)
        num_m = num_c = 0.0
        nw = 0
        h, w = v.shape
        # vectorized over the 8 shifts: per-cell deg + weighted lags
        deg = np.zeros((h, w))
        lag = np.zeros((h, w))
        csum = np.zeros((h, w))
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if (dr, dc) == (0, 0):
                    continue
                sh = np.zeros((h, w), dtype=bool)
                src = (slice(max(0, -dr), h - max(0, dr)), slice(max(0, -dc), w - max(0, dc)))
                dst = (slice(max(0, dr), h + min(0, dr)), slice(max(0, dc), w + min(0, dc)))
                ok = valid[src] & valid[dst]
                deg[dst] += ok
                lag[dst] += np.where(ok, z[src], 0.0)
                csum[dst] += np.where(ok, (v[dst] - v[src]) ** 2, 0.0)
        has = valid & (deg > 0)
        nw = int(has.sum())
        num_m = float((z[has] / deg[has] * lag[has]).sum())
        num_c = float((csum[has] / deg[has]).sum())
        den = float((z[valid] ** 2).sum())
        exp_m = (n / nw) * num_m / den
        exp_c = ((n - 1) / (2.0 * nw)) * num_c / den
        assert math.isfinite(row["moran_r"]) and abs(row["moran_r"] - exp_m) < 1e-9
        assert abs(row["geary_r"] - exp_c) < 1e-9
        assert row["n"] == n and row["nw"] == nw
    finally:
        imgs.unpersist()
