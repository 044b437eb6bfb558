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
