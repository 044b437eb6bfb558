"""Terrain derivatives (Horn slope/aspect/hillshade) vs an independent
numpy shift-based implementation."""

import numpy as np
from pyspark.sql import functions as F

from georasters_spark.operators import pixels as PX
from georasters_spark.operators import terrain as TR
from georasters_spark.sources import synth


def test_terrain_matches_numpy(spark, images_t1):
    """Dense DEM = the unmasked formula field (the masked table's
    nodata stripes leave ~no full 3x3 windows); the masked/edge NULL
    rule is covered by test_terrain_flat_and_edge_rules and the
    valid-table block below."""
    spec = synth.T1
    rr = np.arange(spec.height)[:, None]
    cc = np.arange(spec.width)[None, :]
    full = synth.field_value(rr, cc, spec.seed).astype(np.float64)
    dem = (
        spark.range(spec.height).select(F.col("id").alias("row"))
        .crossJoin(spark.range(spec.width).select(F.col("id").alias("col")))
        .select("row", "col",
                ((F.col("row") * 7919 + F.col("col") * 104729 + F.lit(spec.seed))
                 % 1997).alias("value"))
    )
    got = TR.slope_aspect_hillshade(
        dem, cellsize=(spec.cellx, spec.celly), zfactor=0.001
    ).toPandas()
    slope, aspect, hs = TR.terrain_numpy_oracle(
        full, -1.0, (spec.cellx, spec.celly), zfactor=0.001
    )
    assert len(got) > 100_000
    n_full = 0
    for t in got.itertuples(index=False):
        es, ea, eh = slope[t.row, t.col], aspect[t.row, t.col], hs[t.row, t.col]
        if t.slope_deg is None or np.isnan(t.slope_deg):
            assert np.isnan(es)
            continue
        n_full += 1
        assert abs(t.slope_deg - es) < 1e-5
        assert abs(t.hillshade - eh) < 1e-4
        if t.aspect_deg is None or (isinstance(t.aspect_deg, float) and np.isnan(t.aspect_deg)):
            assert np.isnan(ea)
        else:
            # compass wrap: 0 == 360
            d = abs(t.aspect_deg - ea) % 360.0
            assert min(d, 360.0 - d) < 1e-5
    assert n_full > 50_000  # interior cells really exercised
    # sanity: slopes land in (0, 90), hillshade in [0, 255]
    v = got.dropna(subset=["slope_deg"])
    assert (v.slope_deg >= 0).all() and (v.slope_deg < 90).all()
    assert (v.hillshade >= 0).all() and (v.hillshade <= 255).all()


def test_terrain_flat_and_edge_rules(spark):
    """A constant 5x5 patch: interior cells are FLAT (slope 0, aspect
    NULL, hillshade = 255*cos(zen)); edge cells have NULL derivatives."""
    import math

    import pandas as pd

    rows = [(r, c, 7) for r in range(5) for c in range(5)]
    px = spark.createDataFrame(pd.DataFrame(rows, columns=["row", "col", "value"]),
                               "row long, col long, value long")
    out = TR.slope_aspect_hillshade(px, cellsize=(1.0, -1.0)).toPandas()
    inner = out[(out.row.between(1, 3)) & (out.col.between(1, 3))]
    assert (inner.slope_deg == 0.0).all()
    assert inner.aspect_deg.isna().all()
    want_hs = round(255.0 * math.cos(math.radians(45.0)), 6)
    assert (inner.hillshade == want_hs).all()
    edge = out[(out.row == 0)]
    assert edge.slope_deg.isna().all()


def test_d8_and_flow_accumulation_vs_numpy(spark):
    """D8 directions and accumulation vs a direct numpy topological
    computation on a small dense DEM; accumulation conserves mass
    (every cell contributes once to each pit it drains to)."""
    h, w = 60, 80
    rr = np.arange(h)[:, None]
    cc = np.arange(w)[None, :]
    full = synth.field_value(rr, cc, 42).astype(np.int64)
    dem = spark.createDataFrame(
        [(int(r), int(c), int(full[r, c])) for r in range(h) for c in range(w)],
        "row long, col long, value long",
    )
    got_d8 = TR.d8_flow_direction(dem).toPandas()
    # numpy D8: exact-integer steepest descent, smallest-code ties
    exp_d8 = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            best = (0, 0)  # (score, -code) lexicographic max, code asc
            for dr, dc, code, wt in TR.D8_OFFSETS:
                nr, nc = r + dr, c + dc
                if 0 <= nr < h and 0 <= nc < w and full[nr, nc] < full[r, c]:
                    d = int(full[r, c] - full[nr, nc])
                    score = d * d * wt
                    if best == (0, 0) or (score, -code) > (best[0], -best[1]):
                        best = (score, code)
            exp_d8[r, c] = best[1]
    for t in got_d8.itertuples(index=False):
        assert t.d8 == exp_d8[t.row, t.col], (t.row, t.col)

    acc = TR.flow_accumulation(dem).toPandas()
    # numpy accumulation: walk every cell's flow path
    exp_acc = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            cr, cc2 = r, c
            exp_acc[cr, cc2] += 1
            while exp_d8[cr, cc2] != 0:
                dr, dc = TR._D8_STEP[int(exp_d8[cr, cc2])]
                nr, nc = cr + dr, cc2 + dc
                if not (0 <= nr < h and 0 <= nc < w):
                    break
                cr, cc2 = nr, nc
                exp_acc[cr, cc2] += 1
    assert len(acc) == h * w
    for t in acc.itertuples(index=False):
        assert t.acc == exp_acc[t.row, t.col], (t.row, t.col)
    assert acc["acc"].max() > 5  # real confluence happens


def test_terrain_halo_plan_equals_join_plan(spark, images_t1):
    """horn_sums via the tile+halo stencil is bit-equal to the
    neighbor-join form on the masked table (seams, edges, nodata)."""
    import pandas as pd

    spec = synth.T1
    px = PX.pixel_table(images_t1, valid_only=True).select(
        "row", "col", F.col("value").cast("long").alias("value")
    )
    kw = dict(cellsize=(spec.cellx, spec.celly), zfactor=0.001)
    a = TR.slope_aspect_hillshade(px, plan="join", **kw).toPandas()
    b = TR.slope_aspect_hillshade(px, plan="halo", **kw).toPandas()
    a = a.sort_values(["row", "col"]).reset_index(drop=True)
    b = b.sort_values(["row", "col"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_terrain_tiles_plan_matches_join(spark, images_t1):
    """plan='tiles' (decode-in-place + halo strips) must equal the
    gated neighbor-join plan cell-for-cell."""
    from georasters_spark.operators import pixels as PX
    from georasters_spark.operators import terrain as TR
    from georasters_spark.sources import synth

    spec = synth.T1
    kw = dict(cellsize=(spec.cellx, spec.celly), zfactor=0.001)
    px = PX.pixel_table(images_t1, valid_only=True).select(
        "row", "col", "value")
    a = {(r["row"], r["col"]): (r["value"], r["slope_deg"], r["aspect_deg"],
                                r["hillshade"])
         for r in TR.slope_aspect_hillshade(px, plan="join", **kw).collect()}
    b = {(r["row"], r["col"]): (r["value"], r["slope_deg"], r["aspect_deg"],
                                r["hillshade"])
         for r in TR.slope_aspect_hillshade(
             None, plan="tiles", images=images_t1, **kw).collect()}
    assert a == b and len(a) > 50000
