"""Seeded-permutation reproducibility, float32 grid path, catalog-backed
parquet scan pushdown."""

import numpy as np
import pytest
import pandas as pd
from pyspark.sql import functions as F

from georasters_spark.operators import autocorr as AC
from georasters_spark.operators import pixels as PX
from georasters_spark.sources import codec, synth


def _small_px(spark, n=12):
    rows = [
        (r, c, int((r * 7 + c * 13) % 50))
        for r in range(n)
        for c in range(n)
        if (r * 3 + c) % 5 != 0
    ]
    return spark.createDataFrame(rows, "row long, col long, value long")


def test_moran_permutation_seeded_reproducible(spark):
    """Reference seeded-permutation reproducibility
    (tests/test_georasters.py:478-528): same seed ⇒ identical result;
    permutation params are deterministic functions of (n, seed)."""
    px = _small_px(spark)
    a = AC.moran_permutation_test(px, n_perm=7, seed=11).collect()[0]
    b = AC.moran_permutation_test(px, n_perm=7, seed=11).collect()[0]
    assert a == b
    p1 = AC.permutation_params(1000, 5, 11)
    p2 = AC.permutation_params(1000, 5, 11)
    p3 = AC.permutation_params(1000, 5, 12)
    assert p1 == p2 and p1 != p3
    # every param really is a bijection of Z_n
    n = 97
    for _, a_mul, b_add in AC.permutation_params(n, 5, 3)[1:]:
        img = {(a_mul * k + b_add) % n for k in range(n)}
        assert len(img) == n


def test_float32_grid_roundtrip(spark):
    """float-valued grids ride the rawf32 codec through assemble →
    decode with exact float32 values."""
    rng = np.random.default_rng(3)
    vals = rng.uniform(-5, 5, 200).astype(np.float32)
    rows = [(int(i // 20), int(i % 20), float(vals[i])) for i in range(200)]
    px = spark.createDataFrame(rows, "row long, col long, value double")
    tiles = PX.assemble_tiles(
        px, grid_id="fgrid", origin=(0.0, 0.0), cellsize=(0.1, -0.1),
        tile=64, ndv=-9999.0, dtype="float32",
    )
    assert tiles.select("fmt").first()["fmt"] == "rawf32"
    back = (
        PX.pixel_table(tiles, valid_only=True)
        .toPandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    assert len(back) == 200
    got = back["value"].to_numpy(dtype=np.float32)
    exp = np.array([v for _, _, v in sorted(rows)], dtype=np.float32)
    assert np.array_equal(got, exp)


def test_catalog_scan_pushes_filters(spark):
    """images_for serves a real parquet scan — a tile_row predicate
    must appear as PushedFilters in the physical plan."""
    import io
    from contextlib import redirect_stdout

    from georasters_spark import queries as Q
    from georasters_spark.sources.catalog import SnapshotTable

    Q.images_for(spark, synth.T1)  # ensures the catalog table exists
    snap = SnapshotTable(f"{Q.TABLES_ROOT}/{synth.T1.grid_id}_raw16").snapshot()
    # mergeSchema changes the logical relation so the cached
    # InMemoryRelation from images_for is NOT substituted — we want to
    # see the raw parquet scan
    raw = spark.read.option("mergeSchema", "true").parquet(*snap["dirs"])
    filtered = raw.filter(F.col("tile_row") == 2).select("image_id", "tile_row")
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "tile_row" in plan.split("PushedFilters")[1][:200] or "InMemory" in plan
    assert filtered.count() == synth.T1.tiles_x


def test_asof_join_semantics(spark):
    """AS-OF: <= match (equal-ts right row matches), most-recent wins,
    deterministic max-id tie-break among equal-ts right rows, NULLs
    when no prior right row, keys never cross."""
    from pyspark.sql import functions as F

    from georasters_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 50), (3, 100, 5), (4, 200, 30)],
        "lid long, user_id long, t long",
    ).select("lid", "user_id", "t")
    right = spark.createDataFrame(
        [(901, 100, 10), (902, 100, 10), (903, 100, 40), (904, 200, 99)],
        "rid long, user_id long, t long",
    ).select("user_id", "t", "rid")
    out = asof_join(left, right, key="user_id", ts="t", right_cols=("rid",)) \
        .toPandas().set_index("lid")
    # t=10: two right rows at exactly t=10 -> equal-ts match, max rid wins
    assert out.loc[1, "asof_rid"] == 902 and out.loc[1, "gap"] == 0
    # t=50: most recent at-or-before is rid 903 (t=40)
    assert out.loc[2, "asof_rid"] == 903 and out.loc[2, "gap"] == 10
    # t=5: nothing at-or-before -> NULLs
    import pandas as pd
    assert pd.isna(out.loc[3, "asof_rid"]) and pd.isna(out.loc[3, "gap"])
    # other user's rows never leak across keys (user 200 t=30 < rid904 t=99)
    assert pd.isna(out.loc[4, "asof_rid"])


def test_asof_join_null_payload_not_torn(spark):
    """A NULL inside ONE right payload column must not tear the output
    into a mix of two right rows: the whole payload struct is carried
    together (code-review regression)."""
    import pandas as pd

    from georasters_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 7, 10)], "lid long, user_id long, t long")
    right = spark.createDataFrame(
        [(7, 5, 1, 2), (7, 8, None, 9)],
        "user_id long, t long, a long, b long",
    )
    out = asof_join(left, right, key="user_id", ts="t",
                    right_cols=("a", "b")).toPandas().iloc[0]
    # most recent right row is (t=8, a=NULL, b=9): take it WHOLE
    assert pd.isna(out["asof_a"]) and out["asof_b"] == 9 and out["asof_ts"] == 8


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check vs an independent oracle: pandas merge_asof
    (direction='backward') on random events with unique timestamps."""
    import numpy as np
    import pandas as pd

    from georasters_spark.operators.temporal import asof_join

    rng = np.random.default_rng(23)
    n_l, n_r = 200, 300
    lt = rng.choice(100000, size=n_l, replace=False)
    rt = rng.choice(100000, size=n_r, replace=False)
    lk = rng.integers(0, 12, n_l)
    rk = rng.integers(0, 12, n_r)
    left_pd = pd.DataFrame({"lid": np.arange(n_l), "user_id": lk, "t": lt})
    right_pd = pd.DataFrame({"user_id": rk, "t": rt, "rid": np.arange(n_r) + 1000})
    left = spark.createDataFrame(left_pd.astype("int64"))
    right = spark.createDataFrame(right_pd.astype("int64"))
    got = asof_join(left, right, key="user_id", ts="t", right_cols=("rid",)) \
        .toPandas().sort_values("lid").reset_index(drop=True)
    exp = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("t"),
        on="t", by="user_id", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(exp) == n_l
    for g, e in zip(got.itertuples(index=False), exp.itertuples(index=False)):
        if pd.isna(e.rid):
            assert pd.isna(g.asof_rid), (g, e)
        else:
            assert g.asof_rid == e.rid, (g, e)


def test_geary_permutation_numpy_mirror(spark):
    """geary_permutation_test == a direct numpy mirror of its seeded
    modular draws: same c_obs as the closed-form Geary C and the same
    n_ge from re-deriving every permutation's pair square-difference
    sum on the driver (reference pysal_Geary permutations=,
    georasters.py:1271-1308)."""
    px = _small_px(spark)
    n_perm, seed = 9, 23
    got = AC.geary_permutation_test(px, n_perm=n_perm, seed=seed).collect()[0]
    same = AC.geary_permutation_test(px, n_perm=n_perm, seed=seed).collect()[0]
    assert got == same  # seeded => reproducible

    pdf = px.toPandas().sort_values(["row", "col"]).reset_index(drop=True)
    n = len(pdf)
    v = pdf["value"].to_numpy(np.int64)
    pos = {(r, c): k for k, (r, c) in enumerate(zip(pdf["row"], pdf["col"]))}
    pairs = [
        (ka, pos[(r + dr, c + dc)])
        for (r, c), ka in pos.items()
        for dr, dc in AC.QUEEN
        if (r + dr, c + dc) in pos
    ]
    s0 = len(pairs)

    def d2(perm_v):
        return sum(int(perm_v[a] - perm_v[b]) ** 2 for a, b in pairs)

    num_obs = d2(v)
    mean = v.mean()
    c_exp = (n - 1) * num_obs / (2.0 * s0 * float(((v - mean) ** 2).sum()))
    assert got["c_obs"] == pytest.approx(c_exp, rel=1e-12)
    n_ge = 0
    ks = np.arange(n, dtype=np.int64)
    for _, amul, badd in AC.permutation_params(n, n_perm, seed)[1:]:
        # the engine rewrites pair key k -> (amul*k + badd) % n and
        # looks the ORIGINAL rank->value table up at the new key
        perm_v = v[(amul * ks + badd) % n]
        if d2(perm_v) >= num_obs:
            n_ge += 1
    assert got["n_ge"] == n_ge
    assert got["p_sim"] == pytest.approx((n_ge + 1) / (n_perm + 1))
