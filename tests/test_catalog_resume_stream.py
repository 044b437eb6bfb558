"""Iceberg-lite snapshots, kill-mid-job resume drill, streaming parity,
multimodal pipeline plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from georasters_spark.operators import multimodal as MM
from georasters_spark.plans import lineage as LN
from georasters_spark.sources.catalog import SnapshotTable
from georasters_spark.streaming import events as EV

SF = "/root/testdata/sf0.01"


def test_snapshot_append_scan_rollback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df1 = spark.range(5).withColumn("tag", F.lit("a"))
    df2 = spark.range(3).withColumn("tag", F.lit("b"))
    v1 = t.append(df1)
    v2 = t.append(df2)
    assert (v1, v2) == (1, 2)
    assert t.scan(spark).count() == 8
    assert t.scan(spark, version=1).count() == 5  # time travel
    t.rollback(1)
    assert t.scan(spark).count() == 5
    t2 = SnapshotTable(str(tmp_path / "tbl"))  # reopen — metadata durable
    assert t2.current_version() == 1


def test_snapshot_overwrite_replaces_content(spark, tmp_path):
    """overwrite = Iceberg REPLACE: the new snapshot IS the table; old
    versions stay time-travelable until expired, then their data dirs
    become orphan-GC-able."""
    import os

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(5).withColumn("tag", F.lit("a")))
    v2 = t.overwrite(spark.range(3).withColumn("tag", F.lit("b")))
    assert v2 == 2
    assert t.scan(spark).count() == 3                      # replaced, not unioned
    assert {r["tag"] for r in t.scan(spark).collect()} == {"b"}
    assert t.scan(spark, version=1).count() == 5           # time travel intact
    v1_dirs = t.snapshot(1)["dirs"]
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError):
        t.scan(spark, version=1)
    gone = t.remove_orphan_files(older_than_seconds=0)
    assert set(gone) >= set(v1_dirs)                       # overwritten data GC'd
    assert t.scan(spark).count() == 3                      # current untouched


def test_rollback_then_commit_never_reuses_versions(spark, tmp_path):
    """Snapshot ids are never reused: rollback(1) on a 3-version table
    followed by a commit creates v4 — the surviving v2/v3 manifests are
    not clobbered and stay time-travelable."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for tag in ("a", "b", "c"):
        t.append(spark.range(2).withColumn("tag", F.lit(tag)))
    t.rollback(1)
    v = t.append(spark.range(1).withColumn("tag", F.lit("d")))
    assert v == 4
    assert t.snapshot(4)["parent"] == 1
    assert {r["tag"] for r in t.scan(spark, version=3).collect()} == {"a", "b", "c"}
    assert {r["tag"] for r in t.scan(spark).collect()} == {"a", "d"}
    assert t.snapshot(4)["operation"] == "append"


def test_resume_after_kill_identical_output(spark, tmp_path):
    """North-rule drill: kill mid-job → resume → identical output, and
    per-partition lineage metrics recorded."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keys = sorted(r["lang"] for r in docs.select("lang").distinct().collect())

    def process(key):
        return (
            docs.filter(F.col("lang") == key)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
            .withColumn("lang", F.lit(key))
        )

    with pytest.raises(RuntimeError, match="simulated failure"):
        LN.resumable_run(spark, "job1", str(tmp_path), keys, process, fail_after=2)
    m1 = LN.metrics(str(tmp_path), "job1")
    assert len(m1) == 2  # two partitions committed before the crash

    out = LN.resumable_run(spark, "job1", str(tmp_path), keys, process)
    m2 = LN.metrics(str(tmp_path), "job1")
    assert len(m2) == len(keys)
    assert {m["key"] for m in m2} == set(keys)
    assert all(m["rows"] > 0 for m in m2)

    oneshot = LN.resumable_run(spark, "job2", str(tmp_path), keys, process)
    a = out.toPandas().sort_values(["lang", "source"]).reset_index(drop=True)
    b = oneshot.toPandas().sort_values(["lang", "source"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_clustered_layout_prunes_files(spark, images_t1, tmp_path):
    """bbox scan over the clustered layout reads a strict subset of
    files (directory-level partition pruning) and the right tiles."""
    from georasters_spark.sources import catalog as CAT
    from georasters_spark.sources import synth

    root = str(tmp_path / "clustered")
    CAT.write_clustered(images_t1, root, res=synth.T1.cell_res, prefix_res=1)
    full = spark.read.parquet(root)
    # west-north quadrant bbox
    sub = CAT.scan_bbox(spark, root, (-170.0, 10.0, -100.0, 80.0), prefix_res=1)
    assert len(sub.inputFiles()) < len(full.inputFiles())
    # pruning is sound: re-filtering the FULL table by the same prefix
    # set yields the same tiles
    got = sorted(r["image_id"] for r in sub.select("image_id").collect())
    pref = CAT.cell_prefix_expr(synth.T1.cell_res, 1)
    import pyspark.sql.functions as F

    wanted = {r["p"] for r in sub.select(F.col("cell_prefix").alias("p")).distinct().collect()}
    exp = sorted(
        r["image_id"]
        for r in full.filter(F.col("cell_prefix").isin(list(wanted))).select("image_id").collect()
    )
    assert got == exp
    # every tile whose center is inside the bbox is present
    inside = images_t1.filter(
        (F.col("xmin") + F.col("w") * F.col("cellx") / 2).between(-170.0, -100.0)
        & (F.col("ymax") + F.col("h") * F.col("celly") / 2).between(10.0, 80.0)
    )
    ids_in = {r["image_id"] for r in inside.select("image_id").collect()}
    assert ids_in <= set(got)


def test_cell_prefix_expr_matches_numpy(spark, images_t1):
    from georasters_spark.functions import cells as C
    from georasters_spark.sources import catalog as CAT
    from georasters_spark.sources import synth

    res = synth.T1.cell_res
    got = (
        images_t1.select("cell_id", CAT.cell_prefix_expr(res, 1).alias("p"))
        .toPandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    exp = np.asarray(C.parent(got["cell_id"].to_numpy(), res - 1))
    assert np.array_equal(got["p"].to_numpy(), exp)


def test_raster_pipeline_resume_drill(spark, images_t1, tmp_path):
    """North-rule drill on the RASTER pipeline: zonal partials keyed by
    tile band, killed mid-job, resumed — final per-zone stats equal the
    direct zonal_stats run."""
    from pyspark.sql import functions as F

    from georasters_spark.operators import spatial_join as SJ
    from georasters_spark.sources import synth

    spec = synth.T1
    kw = dict(origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly))
    bands = [f"band{i}" for i in range(spec.tiles_y)]

    def process(key):
        i = int(key.replace("band", ""))
        sub = images_t1.filter(F.col("tile_row") == i)
        return SJ.zonal_stats_fused(sub, synth.ZONES_T1, **kw).select(
            "zone_id", "zcount", "zsum", "zmin", "zmax"
        )

    with pytest.raises(RuntimeError, match="simulated failure"):
        LN.resumable_run(spark, "rjob", str(tmp_path), bands, process, fail_after=2)
    assert len(LN.metrics(str(tmp_path), "rjob")) == 2

    parts = LN.resumable_run(spark, "rjob", str(tmp_path), bands, process)
    merged = (
        parts.groupBy("zone_id")
        .agg(
            F.sum("zcount").alias("zcount"),
            F.sum("zsum").alias("zsum"),
            F.min("zmin").alias("zmin"),
            F.max("zmax").alias("zmax"),
        )
        .toPandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    direct = (
        SJ.zonal_stats_fused(images_t1, synth.ZONES_T1, **kw)
        .select("zone_id", "zcount", "zsum", "zmin", "zmax")
        .toPandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, direct)


def test_streaming_rollup_matches_batch(spark):
    got = (
        EV.run_rollup_stream(spark, SF, query_name="t_rollup")
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    exp = (
        EV.rollup_batch(spark, SF)
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_stateful_user_totals_matches_batch(spark):
    """applyInPandasWithState per-user running totals == batch groupBy
    (single-file source ⇒ final state equals the batch aggregate)."""
    got = (
        EV.run_user_totals_stream(spark, SF, query_name="t_totals")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = (
        EV.user_totals_batch(spark, SF)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"user_id": "int64", "n_events": "int64"}),
        exp.astype({"user_id": "int64", "n_events": "int64"}),
        check_dtype=False,
    )


def test_stream_ingest_to_catalog_exactly_once(spark, images_t1, tmp_path):
    """Streaming tiles land in the catalog one snapshot per micro-batch;
    re-running the stream (checkpoint-free replay) adds NOTHING because
    the batch-id idempotence guard skips committed batches."""
    from georasters_spark.sources.catalog import SnapshotTable
    from georasters_spark.streaming.events import stream_ingest_to_catalog

    # stage 3 parquet files of tiles as the "arriving" stream
    src = str(tmp_path / "arrivals")
    meta = images_t1.select("image_id", "tile_row", "tile_col", "phash")
    meta.filter(F.col("tile_row") < 2).write.parquet(f"{src}/f0")
    meta.filter(F.col("tile_row") == 2).write.parquet(f"{src}/f1")
    meta.filter(F.col("tile_row") > 2).write.parquet(f"{src}/f2")
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    import os

    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:03d}.parquet")

    root = str(tmp_path / "tiles_tbl")
    schema = meta.schema
    v1 = stream_ingest_to_catalog(spark, flat, schema, root, query_name="ing1")
    tbl = SnapshotTable(root)
    assert tbl.scan(spark).count() == 45
    assert v1 >= 1

    # replay from scratch: same files, fresh stream → idempotent
    v2 = stream_ingest_to_catalog(spark, flat, schema, root, query_name="ing2")
    assert tbl.scan(spark).count() == 45
    assert v2 == v1

    # a FOREIGN append (no max_batch_id prop) landing on the same table
    # must not reset the idempotence guard: the chain walk skips it
    tbl.append(meta.limit(1), props={"note": "manual backfill"})
    v3 = stream_ingest_to_catalog(spark, flat, schema, root, query_name="ing3")
    assert tbl.scan(spark).count() == 46  # only the manual row was added
    assert v3 == v2 + 1

    # a DIFFERENT source stream into the same table has its own batch-id
    # sequence: the source-scoped guard must NOT skip its batches
    flat2 = str(tmp_path / "flat2")
    os.makedirs(flat2)
    shutil.copy(sorted(glob.glob(f"{src}/f0/part-*.parquet"))[0], f"{flat2}/000.parquet")
    n_before = tbl.scan(spark).count()
    stream_ingest_to_catalog(spark, flat2, schema, root, query_name="ing4")
    assert tbl.scan(spark).count() > n_before  # new source really landed


def test_multimodal_features_and_resize(spark, images_t1):
    feats = MM.image_features(images_t1.limit(8)).toPandas()
    assert len(feats) == 8
    assert (feats.f_entropy >= 0).all() and (feats.f_entropy <= 4).all()
    small = MM.image_resize(images_t1.limit(4), 8, 8).toPandas()
    assert set(small.w) == {8} and set(small.h) == {8}
    arr = np.frombuffer(small.bytes.iloc[0], dtype="<f4")
    assert arr.shape == (64,)


def test_multiband_band_select(spark):
    """Band-sequential multi-band tiles: band_select(b) is a pure JVM
    substring and the selected plane decodes to exactly band b."""
    from georasters_spark.operators.multimodal import band_select, encode_multiband
    from georasters_spark.sources import codec, synth

    bands = [synth.tile_array(synth.GridSpec(seed=s), 1, 2) for s in (42, 43, 44)]
    row = [("mb_0001_0002", encode_multiband(bands), 64, 64, 3, "raw16x3",
            -9999.0, 1, 2)]
    df = spark.createDataFrame(
        row,
        "image_id string, bytes binary, w int, h int, n_bands int, fmt string, "
        "ndv double, tile_row int, tile_col int",
    )
    for b in (1, 2, 3):
        sel = band_select(df, b).collect()[0]
        assert sel["fmt"] == "raw16" and sel["band"] == b
        dec = codec.decode_tile(bytes(sel["bytes"]), "raw16", 64, 64, -9999.0)
        assert np.array_equal(np.asarray(dec, dtype=np.int16), bands[b - 1])


def test_multimodal_fake_decode_deterministic_and_stub_boundary(spark):
    a1 = MM.decode_any(b"hello", "fake", 16, 16)
    a2 = MM.decode_any(b"hello", "fake", 16, 16)
    assert np.array_equal(a1, a2)
    assert a1.shape == (16, 16)
    # jpeg is a REAL codec now (sources/jpeg.py): corrupt bytes raise
    # ValueError; the remaining stub boundary is webp/mp3/mp4
    with pytest.raises(ValueError):
        MM.decode_any(b"\xff\xd8\xff", "jpeg", 16, 16)
    with pytest.raises(NotImplementedError):
        MM.decode_any(b"\xff\xd8\xff", "webp", 16, 16)


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, 4000), (2, 1000)], "video_id long, duration_ms long"
    )
    out = MM.frame_sample(vids, n_frames=4).toPandas()
    assert len(out) == 8
    v1 = out[out.video_id == 1].sort_values("frame_idx")
    assert list(v1.offset_ms) == [0, 1000, 2000, 3000]


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization (applyInPandasWithState, one
    micro-batch per file) == the batch window sessionize over the same
    events, when events arrive in timestamp order."""
    import georasters_spark.queries as Q
    from georasters_spark.streaming.events import run_sessionize_stream

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").orderBy("ts")
    n = ev.count()
    src = str(tmp_path / "sessions_src")
    # three ts-ordered arrival files = three micro-batches
    ev.limit(n // 3).write.parquet(f"{src}/f0")
    ev.orderBy("ts").offset(n // 3).limit(n // 3).write.parquet(f"{src}/f1")
    ev.orderBy("ts").offset(2 * (n // 3)).write.parquet(f"{src}/f2")
    import glob
    import os
    import shutil

    flat = str(tmp_path / "sessions_flat")
    os.makedirs(flat)
    import time

    base = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        # FileStreamSource batches by file mtime: pin strictly
        # increasing mtimes so arrival order == timestamp order (the
        # operator's documented contract)
        os.utime(dst, (base + i, base + i))

    got = run_sessionize_stream(spark, flat).toPandas() \
        .sort_values(["user_id", "sess_no"]).reset_index(drop=True)
    exp = Q.q_sessionize(spark, sf).toPandas() \
        .sort_values(["user_id", "sess_no"]).reset_index(drop=True)
    exp = exp[["user_id", "sess_no", "sess_start", "sess_end", "n_events", "sess_value"]]
    got = got[["user_id", "sess_no", "sess_start", "sess_end", "n_events", "sess_value"]]
    pd.testing.assert_frame_equal(
        got.astype({"sess_value": "float64"}), exp.astype({"sess_value": "float64"}),
        check_dtype=False, atol=1e-9,
    )
    assert len(got) > 50  # real multi-session data


def test_expire_snapshots_and_orphan_gc(spark, tmp_path):
    """Iceberg-maintenance analogs: expiring old snapshots keeps the
    current table readable; orphan GC removes crash garbage and
    expired-only data dirs, never referenced ones."""
    import os

    t = SnapshotTable(str(tmp_path / "m"))
    t.append(spark.range(4).withColumn("tag", F.lit("a")))
    t.append(spark.range(2).withColumn("tag", F.lit("b")))
    t.append(spark.range(1).withColumn("tag", F.lit("c")))
    # plant crash garbage: a data dir referenced by no manifest
    os.makedirs(os.path.join(str(tmp_path / "m"), "data", "snap-99-deadbeef"))

    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    assert t.scan(spark).count() == 7  # current contents untouched
    # time travel to expired versions is gone — None (end-of-chain for
    # parent walks like the streaming high-water-mark), not an exception
    assert t.snapshot(1) is None

    # retention window: a FRESH unreferenced dir (indistinguishable
    # from an in-flight concurrent append) is NOT deleted...
    assert t.remove_orphan_files() == []
    # ...but crash garbage older than the window is
    removed = t.remove_orphan_files(older_than_seconds=0)
    assert any("snap-99-deadbeef" in r for r in removed)
    # all three data dirs remain referenced by the surviving snapshot
    assert t.scan(spark).count() == 7
    assert len([d for d in os.listdir(os.path.join(str(tmp_path / "m"), "data"))]) == 3


def test_audio_windows_plumbing(spark):
    """Audio analysis windows: overlapping [start, end) spans covering
    each clip, last window clamped to the clip duration."""
    clips = spark.createDataFrame(
        [(1, 2600), (2, 900), (3, 0)], "audio_id long, duration_ms long"
    )
    w = MM.audio_windows(clips, window_ms=1000, hop_ms=500).toPandas()
    c1 = w[w.audio_id == 1].sort_values("window_idx")
    assert list(c1.start_ms) == [0, 500, 1000, 1500]
    assert list(c1.end_ms) == [1000, 1500, 2000, 2500]
    c2 = w[w.audio_id == 2]
    assert len(c2) == 1 and c2.end_ms.iloc[0] == 900  # clamped to duration
    c3 = w[w.audio_id == 3]
    assert len(c3) == 1 and c3.end_ms.iloc[0] == 0
    # the decode side stays a declared stub boundary
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        MM.decode_any(b"\x00\x01", "mp3", 4, 4)


def test_wav_codec_real_roundtrip():
    """The WAV leg is a REAL codec: encode emits a genuine RIFF/WAVE
    PCM16 container (stdlib-independent header check), decode recovers
    the samples and rate bit-for-bit; compressed formats still raise."""
    import numpy as np
    import pytest

    from georasters_spark.operators import multimodal as MM

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, 4321).astype(np.int16)
    buf = MM.encode_wav_pcm16(s, 8000)
    # real RIFF/WAVE layout, not a bespoke blob
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    assert buf[12:16] == b"fmt "
    got, rate = MM.decode_audio(buf, "wav")
    assert rate == 8000
    assert np.array_equal(got, s)
    with pytest.raises(NotImplementedError):
        MM.decode_audio(buf, "mp3")


def test_audio_features_vs_numpy(spark):
    """audio_features == direct numpy on the same decoded samples
    (window slicing, integer energy, sign-flip zcr, unrounded rms)."""
    import numpy as np
    import pandas as pd

    from georasters_spark.operators import multimodal as MM

    rate, dur = 8000, 1300
    n = dur * rate // 1000
    i = np.arange(n, dtype=np.int64)
    s = (((i * 31 + 7) % 4001) - 2000).astype(np.int16)
    buf = MM.encode_wav_pcm16(s, rate)
    df = spark.createDataFrame(
        pd.DataFrame([{"audio_id": 1, "bytes": buf, "fmt": "wav", "duration_ms": dur}]),
        "audio_id long, bytes binary, fmt string, duration_ms long",
    )
    got = MM.audio_features(df, window_ms=500, hop_ms=250).toPandas()
    assert len(got) == (dur - 500) // 250 + 1
    sl = s.astype(np.int64)
    for t in got.itertuples(index=False):
        a = t.start_ms * rate // 1000
        b = t.end_ms * rate // 1000
        win = sl[a:b]
        assert t.n_samples == b - a
        assert t.energy == int((win * win).sum())
        pos = win >= 0
        assert t.zcr == int((pos[1:] != pos[:-1]).sum())
        assert t.rms == float(np.sqrt(int((win * win).sum()) / (b - a)))


def test_stream_stream_attribution_matches_batch(spark):
    """Watermarked stream-stream interval join (two file-stream
    sources, append sink) produces EXACTLY the batch join's rows."""
    from pyspark.sql import functions as F

    got = (
        EV.run_attribution_stream(spark, SF, query_name="t_attrib")
        .toPandas()
        .sort_values(["buy_id", "view_id"])
        .reset_index(drop=True)
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = (
        EV.attribution_join(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
        )
        .toPandas()
        .sort_values(["buy_id", "view_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0
    assert (got["gap_s"] >= 0).all() and (got["gap_s"] <= 7200).all()


def test_attribution_state_eviction_is_bounded(spark, tmp_path):
    """Pins the bounded-state claim of the watermarked attribution
    join: a 3-batch drill with event time advancing 4 hours per batch
    must actually EVICT state older than watermark + lookback — the
    join state may never accumulate every view ever seen, or a
    100-TB/week stream would OOM its state store."""
    import datetime as dt

    landing = tmp_path / "landing"
    landing.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    n_views_per_batch = 40
    for batch in range(3):
        base = t0 + dt.timedelta(hours=4 * batch)
        rows = [
            (batch * 1000 + i, base + dt.timedelta(minutes=i % 30),
             i % 7, "view", 0.0, "{}")
            for i in range(n_views_per_batch)
        ] + [
            (batch * 1000 + 900 + u, base + dt.timedelta(minutes=45),
             u, "purchase", 9.99, "{}")
            for u in range(7)
        ]
        spark.createDataFrame(rows, EV.EVENT_SCHEMA).coalesce(1).write.parquet(
            str(landing / f"b{batch}"))

    def src():
        return (spark.readStream.schema(EV.EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(landing) + "/*"))

    views = src().filter(F.col("event_type") == "view")
    buys = src().filter(F.col("event_type") == "purchase")
    q = (
        EV.attribution_join(views, buys, lookback="2 hours", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attrib_evict")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p.get("stateOperators")]
        assert progress, "no state-operator progress recorded"
        removed = sum(
            so.get("numRowsRemoved", 0)
            for p in progress for so in p["stateOperators"]
        )
        final_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    total_input = 3 * (n_views_per_batch + 7)
    # eviction must have happened, and the final state must be smaller
    # than the total input (batches 1-2 are beyond watermark+lookback
    # of batch 3's event time, 8h later)
    assert removed > 0, "watermark+lookback never evicted any state rows"
    assert final_rows < total_input, (final_rows, total_input)
    # joined output is still the exact batch answer
    ev = spark.read.parquet(str(landing) + "/*")
    exp = EV.attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        lookback="2 hours",
    ).count()
    assert spark.table("t_attrib_evict").count() == exp


def test_file_manifest_minmax_skipping(spark, images_t1, tmp_path):
    """r5: per-file cell_id min/max skipping (Iceberg data-file
    manifest analog) reads strictly FEWER files than directory-only
    pruning on a multi-file-per-partition layout, with identical
    results."""
    import pyspark.sql.functions as F
    from georasters_spark.sources import catalog as CAT
    from georasters_spark.sources import synth

    res = synth.T1.cell_res
    root = str(tmp_path / "clustered_mf")
    # range_files=24: several files per partition dir, tight disjoint
    # cell_id spans within each (the skewed layout of the verdict item)
    CAT.write_clustered(images_t1, root, res=res, prefix_res=1,
                        range_files=24)
    import json as js
    import os as osp
    man = js.load(open(osp.path.join(root, "_file_manifest.json")))
    assert len(man) >= 8  # genuinely multi-file
    assert all(v[0] is not None and v[0] <= v[1] for v in man.values())

    bbox = (-170.0, 10.0, -100.0, 80.0)
    dir_only = CAT.scan_bbox(spark, root, bbox, prefix_res=1)
    skipped = CAT.scan_bbox(spark, root, bbox, prefix_res=1, res=res)
    n_dir, n_skip = len(dir_only.inputFiles()), len(skipped.inputFiles())
    assert n_skip < n_dir, (n_skip, n_dir)

    # skipping is SOUND: every tile intersecting the bbox cell
    # intervals survives — compare against brute-force cell filter
    ivals = CAT.bbox_cell_intervals(bbox, res, skip_res=3)
    cond = None
    for lo, hi in ivals:
        c = F.col("cell_id").between(lo, hi)
        cond = c if cond is None else (cond | c)
    exp = sorted(r["image_id"] for r in
                 spark.read.parquet(root).filter(cond).select("image_id").collect())
    got_ids = {r["image_id"] for r in skipped.select("image_id").collect()}
    assert set(exp) <= got_ids
    # and the skipped scan is a subset of the directory scan
    dir_ids = {r["image_id"] for r in dir_only.select("image_id").collect()}
    assert got_ids <= dir_ids


def test_incremental_dedup_stream_matches_full_batch(spark, tmp_path):
    """The streaming CDC dedup loop (probe archive -> land pairs ->
    append archive) accumulates EXACTLY the full-corpus
    minhash_dedup_pairs: every pair surfaces once, at the batch where
    its later member arrives."""
    import glob
    import os
    import shutil
    import time

    from georasters_spark.operators import dedup as DD
    from georasters_spark.streaming.events import run_incremental_dedup_stream

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("doc_id", "source", "text")
    n = docs.count()
    src = str(tmp_path / "cdc_src")
    d = docs.orderBy("doc_id")
    d.limit(n // 3).write.parquet(f"{src}/f0")
    d.offset(n // 3).limit(n // 3).write.parquet(f"{src}/f1")
    d.offset(2 * (n // 3)).write.parquet(f"{src}/f2")
    flat = str(tmp_path / "cdc_flat")
    os.makedirs(flat)
    base = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i, base + i))

    got = run_incremental_dedup_stream(
        spark, flat, str(tmp_path / "cdc_work")).toPandas()
    full = DD.minhash_dedup_pairs(docs, n=3, threshold=0.5).toPandas()
    assert len(full) > 0
    canon_g = {tuple(sorted((int(t.doc_a), int(t.doc_b)))): t.jaccard
               for t in got.itertuples(index=False)}
    canon_f = {tuple(sorted((int(t.doc_a), int(t.doc_b)))): t.jaccard
               for t in full.itertuples(index=False)}
    assert canon_g == canon_f
    assert len(canon_g) == len(got)  # no pair emitted twice
    # kinds are consistent with batch membership
    b = n // 3
    for t in got.itertuples(index=False):
        same = (min(t.doc_a, t.doc_b) // b == min(t.doc_b // b, 2)
                and (t.doc_a // b if t.doc_a // b < 2 else 2)
                == (t.doc_b // b if t.doc_b // b < 2 else 2))
        assert t.kind == ("new_new" if same else "new_old")
