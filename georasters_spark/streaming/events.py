"""Structured Streaming ingest: windowed event rollups.

The reference has no streaming (SURVEY §2.11); this is the engine's
ingest path for continuous tile/caption telemetry: readStream →
watermark → windowed aggregate → sink. The batch/stream parity test
(stream result == batch groupBy on the same files) is the correctness
gate — Structured Streaming guarantees it for complete-mode aggs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def rollup_agg(df):
    agg = df.withWatermark("ts", "1 hour").groupBy(
        F.window("ts", "6 hours"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
    return agg.select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        "event_type",
        "n_events",
        "sum_value",
        "approx_users",
    )




def _landing_dir(sf_dir: str) -> str:
    """File-stream sources need a DIRECTORY: expose the single parquet
    file through a temp dir of symlinks (a real deployment points at a
    landing directory / Kafka topic instead). Shared by every stream
    driver in this module."""
    import hashlib
    import os

    src_dir = f"/tmp/georasters_stream_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events-000.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    return src_dir


def run_rollup_stream(spark, sf_dir: str, query_name: str = "rollup"):
    """Drive the streaming rollup to completion over the parquet events
    table (memory sink, complete mode) and return the result DF."""
    src_dir = _landing_dir(sf_dir)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        rollup_agg(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)


def rollup_batch(spark, sf_dir: str):
    """The batch oracle for the same rollup."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rollup_agg(df)


# ---------------------------------------------------------------------------
# custom stateful operator: per-user running totals via
# applyInPandasWithState (the arbitrary-state API the north rule's
# streaming surface calls for)
# ---------------------------------------------------------------------------

def _user_totals_fn(key, pdf_iter, state):
    import pandas as pd

    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def run_user_totals_stream(spark, sf_dir: str, query_name: str = "usertotals"):
    """Stateful streaming: per-user cumulative event count + value sum,
    kept in explicit group state across micro-batches."""
    src_dir = _landing_dir(sf_dir)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends each update; keep the last per user
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    t = spark.table(query_name)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return t.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def stream_ingest_to_catalog(spark, src_dir: str, schema, table_root: str,
                             query_name: str = "ingest") -> int:
    """Streaming ingest into the Iceberg-lite catalog with exactly-once
    sink semantics: each micro-batch commits as ONE snapshot via
    foreachBatch (idempotence by batch-id property — a replayed batch
    is skipped when its id is already committed). Returns the final
    table version."""
    from ..sources.catalog import SnapshotTable, source_high_water_mark

    tbl = SnapshotTable(table_root)

    def sink(batch_df, batch_id: int):
        if batch_id <= source_high_water_mark(tbl, src_dir):
            return  # replay after restart: already committed
        tbl.append(
            batch_df,
            props={"max_batch_id": batch_id, "ingest_query": query_name,
                   "source": src_dir},
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return tbl.current_version()


def user_totals_batch(spark, sf_dir: str):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# stateful streaming sessionization: the streaming form of the batch
# sessionize gate (queries.q_sessionize) via applyInPandasWithState —
# per-user open-session state survives across micro-batches; closed
# sessions are emitted as soon as the gap rule fires, the open session
# is emitted as an update each batch (latest row per (user, sess_no)
# wins downstream).
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800


def _session_fn(key, pdf_iter, state):
    import pandas as pd

    (user_id,) = key
    if state.exists:
        last_t, sess_no, start, n, val = state.get
    else:
        last_t, sess_no, start, n, val = -1, 0, 0, 0, 0.0
    rows = []
    events = pd.concat(list(pdf_iter))
    # batch order rule identical to the batch window: (t, value)
    events = events.sort_values(["t", "value"])
    for t, v in zip(events["t"].astype("int64"), events["value"].astype("float64")):
        t, v = int(t), float(v)
        if sess_no == 0 or t - last_t > SESSION_GAP_S:
            if sess_no > 0:  # close the previous session
                rows.append((user_id, sess_no, start, last_t, n, round(val, 4)))
            sess_no += 1
            start, n, val = t, 0, 0.0
        n += 1
        val += v
        last_t = t
    state.update((last_t, sess_no, start, n, val))
    rows.append((user_id, sess_no, start, last_t, n, round(val, 4)))  # open session
    yield pd.DataFrame(
        rows,
        columns=["user_id", "sess_no", "sess_start", "sess_end", "n_events", "sess_value"],
    )


def run_sessionize_stream(spark, src_dir: str, query_name: str = "sessions"):
    """Drive the stateful sessionizer over a directory of
    time-ordered event files (one file per micro-batch) and return the
    final per-(user, session) rows — comparable 1:1 with the batch
    sessionize query when events arrive in timestamp order."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            "user_id",
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias("t"),
            "value",
        )
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=(
            "user_id long, sess_no long, sess_start long, sess_end long, "
            "n_events long, sess_value double"
        ),
        stateStructType="last_t long, sess_no long, start long, n long, val double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    t = spark.table(query_name)
    w = W.partitionBy("user_id", "sess_no").orderBy(F.desc("n_events"), F.desc("sess_end"))
    return (
        t.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


def attribution_join(views, buys, lookback: str = "2 hours",
                     watermark: str = "1 hour"):
    """Stream-stream (or batch-batch: same code path) attribution
    join: each purchase joins every view by the SAME user within
    `lookback` before it — the canonical watermarked interval join.
    On streams, both sides carry watermarks so Spark can bound the
    join state buffer (views older than watermark+lookback are
    evicted); on static frames withWatermark is skipped and the plan
    is a plain range-condition join. Output is identical either way
    (parity-tested), so the batch form is the DuckDB-oracle gate."""
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
    if buys.isStreaming:
        buys = buys.withWatermark("ts", watermark)
    v = views.select(
        F.col("user_id"), F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    b = buys.select(
        F.col("user_id"), F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
        F.round(F.col("value"), 6).alias("buy_value"),
    )
    j = b.join(
        v,
        (b.user_id == v.user_id)
        & (F.col("view_ts") <= F.col("buy_ts"))
        & (F.col("view_ts") >= F.col("buy_ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    ).drop(v.user_id)
    return j.select(
        "buy_id", "user_id", "buy_ts", "buy_value", "view_id", "view_ts",
        (F.unix_timestamp("buy_ts") - F.unix_timestamp("view_ts"))
        .cast("long").alias("gap_s"),
    )


def run_attribution_stream(spark, sf_dir: str, query_name: str = "attrib"):
    """Drive the stream-stream attribution join to completion (two
    file-stream sources over the same landing dir, append sink)."""
    src_dir = _landing_dir(sf_dir)

    def src():
        return (spark.readStream.schema(EVENT_SCHEMA)
                .option("maxFilesPerTrigger", 1).parquet(src_dir))

    views = src().filter(F.col("event_type") == "view")
    buys = src().filter(F.col("event_type") == "purchase")
    q = (
        attribution_join(views, buys)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)


def run_incremental_dedup_stream(spark, src_dir: str, work_dir: str,
                                 query_name: str = "cdcdedup",
                                 n: int = 3, threshold: float = 0.5):
    """The CDC dedup loop as a STREAM: each micro-batch of documents
    probes the archive of everything already ingested
    (dedup.incremental_minhash_pairs — new×old via the band index plus
    new×new), lands its near-dup pairs, and appends itself to the
    archive. Every pair is emitted exactly once — at the batch where
    its LATER member arrives — so the union over batches equals the
    full-corpus minhash_dedup_pairs (parity-tested). Replay-safe: BOTH
    pairs and the archive land under per-batch paths written with
    overwrite, and a batch only ever reads STRICTLY EARLIER archive
    batches — a replayed batch redoes identical work and never probes
    itself.

    Returns the accumulated pairs DataFrame (doc_a, doc_b, jaccard,
    kind, batch_id)."""
    import glob
    import os

    from pyspark.sql import types as T

    from ..operators.dedup import incremental_minhash_pairs

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    archive_root = os.path.join(work_dir, "archive")
    pairs_root = os.path.join(work_dir, "pairs")

    def sink(batch_df, batch_id: int):
        new = batch_df.select("doc_id", "source", "text")
        # the corpus = STRICTLY EARLIER batches: per-batch archive dirs
        # keyed by the checkpoint-sequence batch id make both sides of
        # the loop idempotent — a replayed batch overwrites its own
        # archive/pairs dirs and never sees itself (or later batches)
        # in `old`
        older = [d for d in sorted(glob.glob(f"{archive_root}/b*"))
                 if int(os.path.basename(d)[1:]) < batch_id]
        if older:
            old = spark.read.parquet(*older).select("doc_id", "source", "text")
        else:
            old = spark.createDataFrame([], schema)
        pairs = incremental_minhash_pairs(new, old, n=n, threshold=threshold)
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite").parquet(os.path.join(pairs_root, f"b{batch_id:05d}"))
        new.write.mode("overwrite").parquet(
            os.path.join(archive_root, f"b{batch_id:05d}"))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(os.path.join(pairs_root, "b*"))
