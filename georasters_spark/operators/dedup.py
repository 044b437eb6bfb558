"""Deduplication operators for the training-data pipeline (caption /
document side of the image+caption table).

* exact_dedup      — hash-groupBy on a normalization key; keeper =
                     min(doc_id). One shuffle, map-side partial agg.
* shingles         — distinct word n-gram shingles per doc (JVM-side
                     split/explode; no Python in the hot path).
* jaccard_pairs    — exact n-gram Jaccard via shingle-inverted-index
                     self-join; O(Σ postings²) only within identical
                     shingles (never a doc×doc cross join). At 100 TB:
                     frequent shingles are capped (df_cap) — standard
                     posting-list pruning; the cap only drops shingles
                     shared by > df_cap docs, which cannot create NEW
                     pairs above the threshold when docs also share
                     rarer shingles (and stop-shingles that frequent
                     carry no dedup signal).
* minhash_signatures / lsh_candidate_pairs — MinHash + banded LSH:
  signature h_i = min over shingles of (a_i*x + b_i mod p), bands of
  r rows hashed to buckets, candidates = docs sharing a bucket.
  Verified against exact Jaccard (pytest); the gated query re-verifies
  candidates with exact Jaccard so output = exact pairs (LSH is the
  scale path, exactness comes from the verify step).
* simhash64        — 64-bit SimHash over token hashes; near-dup =
  hamming distance <= d via 4-band exact-match blocking.
* simhash_md5 / simhash_near_dup — 60-bit SimHash variant whose token
  hash (first 15 hex chars of md5) both Spark and DuckDB compute
  identically, so the banded near-dup pipeline is EXACTLY oracle-able;
  banding with max_hamming < bands guarantees full recall (pigeonhole:
  a pair differing in <= h bits has at least one intact band), and the
  exact bit_count verify makes banded == brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps a*x+b inside int64 (a, x < 2^31 ⇒
# a*x < 2^62) so the MinHash fold is pure vectorized numpy — no
# arbitrary-precision Python ints in the per-doc hot path
MERSENNE = (1 << 31) - 1


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("w", F.split(F.col(text_col), " "))


def exact_dedup(docs: DataFrame, key_words: int | None = None) -> DataFrame:
    """Group documents by (a prefix-normalized) content key.
    key_words=None → full text key. Returns one row per group:
    (keeper_id, n_copies, member_ids sorted)."""
    if key_words is None:
        key = F.col("text")
    else:
        key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, key_words), " ")
    g = docs.select(F.col("doc_id"), key.alias("k")).groupBy("k").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.sort_array(F.collect_list("doc_id")).alias("member_ids"),
    )
    return g.select("keeper_id", "n_copies", "member_ids")


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams — pure JVM expressions.
    Documents shorter than n tokens yield no shingles (F.sequence would
    otherwise generate a DESCENDING range and slice() would throw)."""
    t = tokens(docs).filter(F.size("w") >= n)
    idx = t.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.size("w") - n)).alias("i"),
    )
    sh = idx.select(
        "doc_id",
        F.array_join(F.slice(F.col("w"), F.col("i") + 1, n), " ").alias("shingle"),
    )
    return sh.distinct()


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, df_cap: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold pairs (doc_a < doc_b)."""
    sh = shingles(docs, n)
    if df_cap is not None:
        freq = sh.groupBy("shingle").count().filter(F.col("count") <= df_cap)
        sh = sh.join(freq.select("shingle"), "shingle")
    # the shingle table feeds the pair generation AND the per-doc counts
    # — without the checkpoint the explode+distinct lineage executed up
    # to 4x (the broadcast boundary defeats exchange reuse)
    sh = sh.localCheckpoint(eager=True)
    # one row per doc — checkpointed because BOTH broadcast joins below
    # consume it and the renamed attribute chains defeat exchange reuse
    # (the plan otherwise re-aggregates the shingle table per join)
    cnts = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nsh")).localCheckpoint(eager=True)
    # pair generation from sorted posting lists: ONE exchange keyed by
    # shingle + a JVM higher-order-function explode, instead of the
    # two-sided self-join shuffle; per shingle the emitted (a < b)
    # pairs are exactly the join's.  Postings longer than _HOT cannot
    # materialize their O(p²) struct array in one row (a stop-shingle
    # with 100k docs would OOM the task) — those few hot shingles route
    # through the streaming self-join instead, same pair multiset.
    _HOT = 1024
    # checkpointed: the small/hot split below reads it twice, and the
    # grouped collect_list must not re-aggregate per branch
    plists = (sh.groupBy("shingle")
              .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
              .filter(F.size("ds") >= 2)).localCheckpoint(eager=True)
    pairs = plists.filter(F.size("ds") <= _HOT).select(F.explode(F.expr(
        "flatten(transform(ds, (x, i) -> transform("
        "slice(ds, i + 2, size(ds) - i - 1), "
        "y -> struct(x AS doc_a, y AS doc_b))))")).alias("p")
    ).select("p.doc_a", "p.doc_b")
    hot = plists.filter(F.size("ds") > _HOT).select(
        "shingle", F.explode("ds").alias("doc_id"))
    hot_pairs = (hot.select("shingle", F.col("doc_id").alias("doc_a"))
                 .join(hot.select("shingle", F.col("doc_id").alias("doc_b")),
                       "shingle")
                 .filter(F.col("doc_a") < F.col("doc_b"))
                 .select("doc_a", "doc_b"))
    inter = pairs.unionByName(hot_pairs).groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("inter"))
    ratio = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    j = (
        inter.join(cnts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nsh", "na"), "doc_a")
        .join(cnts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nsh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(ratio, 6))
    )
    # threshold on the UNROUNDED ratio (matches the SQL oracle exactly,
    # incl. boundary values within 5e-7 of the threshold)
    return j.filter(ratio >= threshold).select(
        "doc_a", "doc_b", F.col("inter").cast("long").alias("inter"), "jaccard"
    )


def _hash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 64, seed: int = 7
) -> DataFrame:
    """(doc_id, sig array<long>) — Arrow-batched numpy MinHash over
    xxhash64 shingle keys (JVM hash, Python only folds minima)."""
    a, b = _hash_params(num_hashes, seed)
    a2 = a.reshape(-1, 1)  # (H, 1)
    b2 = b.reshape(-1, 1)
    sh = shingles(docs, n).select("doc_id", F.xxhash64("shingle").alias("h"))

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["h"].to_numpy(dtype=np.int64) % MERSENNE  # (S,), in [0, p)
        sig = ((a2 * x.reshape(1, -1) + b2) % MERSENNE).min(axis=1)  # (H,)
        return pd.DataFrame({"doc_id": [key[0]], "sig": [sig.tolist()]})

    return sh.groupBy("doc_id").applyInPandas(fold, schema="doc_id long, sig array<long>")


def _band_rows(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, bucket): the banded-LSH inverted-index rows — the
    ONE place the bucket hash is defined (lsh_candidate_pairs,
    minhash_band_index and the incremental probe all share it)."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.xxhash64(F.slice("sig", i * rows + 1, rows).cast("string")).alias("bucket"),
                )
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """Banded LSH: docs sharing any band bucket → candidate pair."""
    banded = _band_rows(sigs, bands, rows)
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _jaccard_verify(cand: DataFrame, docs: DataFrame, n: int,
                    threshold: float, keep_cols: tuple = ()) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b [, keep_cols])
    candidates against the docs' shingle sets — the ONE verify block
    minhash_dedup_pairs and incremental_minhash_pairs share."""
    sh = shingles(docs, n)
    cnts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", *keep_cols)
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ratio = (F.col("inter").cast("double")
             / (F.col("na") + F.col("nb") - F.col("inter")))
    j = (
        inter
        .join(cnts.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("nsh", "na"), "doc_a")
        .join(cnts.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("nsh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(ratio, 6))
    )
    return j.filter(ratio >= threshold).select(
        "doc_a", "doc_b", "jaccard", *keep_cols)


def minhash_dedup_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
) -> DataFrame:
    """LSH candidates re-verified with exact Jaccard — the scale path
    whose output equals the brute-force pairs (for thresholds where the
    banding curve gives ~1 recall; verified in pytest)."""
    sigs = minhash_signatures(docs, n, num_hashes)
    cand = lsh_candidate_pairs(sigs, bands, rows)
    return _jaccard_verify(cand, docs, n, threshold)


def phash_near_dup_pairs(
    images: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """IMAGE near-duplicate pairs by perceptual-hash Hamming distance.

    Banded blocking on the 64-bit phash: by pigeonhole, any pair with
    Hamming distance < n_bands shares at least one exact band, so the
    block is EXACT iff max_hamming <= n_bands - 1. The constructor
    enforces that: callers wanting a larger radius must raise n_bands
    (e.g. 8 bands of 8 bits covers max_hamming <= 7 at the cost of
    coarser buckets). Candidates are always verified exactly.
    Returns (img_a, img_b, hamming).
    """
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banded blocking with {n_bands} bands only guarantees recall "
            f"for max_hamming <= {n_bands - 1}; raise n_bands"
        )
    assert 64 % n_bands == 0
    bw = 64 // n_bands
    mask = (1 << bw) - 1
    banded = images.select(
        F.col("image_id"),
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("phash"), i * bw).bitwiseAND(F.lit(mask)).alias("bits"),
                )
                for i in range(n_bands)
            ])
        ).alias("bb"),
    ).select("image_id", "phash", "bb.band", "bb.bits")
    l = banded.select(F.col("image_id").alias("img_a"), F.col("phash").alias("ha"), "band", "bits")
    r = banded.select(F.col("image_id").alias("img_b"), F.col("phash").alias("hb"), "band", "bits")
    cand = (
        l.join(r, ["band", "bits"])
        .filter(F.col("img_a") < F.col("img_b"))
        .select("img_a", "img_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("img_a", "img_b", "hamming")
    )


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): sign-sum of token xxhash64 bits."""
    tok = tokens(docs).select("doc_id", F.explode("w").alias("tok"))
    th = tok.select("doc_id", F.xxhash64("tok").alias("h"))
    bit_cols = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    per_doc = th.groupBy("doc_id").agg(*bit_cols)
    expr = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        expr = term if expr is None else expr.bitwiseOR(term)
    return per_doc.select("doc_id", expr.alias("simhash"))


# --- cross-engine-exact SimHash (md5 token hash, 60 bits) ------------------

SIMHASH_BITS = 60  # 15 md5 hex chars: same value from Spark conv() and
                   # DuckDB's ('0x'||substr(md5(t),1,15))::BIGINT


def simhash_md5(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long): sign-sum SimHash over a 60-bit md5-
    derived token hash. Same locality behavior as simhash64 but the
    token hash is reproducible in ANSI SQL, so the whole pipeline is
    exactly oracle-able (simhash64/xxhash64 stays the fastest JVM
    path). Token multiplicity counts, ties (sum == 0) give a 0 bit."""
    tok = tokens(docs).select("doc_id", F.explode("w").alias("tok"))
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    per_doc = th.groupBy("doc_id").agg(*bit_cols)
    expr = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        expr = term if expr is None else expr.bitwiseOR(term)
    return per_doc.select("doc_id", expr.alias("simhash"))


def simhash_near_dup(
    docs: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs whose 60-bit md5-SimHash differs
    in <= max_hamming bits.  Scale path: band the signature into
    `bands` equal slices and equi-join on (band, slice) — a pair
    within max_hamming < bands MUST agree on some intact band
    (pigeonhole), so banding is lossless; the bit_count verify then
    drops every false candidate, making banded == brute force (the
    DuckDB oracle IS brute force).  No doc x doc cross join ever."""
    if max_hamming >= bands:
        raise ValueError(
            f"banded blocking needs max_hamming < bands for guaranteed "
            f"recall (got hamming {max_hamming}, bands {bands})")
    if SIMHASH_BITS % bands:
        raise ValueError(f"bands must divide {SIMHASH_BITS}")
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    sh = simhash_md5(docs)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask)).alias("slice"),
            )
            for i in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.slice")
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sig_a"), "band", "slice")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sig_b"), "band", "slice")
    cand = (
        a.join(b, ["band", "slice"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame, key: str = "doc_id",
                   a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Canonical near-dup clustering — the stage AFTER pair generation
    in a training-data pipeline (reference scope: the engine's dedup
    operators emit pairs; a pipeline must then pick ONE survivor per
    duplicate group, and near-dup similarity is not transitive, so
    groups are the CONNECTED COMPONENTS of the pair graph).

    ``pairs`` is any near-dup pair table (minhash/simhash/phash/
    jaccard output); returns (key, cluster_id, is_canonical,
    cluster_size) for EVERY doc — cluster_id is the component-minimum
    key (deterministic, layout-independent), is_canonical marks the
    survivor, docs in no pair are their own singleton cluster.

    Scale: connected components run on the EDGE set only
    (``algebra._merge_labels_distributed`` — min-propagation +
    pointer jumping, O(log diameter) rounds); near-dup pairs are a
    vanishing fraction of a 100-TB corpus, and the full docs table
    sees just one left join onto the component roots plus one
    cluster-size aggregate.  Never materializes doc×doc anything."""
    from .algebra import _merge_labels_distributed

    eset = pairs.select(F.col(a_col).alias("la"), F.col(b_col).alias("lb"))
    roots = _merge_labels_distributed(eset)
    lab = (
        docs.select(key)
        .join(roots.withColumnRenamed("label", key), key, "left")
        .select(key, F.coalesce("root", F.col(key)).alias("cluster_id"))
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return lab.join(sizes, "cluster_id").select(
        key, "cluster_id",
        (F.col(key) == F.col("cluster_id")).alias("is_canonical"),
        "cluster_size",
    )


def dedup_keep(docs: DataFrame, pairs: DataFrame, key: str = "doc_id",
               a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Filter ``docs`` to one canonical survivor per near-dup cluster
    (the component-minimum key): the materialized "deduplicated
    corpus" view of ``dedup_clusters``."""
    keep = dedup_clusters(docs, pairs, key, a_col, b_col).filter(
        F.col("is_canonical")).select(key)
    return docs.join(keep, key, "left_semi")


def minhash_band_index(docs: DataFrame, n: int = 3, num_hashes: int = 64,
                       bands: int = 16, rows: int = 4) -> DataFrame:
    """The persistable inverted index a CDC/incremental pipeline keeps
    between batches: (doc_id, band, bucket) band-bucket rows of the
    corpus. New batches probe it with ONE equi-join — the corpus is
    never re-paired against itself."""
    return _band_rows(minhash_signatures(docs, n, num_hashes), bands, rows)


def incremental_minhash_pairs(
    new_docs: DataFrame,
    old_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
) -> DataFrame:
    """Incremental near-dup: a NEW document batch probes the EXISTING
    corpus (the CDC shape of a training-data pipeline — each crawl
    increment dedups against everything already ingested WITHOUT
    re-pairing the corpus against itself). Candidates are
    new×old bucket probes of the persistable band index
    (minhash_band_index) plus new×new within-batch pairs; both verify
    with exact Jaccard like minhash_dedup_pairs. Returns
    (doc_a, doc_b, jaccard, kind) — kind 'new_old' (doc_a = the new
    doc) or 'new_new' (doc_a < doc_b)."""
    bn = minhash_band_index(new_docs, n, num_hashes, bands, rows)
    bo = minhash_band_index(old_docs, n, num_hashes, bands, rows)
    cand_no = (
        bn.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(bo.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
              ["band", "bucket"])
        # defense against a caller whose batches overlap (e.g. a replay
        # that re-ingested docs into the corpus): never a self-pair
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .withColumn("kind", F.lit("new_old"))
    )
    cand_nn = (
        bn.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(bn.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
              ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .withColumn("kind", F.lit("new_new"))
    )
    cand = cand_no.unionByName(cand_nn)
    return _jaccard_verify(cand, new_docs.unionByName(old_docs), n,
                           threshold, keep_cols=("kind",))


def substring_windows(docs: DataFrame, window: int = 8) -> DataFrame:
    """(doc_id, pos, wkey): one row per token-window position; wkey is
    the md5 of the space-joined window — a 128-bit collision-safe
    inverted-index key (the text itself never shuffles).  Documents
    shorter than ``window`` tokens yield no rows."""
    t = tokens(docs).filter(F.size("w") >= window)
    idx = t.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(0), F.size("w") - window)).alias("pos"),
    )
    return idx.select(
        "doc_id", "pos",
        F.md5(F.array_join(F.slice(F.col("w"), F.col("pos") + 1, window),
                           " ")).alias("wkey"),
    )


def substring_dup_pairs(docs: DataFrame, window: int = 8,
                        df_cap: int | None = 50,
                        min_windows: int = 1) -> DataFrame:
    """Exact-substring near-duplication (the Lee et al. 2021
    'Deduplicating Training Data' exact-substring criterion, bounded):
    document pairs sharing >= min_windows exact ``window``-token
    windows, with the longest shared span in doc_a's coordinates.

    Plan: window inverted index (explode + md5, pure JVM) → optional
    document-frequency cap drops boilerplate windows (mirrored in the
    oracle, so deterministic) → wkey equi-join carrying BOTH positions
    (never doc x doc) → gaps-and-islands along the (pa − pb) DIAGONAL
    (window over the PAIR partition — bounded by document length,
    never corpus size).  A shared contiguous substring is exactly a
    diagonal run (consecutive pa with pa − pb constant); a run of pa
    alone would over-report spans doc_b only contains in pieces.
    max_span_tokens = longest diagonal run + window - 1; n_windows =
    distinct shared doc_a window positions.
    """
    from pyspark.sql import Window as W

    wins = substring_windows(docs, window)
    if df_cap is not None:
        keep = wins.groupBy("wkey").agg(
            F.countDistinct("doc_id").alias("_df")
        ).filter(F.col("_df") <= df_cap).select("wkey")
        wins = wins.join(keep, "wkey")
    a = wins.select(F.col("doc_id").alias("doc_a"),
                    F.col("pos").alias("pa"), "wkey")
    b = wins.select(F.col("doc_id").alias("doc_b"),
                    F.col("pos").alias("pb"), "wkey")
    hits = (a.join(b, "wkey")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "pa", "pb").distinct())
    diag = (F.col("pa") - F.col("pb")).alias("_d")
    grp = (F.col("pa")
           - F.row_number().over(W.partitionBy("doc_a", "doc_b", "_d")
                                 .orderBy("pa"))).alias("_g")
    runs = hits.select("doc_a", "doc_b", "pa", diag) \
               .select("doc_a", "doc_b", "pa", "_d", grp) \
               .groupBy("doc_a", "doc_b", "_d", "_g") \
               .agg(F.count(F.lit(1)).alias("_run"))
    out = runs.groupBy("doc_a", "doc_b").agg(
        (F.max("_run") + F.lit(window - 1)).alias("max_span_tokens"),
    ).join(
        hits.groupBy("doc_a", "doc_b")
            .agg(F.countDistinct("pa").alias("n_windows")),
        ["doc_a", "doc_b"])
    return out.filter(F.col("n_windows") >= min_windows).select(
        "doc_a", "doc_b",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("max_span_tokens").cast("long").alias("max_span_tokens"))
