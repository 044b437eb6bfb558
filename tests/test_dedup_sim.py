"""Dedup + similarity: MinHash/LSH vs exact Jaccard, SimHash locality,
LSH-ANN recall vs brute force, text operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from georasters_spark.operators import dedup as DD
from georasters_spark.operators import similarity as SM
from georasters_spark.operators import text as TX

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_minhash_lsh_finds_exact_pairs(spark, docs):
    """LSH+verify output == brute-force Jaccard pairs at threshold 0.5
    (banding 16x4: P(miss | j>=0.5) ≈ (1-0.5^4)^16 ≈ 0.35 per hash
    family — so use the verified operator which must still equal brute
    force because candidates ⊇ actual pairs at our data's j>=0.8)."""
    exact = (
        DD.jaccard_pairs(docs, n=3, threshold=0.5)
        .select("doc_a", "doc_b", "jaccard")
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    lsh = (
        DD.minhash_dedup_pairs(docs, n=3, threshold=0.5, num_hashes=64, bands=16, rows=4)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, lsh)
    assert len(exact) > 0  # fixture really contains near-dups


def test_cosine_pairs_blocked_equals_cross_join(spark, emb):
    """Distributed block-GEMM threshold join == the all-pairs crossJoin
    (same pairs, same 6dp cosines) across several block counts,
    including B=1 (single task) and B larger than needed."""
    from georasters_spark.operators.similarity import _dot, with_norm

    a = with_norm(emb).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").cast("array<double>").alias("ea"),
        F.col("_norm").alias("na"),
    )
    b = with_norm(emb).select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").cast("array<double>").alias("eb"),
        F.col("_norm").alias("nb"),
    )
    exact = (
        a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= 0.45)
        .select("vec_a", "vec_b", "cos")
        .toPandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )
    for nb_ in (1, 3, 7):
        got = (
            SM.cosine_pairs_blocked(emb, threshold=0.45, n_blocks=nb_)
            .toPandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, got, check_dtype=False)
    assert len(exact) > 0


def test_ivf_topk_recall_and_full_probe_equality(spark, emb):
    """IVF ANN: with nprobe == n_clusters the probed search EQUALS
    brute force exactly; with a partial probe, recall stays useful and
    every returned neighbor's cosine is genuine (subset property)."""
    k_clusters = 8
    cents = SM.kmeans_fit(emb, k=k_clusters, iters=4)
    assert cents.shape == (k_clusters, 64)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SM.brute_force_topk(emb, queries, k=5).toPandas()
    full = SM.ivf_topk(emb, queries, cents, k=5, nprobe=k_clusters).toPandas()
    e = exact.sort_values(["query_id", "sim_rank"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "sim_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(e, f)

    part = SM.ivf_topk(emb, queries, cents, k=5, nprobe=3).toPandas()
    exact_pairs = set(zip(e.query_id, e.vec_id))
    part_pairs = set(zip(part.query_id, part.vec_id))
    recall = len(exact_pairs & part_pairs) / len(exact_pairs)
    assert recall >= 0.3, recall  # near-random embeddings: partial probe
    # subset property: probed cosines must match the exact scores
    merged = part.merge(exact.rename(columns={"sim_rank": "er"}),
                        on=["query_id", "vec_id"], suffixes=("", "_e"), how="inner")
    assert (merged.cos == merged.cos_e).all()


def test_kmeans_fit_deterministic(spark, emb):
    a = SM.kmeans_fit(emb, k=4, iters=2)
    b = SM.kmeans_fit(emb, k=4, iters=2)
    assert np.array_equal(a, b)
    # assignment covers all vectors exactly once
    asg = SM.kmeans_assign(emb, a).toPandas()
    assert len(asg) == emb.count()
    assert set(asg.cluster) <= set(range(4))


def test_minhash_signature_similarity_estimates_jaccard(spark, docs):
    """Signature agreement rate ≈ true Jaccard for a high-sim pair."""
    pairs = DD.jaccard_pairs(docs, n=3, threshold=0.8).toPandas()
    assert len(pairs) > 0
    da, db, jac = int(pairs.iloc[0].doc_a), int(pairs.iloc[0].doc_b), float(pairs.iloc[0].jaccard)
    sigs = DD.minhash_signatures(
        docs.filter(F.col("doc_id").isin(da, db)), n=3, num_hashes=64
    ).toPandas().set_index("doc_id")
    sa, sb = np.array(sigs.loc[da, "sig"]), np.array(sigs.loc[db, "sig"])
    est = float((sa == sb).mean())
    assert abs(est - jac) < 0.25


def test_simhash_locality(spark, docs):
    """Near-dup docs have small simhash Hamming distance; random pairs
    are near 32 bits apart."""
    pairs = DD.jaccard_pairs(docs, n=3, threshold=0.8).toPandas()
    sh = DD.simhash64(docs).toPandas().set_index("doc_id")["simhash"]

    def ham(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [ham(sh[a], sh[b]) for a, b in zip(pairs.doc_a, pairs.doc_b)]
    rng = np.random.default_rng(0)
    ids = sh.index.to_numpy()
    rand = [ham(sh[a], sh[b]) for a, b in zip(rng.choice(ids, 50), rng.choice(ids, 50)) if a != b]
    # docs share a small vocabulary, so random pairs sit well under the
    # 32-bit random-hash expectation — require separation, not absolutes
    assert np.mean(near) < 12
    assert np.mean(rand) > np.mean(near) + 5


def test_exact_dedup_full_text(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y z"), (4, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = DD.exact_dedup(df).toPandas().sort_values("keeper_id").reset_index(drop=True)
    assert out.loc[0, "keeper_id"] == 1 and out.loc[0, "n_copies"] == 3
    assert list(out.loc[0, "member_ids"]) == [1, 2, 4]
    assert out.loc[1, "keeper_id"] == 3 and out.loc[1, "n_copies"] == 1


def test_lsh_ann_recall(spark, emb):
    """LSH top-k recall@5 >= 0.8 vs brute force; exact when probing the
    full Hamming ball."""
    queries = emb.filter(F.col("vec_id") < 20)
    brute = SM.brute_force_topk(emb, queries, k=5).toPandas()
    lsh = SM.lsh_topk(emb, queries, k=5, bits=6, probe_hamming=1, tables=8).toPandas()
    b = set(zip(brute.query_id, brute.vec_id))
    l = set(zip(lsh.query_id, lsh.vec_id))
    recall = len(b & l) / len(b)
    assert recall >= 0.8, recall


def test_text_quality_and_langid(spark, docs):
    q = TX.quality_score(docs).toPandas()
    assert ((q.quality >= 0) & (q.quality <= 1)).all()
    li = TX.lang_id(docs).toPandas()
    assert set(li.pred_lang) <= {"de", "en", "es", "fr", "und"}
    fp = TX.fingerprint(docs, k=8).toPandas()
    # docs with < 8 distinct tokens yield shorter digests
    assert (fp.fingerprint.str.len() <= 8).all() and (fp.fingerprint.str.len() >= 1).all()


def test_phash_near_dup_finds_lossy_twins(spark, images_t1):
    """Every tile must pair with its q8-lossy re-encode (image dedup)."""
    from pyspark.sql import functions as F

    from georasters_spark import queries as Q
    from georasters_spark.operators import dedup as DDm
    from georasters_spark.sources import synth

    lossy = Q.images_for(spark, synth.T1, fmt="q8").select(
        F.concat(F.lit("lossy_"), F.col("image_id")).alias("image_id"), "phash"
    )
    both = images_t1.select("image_id", "phash").unionByName(lossy)
    pairs = DDm.phash_near_dup_pairs(both, max_hamming=6, n_bands=8).toPandas()
    twins = pairs[
        (pairs.img_a.str.replace("lossy_", "") == pairs.img_b.str.replace("lossy_", ""))
        & (pairs.img_a != pairs.img_b)
    ]
    assert len(twins) == 45
    assert (twins.hamming <= 6).all()


def test_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    sh = DD.shingles(df, n=3).toPandas()
    assert sorted(sh.shingle) == ["a b c", "b c d", "c d e"]


def test_shingles_short_docs_no_crash(spark):
    """Docs shorter than n tokens yield zero shingles (no slice error),
    matching the SQL oracle's empty range."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "solo"), (3, "a b c d")], "doc_id long, text string"
    )
    sh = DD.shingles(df, n=3).toPandas()
    assert set(sh.doc_id) == {3}
    assert sorted(sh.shingle) == ["a b c", "b c d"]
    # jaccard over a mix with short docs must not crash
    out = DD.jaccard_pairs(df, n=3, threshold=0.1).toPandas()
    assert len(out) == 0


def test_phash_banding_guard(spark, docs):
    """Banding recall guarantee is enforced: max_hamming > n_bands-1
    raises instead of silently losing pairs."""
    import pytest as _pt

    df = spark.createDataFrame([(u"a", 1), (u"b", 2)], "image_id string, phash long")
    with _pt.raises(ValueError, match="raise n_bands"):
        DD.phash_near_dup_pairs(df, max_hamming=6, n_bands=4)


def test_lang_id_tiebreak_smallest(spark):
    """Equal stopword hits -> lexicographically smallest language."""
    df = spark.createDataFrame(
        [(1, "the la of le"), (2, "zzz qqq")], "doc_id long, text string"
    )
    df = df.withColumn("lang", F.lit("xx"))
    out = TX.lang_id(df).toPandas().set_index("doc_id")
    # 'the'+'of' = 2 en hits; 'la'+'le'... la∈es(1), le∈fr(1) → en wins (2)
    assert out.loc[1, "pred_lang"] == "en"
    assert out.loc[2, "pred_lang"] == "und"


def test_sq8_quantization_properties(spark, emb):
    """SQ8 int8 quantization: (a) dequantized max error <= scale/2 per
    vector (the half-ulp bound of round-half-even), (b) codes stay in
    [-127, 127], (c) quantized top-k recall vs exact float top-k >= 0.8
    at k=5 over 20 queries."""
    import numpy as np
    from pyspark.sql import functions as F

    from georasters_spark.operators import similarity as SM

    q = SM.quantize_int8(emb).join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e")),
        "vec_id",
    ).toPandas()
    for t in q.itertuples(index=False):
        codes = np.asarray(t.codes, dtype=np.float64)
        e = np.asarray(t.e, dtype=np.float64)
        assert np.abs(codes).max() <= 127
        assert np.abs(codes * t.scale - e).max() <= t.scale / 2 + 1e-12

    queries = emb.filter(F.col("vec_id") < 20)
    exact = SM.brute_force_topk(emb, queries, k=5).toPandas()
    quant = SM.quantized_topk(emb, queries, k=5).toPandas()
    hits = 0
    for qid in range(20):
        a = set(exact[exact.query_id == qid].vec_id)
        b = set(quant[quant.query_id == qid].vec_id)
        hits += len(a & b)
    assert hits / (20 * 5) >= 0.8, hits


def test_deterministic_split_properties(spark):
    """split(): layout-independent (repartition changes nothing),
    append-stable (adding rows never moves an existing row), fractions
    approximately honored, and the same id always lands in the same
    split across DataFrames."""
    from pyspark.sql import functions as F

    from georasters_spark.operators import sampling as SA

    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = SA.split(docs, "doc_id", fr, salt=7).select("doc_id", "split")
    b = SA.split(docs.repartition(13), "doc_id", fr, salt=7).select("doc_id", "split")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    half = SA.split(docs.filter(F.col("doc_id") < 250), "doc_id", fr, salt=7)
    joined = a.join(half.select("doc_id", F.col("split").alias("s2")), "doc_id")
    assert joined.filter(F.col("split") != F.col("s2")).count() == 0

    counts = dict(a.groupBy("split").count().collect())
    n = sum(counts.values())
    assert abs(counts.get("train", 0) / n - 0.9) < 0.06
    # different salt -> different assignment (salting works)
    c = SA.split(docs, "doc_id", fr, salt=8).select("doc_id", F.col("split").alias("s3"))
    moved = a.join(c, "doc_id").filter(F.col("split") != F.col("s3")).count()
    assert moved > 0

    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        SA.split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_stratified_cap_properties(spark):
    """stratified_cap(): exactly min(cap, group size) rows per group,
    deterministic across layouts, and the plan carries a map-side
    WindowGroupLimit (partial top-k before the exchange)."""
    from pyspark.sql import functions as F

    from georasters_spark.operators import sampling as SA

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = SA.stratified_cap(docs, "source", "doc_id", cap=20, salt=3)
    sizes = dict(out.groupBy("source").count().collect())
    full = dict(docs.groupBy("source").count().collect())
    for src, nfull in full.items():
        assert sizes.get(src, 0) == min(20, nfull)
    out2 = SA.stratified_cap(docs.repartition(7), "source", "doc_id", cap=20, salt=3)
    assert out.select("doc_id").exceptAll(out2.select("doc_id")).isEmpty()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_hash_col_negative_ids_match_sql_and_are_uniform(spark):
    """hash_col == hash_sql for extreme/negative int64 ids (both
    non-negative), and negative ids don't collapse into one split."""
    import duckdb
    from pyspark.sql import functions as F

    from georasters_spark.operators import sampling as SA

    ids = [-5, -2147483649, 0, 12345, 9223372036854775806,
           -9223372036854775807, -1]
    sdf = spark.createDataFrame([(i,) for i in ids], "x long")
    got = (sdf.select(SA.hash_col("x", 7).alias("h"))
           .toPandas()["h"].tolist())
    vals = ",".join(f"({i})" for i in ids)
    exp = duckdb.sql(
        f"SELECT {SA.hash_sql('x', 7)} AS h FROM (VALUES {vals}) t(x)"
    ).df()["h"].tolist()
    assert got == exp and all(h >= 0 for h in got)

    neg = spark.range(1000).select((-F.col("id") - 1).alias("doc_id"))
    fr = {"train": 0.5, "val": 0.5}
    counts = dict(SA.split(neg, "doc_id", fr, salt=1)
                  .groupBy("split").count().collect())
    assert abs(counts.get("train", 0) - 500) < 120, counts
    import pytest

    with pytest.raises(ValueError, match="salt"):
        SA.hash_col("doc_id", -1)


def test_dedup_clusters_transitive_chain_and_singletons(spark):
    # near-dup similarity is NOT transitive: a-b and b-c pairs must
    # still land a, b, c in ONE cluster with min-id canonical; d is a
    # singleton; e-f a separate pair
    docs = spark.createDataFrame(
        [(i,) for i in (10, 20, 30, 40, 50, 60)], "doc_id long")
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (50, 60)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"], r["cluster_size"])
           for r in DD.dedup_clusters(docs, pairs).collect()}
    assert out == {
        10: (10, True, 3), 20: (10, False, 3), 30: (10, False, 3),
        40: (40, True, 1), 50: (50, True, 2), 60: (50, False, 2),
    }
    kept = sorted(r["doc_id"] for r in DD.dedup_keep(docs, pairs).collect())
    assert kept == [10, 40, 50]


def test_dedup_clusters_matches_networkless_oracle(spark, docs):
    # real simhash pairs on the sf0.01 documents: cluster assignment
    # equals a driver-side union-find over the same pairs
    pairs = DD.simhash_near_dup(docs, max_hamming=3, bands=4)
    got = {r["doc_id"]: r["cluster_id"]
           for r in DD.dedup_clusters(docs, pairs).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for r in docs.select("doc_id").collect():
        d = r["doc_id"]
        assert got[d] == find(d), d


def test_incremental_minhash_equals_full_restriction(spark, docs):
    """Incremental probe (new batch vs corpus index) finds EXACTLY the
    full-table pairs touching a new doc — nothing lost by never
    re-pairing the corpus, nothing invented."""
    from georasters_spark.operators import dedup as DD

    full = DD.minhash_dedup_pairs(docs, n=3, threshold=0.5).toPandas()
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    inc = DD.incremental_minhash_pairs(new, old, n=3, threshold=0.5).toPandas()
    exp = set()
    for t in full.itertuples(index=False):
        an, bn = t.doc_a % 4 == 0, t.doc_b % 4 == 0
        if an and bn:
            exp.add((t.doc_a, t.doc_b, "new_new"))
        elif an:
            exp.add((t.doc_a, t.doc_b, "new_old"))
        elif bn:
            exp.add((t.doc_b, t.doc_a, "new_old"))
    got = {(t.doc_a, t.doc_b, t.kind) for t in inc.itertuples(index=False)}
    assert got == exp
    # jaccard values agree with the full run
    jmap = {}
    for t in full.itertuples(index=False):
        jmap[(t.doc_a, t.doc_b)] = t.jaccard
        jmap[(t.doc_b, t.doc_a)] = t.jaccard
    for t in inc.itertuples(index=False):
        assert jmap[(t.doc_a, t.doc_b)] == t.jaccard


def test_pq_adc_matches_numpy_and_recall(spark, emb):
    """PQ: fitted codebooks encode deterministically; ADC ranking
    equals a numpy mirror exactly (integer micro-unit distances); and
    PQ top-k keeps useful L2 recall vs exact search."""
    m, kcw, topk = 4, 16, 5
    books = SM.pq_fit(emb, m=m, k=kcw, iters=2)
    assert books.shape == (m, kcw, 16)
    assert np.array_equal(books, SM.pq_fit(emb, m=m, k=kcw, iters=2))
    queries = emb.filter(F.col("vec_id") < 10)
    got = SM.pq_topk(emb, queries, books, k=topk).toPandas()

    ep = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = ep["vec_id"].to_numpy(np.int64)
    X = np.asarray(ep["embedding"].tolist(), dtype=np.float64)
    sub = X.shape[1] // m
    codes = np.stack([
        np.argmin(((X[:, s*sub:(s+1)*sub][:, None, :]
                    - books[s][None, :, :]) ** 2).sum(axis=2), axis=1)
        for s in range(m)], axis=1)
    qm = X[ids < 10]
    qi = ids[ids < 10]
    luts = np.stack([
        np.rint((((qm[:, s*sub:(s+1)*sub][:, None, :]
                   - books[s][None, :, :]) ** 2).sum(axis=2)) * 1e6)
        .astype(np.int64) for s in range(m)], axis=1)
    exp = {}
    for a, q in enumerate(qi):
        d = np.zeros(len(ids), np.int64)
        for s in range(m):
            d += luts[a, s][codes[:, s]]
        order = sorted((int(d[i]), int(ids[i])) for i in range(len(ids))
                       if ids[i] != q)[:topk]
        exp[int(q)] = order
    for q, rows in got.groupby("query_id"):
        r = rows.sort_values("sim_rank")
        assert [(int(t.d2_u6), int(t.vec_id))
                for t in r.itertuples(index=False)] == exp[int(q)]

    # recall vs exact L2 top-k (near-random 64-d embeddings; PQ with
    # m=4 is a coarse sketch — assert it beats chance handily)
    exact = {}
    for a, q in enumerate(qi):
        d2 = ((X - qm[a][None, :]) ** 2).sum(axis=1)
        order = sorted((float(d2[i]), int(ids[i])) for i in range(len(ids))
                       if ids[i] != q)[:topk]
        exact[int(q)] = {v for _, v in order}
    hits = sum(len(exact[q] & {v for _, v in exp[q]}) for q in exact)
    recall = hits / (len(exact) * topk)
    assert recall >= 0.2, recall


def test_substring_dup_pairs_spans(spark):
    """Hand-built corpus: known shared 3-token windows, island merging,
    df-cap drop, and the min_windows filter."""
    from georasters_spark.operators import dedup as DD

    docs = spark.createDataFrame([
        (1, "a b c d e f g h"),          # shares a..f with doc 2
        (2, "a b c d e f x y"),
        (3, "q r s t u v w z"),          # no overlap
        (4, "k k k m a b c"),            # single shared window with 1/2
        (5, "k k k m n o p"),
    ], "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): (r["n_windows"], r["max_span_tokens"])
           for r in DD.substring_dup_pairs(docs, window=3, df_cap=50,
                                           min_windows=1).collect()}
    # docs 1/2 share windows at doc-1 positions 0..3 (a b c, b c d,
    # c d e, d e f): one island of 4 -> span 4 + 3 - 1 = 6 tokens
    assert got[(1, 2)] == (4, 6)
    # docs 4/5 share 'k k k' and 'k k m'? no — 4 is 'k k k m a b c':
    # windows 'k k k','k k m','k m a','m a b','a b c'; 5 has 'k k k',
    # 'k k m','k m n',... -> shared at positions 0,1: island of 2
    assert got[(4, 5)] == (2, 4)
    # doc 1/4 and 2/4 share 'a b c' (one window each)
    assert got[(1, 4)] == (1, 3) and got[(2, 4)] == (1, 3)
    assert not any(3 in k for k in got)
    # min_windows=2 drops the single-window pairs
    got2 = {(r["doc_a"], r["doc_b"])
            for r in DD.substring_dup_pairs(docs, window=3, min_windows=2)
            .collect()}
    assert got2 == {(1, 2), (4, 5)}
    # df_cap=1 drops every shared window (each appears in >= 2 docs)
    assert DD.substring_dup_pairs(docs, window=3, df_cap=1).count() == 0


def test_substring_span_requires_diagonal_contiguity(spark):
    """A run of consecutive doc_a positions whose doc_b matches are
    DISJOINT must not be reported as one long span (review finding):
    doc_b contains 'a b c' and 'b c d' but never 'a b c d'."""
    from georasters_spark.operators import dedup as DD

    docs = spark.createDataFrame([
        (1, "a b c d"),
        (2, "a b c x b c d"),
    ], "doc_id long, text string")
    rows = DD.substring_dup_pairs(docs, window=3, min_windows=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_windows"] == 2            # both windows shared
    assert r["max_span_tokens"] == 3      # but never contiguously
