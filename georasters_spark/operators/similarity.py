"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: query set × corpus with the
  dot product as a JVM higher-order-function fold (F.aggregate over
  F.zip_with) — no Python per row. Baseline + verifier.
* lsh_topk         — random-hyperplane LSH (signed projections →
  b-bit signature, multi-probe by Hamming-ball radius) to restrict
  candidates, then exact re-scoring. The scale path: candidates per
  query ≈ corpus/2^b · probes, each bucket join is an equi-join on
  the signature key.

At 100 TB the corpus side is bucketed by signature; queries broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    e = F.col(col).cast("array<double>")
    return df.withColumn("_norm", F.sqrt(_dot(e, e)))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """(query_id, vec_id, cos, sim_rank): exact cosine top-k, ranked on
    the 6-dp-rounded score with id tie-break (cross-engine stable)."""
    c = with_norm(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("ce"),
        F.col("_norm").alias("cn"),
    )
    q = with_norm(queries).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qe"),
        F.col("_norm").alias("qn"),
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos", F.round(_dot(F.col("ce"), F.col("qe")) / (F.col("cn") * F.col("qn")), 6)
    )
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "vec_id", "cos", "sim_rank")
    )


def cosine_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    n_blocks: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine-threshold join via distributed block
    matrix product (the scale-correct form of the brute-force leg).

    When the data has no LSH-able similarity gap (near-dup cosines not
    separated from the background), an EXACT threshold join is
    inherently Ω(n²) work — the scalable plan makes that work
    vectorized compute instead of a shuffled row explosion: vectors are
    hashed into B blocks, each of the B·(B+1)/2 block PAIRS is one
    grouped-map task that runs a single BLAS GEMM (batch × batchᵀ) and
    emits only surviving pairs. Shuffle volume is (B+1)·n rows
    (replication), never n² rows; task memory is 2·(n/B)·d.

    Output (vec_a, vec_b, cos) with vec_a < vec_b, cos rounded 6dp.
    BIT-MATCH contract: GEMM summation order differs from a sequential
    dot-product fold by ~1e-9, which could flip the 6th dp on a tie —
    so the GEMM only FILTERS candidates at (threshold − 1e-4), and the
    few survivors are re-scored with the same JVM sequential fold the
    SQL oracle uses (identical association ⇒ identical doubles), then
    thresholded on the rounded exact value. The 1e-4 margin is ≥ 10⁵×
    the worst-case GEMM-vs-fold divergence, so the candidate set is a
    provable superset.
    """
    spark = emb.sparkSession
    B = int(n_blocks)
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col("embedding").cast("array<double>").alias("e"),
        F.pmod(F.xxhash64(F.col(id_col)), B).alias("blk"),
    )
    # row in block b is the LEFT member of tasks (b, j>=b) and the
    # RIGHT member of tasks (i<=b, b)
    sides = []
    for side, tag in (("L", 0), ("R", 1)):
        rep = base.select(
            "vid", "e", "blk",
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("o"),
        )
        if side == "L":
            rep = rep.filter(F.col("o") >= F.col("blk")).select(
                F.col("blk").alias("pi"), F.col("o").alias("pj"),
                "vid", "e", F.lit(tag).alias("side"),
            )
        else:
            rep = rep.filter(F.col("o") <= F.col("blk")).select(
                F.col("o").alias("pi"), F.col("blk").alias("pj"),
                "vid", "e", F.lit(tag).alias("side"),
            )
        sides.append(rep)
    tasks = sides[0].unionByName(sides[1])
    thr = float(threshold)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        left = pdf[pdf["side"] == 0]
        right = pdf[pdf["side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                                 "vec_b": pd.Series(dtype=np.int64),
                                 "cos": pd.Series(dtype=np.float64)})
        la = np.asarray(left["e"].tolist(), dtype=np.float64)
        rb = np.asarray(right["e"].tolist(), dtype=np.float64)
        lid = left["vid"].to_numpy(np.int64)
        rid = right["vid"].to_numpy(np.int64)
        na = np.sqrt((la * la).sum(axis=1))
        nb = np.sqrt((rb * rb).sum(axis=1))
        cos = np.round((la @ rb.T) / np.outer(na, nb), 6)
        hit = cos >= thr - 1e-4  # margin: exact rescoring decides below
        if int(key[0]) == int(key[1]):
            # same-block task sees each pair twice (u,v) and (v,u):
            # keep the ordered half only
            hit &= lid[:, None] < rid[None, :]
        else:
            hit &= lid[:, None] != rid[None, :]
        ii, jj = np.nonzero(hit)
        va = np.minimum(lid[ii], rid[jj])  # canonical a < b regardless of side
        vb = np.maximum(lid[ii], rid[jj])
        return pd.DataFrame({"vec_a": va, "vec_b": vb})

    cand = tasks.groupBy("pi", "pj").applyInPandas(
        kernel, schema="vec_a long, vec_b long"
    )
    # exact rescoring of the (small) candidate set with the sequential
    # JVM fold — the same expression shape as the SQL oracle
    ea = emb.select(F.col(id_col).alias("vec_a"),
                    F.col("embedding").cast("array<double>").alias("_ea"))
    eb = emb.select(F.col(id_col).alias("vec_b"),
                    F.col("embedding").cast("array<double>").alias("_eb"))
    scored = (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("_ea"), F.col("_eb"))
                / (F.sqrt(_dot(F.col("_ea"), F.col("_ea")))
                   * F.sqrt(_dot(F.col("_eb"), F.col("_eb")))),
                6,
            ),
        )
    )
    return scored.filter(F.col("cos") >= thr).select("vec_a", "vec_b", "cos")


def hyperplanes(dim: int, bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def signatures(df: DataFrame, planes: np.ndarray, id_col: str = "vec_id") -> DataFrame:
    """b-bit random-hyperplane signature via an Arrow pandas UDF."""
    b, d = planes.shape
    pl = planes  # captured once per task

    @F.pandas_udf("long")
    def sig(emb: pd.Series) -> pd.Series:
        m = np.asarray(emb.tolist(), dtype=np.float64)  # (n, d)
        bits = (m @ pl.T) > 0  # (n, b)
        out = np.zeros(len(m), dtype=np.int64)
        for i in range(b):
            out |= bits[:, i].astype(np.int64) << i
        return pd.Series(out)

    return df.select(F.col(id_col), F.col("embedding"), sig("embedding").alias("sig"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    probe_hamming: int = 1,
    tables: int = 4,
    dim: int = 64,
    seed: int = 11,
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-table random-hyperplane ANN: `tables` independent b-bit
    signature families; per table, probe all buckets within Hamming
    distance <= probe_hamming of the query signature; union candidates;
    re-score exactly. Recall vs brute force is pytest-verified. At
    scale the corpus is written bucketed by each table's signature, so
    every probe is a shuffle-free equi-join."""
    import itertools

    masks = [0]
    for r in range(1, probe_hamming + 1):
        for comb in itertools.combinations(range(bits), r):
            m = 0
            for b_ in comb:
                m |= 1 << b_
            masks.append(m)

    cand = None
    for t in range(tables):
        planes = hyperplanes(dim, bits, seed + 1000 * t)
        csig = signatures(corpus, planes, id_col).withColumnRenamed(id_col, "vec_id")
        qsig = signatures(queries, planes, id_col).withColumnRenamed(id_col, "query_id")
        probe = qsig.select(
            "query_id",
            F.col("embedding").alias("qe"),
            F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask"),
            "sig",
        ).withColumn("probe_sig", F.col("sig").bitwiseXOR(F.col("mask")))
        c = csig.join(
            F.broadcast(probe.select("query_id", "qe", F.col("probe_sig").alias("sig"))),
            "sig",
        ).filter(F.col("vec_id") != F.col("query_id"))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["query_id", "vec_id"])

    ce = F.col("embedding").cast("array<double>")
    qe = F.col("qe").cast("array<double>")
    scored = cand.withColumn(
        "cos",
        F.round(
            _dot(ce, qe) / (F.sqrt(_dot(ce, ce)) * F.sqrt(_dot(qe, qe))), 6
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "vec_id", "cos", "sim_rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: deterministic distributed k-means coarse
# quantizer + cluster-probed exact re-scoring — the classic alternative
# to LSH for embedding retrieval. At scale the corpus is written
# bucketed by `cluster`, so every probe is a shuffle-free equi-join and
# only nprobe/k of the corpus is scanned per query.
# ---------------------------------------------------------------------------

def kmeans_fit(
    emb: DataFrame, k: int = 16, iters: int = 5, id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic Lloyd k-means over the embedding column.
    Init = the k lowest-id vectors (reproducible across runs/engines);
    assignment is an Arrow batch argmin against the broadcast (k, d)
    centroid matrix; the update is ONE JVM-side aggregate per iteration
    (posexplode → groupBy(cluster, pos) avg — no vectors ever collect
    except the k×d centroid matrix itself)."""
    d0 = emb.select(id_col, "embedding").orderBy(id_col).limit(k).toPandas()
    cents = np.asarray(d0["embedding"].tolist(), dtype=np.float64)
    sel = emb.select("embedding")

    for _ in range(iters):
        c_bc = cents

        # r7: the update is ONE fused Arrow pass — assignment argmin and
        # per-cluster (sum, count) partials in the same numpy batch loop
        # — instead of assignment + an n×d posexplode shuffle + a
        # grouped avg.  Only (#partitions × k) partial rows leave the
        # executors; the driver combines them in (cluster, partition)
        # sort order so reruns are bit-identical (the determinism
        # contract of this fit).
        def partials(batches, c=c_bc):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            kk, d = c.shape
            sums = np.zeros((kk, d))
            cnt = np.zeros(kk, np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
                d2 = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
                a = np.argmin(d2, axis=1)
                np.add.at(sums, a, m)
                cnt += np.bincount(a, minlength=kk)
            nz = np.flatnonzero(cnt)
            yield pd.DataFrame({
                "pid": np.full(len(nz), pid, np.int64),
                "cluster": nz.astype(np.int64),
                "s": [sums[i].tolist() for i in nz],
                "c": cnt[nz],
            })

        up = sel.mapInPandas(
            partials, schema="pid long, cluster long, s array<double>, c long"
        ).toPandas()
        nxt = cents.copy()  # empty clusters keep their previous centroid
        if len(up):
            up = up.sort_values(["cluster", "pid"])
            for cl, g in up.groupby("cluster", sort=True):
                s = np.zeros(cents.shape[1])
                n = 0
                for t in g.itertuples(index=False):
                    s += np.asarray(t.s, dtype=np.float64)
                    n += int(t.c)
                nxt[int(cl)] = s / n
        cents = nxt
    return cents


def kmeans_assign(emb: DataFrame, centroids: np.ndarray, id_col: str = "vec_id") -> DataFrame:
    """(id, embedding, cluster): nearest-centroid assignment, Arrow
    batch GEMM against the broadcast centroid matrix."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def nearest(e: pd.Series) -> pd.Series:
        m = np.asarray(e.tolist(), dtype=np.float64)  # (n, d)
        # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
        d2 = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return emb.select(id_col, "embedding", nearest("embedding").alias("cluster"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: per query, probe the `nprobe` nearest clusters and
    exact-rescore only their members (equi-join on cluster). With
    nprobe == n_clusters this is EXACTLY brute_force_topk (tested)."""
    cents = np.asarray(centroids, dtype=np.float64)
    c_assigned = kmeans_assign(corpus, cents, id_col=id_col).select(
        F.col(id_col).alias("vec_id"), F.col("embedding").alias("ce"), "cluster"
    )

    @F.pandas_udf("array<int>")
    def probes(e: pd.Series) -> pd.Series:
        m = np.asarray(e.tolist(), dtype=np.float64)
        d2 = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        idx = np.argsort(d2, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(idx))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col("embedding").alias("qe"),
        F.explode(probes("embedding")).alias("cluster"),
    )
    cand = c_assigned.join(F.broadcast(q), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    ce = F.col("ce").cast("array<double>")
    qe = F.col("qe").cast("array<double>")
    scored = cand.withColumn(
        "cos", F.round(_dot(ce, qe) / (F.sqrt(_dot(ce, ce)) * F.sqrt(_dot(qe, qe))), 6)
    ).dropDuplicates(["query_id", "vec_id"])
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "vec_id", "cos", "sim_rank")
    )


# ---------------------------------------------------------------------------
# Int8 scalar quantization (SQ8) — the storage/bandwidth workhorse of
# production vector search: per-vector symmetric scale s = max|x|/127,
# code_i = round_half_even(x_i / s) in [-127, 127]. Cosine over codes
# needs NO dequantization — the scales cancel:
#   cos_q = <cq, cc> / (|cq| |cc|)   (exact integer dots)
# so the quantized search is pure integer arithmetic on 4x less data.
# At 100 TB: codes are array<tinyint> (4x bandwidth/memory win on the
# scan), the topk plan is the same broadcast-query shape as
# brute_force_topk, and SQ8 composes with the IVF/LSH candidate
# generators above (quantize the corpus once, probe as usual, rescore
# survivors with full floats if needed).
# HALF_EVEN (F.bround / DuckDB round_even) keeps the codes — and
# therefore the gated scores — bit-identical across engines.
# ---------------------------------------------------------------------------


def quantize_int8(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, scale, codes array<int>, n2 = |codes|): per-vector
    symmetric int8 quantization of the embedding column."""
    e = F.col("embedding").cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0),
        F.lit(1e-30),  # all-zero vector guard
    )
    out = df.select(F.col(id_col).alias("vec_id"), e.alias("e"), scale.alias("scale"))
    codes = F.transform(F.col("e"), lambda x: F.bround(x / F.col("scale")))
    out = out.withColumn("codes", codes)
    return out.select(
        "vec_id", "scale", "codes", F.sqrt(_dot(F.col("codes"), F.col("codes"))).alias("n2")
    )


def quantized_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k under the SQ8 metric (deterministic, hence exactly
    oracle-able): integer-dot cosine over quantized codes, ranked on
    the 6-dp score with id tie-break — same contract as
    brute_force_topk, 4x less data scanned."""
    c = quantize_int8(corpus, id_col).select(
        "vec_id", F.col("codes").alias("cc"), F.col("n2").alias("cn"))
    q = quantize_int8(queries, id_col).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qc"),
        F.col("n2").alias("qn"))
    # Zero-norm (all-zero) vectors have no cosine: Spark yields NULL for
    # 0/0 while DuckDB yields NaN, and the two order differently under
    # ORDER BY DESC — filter them out of BOTH sides before scoring (the
    # oracle SQL applies the same n2 > 0 predicate).
    c = c.filter(F.col("cn") > 0)
    q = q.filter(F.col("qn") > 0)
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "qcos", F.round(_dot(F.col("cc"), F.col("qc")) / (F.col("cn") * F.col("qn")), 6)
    )
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("qcos"), "vec_id")
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "vec_id", "qcos", "sim_rank")
    )


def pq_fit(emb: DataFrame, m: int = 4, k: int = 16, iters: int = 0,
           id_col: str = "vec_id") -> np.ndarray:
    """Product-quantization codebooks (m, k, d/m): per-subspace Lloyd
    k-means through the SAME deterministic kmeans_fit (lowest-id init,
    fixed iterations). iters=0 returns the init codebook itself — the
    k lowest-id vectors' subvectors — which is exactly SQL-derivable
    (the gate form); production fits pass iters>0 (recall pytest)."""
    d = len(emb.select("embedding").first()[0])
    if d % m:
        raise ValueError(f"pq: d={d} not divisible by m={m}")
    sub = d // m
    books = []
    for s in range(m):
        sdf = emb.select(
            id_col, F.slice(F.col("embedding").cast("array<double>"),
                            s * sub + 1, sub).alias("embedding"))
        books.append(kmeans_fit(sdf, k=k, iters=iters, id_col=id_col))
    return np.stack(books)  # (m, k, sub)


def pq_encode(emb: DataFrame, books: np.ndarray,
              id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<int>): per-subspace nearest-codeword ids, one
    Arrow batch GEMM per subspace against the broadcast codebooks
    (ties -> smallest codeword id, matching SQL arg_min)."""
    bks = np.asarray(books, dtype=np.float64)
    m, kcw, sub = bks.shape

    @F.pandas_udf("array<int>")
    def enc(e: pd.Series) -> pd.Series:
        x = np.asarray(e.tolist(), dtype=np.float64)  # (n, d)
        codes = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            xs = x[:, s * sub:(s + 1) * sub]
            d2 = (((xs[:, None, :] - bks[s][None, :, :]) ** 2).sum(axis=2))
            codes[:, s] = np.argmin(d2, axis=1)  # first (smallest) argmin
        return pd.Series(list(codes))

    return emb.select(F.col(id_col).alias("vec_id"),
                      enc("embedding").alias("codes"))


def pq_topk(corpus: DataFrame, queries: DataFrame, books: np.ndarray,
            k: int = 5, id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the corpus is scanned as
    (m)-byte codes only; each query builds its (m, k) LUT of exact
    subspace distances to every codeword and corpus distances are m
    lookups + a sum — the PQ scan shape (codes are ~d·4/m× smaller
    than the raw vectors). Distances ship in exact integer MICRO-UNITS
    (LUT entries rounded to 1e-6 before summing), so rank order is an
    integer compare with a vec_id tie-break — engine-exact, making the
    gate form (iters=0 books) SQL-oracle-able."""
    bks = np.asarray(books, dtype=np.float64)
    m, kcw, sub = bks.shape
    codes = pq_encode(corpus, books, id_col)
    qp = queries.select(F.col(id_col).alias("query_id"), "embedding") \
        .toPandas()
    qids = qp["query_id"].to_numpy(np.int64)
    qm = np.asarray(qp["embedding"].tolist(), dtype=np.float64)  # (nq, d)
    # (nq, m, kcw) LUTs quantized to EXACT integer micro-units (1e-6):
    # the per-corpus-vector distance is then an integer SUM of m
    # lookups, so ranking is engine-exact (float summation order can
    # never flip a rank)
    luts = np.stack([
        np.rint((((qm[:, s * sub:(s + 1) * sub][:, None, :]
                   - bks[s][None, :, :]) ** 2).sum(axis=2)) * 1e6)
        .astype(np.int64)
        for s in range(m)
    ], axis=1)
    spark = corpus.sparkSession
    b_luts = spark.sparkContext.broadcast(luts)
    b_qids = spark.sparkContext.broadcast(qids)

    def scan(batches):
        lt = b_luts.value
        qi = b_qids.value
        nq = len(qi)
        for pdf in batches:
            cm = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            vids = pdf["vec_id"].to_numpy(np.int64)
            # dist (nq, n): integer sum over subspaces of LUT gathers
            d = np.zeros((nq, len(cm)), dtype=np.int64)
            for s in range(m):
                d += lt[:, s, :][:, cm[:, s]]
            out = pd.DataFrame({
                "query_id": np.repeat(qi, len(cm)),
                "vec_id": np.tile(vids, nq),
                "d2_u6": d.ravel(),
            })
            yield out[out["query_id"] != out["vec_id"]]

    scored = codes.mapInPandas(
        scan, schema="query_id long, vec_id long, d2_u6 long")
    w = W.partitionBy("query_id").orderBy("d2_u6", "vec_id")
    return (scored.withColumn("sim_rank", F.row_number().over(w))
            .filter(F.col("sim_rank") <= k)
            .select("query_id", "vec_id", "d2_u6", "sim_rank"))
