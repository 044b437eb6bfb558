"""Text analysis operators (training-data pipeline): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All hot-path logic is JVM Column expressions (split / size /
aggregate / transform); Python appears nowhere per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "que", "es"],
    "de": ["der", "die", "das", "und", "in", "zu", "ist"],
    "fr": ["le", "la", "de", "et", "en", "que", "est"],
}


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc stats: token count, distinct tokens, char stats, quality
    score = distinct/total ratio damped by a length prior."""
    w = F.split(F.col("text"), " ")
    # BPE-ish subword count: alnum runs and punctuation runs counted
    # separately (the usual pre-tokenizer shape)
    sub = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]+"), 0))
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(w).cast("long").alias("n_tokens"),
        sub.cast("long").alias("n_subtokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.round(F.length("text").cast("double") / F.size(w), 6).alias("avg_token_len"),
        F.round(
            F.size(F.array_distinct(w)).cast("double") / F.size(w), 6
        ).alias("distinct_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]: favors mid-length docs with
    diverse vocabulary (the usual web-corpus filter shape)."""
    w = F.split(F.col("text"), " ")
    nt = F.size(w).cast("double")
    ratio = F.size(F.array_distinct(w)).cast("double") / nt
    len_prior = F.least(nt / F.lit(64.0), F.lit(1.0))
    return docs.select(
        "doc_id", F.round(ratio * len_prior, 6).alias("quality")
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language-ID heuristic: predicted = argmax over
    languages of stopword hits (ties → lexicographic lang)."""
    w = F.split(F.col("text"), " ")
    # sort ascending by (-hits, lang) and take the head: most hits wins,
    # ties broken by the lexicographically smallest language code
    scores = [
        F.struct(
            (-F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(STOPWORDS.items())
    ]
    best = F.array_sort(F.array(*scores)).getItem(0)
    return docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        F.when(best.getField("neg_hits") < 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
    )


def fingerprint(docs: DataFrame, k: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: the k smallest distinct token-hash
    values per doc (an order-insensitive rolling-hash digest)."""
    tok = docs.select("doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("t"))
    h = tok.select("doc_id", F.xxhash64("t").alias("h"))
    return h.groupBy("doc_id").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("fingerprint")
    )
