"""Deterministic sampling for training-data pipelines — pure Column
arithmetic, exactly reproducible across engines and reruns.

Spark's built-in ``df.sample``/``randomSplit`` are seed-dependent on
partitioning (a repartition changes the sample), which is exactly what
a 100-TB training pipeline cannot tolerate: the train/val/test split of
a document must be a FUNCTION OF ITS ID, not of the physical layout.
These operators derive everything from a Knuth multiplicative hash in
the 2^31-1 prime field (the same field dedup.py's MinHash uses), all
in int64-safe arithmetic:

    h(id) = ((pmod(id, 2^31) + salt) mod 2^31) * 2654435761 mod (2^31 - 1)

(pmod = non-negative remainder: Spark/DuckDB % keeps the dividend's
sign, and a negative hash would fall below every split threshold —
signed 64-bit ids, common for hashed keys, would all land in the
first split)

(salt mixes BEFORE the multiply so a salt change reshuffles every
assignment — added after, it would only nudge hashes by ±salt and
almost never cross a threshold)

* split            — assign 'train' / 'val' / ... by cumulative
                     fraction thresholds on h. One narrow projection,
                     no shuffle, no state; adding data never moves an
                     existing row between splits.
* stratified_cap   — at most `cap` rows per group, chosen by hash
                     order (deterministic "random" without a seed
                     file): one shuffle on the group key; Spark pushes
                     a map-side WindowGroupLimit partial top-k, so the
                     exchange carries at most cap rows per group per
                     partition, not the whole group.

At 100 TB both are scan-shaped: split is a stateless map; the cap's
per-group exchange is bounded by cap x partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MOD = 2147483647  # 2^31 - 1 (prime)


def hash_col(id_col, salt: int = 0):
    """The shared deterministic hash Column: int64-safe everywhere
    ((2^31 - 1)·KNUTH < 2^63), non-negative for ANY int64 id."""
    if not 0 <= salt < 2147483648:
        raise ValueError("salt must be in [0, 2^31)")
    m = F.lit(2147483648)
    # mod the id BEFORE adding salt: id + salt could overflow int64
    # (silently wrapping in Spark, erroring in ANSI engines)
    pm = ((F.col(id_col) % m) + m + F.lit(salt)) % m
    return (pm * F.lit(_KNUTH)) % F.lit(_MOD)


def hash_sql(id_col: str, salt: int = 0) -> str:
    """The same hash in ANSI SQL (DuckDB oracle dialect)."""
    pm = f"((({id_col}) % 2147483648) + 2147483648 + {salt}) % 2147483648"
    return f"(({pm}) * {_KNUTH}) % {_MOD}"


def split(df: DataFrame, id_col: str, fractions: dict[str, float],
          salt: int = 0, out_col: str = "split") -> DataFrame:
    """Deterministic dataset split: cumulative-fraction thresholds on
    the id hash. Fractions must sum to 1 (the last split absorbs the
    rounding tail). Layout-independent and stable under appends."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = hash_col(id_col, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = h < F.lit(int(acc * _MOD))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def split_sql(id_col: str, fractions: dict[str, float], salt: int = 0) -> str:
    """CASE expression mirroring split() threshold-for-threshold."""
    h = hash_sql(id_col, salt)
    names = list(fractions)
    acc = 0.0
    parts = []
    for name in names[:-1]:
        acc += fractions[name]
        parts.append(f"WHEN {h} < {int(acc * _MOD)} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_cap(df: DataFrame, group_col: str, id_col: str,
                   cap: int, salt: int = 0) -> DataFrame:
    """Deterministic per-group downsample: keep the `cap` rows with the
    smallest (hash, id) per group. Hash order ≈ uniform random, but
    reproducible and append-stable for the surviving rows whose hash
    stays below the group's cap-th value."""
    h = hash_col(id_col, salt)
    w = W.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_r")
    )
