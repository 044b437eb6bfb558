"""Temporal joins over event streams: as-of join.

The reference library has no event/temporal surface; this is part of
the engine's training-pipeline mandate (sessionize/rollup live in
streaming/events.py). An AS-OF join attaches, to every left row, the
most recent right row at-or-before it per key — the canonical
point-in-time feature lookup.

Execution: union-tag both sides, ONE per-key window pass with
last(..., ignorenulls=True) carry-forward — the right side is ordered
before the left at equal timestamps so ties match (<= semantics), and
among equal-timestamp right rows the greatest id wins
(deterministic, mirrored by the oracle's ranked join). The window is
partitioned by the join key — no global ordering, shuffle = one hash
exchange on the key, scale-safe for any per-key cardinality that fits
a partition stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "t",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row: the most recent right row with
    right.ts <= left.ts and the same key (NULLs when none).

    left:  (key, ts, ...left columns kept as-is)
    right: (key, ts, *right_cols)
    Output: left columns + {f"asof_{c}" for c in right_cols}
            + asof_ts + gap (left.ts − right.ts).
    """
    lcols = [c for c in left.columns]
    l = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l = l.withColumn("_r_ts", F.lit(None).cast("long"))

    r = right.select(
        key,
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts).alias("_r_ts"),
    )
    for c in lcols:
        if c not in (key, ts):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols], "_r_ts").unionByName(
        r.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols], "_r_ts")
    )
    # right rows sort before left rows at equal ts (<= match); among
    # equal-ts right rows the LAST in (_r_ts, id...) order wins — we
    # order by every right payload column for full determinism
    order = [F.col(ts), F.col("_side")] + [F.col(f"_r_{c}") for c in right_cols]
    w = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    carried = u
    for c in right_cols:
        carried = carried.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    carried = carried.withColumn("asof_ts", F.last("_r_ts", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"asof_{c}") for c in right_cols],
        "asof_ts",
        (F.col(ts) - F.col("asof_ts")).alias("gap"),
    )
    return out
