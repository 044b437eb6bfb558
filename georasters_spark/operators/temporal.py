"""Temporal joins over event streams: as-of join.

The reference library has no event/temporal surface; this is part of
the engine's training-pipeline mandate (sessionize/rollup live in
streaming/events.py). An AS-OF join attaches, to every left row, the
most recent right row at-or-before it per key — the canonical
point-in-time feature lookup.

Execution: union-tag both sides, ONE per-key window pass carrying the
entire right-side payload as a single STRUCT with
last(..., ignorenulls=True) — one struct, not one window per column,
so a NULL inside one payload column can never tear the output into a
mix of two different right rows. The right side is ordered before the
left at equal timestamps so ties match (<= semantics), and among
equal-timestamp right rows the greatest payload wins (deterministic).
The window is partitioned by the join key — no global ordering,
shuffle = one hash exchange on the key.
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

    left:  (key, ts, ...left columns kept as-is); ts must be a numeric
           epoch column (the output gap = left.ts − right.ts).
    right: (key, ts, *right_cols)
    Output: left columns + {f"asof_{c}" for c in right_cols}
            + asof_ts + gap.
    """
    lcols = list(left.columns)
    rtypes = dict(right.dtypes)
    ts_type = rtypes[ts]
    payload_fields = [F.col(c).alias(c) for c in right_cols] + [
        F.col(ts).cast(ts_type).alias("_ts")
    ]
    payload_type = ", ".join(
        [f"{c}: {rtypes[c]}" for c in right_cols] + [f"_ts: {ts_type}"]
    )

    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_p", F.lit(None).cast(f"struct<{payload_type}>")
    )
    r = right.select(
        key, F.col(ts), F.lit(0).alias("_side"), F.struct(*payload_fields).alias("_p")
    )
    for c in lcols:
        if c not in (key, ts):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l.select(*lcols, "_side", "_p").unionByName(r.select(*lcols, "_side", "_p"))
    # right rows sort before left rows at equal ts (<= match); among
    # equal-ts right rows the LAST struct in payload order wins —
    # struct ordering is lexicographic over (right_cols..., ts), fully
    # deterministic
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"), F.col("_p"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = u.withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols],
        F.col("_asof._ts").alias("asof_ts"),
        (F.col(ts) - F.col("_asof._ts")).alias("gap"),
    )
