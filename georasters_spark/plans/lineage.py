"""Checkpoint / resume with per-partition lineage + metrics (north rule).

A pipeline run is split into idempotent units keyed by a partition key
(zone id, tile band, cell prefix, ...). Each unit's output is written
to its own parquet dir, then a lineage record (key, rows, seconds,
attempt, job_id) is appended to a manifest — write-ahead of nothing:
the lineage line commits AFTER the data, so a crash between the two
leaves an orphan dir that the next attempt overwrites. Resume =
anti-join of the requested keys against committed lineage keys.

On a real cluster the manifest lives in an Iceberg metrics table
(transactional append); here it's a JSONL file with atomic renames —
same invariant, same API.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable


class LineageLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def committed(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        out[rec["key"]] = rec
        return out

    def commit(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())


def resumable_run(
    spark,
    job_id: str,
    work_dir: str,
    keys: list[str],
    process_fn: Callable[[str], "DataFrame"],  # noqa: F821
    fail_after: int | None = None,
):
    """Run process_fn(key) for every not-yet-committed key, each into
    <work_dir>/<job_id>/parts/<key>; returns the union DataFrame of ALL
    committed parts. `fail_after` aborts after N fresh commits — the
    kill-mid-job drill used by tests.
    """
    base = os.path.join(work_dir, job_id)
    log = LineageLog(os.path.join(base, "lineage.jsonl"))
    done = log.committed()
    fresh = 0
    for key in keys:
        if key in done:
            continue
        part_dir = os.path.join(base, "parts", key)
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)  # orphan from a crashed attempt
        t0 = time.time()
        df = process_fn(key)
        df.write.mode("overwrite").parquet(part_dir)
        rows = spark.read.parquet(part_dir).count()
        log.commit(
            {
                "job_id": job_id,
                "key": key,
                "rows": rows,
                "seconds": round(time.time() - t0, 3),
                "committed_at": time.time(),
            }
        )
        fresh += 1
        if fail_after is not None and fresh >= fail_after:
            raise RuntimeError(f"simulated failure after {fresh} partitions")
    dirs = [os.path.join(base, "parts", k) for k in keys]
    return spark.read.parquet(*dirs)


def metrics(work_dir: str, job_id: str) -> list[dict]:
    return list(LineageLog(os.path.join(work_dir, job_id, "lineage.jsonl")).committed().values())
