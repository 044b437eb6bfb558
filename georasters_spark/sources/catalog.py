"""Iceberg-lite table catalog: parquet data + JSON snapshot manifests.

No Iceberg jar ships in-sandbox (verified, SURVEY §7.0), so this seam
emulates the subset the engine needs — atomic snapshot commits,
append-only data files, time-travel reads, rollback — behind an API a
real `spark.read.format("iceberg")` catalog can replace on a cluster
(spark-submit --packages org.apache.iceberg:iceberg-spark-runtime...).

Layout:
  <root>/data/snap-<version>/part-*.parquet   (one dir per commit)
  <root>/snapshots/v<version>.json            {version, parent, dirs,
                                               props, metrics}
  <root>/CURRENT                              text file: latest version

Commits are atomic: manifest written to a temp file then os.rename'd;
CURRENT updated last. A crashed writer leaves only unreferenced data
dirs (garbage, never corruption) — the Iceberg invariant.
"""

from __future__ import annotations

import json
import os
import time


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # -- metadata ---------------------------------------------------------
    def current_version(self) -> int:
        p = os.path.join(self.root, "CURRENT")
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None, required: bool = False) -> dict | None:
        """Manifest dict for `version` (default: current). Returns None
        for version 0 AND for versions whose manifest was removed by
        expire_snapshots — an expired snapshot is end-of-chain for any
        parent walk, not an error. required=True restores the LOUD
        failure for reads that must not treat a missing manifest as
        emptiness (the CURRENT manifest disappearing is corruption, and
        silently committing on top of it would drop the whole prior
        lineage)."""
        v = version if version is not None else self.current_version()
        if v == 0:
            return None
        try:
            with open(os.path.join(self.root, "snapshots", f"v{v}.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            if required:
                raise
            return None

    # -- commits ----------------------------------------------------------
    def _next_version(self) -> int:
        """Snapshot numbers are NEVER reused (Iceberg invariant): after
        rollback(1) on a 3-version table the next commit is v4, not a
        clobber of the surviving v2.json."""
        vmax = self.current_version()
        for name in os.listdir(os.path.join(self.root, "snapshots")):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    vmax = max(vmax, int(name[1:-5]))
                except ValueError:
                    continue
        return vmax + 1

    def _set_current(self, version: int) -> None:
        cur_tmp = os.path.join(self.root, ".CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.rename(cur_tmp, os.path.join(self.root, "CURRENT"))

    def _commit(self, df, props: dict | None, operation: str) -> int:
        """Shared commit path for append/overwrite: guard BEFORE the
        expensive parquet write, exclusive manifest creation (os.link
        fails on collision — a concurrent committer loses loudly
        instead of silently clobbering history), CURRENT updated
        last."""
        import uuid

        parent = self.current_version()
        # required: a MISSING current manifest must fail the commit, not
        # silently found a new single-dir lineage over invisible data —
        # and it must fail BEFORE the (potentially huge) dataset write
        prev = self.snapshot(parent, required=parent > 0)
        version = self._next_version()
        # unique attempt suffix: a writer that crashes mid-parquet-write
        # leaves an UNREFERENCED dir (garbage), never a partial dir that
        # permanently blocks the next attempt at the same version
        data_dir = os.path.join(
            self.root, "data", f"snap-{version}-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("errorifexists").parquet(data_dir)
        dirs = ([data_dir] if operation == "overwrite"
                else (prev["dirs"] if prev else []) + [data_dir])
        manifest = {
            "version": version,
            "parent": parent,
            "dirs": dirs,
            "props": props or {},
            "committed_at": time.time(),
            "metrics": {"rows": None},
            "operation": operation,
        }
        tmp = os.path.join(self.root, "snapshots",
                           f".v{version}.{uuid.uuid4().hex[:8]}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self.root, "snapshots", f"v{version}.json")
        try:
            # atomic AND exclusive: two racing committers cannot both
            # win the same version number
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"catalog: concurrent commit lost the race for v{version} "
                f"({self.root}); retry on the new current version")
        finally:
            os.unlink(tmp)
        # optimistic-concurrency parent check: the version-collision
        # guard alone misses a racer that claimed a DIFFERENT number
        # after we read parent — an append built on a stale dir list
        # would silently drop their data.  Re-verify, and withdraw the
        # manifest (CURRENT never pointed at it) on conflict.  The
        # residual read-check-set window means committers to ONE table
        # should still be serialized externally; this guard turns the
        # common races into loud failures instead of silent drops.
        if self.current_version() != parent:
            os.unlink(final)
            raise RuntimeError(
                f"catalog: concurrent commit moved the table past "
                f"v{parent} while v{version} was being written "
                f"({self.root}); retry on the new current version")
        self._set_current(version)
        return version

    def append(self, df, props: dict | None = None) -> int:
        """Write df as a new data dir + snapshot manifest (table = union
        of the lineage's dirs). Returns the new version."""
        return self._commit(df, props, "append")

    def overwrite(self, df, props: dict | None = None) -> int:
        """Iceberg REPLACE-snapshot analog: commit df as the table's
        NEW FULL CONTENT — the snapshot's dir list is just the new data
        dir, not the appended lineage.  Prior snapshots stay readable
        (time travel) until expire_snapshots drops them; their data
        dirs become orphan-GC-able once expired.  The maintenance
        commit for recomputed tables (e.g. an xyz_update pyramid)."""
        return self._commit(df, props, "overwrite")

    def rollback(self, version: int) -> None:
        if self.snapshot(version) is None:
            raise ValueError(f"no snapshot v{version}")
        self._set_current(version)

    # -- maintenance --------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Iceberg expire_snapshots analog: drop snapshot manifests older
        than the last `keep_last` (the current lineage tail), keeping
        every data dir still referenced by a SURVIVING snapshot. Returns
        the expired version numbers. Time travel to expired versions
        stops working; the current table contents are untouched."""
        cur = self.current_version()
        keep = set(range(max(1, cur - keep_last + 1), cur + 1))
        expired = []
        for v in range(1, cur + 1):
            if v in keep:
                continue
            p = os.path.join(self.root, "snapshots", f"v{v}.json")
            if os.path.exists(p):
                os.remove(p)
                expired.append(v)
        return expired

    def remove_orphan_files(self, older_than_seconds: float = 3 * 3600) -> list[str]:
        """Delete data dirs referenced by NO surviving snapshot —
        the garbage left by crashed writers (unique attempt dirs) and
        by expire_snapshots. Never touches a referenced dir.

        Only dirs whose mtime is older than `older_than_seconds` are
        deleted (Iceberg's remove_orphan_files `older_than` default):
        an IN-FLIGHT concurrent append (parquet dir written, manifest
        not yet committed) is indistinguishable from crash garbage by
        reference-counting alone, so a fresh unreferenced dir is left
        for a later GC pass rather than pulled out from under the
        commit. Pass 0 only when the caller guarantees single-writer."""
        import shutil

        referenced: set[str] = set()
        snapdir = os.path.join(self.root, "snapshots")
        for f in os.listdir(snapdir):
            if f.startswith("v") and f.endswith(".json"):
                with open(os.path.join(snapdir, f)) as fh:
                    referenced.update(json.load(fh)["dirs"])
        removed = []
        cutoff = time.time() - older_than_seconds
        datadir = os.path.join(self.root, "data")
        for d in sorted(os.listdir(datadir)):
            full = os.path.join(datadir, d)
            if full not in referenced and os.path.getmtime(full) < cutoff:
                shutil.rmtree(full)
                removed.append(full)
        return removed

    # -- reads ------------------------------------------------------------
    def scan(self, spark, version: int | None = None):
        # reading the CURRENT version through a missing manifest is
        # corruption (loud); an explicit expired version reads as a
        # clear ValueError
        snap = self.snapshot(
            version, required=version is None and self.current_version() > 0
        )
        if snap is None or not snap["dirs"]:
            raise ValueError("empty table" if version is None
                             else f"no snapshot v{version} (expired?)")
        return spark.read.parquet(*snap["dirs"])


# ---------------------------------------------------------------------------
# spatially clustered layout: PARTITIONED BY (cell prefix), Z-ordered files
# ---------------------------------------------------------------------------

def cell_prefix_expr(res: int, prefix_res: int):
    """Column expr: parent cell of `cell_id` at prefix_res (pure integer
    ops on the Morton layout — usable in partitionBy)."""
    from pyspark.sql import functions as F

    from ..functions.cells import RES_SHIFT

    shift = 2 * (res - prefix_res)
    return F.expr(
        f"CAST({prefix_res} AS BIGINT) * {1 << RES_SHIFT} + "
        f"(cell_id % {1 << RES_SHIFT}) DIV {1 << shift}"
    )


def write_clustered(images, root: str, res: int, prefix_res: int = 1,
                    range_files: int | None = None) -> None:
    """Write the images table partitioned by coarse cell prefix and
    sorted by cell_id within partitions — the layout that makes bbox /
    ring queries prune files (Iceberg PARTITIONED BY bucket + ORDER BY
    z-curve analog, SURVEY §4.2). range_files=N range-partitions on
    (cell_prefix, cell_id) into ~N tasks so each partition directory
    holds several files with TIGHT disjoint cell_id spans — the layout
    per-file min/max skipping needs. A file manifest of per-file
    cell_id min/max (from the parquet footer statistics) is written
    alongside, Iceberg-manifest style."""
    from pyspark.sql import functions as F

    df = images.withColumn("cell_prefix", cell_prefix_expr(res, prefix_res))
    part = (
        df.repartitionByRange(range_files, F.col("cell_prefix"), F.col("cell_id"))
        if range_files else df.repartition("cell_prefix")
    )
    (
        part.sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(root)
    )
    write_file_manifest(root)


def write_file_manifest(root: str) -> dict:
    """Per-file cell_id [min, max] from parquet footer row-group
    statistics -> <root>/_file_manifest.json (atomic rename). This is
    the Iceberg data-file manifest analog: scan planning reads ONE
    small JSON instead of every footer."""
    import glob

    import pyarrow.parquet as pq

    man: dict = {}
    for p in sorted(glob.glob(os.path.join(root, "cell_prefix=*", "*.parquet"))):
        md = pq.ParquetFile(p).metadata
        idx = None
        for i in range(md.num_columns):
            if md.row_group(0).column(i).path_in_schema == "cell_id":
                idx = i
                break
        mn = mx = None
        if idx is not None:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break
                mn = int(st.min) if mn is None else min(mn, int(st.min))
                mx = int(st.max) if mx is None else max(mx, int(st.max))
        man[os.path.relpath(p, root)] = [mn, mx]
    tmp = os.path.join(root, "_file_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.rename(tmp, os.path.join(root, "_file_manifest.json"))
    return man


def _bbox_prefix_cells(bbox, prefix_res: int) -> list[int]:
    import numpy as np

    from ..functions import cells as C

    x0, y0, x1, y1 = bbox
    n = 1 << prefix_res
    ix0, iy1 = C.lonlat_to_ixiy(np.array([x0]), np.array([y0]), prefix_res)
    ix1, iy0 = C.lonlat_to_ixiy(np.array([x1]), np.array([y1]), prefix_res)
    wanted = []
    for ix in range(int(ix0[0]), int(ix1[0]) + 1):
        for iy in range(int(iy0[0]), int(iy1[0]) + 1):
            if 0 <= ix < n and 0 <= iy < n:
                wanted.append(int(C.encode(np.int64(ix), np.int64(iy), prefix_res)))
    return sorted(set(wanted))


def bbox_cell_intervals(bbox, res: int, skip_res: int) -> list[tuple[int, int]]:
    """Closed cell_id intervals (at table res) covering the bbox: each
    skip_res cell the bbox touches maps to ONE contiguous Morton
    interval of its res-level descendants (Z-curve prefix property).
    Sound over-approximation — exactly Iceberg's range-skipping
    contract."""
    from ..functions.cells import RES_SHIFT

    if skip_res > res:
        raise ValueError(f"skip_res {skip_res} must be <= table res {res}")
    shift = 2 * (res - skip_res)
    out = []
    for cid in _bbox_prefix_cells(bbox, skip_res):
        m = cid % (1 << RES_SHIFT)  # morton at skip_res
        lo = (res << RES_SHIFT) | (m << shift)
        hi = (res << RES_SHIFT) | (((m + 1) << shift) - 1)
        out.append((lo, hi))
    return out


def scan_bbox(spark, root: str, bbox: tuple[float, float, float, float],
              prefix_res: int = 1, res: int | None = None,
              skip_res: int | None = None):
    """Read only the data that can intersect the bbox. Two pruning
    tiers, both metadata-only (no data file is listed or opened for a
    pruned unit — what Iceberg manifest pruning does):

    1. directory: partitions whose prefix cell intersects the bbox;
    2. file (res= given + _file_manifest.json present): within the
       kept directories, only files whose footer-stat cell_id
       [min, max] overlaps a bbox cell interval at skip_res
       (default prefix_res + 2) — Iceberg per-data-file min/max
       skipping on the sort key.

    Falls back to tier 1 when the manifest is missing (pre-r5 layout).
    """
    wanted = _bbox_prefix_cells(bbox, prefix_res)
    dirs = [
        p for p in (os.path.join(root, f"cell_prefix={c}") for c in wanted)
        if os.path.exists(p)
    ]
    if not dirs:
        return spark.read.parquet(root).limit(0)
    man_path = os.path.join(root, "_file_manifest.json")
    if res is not None and os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        ivals = bbox_cell_intervals(
            bbox, res, min(res, skip_res if skip_res is not None
                           else prefix_res + 2))
        # walk the ACTUAL files in the kept directories: a data file
        # appended outside write_clustered (stale manifest) has no
        # entry and MUST be read — skipping only what the manifest
        # provably bounds keeps tier 2 sound against foreign writers
        files = []
        for d in dirs:
            for fname in sorted(os.listdir(d)):
                if not fname.endswith(".parquet"):
                    continue
                full = os.path.join(d, fname)
                ent = man.get(os.path.relpath(full, root))
                if ent is None or ent[0] is None:
                    files.append(full)  # unknown/statless: must read
                    continue
                mn, mx = ent
                if any(mn <= hi and mx >= lo for lo, hi in ivals):
                    files.append(full)
        if not files:
            return spark.read.parquet(root).limit(0)
        return spark.read.option("basePath", root).parquet(*files)
    return spark.read.option("basePath", root).parquet(*dirs)


def source_high_water_mark(tbl: SnapshotTable, src_dir: str) -> int:
    """Max committed batch id for one source stream across the snapshot
    chain — the shared exactly-once replay guard (events.
    stream_ingest_to_catalog and streaming/pyramid.py).  Walking
    parents means a non-ingest commit (no max_batch_id prop) can't
    reset the guard to -1; scoping by source means a DIFFERENT stream
    ingesting into the same table (its own checkpoint restarts batch
    ids at 0) is never silently skipped."""
    v = tbl.current_version()
    while v:
        snap = tbl.snapshot(v)
        if snap is None:
            return -1  # expired manifest: end of walkable chain
        props = snap.get("props") or {}
        if "max_batch_id" in props and props.get("source") == src_dir:
            return int(props["max_batch_id"])
        v = snap.get("parent", 0)
    return -1
