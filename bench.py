"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: run the same spatial job at local[8] and local[32] on the
same input and write rows/sec + scaling efficiency to BENCH/BASELINE.md
(the sandbox proxy for the N→4N executor criterion, BASELINE.json:14).

Raster benchmarks run on the BENCH synthetic grid (4320x2160 px,
9,331,200 cells — the pre1500.tif reference anchor, BASELINE.md) so the
numbers are comparable to the reference's single-call scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cores: int):
    from georasters_spark.session import get_spark

    return get_spark(app_name=f"bench[{cores}]", cores=cores, shuffle_partitions=max(cores, 8))


def _build(spark, spec):
    from georasters_spark.sources import synth

    imgs = synth.build_images(spark, spec, fmt="raw16").persist()
    imgs.count()
    return imgs


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from georasters_spark.operators import pixels as PX
    from georasters_spark.operators import spatial_join as SJ
    from georasters_spark.sources import synth

    spec = synth.BENCH
    times: dict[str, float] = {}

    t0 = time.time()
    imgs = _build(spark, spec)
    times["ingest_tiles"] = round(time.time() - t0, 3)

    kw = dict(origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly))

    t0 = time.time()
    SJ.zonal_stats_fused(imgs, synth.ZONES_T1, **kw).collect()
    times["zonal_stats"] = round(time.time() - t0, 3)

    t0 = time.time()
    SJ.zonal_stats(imgs, synth.ZONES_T1, **kw).collect()
    times["zonal_stats_unfused"] = round(time.time() - t0, 3)

    t0 = time.time()
    z = [zz for zz in synth.ZONES_EXTRA if zz.name == "skew_half_world"]
    SJ.zonal_stats(imgs, z, salt=32, **kw).collect()
    times["zonal_skew_salted"] = round(time.time() - t0, 3)

    t0 = time.time()
    px = PX.pixel_table(imgs, valid_only=True)
    px.agg(F.count("value"), F.sum("value")).collect()
    times["decode_scan_agg"] = round(time.time() - t0, 3)

    t0 = time.time()
    pts = synth.points_df(spark, 10000)
    PX.lookup_points_fused(
        imgs, pts, origin=(spec.x0, spec.y0), cellsize=(spec.cellx, spec.celly)
    ).agg(F.count("value")).collect()
    times["map_pixel_10k"] = round(time.time() - t0, 3)

    t0 = time.time()
    from georasters_spark.operators import knn as KN

    KN.knn_tiles(imgs, synth.points_df(spark, 1000), res=spec.cell_res, k=5).count()
    times["knn_1k_points"] = round(time.time() - t0, 3)

    t0 = time.time()
    from georasters_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    DD.jaccard_pairs(docs, n=3, threshold=0.5).count()
    times["jaccard_dedup"] = round(time.time() - t0, 3)

    t0 = time.time()
    from georasters_spark.operators import similarity as SM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    SM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5).count()
    times["ann_topk"] = round(time.time() - t0, 3)

    imgs.unpersist()
    return times


def scaling_job(spark) -> tuple[float, int]:
    """The fixed job for the N-vs-4N scaling proxy: decode + PIP zonal
    over the BENCH grid. Returns (seconds, pixel rows processed)."""
    from georasters_spark.operators import spatial_join as SJ
    from georasters_spark.sources import synth

    spec = synth.BENCH
    imgs = _build(spark, spec)
    t0 = time.time()
    res = SJ.zonal_stats_fused(
        imgs,
        synth.ZONES_T1 + [z for z in synth.ZONES_EXTRA if z.name == "skew_half_world"],
        origin=(spec.x0, spec.y0),
        cellsize=(spec.cellx, spec.celly),
    ).collect()
    dt = time.time() - t0
    rows = int(sum(r["zcount"] for r in res))
    imgs.unpersist()
    return dt, rows


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1 if "0.1" in sf_dir else (0.01 if "0.01" in sf_dir else 0.001)

    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            spark = _spark(cores)
            dt, rows = scaling_job(spark)   # warm: JVM+codegen
            dt2, _ = scaling_job(spark)     # measured run
            best = min(dt, dt2)
            results[cores] = {"sec": round(best, 3), "rows_per_sec": round(rows / best)}
            spark.stop()
        eff = results[32]["rows_per_sec"] / (4 * results[8]["rows_per_sec"])
        md = f"""# BENCH — measured scaling (sandbox proxy for N→4N executors)

Job: decode + PIP zonal stats (4 zones incl. salted skew zone) over the
BENCH grid (4320x2160 px = 9,331,200 cells, 2,312 tiles, raw16).

| parallelism | seconds | zonal output rows/sec |
|---|---|---|
| local[8]  | {results[8]['sec']} | {results[8]['rows_per_sec']:,} |
| local[32] | {results[32]['sec']} | {results[32]['rows_per_sec']:,} |

**Scaling efficiency (8→32 cores, 4x): {eff:.3f}** (criterion ≥ 0.8 — note
local-mode cores share one JVM + memory bandwidth; a real 4x-executor
cluster adds memory + I/O bandwidth with the cores).
"""
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(md)
        print(json.dumps({"scaling_efficiency": round(eff, 3), "results": results}))
        return

    spark = _spark(cpus)
    times = run_queries(spark, sf_dir)
    total = round(sum(times.values()), 3)
    npx = 9331200
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "pixels": npx,
                "decode_scan_pixels_per_sec": round(npx / times["decode_scan_agg"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
