"""Fine-grained sieve/polygonize phase isolation (r7 session 2).

NOT the graded bench.  Times each internal phase of sieve_1M /
polygonize_1M with noop sinks and job labels so the next optimization
targets the measured cost, not the assumed one (guide 1.1/1.4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:52s} {dt:7.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out, dt


def main():
    from georasters_spark.session import get_spark
    from georasters_spark.operators import algebra as AL
    from georasters_spark.operators import pixels as PX
    from georasters_spark.sources import synth

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="sieve_phases", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    # warmup as in bench.py
    warm = synth.build_images(spark, synth.T1, fmt="raw16").persist()
    warm.count()
    PX.pixel_table(warm, valid_only=True).agg(F.count("value")).collect()
    warm.unpersist()

    spec = synth.BENCH
    imgs = synth.build_images(spark, spec, fmt="raw16").persist()
    imgs.count()
    pxq = PX.pixel_table(
        imgs.filter((F.col("tile_row") < 16) & (F.col("tile_col") < 16)),
        valid_only=True,
    ).filter(
        (F.col("row") < 1024) & (F.col("col") < 1024)
    ).select("row", "col",
             (F.col("value").cast("long") / 250).cast("long").alias("value"))

    for rep in range(2):
        print(f"-- rep {rep} --", flush=True)
        timed(spark, "pxq decode+filter only (noop)", lambda: noop(pxq))
        # phase 1: labels (the polygonize_labels internals, step by step)
        L, _ = timed(spark, "polygonize_labels + checkpoint",
                     lambda: AL.polygonize_labels(pxq).localCheckpoint(
                         eager=True))
        # phase 2: S region agg
        S = L.groupBy("region_id").agg(
            F.count(F.lit(1)).alias("sz"), F.first("value").alias("value"),
            F.min("row").alias("a_r"),
            F.expr("min_by(col, struct(row, col))").alias("a_c"))
        timed(spark, "S region agg (noop)", lambda: noop(S))
        # phase 3: E adjacency — grouped-map part only
        tile = 64
        keyed = L.withColumn(
            "trow", F.floor(F.col("row") / tile).cast("int")
        ).withColumn("tcol", F.floor(F.col("col") / tile).cast("int"))
        import numpy as np
        import pandas as pd
        offs = [(0, 1), (1, 0)]

        def tile_edges(key, pdf):
            ty, tx = int(key[0]), int(key[1])
            r = pdf["row"].to_numpy(np.int64) - ty * tile
            c = pdf["col"].to_numpy(np.int64) - tx * tile
            lab = pdf["region_id"].to_numpy(np.int64)
            grid = np.full((tile, tile), -1, np.int64)
            grid[r, c] = lab
            pairs = []
            for dr, dc in offs:
                sa = grid[max(0, -dr):tile - max(0, dr),
                          max(0, -dc):tile - max(0, dc)]
                sb = grid[max(0, dr):tile + min(0, dr),
                          max(0, dc):tile + min(0, dc)]
                m2 = (sa >= 0) & (sb >= 0) & (sa != sb)
                if m2.any():
                    pairs.append(np.stack([sa[m2], sb[m2]], axis=1))
            if not pairs:
                return pd.DataFrame({"ra": np.empty(0, np.int64),
                                     "rb": np.empty(0, np.int64)})
            e = np.unique(np.concatenate(pairs), axis=0)
            return pd.DataFrame({"ra": e[:, 0], "rb": e[:, 1]})

        Eg = keyed.groupBy("trow", "tcol").applyInPandas(
            tile_edges, schema="ra long, rb long")
        timed(spark, "E intra grouped-map (noop)", lambda: noop(Eg))
        # phase 3b: band joins only
        a = keyed.select("row", "col", F.col("region_id").alias("ra"))
        b = keyed.select(F.col("row").alias("rb_r"),
                         F.col("col").alias("rb_c"),
                         F.col("region_id").alias("rb"))
        bands = None
        for (dr, dc), band, band_b in [
                ((0, 1), (F.col("col") + 1) % tile == 0,
                 F.col("rb_c") % tile == 0),
                ((1, 0), (F.col("row") + 1) % tile == 0,
                 F.col("rb_r") % tile == 0)]:
            e = (a.filter(band)
                 .join(b.filter(band_b), (F.col("row") + dr == F.col("rb_r"))
                       & (F.col("col") + dc == F.col("rb_c")))
                 .filter(F.col("ra") != F.col("rb")).select("ra", "rb"))
            bands = e if bands is None else bands.unionByName(e)
        timed(spark, "E cross band joins (noop)", lambda: noop(bands))
        E_full = Eg.unionByName(bands)
        E_full = E_full.unionByName(E_full.select(
            F.col("rb").alias("ra"), F.col("ra").alias("rb"))).distinct()
        timed(spark, "E full sym+distinct (noop)", lambda: noop(E_full))
        # whole query
        timed(spark, "sieve full (count)",
              lambda: AL.sieve(pxq, threshold=2).count())
        timed(spark, "polygonize full (count)",
              lambda: AL.polygonize(pxq, merge="distributed").count())
    imgs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
