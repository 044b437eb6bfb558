"""Ring-expansion kNN == brute force (exactness of the candidate bound)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from georasters_spark.operators import knn as KN
from georasters_spark.sources import synth


def _brute(spark, images, points, k):
    tiles = images.select(
        "image_id",
        (F.col("xmin") + (F.col("w") * F.col("cellx")) / 2).alias("cx"),
        (F.col("ymax") + (F.col("h") * F.col("celly")) / 2).alias("cy"),
    ).toPandas()
    pts = points.toPandas()
    out = []
    for p in pts.itertuples():
        d2 = np.round((tiles.cx - p.x) ** 2 + (tiles.cy - p.y) ** 2, 6)
        df = pd.DataFrame({"image_id": tiles.image_id, "dist2": d2}).sort_values(
            ["dist2", "image_id"]
        )
        top = df.head(k)
        for rank, r in enumerate(top.itertuples(), 1):
            out.append((p.point_id, r.image_id, r.dist2, rank))
    return pd.DataFrame(out, columns=["point_id", "image_id", "dist2", "knn_rank"])


def test_knn_matches_brute_force(spark, images_t1):
    pts = synth.points_df(spark, 40)
    got = (
        KN.knn_tiles(images_t1, pts, res=synth.T1.cell_res, k=5)
        .toPandas()
        .sort_values(["point_id", "knn_rank"])
        .reset_index(drop=True)
    )
    exp = _brute(spark, images_t1, pts, 5).sort_values(
        ["point_id", "knn_rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"point_id": "int64"}), exp.astype({"point_id": "int64"}), check_dtype=False)


def test_knn_sparse_tiles(spark, images_t1):
    """With most tiles removed, rings must keep expanding until k found."""
    sparse = images_t1.filter(
        (F.col("tile_row") % 3 == 0) & (F.col("tile_col") % 4 == 0)
    )
    assert sparse.count() == 6
    pts = synth.points_df(spark, 10)
    got = (
        KN.knn_tiles(sparse, pts, res=synth.T1.cell_res, k=3)
        .toPandas()
        .sort_values(["point_id", "knn_rank"])
        .reset_index(drop=True)
    )
    exp = _brute(spark, sparse, pts, 3).sort_values(
        ["point_id", "knn_rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"point_id": "int64"}), exp.astype({"point_id": "int64"}), check_dtype=False)


def test_knn_k_larger_than_tiles(spark, images_t1):
    """k > #tiles → every tile returned, ranked."""
    sparse = images_t1.filter(F.col("tile_row") == 0).filter(F.col("tile_col") < 3)
    pts = synth.points_df(spark, 3)
    got = KN.knn_tiles(sparse, pts, res=synth.T1.cell_res, k=10).toPandas()
    assert (got.groupby("point_id").size() == 3).all()
