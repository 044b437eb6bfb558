"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query: documents (sf0.001 parquet) become
                 deterministic geo points, map_pixel-looked-up into the
                 synthetic tile grid, aggregated per source.
queries()      — one entry per gated operator (georasters_spark.queries).
oracle_sql()   — matching DuckDB SQL; raster oracles recompute the
                 deterministic synthetic pixel field via range() while
                 Spark goes through the real tile-codec path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial point-lookup join of documents into the tile grid."""
    from pyspark.sql import functions as F

    from georasters_spark import queries as Q
    from georasters_spark.functions import grid as G
    from georasters_spark.operators import pixels as PX

    spec = Q.SPEC
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pts = docs.select(
        "doc_id",
        "source",
        (F.lit(-180.0) + ((F.col("doc_id") * 7351) % 3600).cast("double") / 10.0).alias("x"),
        (F.lit(90.0) - ((F.col("doc_id") * 4099) % 1800).cast("double") / 10.0).alias("y"),
    )
    pts = pts.withColumn("prow", G.row_of_y(F.col("y"), spec.y0, spec.celly)).withColumn(
        "pcol", G.col_of_x(F.col("x"), spec.x0, spec.cellx)
    )
    px = PX.pixel_table(
        Q.images_for(spark, spec),
        valid_only=True,
        origin=(spec.x0, spec.y0),
        cellsize=(spec.cellx, spec.celly),
    ).select(F.col("row").alias("prow"), F.col("col").alias("pcol"), "value")
    hits = px.join(F.broadcast(pts), ["prow", "pcol"], "right")
    return hits.groupBy("source").agg(
        F.count("doc_id").alias("n_docs"),
        F.count("value").alias("n_hits"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from georasters_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from georasters_spark.queries import QUERIES

    return {name: sql() for name, (_fn, sql) in QUERIES.items() if sql is not None}
