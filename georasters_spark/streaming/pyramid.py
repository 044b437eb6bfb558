"""Streaming pyramid maintenance — continuous CDC re-tiling.

The north-star pipeline shape for a living 10^12-image lake: tile
updates arrive as a stream, every micro-batch commits (a) the merged
images table and (b) the incrementally-updated XYZ pyramid
(operators/xyz.xyz_update — only affected z/x/y tiles rebuild) to the
Iceberg-lite catalog, with the same exactly-once batch-id high-water
mark as events.stream_ingest_to_catalog.

Crash/replay contract: the high-water mark is tracked on the PYRAMID
table, which commits LAST — a crash between the images commit and the
pyramid commit replays the whole batch, and both steps are idempotent
(the anti-join merge of the same batch reproduces the same images
state; xyz_update of the same change list reproduces the same tiles).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_pyramid_maintenance(spark, src_dir: str, images_root: str,
                               pyramid_root: str,
                               src_origin: tuple[float, float],
                               src_cellsize: tuple[float, float],
                               base_zoom: int, min_zoom: int,
                               src_tile: int = 64, tile_px: int = 256,
                               ndv: float = -9999.0,
                               query_name: str = "pyramid",
                               checkpoint_dir: str | None = None) -> tuple[int, int]:
    """Drain ``src_dir`` (parquet stream of replaced images-table rows)
    into the images + pyramid catalog tables.  Both tables must be
    bootstrapped (images state + its xyz_pyramid) before the first
    batch.  Returns (images_version, pyramid_version)."""
    import os

    from ..operators import xyz as XYZ
    from ..sources.catalog import SnapshotTable, source_high_water_mark
    from ..sources.synth import IMAGES_SCHEMA

    imgs_tbl = SnapshotTable(images_root)
    pyr_tbl = SnapshotTable(pyramid_root)
    # a DURABLE checkpoint is what makes the batch-id high-water mark
    # meaningful across restarts: with a temp checkpoint a restarted
    # stream renumbers from 0 and "batch_id <= hwm" would silently skip
    # genuinely new data
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(pyramid_root, "_stream_checkpoint")
    if imgs_tbl.current_version() == 0 or pyr_tbl.current_version() == 0:
        raise ValueError("stream_pyramid_maintenance: bootstrap the "
                         "images and pyramid tables first")

    def sink(batch_df, batch_id: int):
        if batch_id <= source_high_water_mark(pyr_tbl, src_dir):
            return  # replay after restart: fully committed already
        dup = (batch_df.groupBy("tile_row", "tile_col").count()
               .filter(F.col("count") > 1))
        if not dup.isEmpty():
            # two replacements of one tile inside a single batch have
            # no defined order — merging both would duplicate the key
            # and double-count every pixel downstream; refuse loudly
            raise ValueError(
                "stream_pyramid_maintenance: batch carries multiple "
                "rows for one (tile_row, tile_col); emit one "
                "replacement per tile per file")
        changed = [(int(r["tile_row"]), int(r["tile_col"]))
                   for r in batch_df.select("tile_row", "tile_col")
                   .distinct().collect()]  # CDC metadata: KB-scale
        if not changed:
            return
        cur = imgs_tbl.scan(spark)
        keys = spark.createDataFrame(changed, "tile_row int, tile_col int")
        merged = cur.join(F.broadcast(keys), ["tile_row", "tile_col"],
                          "left_anti") \
                    .unionByName(batch_df.select(*cur.columns)) \
                    .localCheckpoint(eager=True)
        new_pyr = XYZ.xyz_update(
            merged, src_origin, src_cellsize, changed, pyr_tbl.scan(spark),
            base_zoom=base_zoom, min_zoom=min_zoom, src_tile=src_tile,
            tile_px=tile_px, ndv=ndv, tile_shape=(src_tile, src_tile),
        ).localCheckpoint(eager=True)
        props = {"max_batch_id": batch_id, "source": src_dir,
                 "query": query_name}
        imgs_tbl.overwrite(merged, props=props)
        pyr_tbl.overwrite(new_pyr, props=props)  # hwm commits LAST

    q = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return imgs_tbl.current_version(), pyr_tbl.current_version()
