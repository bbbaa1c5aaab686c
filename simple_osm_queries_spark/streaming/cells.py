"""Structured Streaming variants.

The reference is batch-only (SURVEY.md §2.7); these exist because a 10^12-
scale ingest is in practice a continuously-arriving stream. Two canonical
jobs:

* ``streaming_cell_counts`` — the density aggregation (A1,
  /root/reference/src/osm/density.go:33-49) as an incremental streaming agg:
  per-cell running counts with ``update`` output (complete per-cell state is
  exactly the import pass-1 histogram that drives band planning);
* ``streaming_window_events`` — event-time tumbling-window counts with
  watermarked late-data handling over a timestamped table (the generic
  windowed rollup).

Tests drive them from parquet directories with processAllAvailable() — the
same plan runs against kafka/file sources on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C


def streaming_cell_counts(stream: DataFrame) -> DataFrame:
    """Per-cell running node counts from a (lon, lat)-bearing stream."""
    return (
        stream.withColumn("cell", C.cell_of(F.col("lon"), F.col("lat")))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )


def streaming_window_events(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with a watermark for late data."""
    # watermarks require TIMESTAMP (with zone); NTZ sources are cast — the
    # session timezone is pinned to UTC so values are unchanged
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_h3_counts(stream: DataFrame, res: int = 8) -> DataFrame:
    """Per-H3-cell running counts from a (lon, lat)-bearing stream — the
    density aggregation keyed by REAL H3 ids (the from-scratch encoder runs
    inside the micro-batch as the same Arrow-batched pandas UDF as the
    batch path, so stream/batch cell assignments are identical)."""
    return (
        stream.withColumn("cell", C.cell_h3(F.col("lon"), F.col("lat"), res))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )


def streaming_tile_pixel_counts(
    stream: DataFrame, zoom: int, tile_px: int = 256
) -> DataFrame:
    """The raster-rendering aggregation (operators/tiles.py
    tile_pixel_bins) in streaming form: per-(tile, pixel) running counts
    over a (lon, lat)-bearing stream — continuously refreshed map-tile
    state with ``update`` output. Same shared Web-Mercator projection
    (cells.tile_fxy), same bounded per-tile state (<= tile_px^2 keys per
    tile); a downstream renderer repaints only tiles whose rows updated.

    Delegates to the batch operator: tile_pixel_bins is pure column math,
    so the identical plan runs on a streaming DataFrame — one definition,
    structurally impossible for batch and streaming rasters to diverge."""
    from simple_osm_queries_spark.operators.tiles import tile_pixel_bins

    return tile_pixel_bins(stream, zoom, tile_px)
