"""Structured Streaming jobs driven to completion from parquet dirs."""

import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C
from simple_osm_queries_spark.streaming.cells import (
    streaming_cell_counts,
    streaming_window_events,
)


def test_streaming_cell_counts_matches_batch(spark, dataset, tmp_path):
    src = str(tmp_path / "nodes_src")
    dataset.nodes.select("id", "lon", "lat").write.parquet(src)

    stream = (
        spark.readStream.schema("id long, lon double, lat double").parquet(src)
    )
    q = (
        streaming_cell_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cell_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.cell: r.n for r in spark.sql("SELECT * FROM cell_counts").collect()}
    expected = {
        r.cell: r.n
        for r in dataset.nodes.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected
    # the hot cell dominates
    hot = C.pack_cell_py(*C.cell_xy_py(9.95, 53.55))
    assert got[hot] == max(got.values())


def test_streaming_window_events_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        streaming_window_events(stream, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_events")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_events").collect()
    }
    expected = {
        (r.ws, r.event_type): (r.n, r.tv)
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
        .collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k][0] == expected[k][0]
        assert got[k][1] == pytest.approx(expected[k][1])


def test_streaming_h3_counts_matches_batch(spark, dataset, tmp_path):
    from simple_osm_queries_spark.streaming.cells import streaming_h3_counts

    src = str(tmp_path / "nodes_h3_src")
    dataset.nodes.select("id", "lon", "lat").write.parquet(src)
    stream = (
        spark.readStream.schema("id long, lon double, lat double").parquet(src)
    )
    q = (
        streaming_h3_counts(stream, res=7)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("h3_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r.cell: r.n for r in spark.sql("SELECT * FROM h3_counts").collect()}
    expected = {
        r.cell: r.n
        for r in dataset.nodes.groupBy(
            C.cell_h3(F.col("lon"), F.col("lat"), 7).alias("cell")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected and got


def test_streaming_tile_pixel_counts_matches_batch(spark, dataset, tmp_path):
    """The raster-binning aggregation in streaming form must agree exactly
    with the batch operator (same shared tile_fxy projection)."""
    from simple_osm_queries_spark.operators.tiles import tile_pixel_bins
    from simple_osm_queries_spark.streaming.cells import streaming_tile_pixel_counts

    src = str(tmp_path / "nodes_tiles_src")
    dataset.nodes.select("id", "lon", "lat").write.parquet(src)
    stream = spark.readStream.schema("id long, lon double, lat double").parquet(src)
    q = (
        streaming_tile_pixel_counts(stream, zoom=13, tile_px=32)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tile_px_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.tile_id, r.px, r.py): r.cnt
        for r in spark.sql("SELECT * FROM tile_px_counts").collect()
    }
    expected = {
        (r.tile_id, r.px, r.py): r.cnt
        for r in tile_pixel_bins(
            dataset.nodes.select("lon", "lat"), 13, 32
        ).collect()
    }
    assert got == expected and len(got) > 0
