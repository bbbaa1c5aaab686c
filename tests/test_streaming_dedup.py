"""Stateful streaming dedup: first-seen rows survive, duplicates across
micro-batches are dropped (state persists between triggers)."""

import pandas as pd
from pyspark.sql import functions as F

from simple_osm_queries_spark.streaming.dedup import streaming_dedup_exact


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    chk = str(tmp_path / "chk")

    batch1 = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "fp": ["a", "b", "a", "c"]}  # a duplicated in-batch
    )
    batch2 = pd.DataFrame(
        {"doc_id": [5, 6, 7], "fp": ["b", "d", "c"]}  # b, c duplicate batch1
    )
    spark.createDataFrame(batch1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, fp string").parquet(src)
    dedup = streaming_dedup_exact(stream, "fp", num_buckets=4, output_cols=["doc_id", "fp"])
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    got1 = {(r.doc_id, r.fp) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert {fp for _, fp in got1} == {"a", "b", "c"}
    assert len(got1) == 3  # in-batch duplicate of 'a' dropped

    spark.createDataFrame(batch2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got2 = {(r.doc_id, r.fp) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    new = got2 - got1
    # only 'd' is first-seen in batch2; 'b' and 'c' were admitted in batch1
    assert new == {(6, "d")}


def test_streaming_dedup_bloom_bounded_state(spark, tmp_path):
    """Bloom variant: duplicates across micro-batches drop, state stays a
    fixed byte blob, and at low fill no fresh row is falsely dropped."""
    from simple_osm_queries_spark.streaming.dedup import streaming_dedup_bloom

    src, chk = str(tmp_path / "src_b"), str(tmp_path / "chk_b")
    b1 = pd.DataFrame({"doc_id": list(range(100)), "fp": [f"f{i % 60}" for i in range(100)]})
    spark.createDataFrame(b1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, fp string").parquet(src)
    q = (
        streaming_dedup_bloom(
            stream, "fp", num_buckets=4, bits_per_bucket=1 << 14,
            output_cols=["doc_id", "fp"],
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bloom_out")
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    got1 = {r.fp for r in spark.sql("SELECT * FROM bloom_out").collect()}
    assert got1 == {f"f{i}" for i in range(60)}  # all distincts, no FP drops

    b2 = pd.DataFrame({"doc_id": [1000, 1001], "fp": ["f3", "brand_new"]})
    spark.createDataFrame(b2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got2 = {r.fp for r in spark.sql("SELECT * FROM bloom_out").collect()}
    assert got2 - got1 == {"brand_new"}  # f3 deduped across batches
