"""Streaming sessionization: sessions persist across micro-batches, close on
gap, and match the batch operator's rollup for closed sessions."""

import pandas as pd

from simple_osm_queries_spark.streaming.sessions import streaming_sessionize


def test_streaming_sessions_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "ev_stream")
    chk = str(tmp_path / "chk")

    # user 1: one session spanning both batches (gaps <= 60), then a jump
    # that closes it; user 2: two sessions inside batch 1
    batch1 = pd.DataFrame(
        {"user_id": [1, 1, 2, 2, 2], "ts": [10.0, 50.0, 5.0, 20.0, 500.0]}
    )
    batch2 = pd.DataFrame({"user_id": [1, 1], "ts": [100.0, 1000.0]})
    spark.createDataFrame(batch1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("user_id long, ts double").parquet(src)
    sess = streaming_sessionize(stream, "user_id", "ts", gap_seconds=60)
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    rows1 = {
        (r.key, r.session_id, r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # only user 2's first session closed (5..20, then 500 > gap)
    assert rows1 == {(2, 1, 2, 5.0, 20.0)}

    spark.createDataFrame(batch2).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    rows2 = {
        (r.key, r.session_id, r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # user 1's first session spans batches: 10, 50, 100 (gaps 40, 50), then
    # 1000 closes it — 3 events counted across micro-batches
    assert rows2 - rows1 == {(1, 1, 3, 10.0, 100.0)}


def test_streaming_sessions_match_batch_for_closed(spark, tmp_path):
    """The closed sessions a stream emits equal the batch operator's
    session_stats rows for the same (in-order) events."""
    import numpy as np
    from pyspark.sql import functions as F

    from simple_osm_queries_spark.operators import temporal

    rng = np.random.RandomState(11)
    rows = []
    for uid in range(6):
        t = 0.0
        for _ in range(30):
            t += float(rng.choice([5.0, 20.0, 200.0], p=[0.5, 0.3, 0.2]))
            rows.append((uid, t))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])

    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    spark.createDataFrame(pdf).write.mode("append").parquet(src)
    stream = spark.readStream.schema("user_id long, ts double").parquet(src)
    q = (
        streaming_sessionize(stream, "user_id", "ts", gap_seconds=60)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_cmp")
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.key, r.session_id, r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM sess_cmp").collect()
    }

    batch = temporal.session_stats(
        spark.createDataFrame(pdf).withColumn("ts", F.col("ts")), "user_id", "ts", 60
    ).collect()
    last_sid = {r.user_id: max(x.session_id for x in batch if x.user_id == r.user_id) for r in batch}
    want = {
        (r.user_id, r.session_id, r.n_events, r.session_start, r.session_end)
        for r in batch
        if r.session_id != last_sid[r.user_id]  # open tail sessions not emitted
    }
    assert got == want and len(got) > 10


def test_event_time_timeout_preserves_session_numbering(spark, tmp_path):
    """An idle session flushed by event-time timeout must NOT reset the
    per-key session counter: the next session continues the numbering."""
    from pyspark.sql import functions as F

    src, chk = str(tmp_path / "src_t"), str(tmp_path / "chk_t")
    import pandas as pd

    spark.createDataFrame(pd.DataFrame({"user_id": [1], "ts": [10.0]})).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts double")
        .parquet(src)
        .withColumn("event_time", F.col("ts").cast("timestamp"))
        .withWatermark("event_time", "0 seconds")
    )
    q = (
        streaming_sessionize(stream, "user_id", "ts", gap_seconds=60, use_event_time_timeout=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_tmo")
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    # batch 2: far-future event advances the watermark past 10+60 -> the
    # open session times out AND the event opens session 2 (not 1!)
    spark.createDataFrame(pd.DataFrame({"user_id": [1], "ts": [100000.0]})).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    # batch 3: another jump closes session 2 by gap
    spark.createDataFrame(pd.DataFrame({"user_id": [1], "ts": [900000.0]})).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (r.key, r.session_id, r.n_events, r.session_start)
        for r in spark.sql("SELECT * FROM sess_tmo").collect()
    )
    assert (1, 1, 1, 10.0) in rows
    assert (1, 2, 1, 100000.0) in rows
    sids = [sid for _, sid, _, _ in rows]
    assert len(sids) == len(set(sids)), rows  # no duplicate session ids
