"""As-of join vs pandas merge_asof; sessionization vs a Python oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators import temporal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .cache()
    )


def test_asof_join_matches_merge_asof(spark, events):
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.col("value").alias("purchase_value")
    )
    got = temporal.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        payload=["purchase_id", "purchase_value"],
    ).toPandas()

    cp = clicks.toPandas().sort_values("ts")
    pp = purchases.toPandas().sort_values("ts")
    expected = pd.merge_asof(
        cp, pp[["user_id", "ts", "purchase_id", "purchase_value"]],
        on="ts", by="user_id", direction="backward",
    )
    g = got.set_index("event_id").sort_index()
    e = expected.set_index("event_id").sort_index()
    assert len(g) == len(e)
    pid_g = g["purchase_id"].astype("float64")
    pid_e = e["purchase_id"].astype("float64")
    assert pid_g.fillna(-1).equals(pid_e.fillna(-1))


def test_asof_tie_visibility(spark):
    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, tag string")
    right = spark.createDataFrame([(1, 100, 7.0), (1, 99, 5.0)], "k long, t long, v double")
    out = temporal.asof_join(left, right, "k", "t", "t", ["v"]).collect()
    assert out[0].v == 7.0  # equal-timestamp right row is visible


def test_sessionize_matches_oracle(spark, events):
    gap = 3600
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in temporal.sessionize(events, "user_id", "ts", gap).collect()
    }
    pdf = events.toPandas().sort_values(["user_id", "ts"])
    expected = {}
    for uid, grp in pdf.groupby("user_id"):
        sid = 0
        prev = None
        for r in grp.itertuples():
            t = r.ts.timestamp()
            if prev is None or t - prev > gap:
                sid += 1
            expected[(uid, r.event_id)] = sid
            prev = t
    assert got == expected


def test_session_stats(spark, events):
    stats = temporal.session_stats(events, "user_id", "ts", 3600)
    row = stats.first()
    assert row.n_events >= 1 and row.duration_sec >= 0
    total = stats.agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_asof_payload_taken_atomically_from_one_row(spark):
    """The latest qualifying right row has NULL in one payload column and
    non-NULL in another: the output must NOT mix columns across right rows."""
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, "old_a", "old_b"), (1, 50, None, "new_b")],
        "k long, ts long, a string, b string",
    )
    from simple_osm_queries_spark.operators.temporal import asof_join

    (row,) = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", payload=["a", "b"]
    ).collect()
    assert row.a is None and row.b == "new_b"  # all from the ts=50 row
