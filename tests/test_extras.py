"""Spark-native extras the reference lacks (SURVEY §2.4-2.5: "Spark gives
them for free"): cube/rollup, approx aggregates, intersect/except — plus the
phash (image) near-dup operator."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def test_rollup_and_cube(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = li.groupBy("l_returnflag", "l_linestatus").count().count()
    flags = li.select("l_returnflag").distinct().count()
    rollup_rows = li.rollup("l_returnflag", "l_linestatus").count().count()
    cube_rows = li.cube("l_returnflag", "l_linestatus").count().count()
    statuses = li.select("l_linestatus").distinct().count()
    assert rollup_rows == plain + flags + 1
    assert cube_rows == plain + flags + statuses + 1


def test_approx_aggregates_close_to_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).first()[0]
    assert approx == pytest.approx(exact, rel=0.1)
    med_approx = li.select(F.percentile_approx("l_quantity", 0.5)).first()[0]
    med_exact = li.select(F.expr("percentile(l_quantity, 0.5)")).first()[0]
    assert med_approx == pytest.approx(med_exact, rel=0.2)


def test_set_ops(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").distinct()
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey")
    )
    inter = o.intersect(c).count()
    assert inter == o.count()  # every ordering customer exists
    missing = c.exceptAll(o).count()
    assert missing == c.count() - inter


def test_phash_near_dups(spark):
    # engineered phashes: groups of 4 share all but the low 2 bits
    pdf = pd.DataFrame(
        {
            "image_id": [f"img{i}" for i in range(16)],
            "phash": [(i // 4) * 1024 + (i % 4) for i in range(16)],
        }
    )
    df = spark.createDataFrame(pdf)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.phash_near_dups(df, max_hamming=2).collect()
    }
    # exhaustive oracle over all pairs (candidate generation is pigeonhole-
    # complete for hamming <= chunks-1, so this must match exactly)
    vals = dict(zip(pdf.image_id, pdf.phash))
    expected = {}
    ids = sorted(vals)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(vals[ids[i]] ^ vals[ids[j]]).count("1")
            if h <= 2:
                expected[(ids[i], ids[j])] = h
    assert pairs == expected and expected  # non-trivial
