"""Checkpointed index build: band planning, atomic manifests, resume skips
completed bands, changed input fingerprint forces recompute."""

import json
import os

import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.index import build


def test_plan_bands_respects_cap_and_skew(dataset):
    bands = build.plan_bands(dataset.nodes, max_rows_per_band=200)
    assert bands
    # contiguous, ordered, covering
    for a, b in zip(bands, bands[1:]):
        assert a.max_x < b.min_x
    assert sum(b.rows for b in bands) == dataset.nodes.count()
    # the cap holds except for single oversize columns (hot cell column)
    for b in bands:
        if b.min_x != b.max_x:
            assert b.rows <= 200


def test_build_resume_and_invalidate(dataset, tmp_path, spark):
    out = str(tmp_path / "idx")
    r1 = build.build_index(dataset.nodes, out, input_fingerprint="fp1", max_rows_per_band=300)
    assert r1["bands"] > 0 and r1["skipped"] == 0

    # manifests exist and carry metrics
    mdir = os.path.join(out, "_manifests")
    manifests = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    assert all("rows" in m and "duration_sec" in m for m in manifests)

    # resume: everything skipped, nothing recomputed
    r2 = build.build_index(dataset.nodes, out, input_fingerprint="fp1", max_rows_per_band=300)
    assert r2["bands"] == 0 and r2["skipped"] == len(manifests)
    assert r2["rows"] == r1["rows"]

    # index reads back complete and partition-pruned
    idx = build.read_index(spark, out)
    assert idx.count() == dataset.nodes.count()
    some_x = idx.select("cell_x").first().cell_x
    pruned = idx.filter(F.col("cell_x") == some_x)
    assert pruned.count() == dataset.nodes.filter(F.col("cell_x") == some_x).count()

    # different input fingerprint invalidates manifests
    r3 = build.build_index(dataset.nodes, out, input_fingerprint="fp2", max_rows_per_band=300)
    assert r3["bands"] == len(manifests) and r3["skipped"] == 0


def test_partial_build_resumes_where_it_stopped(dataset, tmp_path):
    out = str(tmp_path / "idx2")
    bands = build.plan_bands(dataset.nodes, max_rows_per_band=300)
    assert len(bands) >= 2
    # simulate a killed job: pre-write a manifest for the first band only
    first = bands[0]
    build._write_manifest_atomic(
        build._manifest_path(out, first),
        {"band": first.key, "min_x": first.min_x, "max_x": first.max_x,
         "rows": first.rows, "input_fingerprint": "fp", "duration_sec": 0.0},
    )
    r = build.build_index(dataset.nodes, out, input_fingerprint="fp", max_rows_per_band=300)
    assert r["skipped"] == 1
    assert r["bands"] == len(bands) - 1


def test_rebuild_with_shrunken_input_purges_stale_partitions(spark, tmp_path):
    """Dynamic partition overwrite only replaces cell_x dirs present in the
    NEW input; a changed fingerprint must wipe the old build so cell_x
    partitions that existed only in the old input don't leak into reads."""
    out = str(tmp_path / "idx")
    old = spark.createDataFrame(
        [(i, i % 3, 0, 53.5) for i in range(90)], "id long, cell_x int, cell_y int, lat double"
    )
    new = spark.createDataFrame(
        [(i, 1 + i % 2, 0, 53.5) for i in range(40)], "id long, cell_x int, cell_y int, lat double"
    )
    build.build_index(old, out, input_fingerprint="fp-old", max_rows_per_band=1000)
    assert sorted(
        r.cell_x for r in build.read_index(spark, out).select("cell_x").distinct().collect()
    ) == [0, 1, 2]
    r2 = build.build_index(new, out, input_fingerprint="fp-new", max_rows_per_band=1000)
    assert r2["wiped"] is True and r2["skipped"] == 0
    got = build.read_index(spark, out)
    assert sorted(r.cell_x for r in got.select("cell_x").distinct().collect()) == [1, 2]
    assert got.count() == 40
    # same fingerprint again -> no wipe, full skip
    r3 = build.build_index(new, out, input_fingerprint="fp-new", max_rows_per_band=1000)
    assert r3["wiped"] is False and r3["bands"] == 0 and r3["skipped"] > 0


def test_iceberg_backend_round_trip(spark, tmp_path):
    """Live only when iceberg-spark-runtime is on the classpath (the
    soq_iceberg hadoop catalog from session.py); documented-skipped
    otherwise so the 100-TB Iceberg story isn't resting on untested code."""
    if not build.iceberg_available(spark):
        import pytest as _pytest

        _pytest.skip(
            "iceberg-spark-runtime-4.x jar not on classpath "
            "(spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13)"
        )
    table = "soq_iceberg.db.idx_test"
    df = spark.createDataFrame(
        [(i, i % 3, 0, 53.5) for i in range(90)], "id long, cell_x int, cell_y int, lat double"
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS soq_iceberg.db")
    r = build.build_index(
        df, str(tmp_path / "ice"), input_fingerprint="fp", max_rows_per_band=40,
        backend="iceberg", iceberg_table=table,
    )
    assert r["bands"] > 0
    got = spark.read.table(table)
    assert got.count() == 90
    assert sorted(x.cell_x for x in got.select("cell_x").distinct().collect()) == [0, 1, 2]
    # resume: same fingerprint -> full skip
    r2 = build.build_index(
        df, str(tmp_path / "ice"), input_fingerprint="fp", max_rows_per_band=40,
        backend="iceberg", iceberg_table=table,
    )
    assert r2["bands"] == 0 and r2["skipped"] == r["bands"]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_iceberg_backend_requires_table_name(spark, tmp_path, dataset):
    with pytest.raises(ValueError, match="iceberg_table"):
        build.build_index(
            dataset.nodes, str(tmp_path / "x"), input_fingerprint="f",
            backend="iceberg",
        )


def test_iceberg_write_band_branches(monkeypatch):
    """Mock-level drive of the Iceberg DSv2 branch logic: first touch
    creates the table partitioned by cell_x, subsequent bands dynamic-
    overwrite their partitions (live round-trip is skip-documented while
    the runtime jar is absent)."""
    from simple_osm_queries_spark.index import build as B

    calls = []

    class FakeWriter:
        def partitionedBy(self, col):
            calls.append(("partitionedBy", str(col)))
            return self

        def create(self):
            calls.append(("create",))

        def overwritePartitions(self):
            calls.append(("overwritePartitions",))

    class FakeDF:
        def writeTo(self, table):
            calls.append(("writeTo", table))
            return FakeWriter()

    class FakeCatalog:
        def __init__(self, exists):
            self._exists = exists

        def tableExists(self, table):
            return self._exists

    class FakeSpark:
        def __init__(self, exists):
            self.catalog = FakeCatalog(exists)

    B._iceberg_write_band(FakeSpark(False), FakeDF(), "soq_iceberg.db.t")
    assert calls == [
        ("writeTo", "soq_iceberg.db.t"),
        ("partitionedBy", "Column<'cell_x'>"),
        ("create",),
    ]
    calls.clear()
    B._iceberg_write_band(FakeSpark(True), FakeDF(), "soq_iceberg.db.t")
    assert calls == [("writeTo", "soq_iceberg.db.t"), ("overwritePartitions",)]


def test_iceberg_changed_input_drops_table(spark, tmp_path, monkeypatch):
    """backend='iceberg' + changed input fingerprint must DROP the table
    before rewriting (overwritePartitions only replaces partitions present
    in the new input — stale cell_x partitions would otherwise survive)."""
    from simple_osm_queries_spark.functions import cells as C
    from simple_osm_queries_spark.index import build as B

    df = spark.range(50).select(
        F.col("id"),
        (F.col("id") % 5).cast("int").alias("cell_x"),
        (F.col("id") % 7).cast("int").alias("cell_y"),
        (F.col("id") * 0.001).alias("lat"),
    )
    out = str(tmp_path / "idx")
    band_calls = []
    monkeypatch.setattr(
        B, "_iceberg_write_band", lambda s, d, t, pc="cell_x": band_calls.append(t)
    )
    sqls = []
    orig_sql = type(spark).sql
    monkeypatch.setattr(
        type(spark), "sql", lambda self, q, *a, **k: sqls.append(q)
    )
    try:
        B.build_index(df, out, "fp-1", backend="iceberg", iceberg_table="soq_iceberg.db.t")
        assert band_calls and not [s for s in sqls if "DROP TABLE" in s]
        band_calls.clear()
        # same fingerprint: manifests short-circuit, no writes, no drop
        B.build_index(df, out, "fp-1", backend="iceberg", iceberg_table="soq_iceberg.db.t")
        assert not band_calls and not [s for s in sqls if "DROP TABLE" in s]
        # changed fingerprint: wipe + DROP TABLE + full rewrite
        B.build_index(df, out, "fp-2", backend="iceberg", iceberg_table="soq_iceberg.db.t")
        assert band_calls
        assert [s for s in sqls if "DROP TABLE IF EXISTS soq_iceberg.db.t" in s]
    finally:
        monkeypatch.setattr(type(spark), "sql", orig_sql)
