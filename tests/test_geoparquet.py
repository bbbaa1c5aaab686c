"""GeoParquet sink: spec-complete files (geo metadata, WKB) readable with
plain pyarrow, byte-decoded against the source coordinates."""

import json
import struct

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from simple_osm_queries_spark.query.planner import run_query
from simple_osm_queries_spark.sources import geoparquet as G


def _decode_wkb(b: bytes):
    (endian, gtype) = struct.unpack("<BI", b[:5])
    assert endian == 1
    if gtype == 1:
        return ("Point", [struct.unpack("<dd", b[5:21])])
    if gtype == 2:
        (n,) = struct.unpack("<I", b[5:9])
        return (
            "LineString",
            [struct.unpack("<dd", b[9 + 16 * i : 25 + 16 * i]) for i in range(n)],
        )
    raise AssertionError(gtype)


def test_point_sink_round_trip(spark, dataset, tmp_path):
    out = str(tmp_path / "gp_points")
    res = run_query(
        "bbox(9.90, 53.50, 10.10, 53.70).nodes{ amenity=bench }", dataset
    ).select("id", "lon", "lat")
    G.write_geoparquet(res, out)
    t = pq.read_table(out)
    assert t.num_rows == res.count() > 0
    meta = json.loads(t.schema.metadata[b"geo"])
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"
    assert meta["columns"]["geometry"]["geometry_types"] == ["Point"]
    bbox = meta["columns"]["geometry"]["bbox"]
    assert 9.90 <= bbox[0] <= bbox[2] <= 10.10
    want = {r.id: (r.lon, r.lat) for r in res.collect()}
    for rid, wkb in zip(t["id"].to_pylist(), t["geometry"].to_pylist()):
        gtype, pts = _decode_wkb(wkb)
        assert gtype == "Point" and pts[0] == want[rid]


def test_way_sink_linestrings(spark, dataset, tmp_path):
    out = str(tmp_path / "gp_ways")
    res = run_query("bbox(9.90, 53.50, 10.10, 53.70).ways{ highway=* }", dataset).select(
        "id", "nodes"
    )
    G.write_geoparquet(res, out)
    t = pq.read_table(out)
    meta = json.loads(t.schema.metadata[b"geo"])
    assert meta["columns"]["geometry"]["geometry_types"] == ["LineString"]
    want = {
        r.id: [(n.lon, n.lat) for n in r.nodes] for r in res.collect()
    }
    assert t.num_rows == len(want) > 0
    for rid, wkb in zip(t["id"].to_pylist(), t["geometry"].to_pylist()):
        gtype, pts = _decode_wkb(wkb)
        assert gtype == "LineString" and pts == want[rid]


def test_duckdb_spatial_reads_it_if_available(spark, dataset, tmp_path):
    """Cross-engine check when duckdb's spatial extension can load
    (needs network to install — skipped in this container)."""
    import duckdb
    import pytest

    con = duckdb.connect()
    try:
        con.sql("INSTALL spatial; LOAD spatial")
    except Exception:
        pytest.skip("duckdb spatial extension unavailable (offline container)")
    out = str(tmp_path / "gp_duck")
    res = run_query(
        "bbox(9.90, 53.50, 10.10, 53.70).nodes{ amenity=bench }", dataset
    ).select("id", "lon", "lat")
    G.write_geoparquet(res, out)
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet') "
        f"WHERE ST_GeometryType(ST_GeomFromWKB(geometry)) = 'POINT'"
    ).fetchone()[0]
    assert n == res.count()


def test_read_geoparquet_points_round_trip(spark, dataset, tmp_path):
    out = str(tmp_path / "pts")
    res = run_query("bbox(9.90, 53.50, 10.10, 53.70).nodes{ amenity=* }", dataset)
    G.write_geoparquet(res.select("id", "lon", "lat"), out)
    back = G.read_geoparquet(spark, out)
    assert set(back.columns) == {"id", "lon", "lat"}
    orig = {r.id: (r.lon, r.lat) for r in res.select("id", "lon", "lat").collect()}
    got = {r.id: (r.lon, r.lat) for r in back.collect()}
    assert got == orig


def test_read_geoparquet_lines_round_trip(spark, dataset, tmp_path):
    out = str(tmp_path / "lines")
    res = run_query("bbox(9.90, 53.50, 10.10, 53.70).ways{ highway=* }", dataset)
    G.write_geoparquet(res.select("id", "nodes"), out)
    back = G.read_geoparquet(spark, out)
    assert set(back.columns) == {"id", "nodes"}
    orig = {
        r.id: [(n.lon, n.lat) for n in r.nodes]
        for r in res.select("id", "nodes").collect()
    }
    got = {r.id: [(n.lon, n.lat) for n in r.nodes] for r in back.collect()}
    assert got == orig


def test_write_refuses_nonempty_dir_and_overwrites(spark, dataset, tmp_path):
    import os

    import pytest as _pytest

    out = str(tmp_path / "twice")
    res = run_query("bbox(9.90, 53.50, 10.10, 53.70).nodes{ amenity=* }", dataset)
    df = res.select("id", "lon", "lat")
    G.write_geoparquet(df, out)
    files1 = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    with _pytest.raises(FileExistsError):
        G.write_geoparquet(df, out)
    G.write_geoparquet(df, out, mode="overwrite")
    files2 = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    # deterministic partition-derived names: same file set, no duplicates
    assert files1 == files2
    assert all(f.startswith("part-") for f in files2)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    n = G.read_geoparquet(spark, out).count()
    assert n == df.count()


def test_read_geoparquet_null_geometry(spark, dataset, tmp_path):
    """Null geometry values are legal GeoParquet — the decoders must map
    them to null lon/lat (points) or null nodes (lines), not crash inside
    the pandas UDF (ADVICE r3 #4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for kind, query, col in [
        ("pts", "bbox(9.90, 53.50, 10.10, 53.70).nodes{ amenity=* }", "lon"),
        ("lines", "bbox(9.90, 53.50, 10.10, 53.70).ways{ highway=* }", "nodes"),
    ]:
        out = str(tmp_path / f"null_{kind}")
        res = run_query(query, dataset)
        sel = res.select("id", "lon", "lat") if kind == "pts" else res.select("id", "nodes")
        G.write_geoparquet(sel, out)
        # splice a null-geometry row into the dataset with the same schema
        import glob as _glob
        f0 = sorted(_glob.glob(out + "/*.parquet"))[0]
        t = pq.read_table(f0)
        null_row = pa.table(
            {"id": pa.array([999_999], t.schema.field("id").type),
             "geometry": pa.array([None], t.schema.field("geometry").type)},
            schema=t.schema,
        )
        pq.write_table(null_row, out + "/part-null.parquet")
        back = G.read_geoparquet(spark, out)
        row = [r for r in back.collect() if r.id == 999_999]
        assert len(row) == 1
        assert getattr(row[0], col) is None
