"""OSM XML source (on the reference's own fixture file), tag-index format
round-trip, and the HTTP server endpoint."""

import json
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.query.planner import run_query
from simple_osm_queries_spark.sources import tag_index
from simple_osm_queries_spark.sources.dataset import prepare
from simple_osm_queries_spark.sources.osm_xml import parse_osm_xml, read_osm_pbf, read_osm_xml

REF_FIXTURE = "/root/reference/test-small.osm"


@pytest.fixture(scope="module")
def ref_dataset(spark):
    nodes, ways, rels = read_osm_xml(spark, REF_FIXTURE)
    return prepare(nodes, ways, rels)


def test_parse_reference_fixture():
    nodes, ways, rels = parse_osm_xml(REF_FIXTURE)
    assert len(nodes) == 3 and len(ways) == 0 and len(rels) == 0
    by_id = {r.id: r for r in nodes.itertuples()}
    # the three nodes documented in FIXTURES.md §4
    assert by_id[1].tags == {"height": "10.5", "natural": "tree"}
    assert by_id[2].tags == {"amenity": "bench", "backrest": "no", "name": "Testbank"}
    assert by_id[3].tags == {"amenity": "bench", "backrest": "yes", "material": "wood"}
    assert by_id[1].lon == pytest.approx(9.9330, abs=1e-3)


def test_query_reference_fixture_end_to_end(ref_dataset):
    def ids(q):
        return sorted(r.id for r in run_query(q, ref_dataset).collect())

    assert ids("bbox(9.9, 53.5, 10.0, 53.6).nodes{ amenity=bench }") == [2, 3]
    assert ids("bbox(9.9, 53.5, 10.0, 53.6).nodes{ height>=10.5 }") == [1]
    assert ids("bbox(9.9, 53.5, 10.0, 53.6).nodes{ backrest=yes OR name=Testbank }") == [2, 3]


def test_pbf_missing_file_raises(spark):
    # the PBF reader is real now (see test_osm_pbf.py); a missing file
    # surfaces as the driver-side open error, not a stub
    with pytest.raises(FileNotFoundError):
        read_osm_pbf(spark, "/nonexistent.osm.pbf")


def test_tag_index_build_and_roundtrip(dataset, tmp_path):
    idx = tag_index.build_tag_index(dataset.nodes, dataset.ways, dataset.relations)
    # natural order per key (the mixed height dictionary)
    assert idx["height"] == ["1", "1m", "1.5 m", "2.5", "10.5"]
    assert idx["seats"] == ["2", "3", "4"]
    assert "highway" in idx and "route" in idx  # ways + relations included
    path = str(tmp_path / "tag-index")
    tag_index.save_tag_index(idx, path)
    assert tag_index.load_tag_index(path) == idx
    # position helpers (tag.go:190-230 semantics)
    assert tag_index.value_index(idx, "height", "2.5") == 3
    assert tag_index.value_index(idx, "height", "nope") is None
    assert tag_index.next_lower_value_index(idx, "height", "2.7") == 3
    assert tag_index.next_lower_value_index(idx, "height", "0") is None


def test_tag_index_escaping(tmp_path):
    # values with every special char round-trip (clean keys)
    idx = {"surface": ["a|b", "line\nbreak", "eq=val", ""]}
    path = str(tmp_path / "tag-index")
    tag_index.save_tag_index(idx, path)
    assert tag_index.load_tag_index(path) == idx
    # byte-level parity with the reference writer (tag.go:301-317): per-value
    # PIPE escape, then NEWLINE/EQUAL on the joined string, key unescaped
    with open(path) as f:
        assert f.read() == "surface=a$$PIPE$$b|line$$NEWLINE$$break|eq$$EQUAL$$val|\n"


def test_tag_index_reference_file_parity(tmp_path):
    # a file as the reference writes it: empty entries kept on load,
    # a key containing '=' truncates at the first '=' (SplitN semantics)
    path = str(tmp_path / "tag-index")
    with open(path, "w") as f:
        f.write("amenity=bench|cafe||\n")
        f.write("odd=key=v1|v2\n")
    loaded = tag_index.load_tag_index(path)
    assert loaded["amenity"] == ["bench", "cafe", "", ""]
    assert loaded["odd"] == ["key=v1", "v2"]
    import pytest as _pytest

    with open(path, "a") as f:
        f.write("noequalsline\n")
    with _pytest.raises(ValueError, match="'=' expected"):
        tag_index.load_tag_index(path)


def test_http_server_query_and_errors(ref_dataset):
    from simple_osm_queries_spark.web import serve

    httpd = serve(ref_dataset, port=18099)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:18099/query",
            data=b"bbox(9.9, 53.5, 10.0, 53.6).nodes{ amenity=bench }",
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            fc = json.loads(resp.read())
        assert resp.status == 200
        assert {f["properties"]["@osm_id"] for f in fc["features"]} == {2, 3}

        bad = urllib.request.Request(
            "http://127.0.0.1:18099/query", data=b"bbox(1,2,3).nodes{a=b}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400
        assert json.loads(e.value.read())["error"] == "parse error"

        with urllib.request.urlopen("http://127.0.0.1:18099/app") as resp:
            app = resp.read()
        # the interactive map UI (reference index.html parity): query editor
        # with {{bbox}} viewport placeholder, canvas map, error label
        assert b"query-input" in app and b"{{bbox}}" in app
        assert b"<canvas" in app and b"error-request-label" in app
    finally:
        httpd.shutdown()


def test_cli_import_and_query(spark, tmp_path, monkeypatch):
    """Drive the CLI functions directly (shared test session instead of a
    fresh one)."""
    from simple_osm_queries_spark import cli

    from types import SimpleNamespace

    idx_dir = str(tmp_path / "idx")
    cli.cmd_import(spark, SimpleNamespace(file=REF_FIXTURE, out=idx_dir))
    assert (tmp_path / "idx" / "tag-index").exists()

    q = SimpleNamespace(
        query="bbox(9.9, 53.5, 10.0, 53.6).nodes{ amenity=bench }",
        data=idx_dir,
        generate=0,
        out=str(tmp_path / "out.geojson"),
    )
    cli.cmd_query(spark, q)
    fc = json.load(open(q.out))
    assert {f["properties"]["@osm_id"] for f in fc["features"]} == {2, 3}


def test_cli_import_pbf(spark, tmp_path):
    """The reference's primary flow: import a real .osm.pbf end-to-end."""
    from types import SimpleNamespace

    from simple_osm_queries_spark import cli
    from simple_osm_queries_spark.sources import osm_pbf
    from simple_osm_queries_spark.sources.osm_xml import parse_osm_xml

    n, w, r = parse_osm_xml(REF_FIXTURE)
    pbf_path = str(tmp_path / "ref.osm.pbf")
    osm_pbf.write_osm_pbf(
        pbf_path,
        nodes=n.itertuples(index=False),
        ways=w.itertuples(index=False),
        relations=r.itertuples(index=False),
    )
    idx_dir = str(tmp_path / "idx_pbf")
    cli.cmd_import(spark, SimpleNamespace(file=pbf_path, out=idx_dir))

    q = SimpleNamespace(
        query="bbox(9.9, 53.5, 10.0, 53.6).nodes{ amenity=bench }",
        data=idx_dir,
        generate=0,
        out=str(tmp_path / "out_pbf.geojson"),
    )
    cli.cmd_query(spark, q)
    fc = json.load(open(q.out))
    assert {f["properties"]["@osm_id"] for f in fc["features"]} == {2, 3}


def test_cli_cells_pipeline(spark, tmp_path):
    """cells subcommand: encode lon/lat -> H3/S2/tile, write partitioned."""
    import numpy as np
    import pandas as pd

    from simple_osm_queries_spark import cli
    from simple_osm_queries_spark.functions import h3 as H
    from simple_osm_queries_spark.functions import h3_encode as E

    src = str(tmp_path / "in.parquet")
    pdf = pd.DataFrame(
        {
            "id": range(50),
            "lon": [9.9 + i * 0.004 for i in range(50)],
            "lat": [53.5 + i * 0.003 for i in range(50)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    out = str(tmp_path / "cells_out")
    cli.cmd_cells(
        spark,
        type("A", (), {"file": src, "out": out, "h3_res": 8, "s2_level": 12, "zoom": 13, "partition_res": 4})(),
    )
    back = spark.read.parquet(out + "/data")
    assert {"h3", "s2", "tile", "h3_part"} <= set(back.columns)
    rows = back.orderBy("id").collect()
    for r in rows[:10]:
        want = E.latlng_to_cell_py(r.lat, r.lon, 8)
        assert int(np.int64(r.h3).astype(np.uint64)) == want
        assert H.parent_py(want, 4) == int(np.int64(r.h3_part).astype(np.uint64))
    import os

    assert [d for d in os.listdir(out + "/data") if d.startswith("h3_part=")]
    # resumable: a second run with the same fingerprint skips every band
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.cmd_cells(
            spark,
            type("A", (), {"file": src, "out": out, "h3_res": 8, "s2_level": 12, "zoom": 13, "partition_res": 4})(),
        )
    assert "resumed" in buf.getvalue()
    import json as _json

    mdir = os.path.join(out, "_manifests")
    manifests = [_json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    assert manifests and all("input_fingerprint" in m for m in manifests)


def test_cells_layout_partition_pruning(spark, tmp_path):
    """The h3_part layout must prune directories for cell predicates —
    the 100-TB read path (reading one region touches one directory set)."""
    import pandas as pd

    from simple_osm_queries_spark import cli

    src = str(tmp_path / "in2.parquet")
    pdf = pd.DataFrame(
        {
            "id": range(200),
            "lon": [9.0 + (i % 20) * 0.5 for i in range(200)],
            "lat": [50.0 + (i // 20) * 0.5 for i in range(200)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    out = str(tmp_path / "cells_pruned")
    cli.cmd_cells(
        spark,
        type("A", (), {"file": src, "out": out, "h3_res": 8, "s2_level": 12, "zoom": 13, "partition_res": 3})(),
    )
    back = spark.read.parquet(out + "/data")
    one_part = back.select("h3_part").first().h3_part
    q = back.filter(F.col("h3_part") == one_part)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "h3_part" in plan.split("PartitionFilters")[1][:120]
    assert q.count() > 0


def test_http_server_h3_cells_endpoint(ref_dataset):
    from simple_osm_queries_spark.web import serve

    httpd = serve(ref_dataset, port=18101)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            "http://127.0.0.1:18101/cells?bbox=9.9,53.5,10.0,53.6&res=7"
        ) as resp:
            fc = json.loads(resp.read())
        assert resp.status == 200 and fc["type"] == "FeatureCollection"
        total = sum(f["properties"]["count"] for f in fc["features"])
        assert total == 3  # the reference fixture's 3 nodes in the window
        for f in fc["features"]:
            assert f["geometry"]["type"] == "Polygon"
            assert len(f["properties"]["h3"]) == 15  # hex token

        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen("http://127.0.0.1:18101/cells?bbox=oops")
        assert e.value.code == 400
    finally:
        httpd.shutdown()


def test_bbox_scan_on_cells_layout_prunes_and_matches(spark, tmp_path):
    """bbox over the cells-CLI layout: three-tier pruning (PartitionFilters
    on h3_part + fine-cell isin + residual), result equals the naive scan."""
    import pandas as pd

    from simple_osm_queries_spark import cli
    from simple_osm_queries_spark.operators.spatial_join import (
        bbox_scan_h3_partitioned,
    )

    src = str(tmp_path / "in3.parquet")
    pdf = pd.DataFrame(
        {
            "id": range(400),
            "lon": [9.0 + (i % 20) * 0.1 for i in range(400)],
            "lat": [50.0 + (i // 20) * 0.1 for i in range(400)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    out = str(tmp_path / "cells3")
    cli.cmd_cells(
        spark,
        type("A", (), {"file": src, "out": out, "h3_res": 8, "s2_level": 12, "zoom": 13, "partition_res": 3})(),
    )
    table = spark.read.parquet(out + "/data")
    bbox = (9.4, 50.4, 9.9, 50.9)
    q = bbox_scan_h3_partitioned(table, *bbox, res=8, partition_res=3)
    got = sorted(r.id for r in q.collect())
    want = sorted(
        r.id
        for r in table.filter(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        ).collect()
    )
    assert got == want and got
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "h3_part" in plan.split("PartitionFilters")[1][:200]


def test_bbox_scan_hemisphere_bounded_plan(spark, tmp_path):
    """VERDICT r3 #3 regression: a hemisphere-sized bbox must compile to a
    bounded number of range predicates (not millions of isin literals) and
    return exactly the rows of the naive lon/lat scan."""
    import pandas as pd

    from simple_osm_queries_spark import cli
    from simple_osm_queries_spark.operators.spatial_join import (
        bbox_scan_h3_partitioned,
        h3_cover_bbox_compact,
    )

    src = str(tmp_path / "in_hemi.parquet")
    pdf = pd.DataFrame(
        {
            "id": range(500),
            "lon": [-170.0 + (i % 25) * 14.0 for i in range(500)],
            "lat": [-80.0 + (i // 25) * 8.0 for i in range(500)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    out = str(tmp_path / "cells_hemi")
    cli.cmd_cells(
        spark,
        type("A", (), {"file": src, "out": out, "h3_res": 8, "s2_level": 12, "zoom": 13, "partition_res": 3})(),
    )
    table = spark.read.parquet(out + "/data")
    bbox = (-180.0, -90.0, 0.0, 90.0)  # western hemisphere
    q = bbox_scan_h3_partitioned(table, *bbox, res=8, partition_res=3)
    got = sorted(r.id for r in q.collect())
    want = sorted(
        r.id
        for r in table.filter(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        ).collect()
    )
    assert got == want and got
    # bounded plan: the compiled predicate tree stays small
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 200_000, f"plan blew up to {len(plan)} chars"
    cells, eff = h3_cover_bbox_compact(*bbox, res=8)
    assert len(cells) <= 4096
    assert eff < 8  # the sampler auto-coarsened instead of raising


def test_http_server_caps(ref_dataset):
    """VERDICT r3 #5 / ADVICE r3 #3: POST /query truncates at max_rows with
    a truncated flag (toLocalIterator fetch, no unbounded collect); GET
    /cells rejects bboxes whose estimated cell count exceeds the cap."""
    from simple_osm_queries_spark.web import serve

    httpd = serve(ref_dataset, port=18102, max_rows=1, max_cells=50_000)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:18102/query",
            data=b"bbox(9.9, 53.5, 10.0, 53.6).nodes{ amenity=bench }",
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            fc = json.loads(resp.read())
        assert len(fc["features"]) == 1
        assert fc["truncated"] is True

        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                "http://127.0.0.1:18102/cells?bbox=-180,-90,180,90&res=12"
            )
        assert e.value.code == 413
        assert json.loads(e.value.read())["error"] == "too many cells"
    finally:
        httpd.shutdown()


def test_merge_tag_index(spark):
    from simple_osm_queries_spark.sources import tag_index

    a_df = spark.createDataFrame(
        [({"amenity": "cafe", "seats": "10"},), ({"amenity": "bench"},)], "tags map<string,string>"
    )
    b_df = spark.createDataFrame(
        [({"amenity": "cafe"},), ({"amenity": "a2"},), ({"height": "3"},)], "tags map<string,string>"
    )
    a = tag_index.build_tag_index(a_df)
    b = tag_index.build_tag_index(b_df)
    merged = tag_index.merge_tag_index(a, b)
    # equals building over the union of the tables (natural order incl.)
    full = tag_index.build_tag_index(a_df, b_df)
    assert merged == full
    assert merged["amenity"] == ["a2", "bench", "cafe"]  # natural order


def test_http_tile_endpoint(ref_dataset):
    """GET /tiles/{z}/{x}/{y}.png serves a decodable 256px heatmap raster
    for a populated tile, a blank raster for an empty one, and 400/404 for
    malformed requests (r5b raster endpoint)."""
    from simple_osm_queries_spark.functions import cells as C
    from simple_osm_queries_spark.sources import codecs
    from simple_osm_queries_spark.web import serve

    httpd = serve(ref_dataset, port=18098)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # a tile that holds fixture nodes (window ~9.9-10.1 lon, 53.5-53.7)
        tx, ty = C.tile_xy_py(9.95, 53.55, 12)
        with urllib.request.urlopen(
            f"http://127.0.0.1:18098/tiles/12/{tx}/{ty}.png"
        ) as resp:
            png = resp.read()
        assert resp.headers["Content-Type"] == "image/png"
        img = codecs.decode_png(png)
        assert img.shape == (256, 256, 3)
        assert img.max() > 0  # populated tile renders something
        # empty tile -> blank
        with urllib.request.urlopen(
            "http://127.0.0.1:18098/tiles/12/0/0.png"
        ) as resp:
            blank = codecs.decode_png(resp.read())
        assert blank.max() == 0
        # out-of-range / malformed
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen("http://127.0.0.1:18098/tiles/12/999999/0.png")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen("http://127.0.0.1:18098/tiles/12/0/abc.png")
        assert e.value.code == 404
    finally:
        httpd.shutdown()


def test_http_mvt_tile_endpoint(ref_dataset):
    """GET /tiles/{z}/{x}/{y}.mvt serves a decodable Mapbox Vector Tile
    carrying the tile's nodes with their tags as attributes, and an empty
    (but valid) tile for an unpopulated slot."""
    from simple_osm_queries_spark.functions import cells as C
    from simple_osm_queries_spark.sources import mvt
    from simple_osm_queries_spark.web import serve

    httpd = serve(ref_dataset, port=18097)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        tx, ty = C.tile_xy_py(9.95, 53.55, 12)
        with urllib.request.urlopen(
            f"http://127.0.0.1:18097/tiles/12/{tx}/{ty}.mvt"
        ) as resp:
            blob = resp.read()
        assert resp.headers["Content-Type"] == "application/vnd.mapbox-vector-tile"
        layers = mvt.decode_tile(blob)
        feats = layers["nodes"]["features"]
        assert len(feats) == 3  # all three fixture nodes share this tile
        by_id = {f["id"]: f for f in feats}
        assert by_id[2]["attrs"]["amenity"] == "bench"
        assert all(f["type"] == mvt.POINT for f in feats)
        # every position inside [0, extent)
        for f in feats:
            (x_, y_), = f["parts"][0]
            assert 0 <= x_ < 4096 and 0 <= y_ < 4096
        # empty tile: still a valid MVT with an empty layer
        with urllib.request.urlopen(
            "http://127.0.0.1:18097/tiles/12/0/0.mvt"
        ) as resp:
            empty = mvt.decode_tile(resp.read())
        assert empty["nodes"]["features"] == []
    finally:
        httpd.shutdown()


def test_http_tile_endpoint_clamped_edges(spark, tmp_path):
    """Round-5 review fixes: (1) a node poleward of the Mercator cutoff
    (lat 86) is CLAMPED into the top tile row by the engine's projection
    (functions/cells.py tile_fxy) — the endpoint's membership filter must
    agree, not drop it with a driver-math bbox; (2) tile URLs with a
    query string (slippy-map cache busting) still resolve."""
    from simple_osm_queries_spark.functions import cells as C
    from simple_osm_queries_spark.sources import codecs
    from simple_osm_queries_spark.web import serve

    xml = tmp_path / "polar.osm"
    xml.write_text(
        '<osm version="0.6">\n'
        '<node id="1" lat="86.0" lon="9.95"/>\n'
        '<node id="2" lat="53.55" lon="180.0"/>\n'
        "</osm>\n"
    )
    ds = prepare(*read_osm_xml(spark, str(xml)))
    httpd = serve(ds, port=18099)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        z = 3
        # node 1: lat 86 clamps to the y=0 row
        tx, _ = C.tile_xy_py(9.95, 80.0, z)
        with urllib.request.urlopen(
            f"http://127.0.0.1:18099/tiles/{z}/{tx}/0.png"
        ) as resp:
            img = codecs.decode_png(resp.read())
        assert img.max() > 0
        # node 2: lon 180 clamps into the last tile column
        n = 1 << z
        ty = C.tile_xy_py(0.0, 53.55, z)[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:18099/tiles/{z}/{n - 1}/{ty}.png"
        ) as resp:
            img = codecs.decode_png(resp.read())
        assert img.max() > 0
        # query string must not 404
        with urllib.request.urlopen(
            f"http://127.0.0.1:18099/tiles/{z}/{tx}/0.png?v=2&key=abc"
        ) as resp:
            assert resp.status == 200
    finally:
        httpd.shutdown()
