"""Distributed GeoJSON-lines sink (one Feature per line, executor-side)."""

import json
import os

from simple_osm_queries_spark.query.planner import run_query
from simple_osm_queries_spark.sources.geojson import to_geojson, write_geojson_lines


def test_geojson_lines_matches_driver_sink(dataset, tmp_path):
    q = "bbox(9.90, 53.50, 10.10, 53.70).ways{ highway=* }"
    result = run_query(q, dataset)
    out = str(tmp_path / "lines")
    write_geojson_lines(result, out)

    features = []
    for fname in os.listdir(out):
        if not fname.startswith("part-"):
            continue
        with open(os.path.join(out, fname)) as f:
            for line in f:
                features.append(json.loads(line))
    expected = to_geojson(result)["features"]

    def key(f):
        return (f["properties"]["@osm_type"], str(f["properties"]["@osm_id"]))

    by_id = {key(f): f for f in features}
    assert len(features) == len(expected)
    for ef in expected:
        gf = by_id[(ef["properties"]["@osm_type"], str(ef["properties"]["@osm_id"]))]
        assert gf["geometry"]["type"] == ef["geometry"]["type"]
        assert gf["geometry"]["coordinates"] == ef["geometry"]["coordinates"]
        # properties: same tags (ids are stringified in the distributed sink)
        for k, v in ef["properties"].items():
            assert str(gf["properties"][k]) == str(v)
