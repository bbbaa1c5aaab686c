"""Relation nesting beyond depth 1: bbox fixpoint fold and parent/child
semi-joins on a hand-built 3-level hierarchy."""

import pandas as pd
import pytest

from simple_osm_queries_spark.query.planner import run_query
from simple_osm_queries_spark.sources.dataset import prepare


@pytest.fixture(scope="module")
def deep_ds(spark):
    # nodes 1..4 spread across distinct cells
    nodes = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "lon": [9.91, 9.99, 10.05, 10.09],
            "lat": [53.51, 53.55, 53.62, 53.69],
            "tags": [{"kind": "a"}, {"kind": "b"}, {"kind": "c"}, {"kind": "d"}],
        }
    )
    ways = pd.DataFrame({"id": [100], "node_ids": [[1, 2]], "tags": [{"w": "x"}]})
    # leaf 200 (node 3), mid 201 (leaf + way), root 202 (mid + node 4)
    rels = pd.DataFrame(
        {
            "id": [200, 201, 202],
            "node_member_ids": [[3], [], [4]],
            "way_member_ids": [[], [100], []],
            "child_relation_ids": [[], [200], [201]],
            "tags": [{"level": "leaf"}, {"level": "mid"}, {"level": "root"}],
        }
    )
    return prepare(
        spark.createDataFrame(nodes, "id long, lon double, lat double, tags map<string,string>"),
        spark.createDataFrame(ways, "id long, node_ids array<long>, tags map<string,string>"),
        spark.createDataFrame(
            rels,
            "id long, node_member_ids array<long>, way_member_ids array<long>, "
            "child_relation_ids array<long>, tags map<string,string>",
        ),
    )


def test_bbox_folds_through_three_levels(deep_ds):
    boxes = {r.id: (r.min_lon, r.min_lat, r.max_lon, r.max_lat) for r in deep_ds.relations.collect()}
    assert boxes[200] == (10.05, 53.62, 10.05, 53.62)  # just node 3
    # mid: leaf bbox + way(1,2) bbox
    assert boxes[201] == (9.91, 53.51, 10.05, 53.62)
    # root: mid bbox + node 4
    assert boxes[202] == (9.91, 53.51, 10.09, 53.69)


def test_child_and_parent_queries_through_levels(deep_ds):
    w = "bbox(9.90, 53.50, 10.10, 53.70)"

    def ids(q):
        return sorted(r.id for r in run_query(q, deep_ds).collect())

    # direct children only (not transitive)
    assert ids(f"{w}.relations{{ this.child_relations{{ level=leaf }} }}") == [201]
    assert ids(f"{w}.relations{{ this.child_relations{{ level=mid }} }}") == [202]
    # parents (direct)
    assert ids(f"{w}.relations{{ this.relations{{ level=root }} }}") == [201]
    # nested two levels: relations whose child has a child that is the leaf
    assert ids(
        f"{w}.relations{{ this.child_relations{{ this.child_relations{{ level=leaf }} }} }}"
    ) == [202]
    # relation bbox intersection prunes: a box covering only node 4 still
    # matches root (bbox approximation, grid_reader.go:513-517 semantics)
    assert ids("bbox(10.08, 53.68, 10.10, 53.70).relations{ level=* }") == [202]
