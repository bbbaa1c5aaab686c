"""Cell-bucketed buffer fallback: result parity with the broadcast path and
an explain guard proving the bucketed plan contains no BroadcastNestedLoopJoin
(the plan we refuse to ship above the broadcast threshold)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators import buffer as B
from simple_osm_queries_spark.sources.dataset import from_generator


@pytest.fixture(scope="module")
def ds(spark):
    d = from_generator(spark, n_nodes=1200, n_ways=240, n_relations=0)
    d.nodes.cache().count()
    d.ways.cache().count()
    return d


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_way_way_bucketed_matches_broadcast(ds):
    outer = ds.ways.filter(F.element_at("tags", "building") == "yes")
    inner = ds.ways.filter(F.element_at("tags", "highway").isNotNull())
    for d in (5.0, 300.0, 2000.0):
        bc = B.within_buffer_way_way(outer, inner, d, strategy="broadcast")
        bk = B.within_buffer_way_way(outer, inner, d, strategy="bucketed")
        assert _ids(bc) == _ids(bk), f"buffer {d}m"
    # at least one distance must produce hits or the parity is vacuous
    assert len(_ids(B.within_buffer_way_way(outer, inner, 2000.0, strategy="bucketed"))) > 0


def test_node_way_bucketed_matches_broadcast(ds):
    nodes = ds.nodes.filter(F.element_at("tags", "amenity").isNotNull())
    ways = ds.ways.filter(F.element_at("tags", "highway").isNotNull())
    for out in ("node", "way"):
        for d in (50.0, 1000.0):
            bc = B.within_buffer_node_way(nodes, ways, d, output=out, strategy="broadcast")
            bk = B.within_buffer_node_way(nodes, ways, d, output=out, strategy="bucketed")
            assert _ids(bc) == _ids(bk), f"{out} {d}m"
    assert len(_ids(B.within_buffer_node_way(nodes, ways, 1000.0, strategy="bucketed"))) > 0


def test_bucketed_plan_has_no_bnlj(ds):
    outer = ds.ways.filter(F.element_at("tags", "building") == "yes")
    inner = ds.ways.filter(F.element_at("tags", "highway").isNotNull())
    bk = B.within_buffer_way_way(outer, inner, 300.0, strategy="bucketed")
    plan = bk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # the broadcast path IS a BNLJ (the point of the threshold)
    bc = B.within_buffer_way_way(outer, inner, 300.0, strategy="broadcast")
    plan_bc = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan_bc

    nk = B.within_buffer_node_way(ds.nodes, inner, 300.0, strategy="bucketed")
    plan_n = nk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_n


def test_auto_threshold_switches(ds):
    outer = ds.ways.limit(50)
    inner = ds.ways.limit(200)
    # tiny threshold forces the bucketed path; results still correct
    bk = B.within_buffer_way_way(outer, inner, 300.0, strategy="auto", broadcast_threshold=10)
    bc = B.within_buffer_way_way(outer, inner, 300.0, strategy="broadcast")
    assert _ids(bk) == _ids(bc)
