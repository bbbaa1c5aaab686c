"""Distributed DBSCAN vs an independent brute-python oracle implementing
the same deterministic variant (directed query-point-scaled metric,
min-id cluster labels, min-cluster border assignment), plus parameter
edge cases and the no-BNLJ plan guard."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.caching import unpersist_intermediates
from simple_osm_queries_spark.operators.clustering import dbscan, eps_neighbor_pairs

M_PER_DEG = 111320.0


def _brute_dbscan(rows, eps_m, min_pts):
    """rows: [(id, lon, lat)]. Returns {id: (cluster|None, role)}."""
    ids = [r[0] for r in rows]
    pos = {r[0]: (r[1], r[2]) for r in rows}

    def neigh(a):
        lon, lat = pos[a]
        kx = M_PER_DEG * math.cos(math.radians(lat))
        out = []
        for b in ids:
            if b == a:
                continue
            dx = (lon - pos[b][0]) * kx
            dy = (lat - pos[b][1]) * M_PER_DEG
            if dx * dx + dy * dy <= eps_m * eps_m:
                out.append(b)
        return out

    nbrs = {a: neigh(a) for a in ids}
    cores = {a for a in ids if len(nbrs[a]) + 1 >= min_pts}
    # components over core-core edges (undirected union of directed edges)
    parent = {a: a for a in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in cores:
        for b in nbrs[a]:
            if b in cores:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {a: find(a) for a in cores}
    # min-id labels
    label = {}
    for a, c in comp.items():
        label.setdefault(c, []).append(a)
    cluster = {a: min(label[find(a)]) for a in cores}
    out = {}
    for a in ids:
        if a in cores:
            out[a] = (cluster[a], "core")
        else:
            cands = [cluster[b] for b in nbrs[a] if b in cores]
            out[a] = (min(cands), "border") if cands else (None, "noise")
    return out


@pytest.fixture(scope="module")
def pts(dataset):
    p = dataset.nodes.select("id", "lon", "lat").cache()
    p.count()
    return p


@pytest.mark.parametrize("eps_m,min_pts", [(800.0, 4), (400.0, 3), (1500.0, 8)])
def test_dbscan_matches_brute_oracle(spark, pts, eps_m, min_pts):
    rows = [(r.id, r.lon, r.lat) for r in pts.collect()]
    want = _brute_dbscan(rows, eps_m, min_pts)
    res = dbscan(pts, eps_m, min_pts)
    got = {r.id: (r.cluster, r.role) for r in res.collect()}
    unpersist_intermediates(res)
    assert set(got) == set(want)
    roles = {}
    for i, (c, role) in want.items():
        roles[role] = roles.get(role, 0) + 1
        assert got[i] == (c, role), (i, got[i], (c, role))
    # the fixture must exercise all three roles at the main setting
    if eps_m == 800.0:
        assert set(roles) == {"core", "border", "noise"}, roles


def test_dbscan_edges(spark, pts):
    # min_pts=1: every point is a core (singletons allowed)
    res = dbscan(pts, 200.0, 1)
    roles = {r.role for r in res.collect()}
    unpersist_intermediates(res)
    assert roles == {"core"}
    # microscopic eps: everything is noise
    res2 = dbscan(pts, 0.001, 3)
    roles2 = {r.role for r in res2.collect()}
    unpersist_intermediates(res2)
    assert roles2 == {"noise"}
    with pytest.raises(ValueError):
        dbscan(pts, 0.0, 3)
    with pytest.raises(ValueError):
        dbscan(pts, 10.0, 0)


def test_pair_join_no_bnlj(pts):
    pairs = eps_neighbor_pairs(pts, 500.0)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
