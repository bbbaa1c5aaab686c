"""nearest_way_join: ranked point->way distances vs an independent numpy
oracle, broadcast/bucketed parity, radius/k semantics, and the no-BNLJ
explain guard on the bucketed (scale) path."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators.nearest_way import nearest_way_join

M_PER_DEG = 111320.0


def _pt_polyline_d_m(lon, lat, way_pts):
    """Independent numpy oracle: min meter distance from (lon, lat) to the
    polyline, equirect scaled at the query point's latitude."""
    kx = M_PER_DEG * math.cos(math.radians(lat))
    px = np.array([(p[0] - lon) * kx for p in way_pts])
    py = np.array([(p[1] - lat) * M_PER_DEG for p in way_pts])
    if len(px) == 1:
        return math.hypot(px[0], py[0])
    ax, ay, bx, by = px[:-1], py[:-1], px[1:], py[1:]
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(len2 > 0, -(ax * dx + ay * dy) / np.where(len2 > 0, len2, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return float(np.sqrt(np.min(cx * cx + cy * cy)))


def _pt_polyline_snap(lon, lat, way_pts):
    """(min dist m, snap_lon, snap_lat) — independent snap oracle."""
    kx = M_PER_DEG * math.cos(math.radians(lat))
    segs = list(zip(way_pts[:-1], way_pts[1:])) or [(way_pts[0], way_pts[0])]
    best = None
    for (al, ap), (bl, bp) in segs:
        ax, ay = (al - lon) * kx, (ap - lat) * M_PER_DEG
        bx, by = (bl - lon) * kx, (bp - lat) * M_PER_DEG
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = min(max(-(ax * dx + ay * dy) / len2, 0.0), 1.0) if len2 > 0 else 0.0
        cx, cy = ax + t * dx, ay + t * dy
        cand = (cx * cx + cy * cy, al + t * (bl - al), ap + t * (bp - ap))
        if best is None or cand < best:
            best = cand
    return math.sqrt(best[0]), best[1], best[2]


@pytest.fixture(scope="module")
def frames(dataset):
    pts = dataset.nodes.select("id", "lon", "lat")
    ways = dataset.ways.select(
        "id", "nodes", "min_lon", "min_lat", "max_lon", "max_lat"
    )
    pts.cache().count()
    ways.cache().count()
    return pts, ways


@pytest.fixture(scope="module")
def oracle(frames):
    pts, ways = frames
    pt_rows = [(r.id, r.lon, r.lat) for r in pts.collect()]
    way_rows = [
        (r.id, [(n.lon, n.lat) for n in r.nodes]) for r in ways.collect()
    ]

    def run(radius_m, k):
        out = {}
        for pid, lon, lat in pt_rows:
            cand = []
            for wid, wpts in way_rows:
                if not wpts:
                    continue
                d = _pt_polyline_d_m(lon, lat, wpts)
                if d <= radius_m:
                    cand.append((d, wid))
            cand.sort(key=lambda c: (c[0] * c[0], c[1]))
            if cand:
                out[pid] = cand[:k]
        return out

    return run


def _by_point(df):
    rows = df.collect()
    out = {}
    for r in sorted(rows, key=lambda r: (r.id, r.rank)):
        out.setdefault(r.id, []).append((r.dist_m, r.way_id, r.rank))
    return out


@pytest.mark.parametrize("k", [1, 3])
def test_matches_numpy_oracle(frames, oracle, k):
    pts, ways = frames
    got = _by_point(nearest_way_join(pts, ways, 2000.0, k=k, strategy="broadcast"))
    want = oracle(2000.0, k)
    assert set(got) == set(want)
    for pid, exp in want.items():
        g = got[pid]
        assert [w for _, w, _ in g] == [w for _, w in exp], f"point {pid}"
        assert [r for _, _, r in g] == list(range(1, len(exp) + 1))
        for (gd, _, _), (ed, _) in zip(g, exp):
            assert abs(gd - ed) < 1e-6, f"point {pid}: {gd} vs {ed}"


def test_snap_matches_numpy_oracle(frames):
    pts, ways = frames
    pt_rows = {r.id: (r.lon, r.lat) for r in pts.collect()}
    way_pts = {
        r.id: [(n.lon, n.lat) for n in r.nodes] for r in ways.collect() if r.nodes
    }
    res = nearest_way_join(pts, ways, 1500.0, k=1, strategy="broadcast", snap=True)
    rows = res.collect()
    assert rows
    for r in rows:
        lon, lat = pt_rows[r.id]
        d, sl, sp = _pt_polyline_snap(lon, lat, way_pts[r.way_id])
        assert abs(r.dist_m - d) < 1e-6
        assert abs(r.snap_lon - sl) < 1e-9 and abs(r.snap_lat - sp) < 1e-9
    # strategy parity holds for snap columns too
    bk = {
        (r.id, r.way_id): (r.snap_lon, r.snap_lat)
        for r in nearest_way_join(
            pts, ways, 1500.0, k=1, strategy="bucketed", snap=True
        ).collect()
    }
    for r in rows:
        sl, sp = bk[(r.id, r.way_id)]
        assert abs(r.snap_lon - sl) < 1e-12 and abs(r.snap_lat - sp) < 1e-12


def test_strategy_parity(frames):
    pts, ways = frames
    for k in (1, 2):
        bc = nearest_way_join(pts, ways, 1500.0, k=k, strategy="broadcast")
        bk = nearest_way_join(pts, ways, 1500.0, k=k, strategy="bucketed")
        key = lambda r: (r.id, r.rank)
        rows_bc = sorted(bc.collect(), key=key)
        rows_bk = sorted(bk.collect(), key=key)
        assert [(r.id, r.way_id, r.rank) for r in rows_bc] == [
            (r.id, r.way_id, r.rank) for r in rows_bk
        ]
        for a, b in zip(rows_bc, rows_bk):
            assert abs(a.dist_m - b.dist_m) < 1e-9


def test_radius_and_rank_semantics(frames):
    pts, ways = frames
    res = nearest_way_join(pts, ways, 800.0, k=3).cache()
    assert res.filter(F.col("dist_m") > 800.0).count() == 0
    per = res.groupBy("id").agg(
        F.count("*").alias("n"),
        F.max("rank").alias("mx"),
        F.min("rank").alias("mn"),
        F.countDistinct("way_id").alias("dw"),
    )
    bad = per.filter(
        (F.col("n") > 3)
        | (F.col("mx") != F.col("n"))
        | (F.col("mn") != 1)
        | (F.col("dw") != F.col("n"))
    )
    assert bad.count() == 0
    # shrinking the radius can only shrink the result
    small = nearest_way_join(pts, ways, 100.0, k=3)
    assert small.count() <= res.count()
    res.unpersist()


def test_validation(frames):
    pts, ways = frames
    with pytest.raises(ValueError):
        nearest_way_join(pts, ways, 0.0)
    with pytest.raises(ValueError):
        nearest_way_join(pts, ways, 100.0, k=0)


def test_http_nearest_endpoint(dataset, frames, oracle):
    import json
    import threading
    import urllib.error
    import urllib.request

    from simple_osm_queries_spark.web import serve

    httpd = serve(dataset, port=18103)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        pts, _ = frames
        p = pts.orderBy("id").first()
        url = (
            f"http://127.0.0.1:18103/nearest?lon={p.lon}&lat={p.lat}"
            f"&k=2&radius=2000"
        )
        with urllib.request.urlopen(url) as resp:
            body = json.loads(resp.read())
        assert resp.status == 200
        want = oracle(2000.0, 2).get(p.id, [])
        got = body["results"]
        assert [r["way_id"] for r in got] == [w for _, w in want]
        assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
        for g, (d, _) in zip(got, want):
            assert abs(g["dist_m"] - d) < 1e-6
            # snap point: re-deriving the equirect distance to the snap
            # reproduces dist_m
            kx = M_PER_DEG * math.cos(math.radians(p.lat))
            dx = (g["snap_lon"] - p.lon) * kx
            dy = (g["snap_lat"] - p.lat) * M_PER_DEG
            assert abs(math.hypot(dx, dy) - g["dist_m"]) < 1e-6
        # validation envelope
        for bad in ("/nearest?lon=999&lat=0", "/nearest?lon=1", "/nearest?lon=1&lat=1&k=0"):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:18103{bad}")
                raise AssertionError(f"{bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert json.loads(e.read())["error"] == "bad request"
    finally:
        httpd.shutdown()


def test_bucketed_plan_no_bnlj(frames):
    pts, ways = frames
    bk = nearest_way_join(pts, ways, 500.0, k=1, strategy="bucketed")
    plan = bk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # k=1 top-k must be an aggregate, not a sort
    assert "min(" in plan or "HashAggregate" in plan
