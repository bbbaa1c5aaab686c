"""North-rule spatial operators vs independent Python/numpy oracles."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C
from simple_osm_queries_spark.operators import knn, spatial_join, tiles

# fixture geometry per FIXTURES.md §5 --------------------------------------------

BBOXES = [
    (0, 9.95, 53.55, 10.05, 53.65),           # middle
    (1, 9.90, 53.50, 10.10, 53.70),           # whole window
    (2, 9.95, 53.55, 9.96, 53.56),            # hot cell
    (3, 10.0, 53.6, 10.0, 53.6),              # degenerate (min==max)
    (4, 11.0, 54.0, 12.0, 55.0),              # empty
    (5, 9.93, 53.52, 10.02, 53.61),
]

PENTAGON = [  # convex 5-gon around the window center
    (9.98, 53.55), (10.06, 53.58), (10.03, 53.66), (9.95, 53.66), (9.92, 53.58),
]
STAR = [  # concave star (self-intersection-free, non-convex)
    (10.00, 53.52), (10.01, 53.58), (10.07, 53.58), (10.02, 53.61),
    (10.04, 53.67), (10.00, 53.62), (9.96, 53.67), (9.98, 53.61),
    (9.93, 53.58), (9.99, 53.58),
]
CROSSING = [  # crosses the 10.0 cell boundary
    (9.99, 53.54), (10.02, 53.54), (10.02, 53.57), (9.99, 53.57),
]


def _pip_oracle(x, y, ring):
    inside = False
    n = len(ring)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if (ay > y) != (by > y) and x < (bx - ax) * (y - ay) / (by - ay) + ax:
            inside = not inside
    return inside


@pytest.fixture(scope="module")
def points(dataset):
    return dataset.nodes.select("id", "lon", "lat", "cell", "cell_x", "cell_y").cache()


@pytest.fixture(scope="module")
def points_pd(points):
    return points.toPandas().sort_values("id").reset_index(drop=True)


def test_bbox_join_matches_oracle(spark, points, points_pd):
    boxes = spark.createDataFrame(
        pd.DataFrame(BBOXES, columns=["qid", "min_lon", "min_lat", "max_lon", "max_lat"])
    )
    got = {
        (r.qid, r.id)
        for r in spatial_join.bbox_join(points, boxes).select("qid", "id").collect()
    }
    expected = set()
    for qid, mnx, mny, mxx, mxy in BBOXES:
        sel = points_pd[
            (points_pd.lon >= mnx) & (points_pd.lon <= mxx)
            & (points_pd.lat >= mny) & (points_pd.lat <= mxy)
        ]
        expected |= {(qid, i) for i in sel.id}
    assert got == expected
    assert any(q == 2 for q, _ in got)  # hot cell exercised
    assert not any(q == 4 for q, _ in got)  # empty box empty


@pytest.mark.parametrize("ring", [PENTAGON, STAR, CROSSING], ids=["pentagon", "star", "crossing"])
def test_point_in_polygon_matches_oracle(spark, points, points_pd, ring):
    polys = spark.createDataFrame(
        [(0, [{"lon": x, "lat": y} for x, y in ring])],
        "qid long, ring array<struct<lon:double,lat:double>>",
    )
    got = {
        r.id for r in spatial_join.point_in_polygon_join(points, polys).select("id").collect()
    }
    expected = {
        int(r.id) for r in points_pd.itertuples() if _pip_oracle(r.lon, r.lat, ring)
    }
    assert expected, "fixture polygon contains no points"
    assert got == expected


def test_point_in_polygon_literal_paths_match_oracle(points, points_pd):
    """Both literal-join strategies (unrolled codegen for small catalogs,
    numpy bitmask for larger ones) must agree with the Python oracle."""
    catalog = [(0, PENTAGON), (1, STAR), (2, CROSSING)]
    expected = {
        (qid, int(r.id))
        for qid, ring in catalog
        for r in points_pd.itertuples()
        if _pip_oracle(r.lon, r.lat, ring)
    }
    # numpy path (3 polygons > 2)
    got_np = {
        (r.qid, r.id)
        for r in spatial_join.point_in_polygon_literal_join(points, catalog)
        .select("qid", "id")
        .collect()
    }
    assert got_np == expected
    # unrolled codegen path (per polygon)
    got_jvm = set()
    for qid, ring in catalog:
        got_jvm |= {
            (r.qid, r.id)
            for r in spatial_join.point_in_polygon_literal_join(points, [(qid, ring)])
            .select("qid", "id")
            .collect()
        }
    assert got_jvm == expected


def _knn_oracle(points_pd, qlon, qlat, k):
    d2 = (points_pd.lon - qlon) ** 2 + (points_pd.lat - qlat) ** 2
    order = sorted(zip(d2, points_pd.id))
    return [(i, d) for d, i in order[:k]]


QUERY_POINTS = [
    (0, 9.951, 53.551, 5),    # hot cell
    (1, 10.05, 53.65, 1),
    (2, 9.901, 53.501, 20),   # window corner
    (3, 10.0, 53.6, 5),
    (4, 10.2, 53.8, 3),       # outside the data window
]


def _queries_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(QUERY_POINTS, columns=["qid", "lon", "lat", "k"])
    )


def test_knn_brute_matches_oracle(spark, points, points_pd):
    res = knn.knn_brute(points, _queries_df(spark))
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.id, r.dist2))
    for qid, qlon, qlat, k in QUERY_POINTS:
        expected = _knn_oracle(points_pd, qlon, qlat, k)
        rows = sorted(got[qid])
        assert len(rows) == k
        assert [i for _, i, _ in rows] == [i for i, _ in expected]
        for (_, _, d2), (_, ed) in zip(rows, expected):
            assert d2 == pytest.approx(ed)


def test_knn_kring_exact_matches_brute(spark, points, points_pd):
    res = knn.knn_kring_exact(points, _queries_df(spark), ring=1)
    got = {}
    for r in res.collect():
        assert r.exact
        got.setdefault(r.qid, []).append((r.rank, r.id))
    for qid, qlon, qlat, k in QUERY_POINTS:
        expected = [i for i, _ in _knn_oracle(points_pd, qlon, qlat, k)]
        assert [i for _, i in sorted(got[qid])] == expected, f"qid={qid}"


def test_knn_kring_salted_same_result(spark, points, points_pd):
    plain = knn.knn_kring(points, _queries_df(spark), ring=2, salt=1)
    salted = knn.knn_kring(points, _queries_df(spark), ring=2, salt=4)
    a = sorted((r.qid, r.rank, r.id) for r in plain.collect())
    b = sorted((r.qid, r.rank, r.id) for r in salted.collect())
    assert a == b


def test_tile_assignment_matches_python(points, points_pd):
    z = 13
    got = {r.id: r.tile_id for r in tiles.assign_tiles(points, z).select("id", "tile_id").collect()}
    for r in points_pd.itertuples():
        tx, ty = C.tile_xy_py(r.lon, r.lat, z)
        assert got[r.id] == C.tile_id_py(tx, ty, z)


def test_tile_join_and_stats(spark, points, points_pd):
    z = 12
    catalog = tiles.make_tile_catalog(spark, z, 9.90, 53.50, 10.10, 53.70)
    joined = tiles.tile_join(points, catalog, z)
    assert joined.count() == len(points_pd)  # catalog covers the window
    stats = {r.tile_id: r.n for r in tiles.tile_stats(points, z).collect()}
    stats_salted = {r.tile_id: r.n for r in tiles.tile_stats(points, z, salt=8).collect()}
    assert stats == stats_salted
    expected = {}
    for r in points_pd.itertuples():
        tx, ty = C.tile_xy_py(r.lon, r.lat, z)
        tid = C.tile_id_py(tx, ty, z)
        expected[tid] = expected.get(tid, 0) + 1
    assert stats == expected


def _knn_oracle_equirect(points_pd, qlon, qlat, k):
    import math as _m

    c = _m.cos(_m.radians(qlat))
    d2 = ((points_pd.lon - qlon) * c) ** 2 + (points_pd.lat - qlat) ** 2
    order = sorted(zip(d2.tolist(), points_pd.id.tolist()), key=lambda t: (t[0], t[1]))
    return [(i, d) for d, i in order[:k]]


def test_knn_h3_exact_matches_oracle(spark, points, points_pd):
    """kNN over real H3 cells (disc-cover candidate generation) equals the
    equirectangular brute oracle for every query, incl. the outside-window
    query that needs disc doubling."""
    res = knn.knn_h3_exact(points, _queries_df(spark), res=8)
    got = {}
    for r in res.collect():
        assert r.exact
        got.setdefault(r.qid, []).append((r.rank, r.id, r.dist2))
    for qid, qlon, qlat, k in QUERY_POINTS:
        expected = _knn_oracle_equirect(points_pd, qlon, qlat, k)
        rows = sorted(got[qid])
        assert [i for _, i, _ in rows] == [i for i, _ in expected], f"qid={qid}"
        for (_, _, d2), (_, ed) in zip(rows, expected):
            assert d2 == pytest.approx(ed)


def test_knn_h3_salted_same_result(spark, points):
    plain = knn.knn_h3(points, _queries_df(spark), res=8, salt=1)
    salted = knn.knn_h3(points, _queries_df(spark), res=8, salt=4)
    a = sorted((r.qid, r.rank, r.id) for r in plain.collect())
    b = sorted((r.qid, r.rank, r.id) for r in salted.collect())
    assert a == b


def test_knn_h3_disc_cover_is_superset(spark):
    """The disc cover must contain every cell holding a point within the
    disc (the exactness guarantee's foundation) — checked directly against
    encoded offsets in all directions."""
    import numpy as np

    from simple_osm_queries_spark.functions import h3_encode as E
    from simple_osm_queries_spark.operators.knn import (
        _h3_disc_cells_col,
        h3_max_circumradius_deg,
    )

    qlon, qlat, res = 9.97, 53.57, 8
    disc = 2.0 * h3_max_circumradius_deg(res)
    df = spark.createDataFrame(pd.DataFrame({"qlon": [qlon], "qlat": [qlat]}))
    cover = set(
        df.select(_h3_disc_cells_col(F.col("qlon"), F.col("qlat"), res, disc).alias("c"))
        .collect()[0]
        .c
    )
    rng = np.random.default_rng(5)
    ang = rng.uniform(0, 2 * np.pi, 4000)
    rad = disc * np.sqrt(rng.uniform(0, 1, 4000))
    import math as _m

    lons = qlon + rad * np.cos(ang) / _m.cos(_m.radians(qlat))
    lats = qlat + rad * np.sin(ang)
    cells = set(E.lnglat_to_cell(lons, lats, res).view(np.int64).tolist())
    assert cells <= cover, f"{len(cells - cover)} cells escaped the cover"


def test_h3_polyfill_is_superset(spark):
    """Every cell containing a polygon point must be in the cover."""
    import numpy as np

    from simple_osm_queries_spark.functions import h3_encode as E
    from simple_osm_queries_spark.operators.spatial_join import h3_polyfill

    ring = PENTAGON
    cover = set(h3_polyfill(ring, 8).tolist())
    # dense interior + boundary samples of the polygon
    rng = np.random.default_rng(9)
    lons = rng.uniform(min(p[0] for p in ring), max(p[0] for p in ring), 20000)
    lats = rng.uniform(min(p[1] for p in ring), max(p[1] for p in ring), 20000)
    inside = np.array([_pip_oracle(x, y, ring) for x, y in zip(lons, lats)])
    cells = set(E.lnglat_to_cell(lons[inside], lats[inside], 8).tolist())
    assert cells <= cover, f"{len(cells - cover)} escaped"


def test_h3_polyfill_wide_latitude_span():
    """ADVICE r3 #1 regression: a ring spanning 0N..85N must not drop
    low-latitude cells (the old sampler scaled every row's lon spacing by
    one worst-case cos and missed 75% of interior cells here)."""
    import numpy as np

    from simple_osm_queries_spark.functions import h3_encode as E
    from simple_osm_queries_spark.operators.spatial_join import h3_polyfill

    rng = np.random.default_rng(7)
    for (lo0, la0, lo1, la1, res) in [
        (10, 0, 20, 85, 2),
        (10, 0, 20, 89, 2),
        (-5, -80, 5, 80, 3),
    ]:
        ring = [(lo0, la0), (lo1, la0), (lo1, la1), (lo0, la1)]
        cover = set(h3_polyfill(ring, res).tolist())
        lons = rng.uniform(lo0, lo1, 20000)
        lats = rng.uniform(la0, la1, 20000)
        cells = set(E.lnglat_to_cell(lons, lats, res).tolist())
        assert cells <= cover, (
            f"bbox=({lo0},{la0},{lo1},{la1}) res={res}: "
            f"{len(cells - cover)}/{len(cells)} cells escaped"
        )


def test_knn_h3_disc_cover_high_latitude(spark):
    """Disc-cover superset at high latitude: rows of the sample grid nearer
    the equator than the query need tighter lon spacing than the query's own
    cos provides (ADVICE r3 #5)."""
    import math as _m

    import numpy as np

    from simple_osm_queries_spark.functions import h3_encode as E
    from simple_osm_queries_spark.operators.knn import (
        _h3_disc_cells_col,
        h3_max_circumradius_deg,
    )

    qlon, qlat, res = 12.0, 75.0, 3
    disc = 2.0 * h3_max_circumradius_deg(res)
    df = spark.createDataFrame(pd.DataFrame({"qlon": [qlon], "qlat": [qlat]}))
    cover = set(
        df.select(_h3_disc_cells_col(F.col("qlon"), F.col("qlat"), res, disc).alias("c"))
        .collect()[0]
        .c
    )
    rng = np.random.default_rng(11)
    ang = rng.uniform(0, 2 * np.pi, 6000)
    rad = disc * np.sqrt(rng.uniform(0, 1, 6000))
    lats = qlat + rad * np.sin(ang)
    lons = qlon + rad * np.cos(ang) / np.cos(np.radians(lats))
    cells = set(E.lnglat_to_cell(lons, lats, res).view(np.int64).tolist())
    assert cells <= cover, f"{len(cells - cover)} cells escaped the cover"


def test_knn_h3_pole_query_falls_back_to_brute(spark, points, points_pd):
    """A pole-adjacent query (padded disc reaches 89.5N) routes to the exact
    brute path instead of the cover sampler; results still match the
    equirect oracle and report exact."""
    polar = spark.createDataFrame(
        [(0, 9.97, 89.8, 5), (1, 9.97, 53.57, 5)],
        "qid long, lon double, lat double, k int",
    )
    pts = points.select("id", "lon", "lat").unionByName(
        spark.createDataFrame(
            [(90001 + i, 9.0 + i * 0.3, 89.7 + 0.01 * i) for i in range(8)],
            "id long, lon double, lat double",
        )
    )
    res = knn.knn_h3(pts, polar, res=8)
    rows = res.collect()
    assert all(r.exact for r in rows)
    pts_pd = pts.select("id", "lon", "lat").toPandas()
    for qid, qlon, qlat, k in [(0, 9.97, 89.8, 5), (1, 9.97, 53.57, 5)]:
        expected = [i for i, _ in _knn_oracle_equirect(pts_pd, qlon, qlat, k)]
        got = [r.id for r in sorted((r for r in rows if r.qid == qid), key=lambda r: r.rank)]
        assert got == expected, f"qid={qid}"


def test_point_in_polygon_h3_matches_plain(spark, points, points_pd):
    from simple_osm_queries_spark.operators.spatial_join import (
        point_in_polygon_h3_join,
        point_in_polygon_literal_join,
    )

    catalog = [(0, PENTAGON), (1, STAR)]
    plain = {
        (r.id, r.qid)
        for r in point_in_polygon_literal_join(points, catalog).select("id", "qid").collect()
    }
    h3ed = {
        (r.id, r.qid)
        for r in point_in_polygon_h3_join(points, catalog, res=8).select("id", "qid").collect()
    }
    assert h3ed == plain and plain


def test_tile_pyramid_matches_per_level_recompute(points, points_pd):
    """Pyramid rollup (aggregate-of-aggregates, one data pass) must equal
    recomputing tile_stats independently at every zoom, and the parent bit
    math must match the python tile packing."""
    from simple_osm_queries_spark.functions import cells as C

    res = tiles.tile_pyramid(points, max_zoom=13, min_zoom=10).collect()
    got = {(r.zoom, r.tile_id): (r.n, r.min_lon, r.max_lat) for r in res}
    assert len(got) == len(res)  # no duplicate (zoom, tile) rows
    for z in range(10, 14):
        expect = {}
        for lon, lat in zip(points_pd.lon, points_pd.lat):
            tx, ty = C.tile_xy_py(lon, lat, z)
            tid = C.tile_id_py(tx, ty, z)
            n, mnl, mxa = expect.get(tid, (0, 181.0, -91.0))
            expect[tid] = (n + 1, min(mnl, lon), max(mxa, lat))
        level = {tid: v for (zz, tid), v in got.items() if zz == z}
        assert set(level) == set(expect), f"zoom {z} tile set"
        for tid, (n, mnl, mxa) in expect.items():
            gn, gmnl, gmxa = level[tid]
            assert gn == n and gmnl == pytest.approx(mnl) and gmxa == pytest.approx(mxa)


def test_precomputed_cell_col_parity(spark, points):
    """The cell_col fast path (cells-CLI layout: precomputed H3 columns)
    must return exactly what the re-encode path returns, for both knn_h3
    and point_in_polygon_h3_join."""
    from simple_osm_queries_spark.operators.spatial_join import (
        point_in_polygon_h3_join,
    )

    keyed = points.withColumn("h3a", C.cell_h3(F.col("lon"), F.col("lat"), 8))
    q = _queries_df(spark)
    plain = sorted(
        (r.qid, r.rank, r.id) for r in knn.knn_h3(points, q, res=8).collect()
    )
    fast = sorted(
        (r.qid, r.rank, r.id)
        for r in knn.knn_h3(keyed, q, res=8, cell_col="h3a").collect()
    )
    assert plain == fast

    pplain = {
        (r.id, r.qid)
        for r in point_in_polygon_h3_join(points, [(0, PENTAGON)], res=8)
        .select("id", "qid")
        .collect()
    }
    pfast = {
        (r.id, r.qid)
        for r in point_in_polygon_h3_join(keyed, [(0, PENTAGON)], res=8, cell_col="h3a")
        .select("id", "qid")
        .collect()
    }
    assert pplain == pfast and pplain


def test_point_in_polygon_h3_large_catalog(spark, points, points_pd):
    """>4 polygons takes the ring-map refine path (codegen limit guard);
    must still match the plain literal join."""
    from simple_osm_queries_spark.operators.spatial_join import (
        point_in_polygon_h3_join,
        point_in_polygon_literal_join,
    )

    catalog = [(0, PENTAGON), (1, STAR), (2, CROSSING)]
    for j in range(3, 6):
        dx = 0.01 * (j - 2)
        catalog.append((j, [(x + dx, y) for x, y in PENTAGON]))
    plain = {
        (r.id, r.qid)
        for r in point_in_polygon_literal_join(points, catalog).select("id", "qid").collect()
    }
    h3ed = {
        (r.id, r.qid)
        for r in point_in_polygon_h3_join(points, catalog, res=8).select("id", "qid").collect()
    }
    assert h3ed == plain and plain


# --- raster tile rendering (r5b: vector -> raster direction) ----------------


def test_tile_pixel_bins_matches_python_oracle(spark):
    """Pixel binning (column math) vs an independent python recompute of
    the same Web-Mercator fractional projection, point by point."""
    import math

    from simple_osm_queries_spark.functions import cells as C
    from simple_osm_queries_spark.operators import tiles as T
    from simple_osm_queries_spark.sources.datagen import node_lonlat

    ids = np.arange(0, 600)
    lon, lat = node_lonlat(ids)
    df = spark.createDataFrame(
        pd.DataFrame({"lon": lon, "lat": lat}), "lon double, lat double"
    )
    zoom, P = 14, 64
    got = {
        (r.tile_id, r.px, r.py): r.cnt
        for r in T.tile_pixel_bins(df, zoom, P).collect()
    }
    oracle: dict = {}
    n = 1 << zoom
    for lo, la in zip(lon, lat):
        fx = (lo + 180.0) / 360.0 * n
        la_c = min(max(la, -C.MAX_MERCATOR_LAT), C.MAX_MERCATOR_LAT)
        lr = math.radians(la_c)
        fy = (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi) / 2.0 * n
        tx = min(max(int(fx), 0), n - 1)
        ty = min(max(int(fy), 0), n - 1)
        px = min(max(int((fx - tx) * P), 0), P - 1)
        py = min(max(int((fy - ty) * P), 0), P - 1)
        key = (C.tile_id_py(tx, ty, zoom), px, py)
        oracle[key] = oracle.get(key, 0) + 1
    assert got == oracle


def test_tile_heatmap_renders_decodable_tiles(spark):
    """Rendered tiles: PNG decodes, intensity is monotone in bin count,
    nonzero pixels == distinct bins, per-tile point totals add up, and the
    hot-cell tile is the brightest (fixture skew made visible)."""
    from simple_osm_queries_spark.operators import tiles as T
    from simple_osm_queries_spark.sources import codecs
    from simple_osm_queries_spark.sources.datagen import node_lonlat

    ids = np.arange(0, 2000)
    lon, lat = node_lonlat(ids)
    df = spark.createDataFrame(
        pd.DataFrame({"lon": lon, "lat": lat}), "lon double, lat double"
    )
    zoom, P = 12, 64
    tiles_out = T.tile_heatmap(df, zoom, P).collect()
    bins = T.tile_pixel_bins(df, zoom, P).collect()
    by_tile: dict = {}
    for r in bins:
        by_tile.setdefault(r.tile_id, {})[(r.px, r.py)] = r.cnt
    assert len(tiles_out) == len(by_tile)
    assert sum(r.n_points for r in tiles_out) == len(ids)
    for r in tiles_out:
        img = codecs.decode_png(bytes(r.png))
        assert img.shape == (P, P, 3)
        gray = img[..., 0]
        cells = by_tile[r.tile_id]
        assert int((gray > 0).sum()) == len(cells)
        # monotone: the max-count bin is the brightest pixel (255)
        (bx, by), _ = max(cells.items(), key=lambda kv: kv[1])
        assert gray[by, bx] == 255
        assert r.zoom == zoom and (r.tile_id >> 58) == zoom
    # hot cell (ids % 100 == 0 cluster) -> that tile has the highest max
    from simple_osm_queries_spark.functions import cells as C

    hot_tx, hot_ty = C.tile_xy_py(9.95, 53.55, zoom)
    hot_id = C.tile_id_py(hot_tx, hot_ty, zoom)
    assert hot_id in by_tile
    assert max(by_tile[hot_id].values()) == max(
        max(v.values()) for v in by_tile.values()
    )


def test_tile_contact_sheet(spark):
    """Deterministic member selection (lowest image_ids), exact thumbnail
    pasting (area resize, PNG lossless), partial tiles padded black,
    n_members counts ALL tile rows while n_shown caps at grid^2."""
    from simple_osm_queries_spark.operators import multimodal, tiles as T
    from simple_osm_queries_spark.sources import codecs
    from simple_osm_queries_spark.sources.datagen import image_pixels, node_lonlat

    ids = np.arange(0, 300)
    lon, lat = node_lonlat(ids)
    rows = [
        (f"img{i:04d}", codecs.encode_png(image_pixels(int(i))), "png",
         float(lon[i]), float(lat[i]))
        for i in ids
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, lon double, lat double"
    )
    zoom, thumb, grid = 11, 8, 2  # cap = 4 per tile
    sheets = {r.tile_id: r for r in
              T.tile_contact_sheet(df, zoom, thumb=thumb, grid=grid).collect()}
    # oracle: python-side grouping
    from simple_osm_queries_spark.functions import cells as C

    groups: dict = {}
    for i in ids:
        tx, ty = C.tile_xy_py(float(lon[i]), float(lat[i]), zoom)
        groups.setdefault(C.tile_id_py(tx, ty, zoom), []).append(f"img{int(i):04d}")
    assert set(sheets) == set(groups)
    for tid, members in groups.items():
        r = sheets[tid]
        assert r.n_members == len(members)
        assert r.n_shown == min(len(members), grid * grid)
        img = codecs.decode_png(bytes(r.png))
        assert img.shape == (grid * thumb, grid * thumb, 3)
        chosen = sorted(members)[: grid * grid]
        for slot, mid in enumerate(chosen):
            i = int(mid[3:])
            src = image_pixels(i).astype(np.float64)
            expect = np.clip(
                np.stack(
                    [multimodal._box_mean_grid(src[..., c], thumb, thumb) for c in range(3)],
                    axis=-1,
                ).round(),
                0,
                255,
            ).astype(np.uint8)
            rr, cc = divmod(slot, grid)
            got = img[rr * thumb : (rr + 1) * thumb, cc * thumb : (cc + 1) * thumb]
            assert np.array_equal(got, expect)
        # unfilled slots stay black
        if len(chosen) < grid * grid:
            rr, cc = divmod(len(chosen), grid)
            assert img[rr * thumb : (rr + 1) * thumb, cc * thumb : (cc + 1) * thumb].max() == 0


def test_tile_contact_sheet_duplicate_ids_and_skip(spark):
    """Hardening (round-5 review): (1) duplicate (tile, image_id) rows must
    not break the grid^2 cap or determinism — the renderer keeps ONE
    representative per slot (smallest bytes); (2) on_error='skip' leaves a
    malformed row's slot black instead of failing the job, while the
    default raises (codec boundary contract)."""
    from pyspark.sql.utils import PythonException

    from simple_osm_queries_spark.operators import tiles as T
    from simple_osm_queries_spark.sources import codecs
    from simple_osm_queries_spark.sources.datagen import image_pixels

    zoom, thumb, grid = 11, 8, 2
    png_a = codecs.encode_png(image_pixels(1))
    png_b = codecs.encode_png(image_pixels(2))
    lo, hi = (png_a, png_b) if png_a < png_b else (png_b, png_a)
    rows = [
        ("dup", png_a, "png", 9.95, 53.55),
        ("dup", png_b, "png", 9.95, 53.55),  # same id, same tile
        ("solo", codecs.encode_png(image_pixels(3)), "png", 9.95, 53.55),
    ]
    schema = "image_id string, bytes binary, fmt string, lon double, lat double"
    df = spark.createDataFrame(rows, schema)
    out = T.tile_contact_sheet(df, zoom, thumb=thumb, grid=grid).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_members == 3
    assert r.n_shown <= grid * grid and r.n_shown == 2  # dup painted once
    img = codecs.decode_png(bytes(r.png))
    # slot 0 = 'dup' with the deterministic (smallest-bytes) representative
    import numpy as np

    from simple_osm_queries_spark.operators import multimodal

    src = codecs.decode_image(lo, "png").astype(np.float64)
    expect = np.clip(
        np.stack(
            [multimodal._box_mean_grid(src[..., c], thumb, thumb) for c in range(3)],
            axis=-1,
        ).round(),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(img[:thumb, :thumb], expect)

    # corrupt row: default raises, on_error='skip' paints black
    bad = spark.createDataFrame(
        [
            ("a", codecs.encode_png(image_pixels(4)), "png", 9.95, 53.55),
            ("b", b"not a png", "png", 9.95, 53.55),
        ],
        schema,
    )
    with pytest.raises(PythonException):
        T.tile_contact_sheet(bad, zoom, thumb=thumb, grid=grid).collect()
    r = T.tile_contact_sheet(bad, zoom, thumb=thumb, grid=grid, on_error="skip").collect()[0]
    assert r.n_shown == 1 and r.n_members == 2
    img = codecs.decode_png(bytes(r.png))
    assert img[:thumb, :thumb].max() > 0  # 'a' painted at slot 0
    assert img[:thumb, thumb : 2 * thumb].max() == 0  # 'b' slot black


def test_zonal_stats_matches_oracle(spark, points, points_pd):
    """zonal_stats: per-polygon count/avg over a 3-zone catalog equals the
    brute python PIP + pandas groupby; empty zones emit no row."""
    catalog = [(0, PENTAGON), (1, STAR), (2, CROSSING)]
    polys = spark.createDataFrame(
        [(q, [{"lon": x, "lat": y} for x, y in ring]) for q, ring in catalog],
        "qid long, ring array<struct<lon:double,lat:double>>",
    )
    got = {
        r.qid: (r.n, r.mean_lon, r.sum_id)
        for r in spatial_join.zonal_stats(
            points, polys,
            values={"mean_lon": F.avg("lon"), "sum_id": F.sum("id")},
        ).collect()
    }
    expected = {}
    for q, ring in catalog:
        sel = [r for r in points_pd.itertuples() if _pip_oracle(r.lon, r.lat, ring)]
        if sel:
            expected[q] = (
                len(sel),
                sum(r.lon for r in sel) / len(sel),
                sum(int(r.id) for r in sel),
            )
    assert set(got) == set(expected) and expected
    for q, (n, ml, si) in expected.items():
        gn, gml, gsi = got[q]
        assert gn == n and gsi == si
        assert abs(gml - ml) < 1e-9

    # a polygon with no points emits no row
    far = spark.createDataFrame(
        [(9, [{"lon": 170.0 + dx, "lat": 10.0 + dy}
              for dx, dy in [(0.0, 0.0), (0.1, 0.0), (0.05, 0.1)]])],
        "qid long, ring array<struct<lon:double,lat:double>>",
    )
    assert spatial_join.zonal_stats(points, far).count() == 0
