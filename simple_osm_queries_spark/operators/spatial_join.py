"""Spatial joins: bbox join and point-in-polygon (north rule).

These extend the reference's bbox machinery (/root/reference/src/query/
location.go:42-47 has only point-in-bbox and bound-intersects) to true
spatial JOIN operators between a big point table and a (small) geometry
table.

Design for scale:
* the geometry side is broadcast (queries/polygons are the small dim);
* every candidate pairing is prefiltered by bbox overlap — with a
  cell-range predicate this is the distributed analogue of the reference's
  "only read cells in range" scan (grid_reader.go:39-78);
* the exact ray-casting test is PURE COLUMN MATH over the ring array
  (aggregate over edge pairs) — whole-stage codegen, no Python in the hot
  path. A polygon with r vertices costs O(r) per candidate, same as any
  single-node implementation, but embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bbox_join(
    points: DataFrame,
    boxes: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    how: str = "inner",
) -> DataFrame:
    """Join points to every query bbox containing them (inclusive bounds).

    ``boxes`` must carry (qid, min_lon, min_lat, max_lon, max_lat); it is
    broadcast — a theta join on range predicates would otherwise be a
    cartesian shuffle.
    """
    cond = (
        (points[lon] >= boxes["min_lon"])
        & (points[lon] <= boxes["max_lon"])
        & (points[lat] >= boxes["min_lat"])
        & (points[lat] <= boxes["max_lat"])
    )
    return points.join(F.broadcast(boxes), cond, how)


def _ring_edges(ring: Column) -> Column:
    """array<struct<a,b>> of consecutive ring edges (wrapping last->first)."""
    n = F.size(ring)
    rotated = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
    return F.zip_with(ring, rotated, lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def point_in_polygon_col(lon: Column, lat: Column, ring: Column) -> Column:
    """Ray-casting point-in-polygon as a pure column expression.

    ``ring`` is array<struct<lon:double,lat:double>> (closed or open — a
    duplicate closing vertex contributes a degenerate edge that never
    crosses). Standard even-odd rule: count edges whose (a.lat > y) !=
    (b.lat > y) and whose ray intersection lies right of x.
    """
    edges = _ring_edges(ring)

    def crosses(e: Column) -> Column:
        ay, by = e["a"]["lat"], e["b"]["lat"]
        ax, bx = e["a"]["lon"], e["b"]["lon"]
        straddles = (ay > lat) != (by > lat)
        x_at_y = (bx - ax) * (lat - ay) / (by - ay) + ax
        return straddles & (lon < x_at_y)

    return F.size(F.filter(edges, crosses)) % 2 == 1


def polygon_bounds(ring: Column) -> tuple[Column, Column, Column, Column]:
    lons = F.transform(ring, lambda p: p["lon"])
    lats = F.transform(ring, lambda p: p["lat"])
    return F.array_min(lons), F.array_min(lats), F.array_max(lons), F.array_max(lats)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    ring: str = "ring",
    how: str = "inner",
) -> DataFrame:
    """Join points to the polygons containing them.

    ``polygons``: (qid, ring: array<struct<lon,lat>>). The polygon side is
    broadcast with precomputed bounds; the bbox prefilter prunes candidates
    before the O(vertices) exact test — the cell-prefilter + refine shape
    the north rule asks for.
    """
    mnx, mny, mxx, mxy = polygon_bounds(F.col(ring))
    polys = polygons.withColumns(
        {"__mnx": mnx, "__mny": mny, "__mxx": mxx, "__mxy": mxy}
    )
    cond = (
        (points[lon] >= polys["__mnx"])
        & (points[lon] <= polys["__mxx"])
        & (points[lat] >= polys["__mny"])
        & (points[lat] <= polys["__mxy"])
        & point_in_polygon_col(points[lon], points[lat], polys[ring])
    )
    return points.join(F.broadcast(polys), cond, how).drop("__mnx", "__mny", "__mxx", "__mxy")
