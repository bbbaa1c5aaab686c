"""Geodesic measures over way/ring geometries (engine addition).

The reference stores way geometry (ordered node lon/lats,
/root/reference/src/index/grid_reader.go:80-142 materializes them for
output) but never measures it — no length, no area, no simplification.
A training-data/analytics engine wants all three (filter ways by length,
rank polygons by area, thin dense geometries before rendering/vector
tiles), so they are first-class here:

* ``way_length_m``   — great-circle (haversine) length of the ordered
  node polyline, METERS, pure column math: consecutive-node segments via
  ``zip_with(slice, slice)``, per-segment haversine, then an in-order
  ``F.aggregate`` left fold (deterministic accumulation order ⇒ the
  DuckDB gate twin can mirror the float op order exactly).
* ``ring_area_m2``   — spherical polygon area by the line-integral
  (spherical excess) formula of Chamberlain & Duquette (JPL, "Some
  algorithms for polygons on a sphere", 2007; the same formula turf.js
  and PostGIS use for fast spherical area): for each wrapped edge
  (λ1,φ1)→(λ2,φ2), accumulate (λ2−λ1)·(2 + sin φ1 + sin φ2); area =
  |Σ|·R²/2. Accurate for edges short enough that great-circle and rhumb
  chords coincide (measured vs l'Huilier great-circle triangulation:
  < 4e-4 relative for ~0.5-degree edges, < 1e-5 below 0.1 degree —
  property-tested); NOT for rings that enclose a pole (the lon winding
  cancels). Pure column math.
* ``simplify_dp``    — Douglas–Peucker polyline simplification in
  meters (equirect local projection about each way's mean latitude, the
  buffer family's metric), Arrow-batched via ``mapInPandas`` with an
  iterative numpy stack (no Python recursion limits). Endpoints are
  always kept; output is an ordered subsequence of the input.

Scale shape: length/area are per-row column expressions (no shuffle, no
UDF — whole-stage codegen); simplify is one Arrow pass, no shuffle.
All distances use knn.EARTH_RADIUS_M (the H3-documented authalic radius)
so meters agree across the kNN, buffer, and measure families.
"""

from __future__ import annotations

# module-level imports: pandas_udf/mapInPandas type-hint resolution breaks
# with `from __future__ import annotations` + function-local imports
import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators.knn import EARTH_RADIUS_M


def haversine_m_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle meters between two points, mirroring knn.haversine_m's
    expression tree exactly (explicit products, no pow) so DuckDB twins
    written for one apply to both."""
    sp = F.sin(F.radians(lat2 - lat1) / F.lit(2.0))
    sl = F.sin(F.radians(lon2 - lon1) / F.lit(2.0))
    a = sp * sp + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * sl * sl
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def way_length_m_col(nodes: Column) -> Column:
    """Haversine length (meters) of an ordered array<struct<..lon,lat..>>.

    In-order left fold: (((0 + s1) + s2) + ...) — deterministic float
    accumulation, mirrored by DuckDB ``list_reduce`` in the gate twin.
    Empty / single-node ways measure 0.
    """
    n = F.size(nodes)
    segs = F.zip_with(
        F.slice(nodes, 1, n - 1),
        F.slice(nodes, 2, n - 1),
        lambda a, b: haversine_m_col(a["lon"], a["lat"], b["lon"], b["lat"]),
    )
    total = F.aggregate(segs, F.lit(0.0), lambda acc, s: acc + s)
    return F.when(n >= 2, total).otherwise(F.lit(0.0))


def way_length_m(ways: DataFrame, nodes_col: str = "nodes", id_col: str = "id") -> DataFrame:
    """(id, length_m) for every way — see :func:`way_length_m_col`."""
    return ways.select(
        F.col(id_col).alias("id"), way_length_m_col(F.col(nodes_col)).alias("length_m")
    )


def ring_area_m2_col(ring: Column) -> Column:
    """Spherical polygon area (m²) of array<struct<..lon,lat..>> by the
    Chamberlain–Duquette line integral (module docstring). The ring may be
    open (last edge wraps to the first vertex) or closed (the duplicated
    vertex contributes a zero term); orientation does not matter (absolute
    value). Degenerate rings (< 3 distinct vertices) measure 0.

    In-order left fold over the wrapped edge list — deterministic float
    accumulation for the DuckDB twin, like :func:`way_length_m_col`.
    """
    n = F.size(ring)
    rotated = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
    terms = F.zip_with(
        ring,
        rotated,
        lambda a, b: F.radians(b["lon"] - a["lon"])
        * (F.lit(2.0) + F.sin(F.radians(a["lat"])) + F.sin(F.radians(b["lat"]))),
    )
    total = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    area = F.abs(total) * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)
    return F.when(n >= 3, area).otherwise(F.lit(0.0))


def ring_area_m2(ways: DataFrame, nodes_col: str = "nodes", id_col: str = "id") -> DataFrame:
    """(id, area_m2) treating each way's node list as a polygon ring."""
    return ways.select(
        F.col(id_col).alias("id"), ring_area_m2_col(F.col(nodes_col)).alias("area_m2")
    )


def bearing_deg_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees in
    [0, 360) clockwise from north — the standard forward-azimuth formula
    θ = atan2(sin Δλ·cos φ2, cos φ1·sin φ2 − sin φ1·cos φ2·cos Δλ).
    Pure column math; the DuckDB twin mirrors it op-for-op (fmod on a
    positive dividend equals pmod exactly)."""
    dl = F.radians(lon2 - lon1)
    y = F.sin(dl) * F.cos(F.radians(lat2))
    x = F.cos(F.radians(lat1)) * F.sin(F.radians(lat2)) - F.sin(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(dl)
    return F.pmod(F.degrees(F.atan2(y, x)) + F.lit(360.0), F.lit(360.0))


def destination_cols(
    lon: Column, lat: Column, bearing_deg: Column, distance_m: Column
) -> tuple[Column, Column]:
    """(dest_lon, dest_lat) after travelling ``distance_m`` along the
    great circle at initial bearing ``bearing_deg`` — the standard
    spherical direct formula (φ2 = asin(sin φ1·cos δ + cos φ1·sin δ·cos θ),
    λ2 = λ1 + atan2(...)), δ = d/R on the shared authalic radius. The
    longitude is NOT normalized: downstream cell encoders are
    wrap-transparent (H3 encodes beyond ±180 to the reflected point
    exactly), and keeping the raw value makes the SQL twin a pure mirror."""
    d = distance_m / F.lit(EARTH_RADIUS_M)
    th = F.radians(bearing_deg)
    p1 = F.radians(lat)
    sp2 = F.sin(p1) * F.cos(d) + F.cos(p1) * F.sin(d) * F.cos(th)
    p2 = F.asin(F.least(F.greatest(sp2, F.lit(-1.0)), F.lit(1.0)))
    l2 = F.radians(lon) + F.atan2(
        F.sin(th) * F.sin(d) * F.cos(p1), F.cos(d) - F.sin(p1) * sp2
    )
    return F.degrees(l2), F.degrees(p2)


def _dp_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas–Peucker keep-mask over projected coords (meters).

    Classic stack formulation (no recursion): for span (i, j), find the
    interior point with max perpendicular distance to chord i–j; if it
    exceeds ``tol`` split, else drop the interior. Degenerate chords
    (i == j spatially) fall back to point-to-point distance.
    """
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        sx, sy = xs[i], ys[i]
        dx, dy = xs[j] - sx, ys[j] - sy
        mx, my = xs[i + 1 : j], ys[i + 1 : j]
        len2 = dx * dx + dy * dy
        if len2 > 0.0:
            t = np.clip(((mx - sx) * dx + (my - sy) * dy) / len2, 0.0, 1.0)
            d2 = (sx + t * dx - mx) ** 2 + (sy + t * dy - my) ** 2
        else:
            d2 = (mx - sx) ** 2 + (my - sy) ** 2
        a = int(np.argmax(d2))
        if d2[a] > tol * tol:
            k = i + 1 + a
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_dp(
    ways: DataFrame,
    tolerance_m: float,
    nodes_col: str = "nodes",
    id_col: str = "id",
) -> DataFrame:
    """Douglas–Peucker simplification: (id, nodes, n_in, n_out) with
    ``nodes`` an ordered subsequence of the input node structs whose
    max deviation from the original polyline is <= ``tolerance_m``.

    Distance is planar meters in the equirect projection about each way's
    own mean latitude (the buffer family's local metric — documented
    approximation, fine for the sub-degree ways this engine indexes).
    Endpoints always survive; ways with <= 2 nodes pass through. One
    Arrow-batched pass, no shuffle; per-way cost O(n log n) average.
    """
    if tolerance_m < 0:
        raise ValueError(f"tolerance_m must be >= 0, got {tolerance_m}")

    schema = ways.select(id_col, nodes_col).schema
    out_schema = (
        f"id {schema[0].dataType.simpleString()}, "
        f"nodes {schema[1].dataType.simpleString()}, n_in int, n_out int"
    )

    def run(batches):
        for pdf in batches:
            out_nodes = []
            n_in = []
            n_out = []
            for nodes in pdf[nodes_col]:
                nodes = list(nodes)
                n = len(nodes)
                n_in.append(n)
                if n <= 2 or tolerance_m == 0.0:
                    out_nodes.append(nodes)
                    n_out.append(n)
                    continue
                lons = np.array([p["lon"] for p in nodes], dtype=np.float64)
                lats = np.array([p["lat"] for p in nodes], dtype=np.float64)
                k = np.cos(np.radians(lats.mean()))
                m_per_deg = EARTH_RADIUS_M * np.pi / 180.0
                keep = _dp_mask(lons * k * m_per_deg, lats * m_per_deg, tolerance_m)
                out_nodes.append([nodes[i] for i in np.flatnonzero(keep)])
                n_out.append(int(keep.sum()))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "nodes": out_nodes,
                    "n_in": pd.Series(n_in, dtype="int32"),
                    "n_out": pd.Series(n_out, dtype="int32"),
                }
            )

    return ways.select(id_col, nodes_col).mapInPandas(run, out_schema)
