"""Bbox geometry column math.

Mirrors the reference's orb.Bound semantics: inclusive containment and
inclusive bound-vs-bound intersection. Query-time geometry checks in the
reference are uniformly "query bbox intersects feature bound"
(/root/reference/src/index/grid_reader.go:180-184); nodes have degenerate
point bounds, ways line bounds, relations bbox-polygon bounds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_in_bbox(lon: Column, lat: Column, min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> Column:
    """Inclusive containment (orb Bound.Contains; /root/reference/src/query/location.go:44)."""
    return (
        (lon >= F.lit(min_lon))
        & (lon <= F.lit(max_lon))
        & (lat >= F.lit(min_lat))
        & (lat <= F.lit(max_lat))
    )


def bbox_intersects(
    f_min_lon: Column,
    f_min_lat: Column,
    f_max_lon: Column,
    f_max_lat: Column,
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
) -> Column:
    """Inclusive bound-vs-bound overlap (orb Bound.Intersects; location.go:46)."""
    return (
        (f_min_lon <= F.lit(max_lon))
        & (f_max_lon >= F.lit(min_lon))
        & (f_min_lat <= F.lit(max_lat))
        & (f_max_lat >= F.lit(min_lat))
    )
