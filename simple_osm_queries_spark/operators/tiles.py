"""Raster <-> vector tile assignment (north rule).

Slippy-map (Web-Mercator) tiles: assigning a point to its tile at zoom z is
pure column math (functions/cells.py), so tile JOIN degenerates to an
equi-join on the computed tile id — no range/spatial join needed, which is
the whole point of tiling at 10^12 scale: the expensive geometry predicate
is replaced by a hash-partitionable key.

``tile_stats`` is the rollup (per-tile aggregation with optional salting for
hot tiles — the reference's extent bin-packer import.go:167-233 solved the
same skew problem at import time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C


def assign_tiles(
    points: DataFrame, zoom: int, lon: str = "lon", lat: str = "lat", out: str = "tile_id"
) -> DataFrame:
    return points.withColumn(out, C.tile_of(F.col(lon), F.col(lat), zoom))


def tile_join(points: DataFrame, tiles: DataFrame, zoom: int) -> DataFrame:
    """Join points to a tile catalog (tile_id, ...) at the same zoom.

    The catalog is the small side -> broadcast. Truth semantics: a point
    belongs to exactly the tile whose index equals its computed slippy
    index (equivalently: tile bbox containment with right/bottom-exclusive
    edges, the slippy convention).
    """
    pts = assign_tiles(points, zoom)
    return pts.join(F.broadcast(tiles), "tile_id", "inner")


def tile_stats(points: DataFrame, zoom: int, salt: int = 1) -> DataFrame:
    """Per-tile rollup: count + bbox of contained points.

    ``salt > 1`` demonstrates explicit hot-key splitting: partial aggregate
    per (tile, salt) then final merge — the classic two-step combine. With
    AQE on, Spark's partial aggregation usually makes this unnecessary; it
    exists for the pathological single-hot-tile case and as the documented
    skew pattern.
    """
    pts = assign_tiles(points, zoom)
    aggs = [
        F.count("*").alias("n"),
        F.min("lon").alias("min_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lon").alias("max_lon"),
        F.max("lat").alias("max_lat"),
    ]
    if salt <= 1:
        return pts.groupBy("tile_id").agg(*aggs)
    partial = (
        pts.withColumn("__salt", F.pmod(F.col("id"), F.lit(salt)))
        .groupBy("tile_id", "__salt")
        .agg(*aggs)
    )
    return partial.groupBy("tile_id").agg(
        F.sum("n").alias("n"),
        F.min("min_lon").alias("min_lon"),
        F.min("min_lat").alias("min_lat"),
        F.max("max_lon").alias("max_lon"),
        F.max("max_lat").alias("max_lat"),
    )


def make_tile_catalog(spark, zoom: int, min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> DataFrame:
    """Enumerate the tiles covering a window (driver-side; tiny)."""
    x0, y1 = C.tile_xy_py(min_lon, min_lat, zoom)  # note: y inverted
    x1, y0 = C.tile_xy_py(max_lon, max_lat, zoom)
    rows = []
    for tx in range(min(x0, x1), max(x0, x1) + 1):
        for ty in range(min(y0, y1), max(y0, y1) + 1):
            rows.append((C.tile_id_py(tx, ty, zoom), zoom, tx, ty))
    return spark.createDataFrame(rows, "tile_id long, zoom int, tile_x int, tile_y int")
