"""Cell / spatial-index encoders.

The reference indexes features into a flat lon/lat grid:
``CellIndex{int(x / cellWidth), int(y / cellHeight)}``
(/root/reference/src/common/cell.go:7-9). Note Go's ``int()`` conversion
TRUNCATES TOWARD ZERO (it is not floor) — we replicate that exactly with
Spark's double→int cast, which also truncates toward zero.

On top of the reference-parity grid we add the distributed-index encoders the
north rule asks for:

* ``tile_x/tile_y/tile_id`` — Web-Mercator slippy tiles (raster<->vector tile
  assignment, z-order locality),
* ``cell_s2`` — REAL S2 cell ids from the in-repo numpy implementation of
  the published S2 scheme (functions/s2.py): bit-compatible, vectorized,
  zero external dependencies.
* ``cell_h3`` — REAL bit-compatible H3 cell ids from the in-repo from-scratch
  numpy implementation of the published H3 scheme (functions/h3_encode.py):
  icosahedral gnomonic projection, aperture-7 digit walk, derived
  face/base-cell tables; no external dependency.

All hot-path encoders are pure JVM column math (whole-stage codegen); only the
H3/S2 encoders drop to Arrow-batched pandas UDFs (never per-row Python).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Default grid: the reference always uses 0.1° x 0.1° cells
# (/root/reference/src/importing/import.go:17, src/main.go:93).
DEFAULT_CELL_W = 0.1
DEFAULT_CELL_H = 0.1

# Packing offsets: grid x in [-1800,1800] for w=0.1; 2^20 leaves headroom for
# much finer grids. cell_id is monotone in (x, y) lexicographic order.
_OFF = 1 << 20
_SHIFT = 21


def cell_x(lon: Column, cell_w: float = DEFAULT_CELL_W) -> Column:
    """Grid x index. Truncation toward zero, per Go int() conversion."""
    return (lon / F.lit(float(cell_w))).cast("int")


def cell_y(lat: Column, cell_h: float = DEFAULT_CELL_H) -> Column:
    return (lat / F.lit(float(cell_h))).cast("int")


def pack_cell(x: Column, y: Column) -> Column:
    """Pack (x, y) grid indices into one long (x-major order)."""
    return ((x.cast("long") + F.lit(_OFF)) * F.lit(1 << _SHIFT)) + (
        y.cast("long") + F.lit(_OFF)
    )


def unpack_cell(cell: Column) -> tuple[Column, Column]:
    x = (cell / F.lit(1 << _SHIFT)).cast("long") - F.lit(_OFF)
    y = (cell % F.lit(1 << _SHIFT)).cast("long") - F.lit(_OFF)
    return x.cast("int"), y.cast("int")


def cell_of(lon: Column, lat: Column, cell_w: float = DEFAULT_CELL_W, cell_h: float = DEFAULT_CELL_H) -> Column:
    """Packed grid cell id for a coordinate (the engine's partition key)."""
    return pack_cell(cell_x(lon, cell_w), cell_y(lat, cell_h))


# ---------------------------------------------------------------------------
# Driver-side helpers (tiny, query-planning only — mirror common/cell.go)
# ---------------------------------------------------------------------------


def _trunc(v: float) -> int:
    """Go int() conversion: truncation toward zero."""
    return int(v)  # Python int() also truncates toward zero


def cell_xy_py(lon: float, lat: float, cell_w: float = DEFAULT_CELL_W, cell_h: float = DEFAULT_CELL_H) -> tuple[int, int]:
    return _trunc(lon / cell_w), _trunc(lat / cell_h)


def pack_cell_py(x: int, y: int) -> int:
    return ((x + _OFF) << _SHIFT) + (y + _OFF)


def cover_bbox_py(
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
    cell_w: float = DEFAULT_CELL_W,
    cell_h: float = DEFAULT_CELL_H,
) -> tuple[int, int, int, int]:
    """Cell range covering a bbox: (min_x, min_y, max_x, max_y) inclusive.

    Mirrors /root/reference/src/index/grid_reader.go:41-42 (min/max cell of
    the two bbox corners, inclusive scan over the rectangle).
    """
    x0, y0 = cell_xy_py(min_lon, min_lat, cell_w, cell_h)
    x1, y1 = cell_xy_py(max_lon, max_lat, cell_w, cell_h)
    return min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1)


def k_ring_py(x: int, y: int, k: int) -> list[tuple[int, int]]:
    """All grid cells within Chebyshev distance k (the (2k+1)^2 block).

    The planner's kNN candidate expansion; the moral equivalent of H3's
    k-ring on the flat grid / quadtree fallback.
    """
    return [(x + dx, y + dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)]


# ---------------------------------------------------------------------------
# Web-Mercator slippy tiles (column math; tile assignment + quadtree fallback)
# ---------------------------------------------------------------------------

MAX_MERCATOR_LAT = 85.05112878


def tile_x(lon: Column, zoom: int) -> Column:
    fx, _ = tile_fxy(lon, F.lit(0.0), zoom)
    tx = F.floor(fx).cast("int")
    # clamp lon=180 edge into the last tile
    return F.least(F.greatest(tx, F.lit(0)), F.lit((1 << zoom) - 1))


def tile_fxy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Fractional Web-Mercator tile coordinates (fx, fy) at ``zoom`` — the
    ONE projection expression tile_x/tile_y floor and tile_pixel_bins
    subdivides into pixels; keeping a single definition is what guarantees
    a point's pixel tile_id always equals its assigned tile_id."""
    n = F.lit(float(1 << zoom))
    fx = (lon + F.lit(180.0)) / F.lit(360.0) * n
    lat_c = F.least(F.greatest(lat, F.lit(-MAX_MERCATOR_LAT)), F.lit(MAX_MERCATOR_LAT))
    lat_rad = F.radians(lat_c)
    fy = (
        (F.lit(1.0) - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(math.pi))
        / F.lit(2.0)
        * n
    )
    return fx, fy


def tile_y(lat: Column, zoom: int) -> Column:
    _, fy = tile_fxy(F.lit(0.0), lat, zoom)
    ty = F.floor(fy).cast("int")
    return F.least(F.greatest(ty, F.lit(0)), F.lit((1 << zoom) - 1))


def tile_id(tx: Column, ty: Column, zoom: int) -> Column:
    """Pack (zoom, tx, ty) into one long: zoom<<58 | tx<<29 | ty (zoom<=29)."""
    return (
        F.lit(zoom).cast("long") * F.lit(1 << 58)
        + tx.cast("long") * F.lit(1 << 29)
        + ty.cast("long")
    )


def tile_of(lon: Column, lat: Column, zoom: int) -> Column:
    return tile_id(tile_x(lon, zoom), tile_y(lat, zoom), zoom)


def tile_fxy_py(lon: float, lat: float, zoom: int) -> tuple[float, float]:
    """Driver/UDF-side twin of tile_fxy — SAME formula term-for-term, so a
    Python-projected pixel always lands in the tile the column expression
    assigned the point to."""
    n = 1 << zoom
    fx = (lon + 180.0) / 360.0 * n
    lat_c = min(max(lat, -MAX_MERCATOR_LAT), MAX_MERCATOR_LAT)
    lat_rad = math.radians(lat_c)
    fy = (1.0 - math.log(math.tan(lat_rad) + 1.0 / math.cos(lat_rad)) / math.pi) / 2.0 * n
    return fx, fy


def tile_xy_py(lon: float, lat: float, zoom: int) -> tuple[int, int]:
    n = 1 << zoom
    fx, fy = tile_fxy_py(lon, lat, zoom)
    tx, ty = int(math.floor(fx)), int(math.floor(fy))
    return min(max(tx, 0), n - 1), min(max(ty, 0), n - 1)


def tile_id_py(tx: int, ty: int, zoom: int) -> int:
    return (zoom << 58) | (tx << 29) | ty


# ---------------------------------------------------------------------------
# H3 / S2 encoders (vectorized pandas UDFs over in-repo implementations)
# ---------------------------------------------------------------------------


def cell_h3(lon: Column, lat: Column, res: int = 8) -> Column:
    """REAL H3 cell id (long, two's-complement of the uint64 id).

    Backed by the in-repo from-scratch numpy implementation of the published
    H3 scheme (functions/h3_encode.py): bit-compatible ids with no external
    dependency, whole-array encode inside one Arrow batch. The derived
    face->base-cell tables are built once per Python worker (~1.5 s) and
    reused for every batch."""

    @F.pandas_udf(T.LongType())
    def _enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        from simple_osm_queries_spark.functions import h3_encode as _h3impl

        cells = _h3impl.lnglat_to_cell(lo.to_numpy(), la.to_numpy(), res)
        return pd.Series(cells.view("int64"))

    # asNondeterministic (guide §4.4): consumers equi-join or filter on
    # the encoded cell column, and Catalyst pushes the join key's
    # isnotnull below the projection, DUPLICATING the encode over the
    # whole table (captured: pip_h3 plans carried two ArrowEvalPython
    # nodes for one encode; 10M-row re-encode paid twice). The encode is
    # deterministic in fact, so results are unchanged — the flag only
    # pins a single evaluation.
    return _enc.asNondeterministic()(lon, lat)


def cell_s2(lon: Column, lat: Column, level: int = 12) -> Column:
    """REAL S2 cell id (long, two's-complement of the uint64 id).

    Backed by the in-repo numpy-vectorized implementation of the published
    S2 scheme (functions/s2.py) — bit-compatible ids with no external
    dependency, whole-array encode inside one Arrow batch."""

    @F.pandas_udf(T.LongType())
    def _enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        from simple_osm_queries_spark.functions import s2 as _s2impl

        cells = _s2impl.lnglat_to_cell(lo.to_numpy(), la.to_numpy(), level)
        return pd.Series(_s2impl.to_signed(cells))

    return _enc(lon, lat)


def h3_center(cell: Column) -> Column:
    """Decode H3 cell ids to their center struct(lon, lat) — the inverse of
    :func:`cell_h3` (self-verifying: every center re-encodes to its cell).
    Requires uniform resolution per batch (group by resolution first for
    mixed sets)."""

    @F.pandas_udf("struct<lon: double, lat: double>")
    def _dec(cells: pd.Series) -> pd.DataFrame:
        import numpy as np

        from simple_osm_queries_spark.functions import h3_encode as _h3impl

        if not len(cells):
            return pd.DataFrame({"lon": [], "lat": []})
        lng, lat = _h3impl.cell_to_lnglat(
            cells.to_numpy(dtype=np.int64).view(np.uint64)
        )
        return pd.DataFrame({"lon": lng, "lat": lat})

    return _dec(cell)


# ---------------------------------------------------------------------------
# Geohash + Morton z-order (pure JVM column math, fully SQL-twinnable)
# ---------------------------------------------------------------------------

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bits_col(v: Column, lo: float, hi: float, nbits: int) -> Column:
    """Bisection bits of v within [lo, hi) as one integer: exactly
    floor((v - lo) / (hi - lo) * 2^nbits), clamped into range."""
    scaled = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << nbits))).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << nbits) - 1))


def zorder_key(x_bits: Column, y_bits: Column, nbits: int) -> Column:
    """Morton interleave of two nbits-wide integers (x in even positions).
    Unrolled shift/mask sum — whole-stage codegen, no UDF. The generic
    2-D clustering key (Delta's OPTIMIZE ZORDER uses the same curve)."""
    terms = []
    for i in range(nbits):
        xb = F.shiftright(x_bits, i).bitwiseAND(F.lit(1)).cast("long")
        yb = F.shiftright(y_bits, i).bitwiseAND(F.lit(1)).cast("long")
        terms.append(xb * F.lit(1 << (2 * i + 1)) + yb * F.lit(1 << (2 * i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def geohash(lon: Column, lat: Column, precision: int = 9) -> Column:
    """Standard geohash string (base32, lon bit first) — pure column math.

    precision chars = 5*precision bits, split ceil/floor between lon/lat.
    The scaled-floor bit extraction equals classic bisection for every
    coordinate except values within one ulp of a bisection boundary (the
    floor path divides by the range once; bisection compares against exact
    dyadic midpoints) — generic coordinates never sit there. Reproducible
    verbatim in ANSI SQL for the oracle twin (which mirrors the floor).
    """
    total = 5 * precision
    n_lon = (total + 1) // 2
    n_lat = total // 2
    lon_b = _bits_col(lon, -180.0, 180.0, n_lon)
    lat_b = _bits_col(lat, -90.0, 90.0, n_lat)
    # interleave lon(hi) first: bit j of the geohash (MSB order) comes from
    # lon when j even, lat when j odd
    terms = []
    for j in range(total):
        src, idx = (lon_b, n_lon - 1 - j // 2) if j % 2 == 0 else (lat_b, n_lat - 1 - j // 2)
        bit = F.shiftright(src, idx).bitwiseAND(F.lit(1)).cast("long")
        terms.append(bit * F.lit(1 << (total - 1 - j)))
    packed = terms[0]
    for t in terms[1:]:
        packed = packed + t
    chars = [
        F.substring(
            F.lit(_GEOHASH32),
            (F.shiftright(packed, (precision - 1 - c) * 5).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_py(lon: float, lat: float, precision: int = 9) -> str:
    """Scalar oracle: classic bisection implementation."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    out = []
    for c in range(precision):
        v = 0
        for b in bits[c * 5 : c * 5 + 5]:
            v = v * 2 + b
        out.append(_GEOHASH32[v])
    return "".join(out)
