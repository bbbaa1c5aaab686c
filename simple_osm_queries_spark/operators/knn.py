"""k-nearest-neighbors over the cell grid (north rule).

The reference has no kNN; the north rule adds it as "H3 k-ring expansion
with a salted sort-merge fallback for hot cells". Two implementations:

* ``knn_brute``  — broadcast the (small) query side, distance + per-query
  top-k window. Exact; the oracle baseline; O(|points| x |queries|) but
  each point partition streams independently (no shuffle until the top-k).
* ``knn_kring``  — candidate generation by k-ring cell expansion: each
  query explodes to the (2r+1)^2 cells around it, equi-joined against the
  cell-keyed point table, then per-query top-k. EXACTNESS GUARANTEE: a
  result is exact iff the k-th distance <= r*min(cell_w, cell_h) (the
  nearest excluded cell starts r cells away); ``knn_kring_exact`` doubles
  r until every query satisfies it — the driver loop touches only the
  per-query max distance aggregate, never the data.

Hot cells (dense urban analog): the candidate join key is the CELL, so a
hot cell makes one shuffle partition huge. AQE skew-join splitting
(enabled in session.py) splits it at runtime; ``salt`` adds explicit
pre-salting of the point side for the pathological case (every query in
one cell), trading one extra shuffle for bounded partitions.

Distance is squared euclidean in degrees (deterministic, monotone with
euclidean; fine within the small window — swap in haversine for global
data). Ties break on point id for determinism.
"""

from __future__ import annotations

# module-level: pandas_udf type-hint resolution needs pd importable here
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C


def _dist2(qlon, qlat, plon, plat):
    return (qlon - plon) * (qlon - plon) + (qlat - plat) * (qlat - plat)


def _topk(cand: DataFrame, k_col: str = "k", prefilter_buckets: int = 16) -> DataFrame:
    """Per-query top-k. Two-phase: a local top-k per (qid, id-bucket) first,
    so a hot query's candidate pile (hundreds of thousands of rows for a
    query inside a dense cell) is sorted in ``prefilter_buckets`` parallel
    partitions instead of one; the global window then ranks at most
    buckets*k rows per query."""
    if prefilter_buckets > 1:
        w_local = Window.partitionBy("qid", "__b").orderBy(
            F.col("dist2").asc(), F.col("id").asc()
        )
        cand = (
            cand.withColumn("__b", F.pmod(F.col("id"), F.lit(prefilter_buckets)))
            .withColumn("__lr", F.row_number().over(w_local))
            .filter(F.col("__lr") <= F.col(k_col))
            .drop("__b", "__lr")
        )
    w = Window.partitionBy("qid").orderBy(F.col("dist2").asc(), F.col("id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col(k_col))
    )


def knn_brute(points: DataFrame, queries: DataFrame, k: int | None = None) -> DataFrame:
    """Exact kNN; query side broadcast. ``queries``: (qid, lon, lat[, k])."""
    q = queries.select(
        "qid",
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        (F.lit(k) if k is not None else F.col("k")).alias("k"),
    )
    cand = points.select("id", "lon", "lat").crossJoin(F.broadcast(q)).withColumn(
        "dist2", _dist2(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat"))
    )
    return _topk(cand).select("qid", "id", "lon", "lat", "dist2", "rank")


def _kring_candidates(
    points: DataFrame, q: DataFrame, ring: int, cell_w: float, cell_h: float, salt: int
) -> DataFrame:
    """Explode each query into its k-ring cells, equi-join on the cell key.

    The cell key is recomputed from lon/lat at THIS operator's granularity —
    kNN wants a much finer grid than the reference's 0.1-degree query grid
    (a ring over coarse cells degenerates to a full scan per query), and the
    key must be consistent between both join sides regardless of what cell
    column the table was partitioned by.
    """
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    qx = C.cell_x(F.col("qlon"), cell_w)
    qy = C.cell_y(F.col("qlat"), cell_h)
    qcells = q.withColumn(
        "cell",
        F.explode(
            F.array(*[C.pack_cell(qx + F.lit(dx), qy + F.lit(dy)) for dx, dy in offsets])
        ),
    )
    pts = points.select(
        "id", "lon", "lat",
        C.cell_of(F.col("lon"), F.col("lat"), cell_w, cell_h).alias("cell"),
    )
    # the exploded query-cell side is tiny (|queries| * ring cells) but comes
    # from a local relation Spark won't size-estimate — without the explicit
    # broadcast it plans a SortMergeJoin that shuffles the whole point table
    if salt > 1:
        # replicate each query row over every salt bucket; points pick one
        # bucket — bounds the per-(cell,salt) partition size for hot cells
        qcells = qcells.withColumn("__salt", F.explode(F.array(*[F.lit(s) for s in range(salt)])))
        pts = pts.withColumn("__salt", (F.pmod(F.col("id"), F.lit(salt))).cast("int"))
        cand = pts.join(F.broadcast(qcells), ["cell", "__salt"]).drop("__salt")
    else:
        cand = pts.join(F.broadcast(qcells), "cell")
    return cand.withColumn(
        "dist2", _dist2(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat"))
    )


def knn_kring(
    points: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    ring: int = 1,
    cell_w: float = C.DEFAULT_CELL_W,
    cell_h: float = C.DEFAULT_CELL_H,
    salt: int = 1,
) -> DataFrame:
    """One-pass k-ring kNN. Exact for every query whose k-th neighbor lies
    within r*min(cell_w,cell_h); ``exact`` column reports the guarantee.
    Queries with fewer than k candidates in the ring return what was found.
    """
    q = queries.select(
        "qid",
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        (F.lit(k) if k is not None else F.col("k")).alias("k"),
    )
    cand = _kring_candidates(points, q, ring, cell_w, cell_h, salt)
    safe2 = (ring * min(cell_w, cell_h)) ** 2
    found = _topk(cand)
    # per-query max-dist and count as window aggregates over the SAME
    # partitioning the top-k window just created — one pass, no re-shuffle,
    # no recomputation of the candidate join (groupBy+join-back would
    # evaluate `found` twice)
    w_all = Window.partitionBy("qid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        found.withColumn("__maxd", F.max("dist2").over(w_all))
        .withColumn("__n", F.count("*").over(w_all))
        .withColumn("exact", (F.col("__n") >= F.col("k")) & (F.col("__maxd") <= F.lit(safe2)))
        .select("qid", "id", "lon", "lat", "dist2", "rank", "exact")
    )


def knn_kring_exact(
    points: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    ring: int = 1,
    max_ring: int = 64,
    cell_w: float = C.DEFAULT_CELL_W,
    cell_h: float = C.DEFAULT_CELL_H,
    salt: int = 1,
) -> DataFrame:
    """Driver loop doubling the ring until every query is guaranteed exact.

    Each round only recomputes the still-inexact queries (usually a
    shrinking handful near sparse regions); the loop inspects a one-row-per-
    query aggregate, not the data.
    """
    pending = queries
    results: list[DataFrame] = []
    r = ring
    while r <= max_ring:
        # cache the round (consumed by done_q, survivors, pending), cut the
        # survivors'/pending's lineage with an eager localCheckpoint (both
        # are <= n_queries x k rows — tiny next to the candidate join), then
        # unpersist immediately: at most ONE round's candidates are cached
        # at a time instead of accumulating executor-memory leaks per round
        res = knn_kring(points, pending, k, r, cell_w, cell_h, salt).cache()
        done_q = res.filter(F.col("exact")).select("qid").distinct()
        results.append(res.join(done_q, "qid", "left_semi").localCheckpoint())
        pending = pending.join(done_q, "qid", "left_anti").localCheckpoint()
        res.unpersist()
        if pending.isEmpty():
            break
        r *= 2
    else:
        # give up on the guarantee for pathological queries: brute-force rest
        results.append(
            knn_brute(points, pending, k).withColumn("exact", F.lit(True))
        )
    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out


# ---------------------------------------------------------------------------
# kNN over REAL H3 cells (the north rule's wording verbatim: "kNN via H3
# k-ring expansion with a salted sort-merge fallback for hot cells")
# ---------------------------------------------------------------------------

import math as _math

# Conservative global H3 cell-size bounds in radians at resolution r, from
# the gnomonic geometry of functions/h3_encode.py: lattice spacing is one
# plane unit u = RES0_U_GNOMONIC / sqrt(7)^r; the plane->sphere scale factor
# ranges [cos^2(vertex angle), 1] = [0.631, 1]. Hex inradius_plane = 0.5,
# circumradius_plane = 1/sqrt(3).
_H3_RES0_U = 0.38196601125010500003
_H3_DISTORT_MIN = 0.631


def _h3_unit_rad(res: int) -> float:
    return _H3_RES0_U / (7.0 ** (res / 2.0))


def h3_min_inradius_deg(res: int) -> float:
    return _math.degrees(0.5 * _h3_unit_rad(res) * _H3_DISTORT_MIN)


def h3_max_circumradius_deg(res: int) -> float:
    return _math.degrees(_h3_unit_rad(res) / _math.sqrt(3.0))


def h3_max_disc_deg(res: int) -> float:
    """Largest search disc the cover sampler accepts at ``res`` (the
    (2*63+1)^2 = 16129-sample budget); beyond it, coarsen the resolution or
    brute-force (knn_h3_exact does the latter automatically)."""
    step = h3_min_inradius_deg(res) / _math.sqrt(2.0) * 0.99
    return (63 * step - h3_max_circumradius_deg(res)) / 1.05


class CoverBudgetExceeded(ValueError):
    """Raised by banded_lon_offsets BEFORE expanding the sample arrays when
    the count would exceed the caller's budget (so a hemisphere-at-res-8
    attempt costs a counts sum, not a multi-GB allocation)."""

    def __init__(self, total: int):
        self.total = total
        super().__init__(f"cover sampler needs {total} samples")


def banded_lon_offsets(
    lat_rows, arc_half, step: float, base_half_deg: float = 0.0,
    max_samples: int | None = None,
):
    """Per-latitude-ROW lon sample offsets for superset cell covers.

    One shared implementation of the r4 sampling fix (ADVICE r3 #1/#5):
    scaling every row's lon spacing by a single cos(lat) under-samples rows
    nearer the equator than the reference latitude. Each row instead uses
    its own +-``step`` band: spacing from the band's largest cos (tightest
    constraint), east-west extent from its smallest (widest reach), capped
    at the full circle. ``arc_half`` is the per-row half-extent in ARC
    degrees (divided by the band cos); ``base_half_deg`` a latitude-
    independent extra half-extent in LON degrees (e.g. a bbox's own span).

    Returns (row_index, lon_offset) arrays: sample i sits at latitude
    ``lat_rows[row_index[i]]`` and longitude ``center + lon_offset[i]``.
    Used by knn's disc cover and spatial_join.h3_polyfill — a sampling fix
    here fixes both."""
    lat_rows = np.asarray(lat_rows, dtype=np.float64)
    arc_half = np.broadcast_to(np.asarray(arc_half, dtype=np.float64), lat_rows.shape)
    band_abs = np.abs(lat_rows)
    c_hi = np.cos(np.radians(np.clip(band_abs - step, 0.0, 89.95)))
    c_lo = np.maximum(np.cos(np.radians(np.minimum(band_abs + step, 89.95))), 1e-9)
    dl = step / c_hi
    halfw = np.minimum(base_half_deg + arc_half / c_lo, 180.0)
    counts = np.ceil(2.0 * halfw / dl).astype(np.int64) + 1
    total = int(counts.sum())
    if max_samples is not None and total > max_samples:
        raise CoverBudgetExceeded(total)
    ridx = np.repeat(np.arange(len(lat_rows)), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total) - np.repeat(starts, counts)
    return ridx, -halfw[ridx] + within * dl[ridx]


def _h3_disc_cells_col(qlon, qlat, res: int, disc_deg: float):
    """array<long> of H3 cells guaranteed to cover the equirectangular disc
    of radius ``disc_deg`` around each query point.

    Cover construction (no neighbor tables needed): every cell intersecting
    the disc has its center within R = 1.05*disc + max_circumradius of the
    query; a sample grid with spacing <= min_inradius/sqrt(2) puts at least
    one sample inside every such cell's inradius disk; encoding the samples
    and deduplicating therefore yields a superset of the intersecting
    cells. Whole Arrow batch encoded in ONE vectorized call.
    """
    from pyspark.sql import types as T

    R = 1.05 * disc_deg + h3_max_circumradius_deg(res)
    step = h3_min_inradius_deg(res) / _math.sqrt(2.0) * 0.99
    n_side = int(_math.ceil(R / step))
    if (2 * n_side + 1) ** 2 > 16384:
        raise ValueError(
            f"disc {disc_deg} deg needs {(2*n_side+1)**2} samples per query "
            f"at res {res}; use a coarser resolution for discs this large"
        )
    offs = np.arange(-n_side, n_side + 1, dtype=np.float64) * step  # lat rows

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _cover(lon: pd.Series, lat: pd.Series) -> pd.Series:
        from simple_osm_queries_spark.functions import h3_encode as E

        if not len(lon):
            return pd.Series([], dtype=object)
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        # Per-latitude-ROW lon sampling (same fix as h3_polyfill, ADVICE r3):
        # scaling every row's lon offsets by the single query-latitude cos
        # under-samples rows nearer the equator than the query. Each row uses
        # its own band cos: spacing from the band's largest cos, extent from
        # its smallest. Queries close enough to a pole for the extent to wrap
        # are routed to brute force by knn_h3 before this UDF runs.
        sample_lon: list[np.ndarray] = []
        sample_lat: list[np.ndarray] = []
        totals: list[int] = []
        for i in range(len(lo)):
            rows = la[i] + offs
            half_arc = np.sqrt(np.maximum(R * R - offs * offs, 0.0))
            try:
                ridx, lon_off = banded_lon_offsets(
                    rows, half_arc, step, max_samples=65536
                )
            except CoverBudgetExceeded as e:
                raise ValueError(
                    f"disc {disc_deg} deg at lat {la[i]:.2f} needs {e.total} "
                    f"samples per query at res {res}; use a coarser "
                    "resolution for discs this large"
                ) from None
            total = len(ridx)
            sample_lon.append(lo[i] + lon_off)
            sample_lat.append(np.clip(rows[ridx], -89.9, 89.9))
            totals.append(total)
        cells = E.lnglat_to_cell(
            np.concatenate(sample_lon), np.concatenate(sample_lat), res
        ).view(np.int64)
        out: list[list[int]] = []
        pos = 0
        for t in totals:
            out.append(np.unique(cells[pos : pos + t]).tolist())
            pos += t
        return pd.Series(out)

    return _cover(qlon, qlat)


def _knn_brute_equirect(points: DataFrame, queries: DataFrame, k: int | None) -> DataFrame:
    """Exact kNN under the same equirect (cos-scaled) metric knn_h3 ranks by;
    the fallback for discs the cover sampler can't serve (pole-adjacent
    queries, outgrown discs). Always ``exact``."""
    q = queries.select(
        "qid",
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        (F.lit(k) if k is not None else F.col("k")).alias("k"),
    )
    cand = points.select("id", "lon", "lat").crossJoin(F.broadcast(q))
    coslat = F.cos(F.radians(F.col("qlat")))
    dx = (F.col("lon") - F.col("qlon")) * coslat
    dy = F.col("lat") - F.col("qlat")
    cand = cand.withColumn("dist2", dx * dx + dy * dy)
    return (
        _topk(cand)
        .select("qid", "id", "lon", "lat", "dist2", "rank")
        .withColumn("exact", F.lit(True))
    )


def knn_h3(
    points: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    res: int = 8,
    disc_deg: float | None = None,
    salt: int = 1,
    cell_col: str | None = None,
) -> DataFrame:
    """kNN via H3 cell cover: points are keyed by their real H3 cell at
    ``res``; each query explodes to the cells covering its search disc, the
    two sides equi-join on the cell id, and a per-query top-k ranks by
    local-meter (equirectangular) distance. ``exact`` reports the disc
    guarantee: true iff >= k candidates were found and the k-th lies inside
    the disc. Hot cells: AQE skew splitting by default; ``salt`` > 1
    pre-salts the point side like knn_kring.

    Queries whose padded disc reaches a pole (where the cover's lon extent
    wraps the full circle and the sampler can't bound its sample count) are
    split off and answered by the exact equirect brute path (ADVICE r3 #5).

    ``cell_col``: name of a PRECOMPUTED res-``res`` H3 column on ``points``
    (e.g. the cells-CLI layout's ``h3``) — skips the per-call re-encode and,
    on a cell-partitioned/sorted layout, lets the cover join prune
    partitions/row groups.
    """
    if disc_deg is None:
        disc_deg = 2.0 * h3_max_circumradius_deg(res)
    polar_cut = 89.5 - (1.05 * disc_deg + h3_max_circumradius_deg(res))
    # one tiny agg (query side is small by contract) instead of an
    # isEmpty + two filters: the common no-polar case pays a single job and
    # reuses `queries` untouched, and knn_h3_exact's per-round calls don't
    # recompute the query plan three times
    max_abs_lat = queries.agg(F.max(F.abs(F.col("lat")))).first()[0]
    if max_abs_lat is not None and float(max_abs_lat) >= polar_cut:
        polar = queries.filter(F.abs(F.col("lat")) >= F.lit(polar_cut))
        rest = queries.filter(F.abs(F.col("lat")) < F.lit(polar_cut))
        return knn_h3(points, rest, k, res, disc_deg, salt, cell_col).unionByName(
            _knn_brute_equirect(points, polar, k)
        )
    q = queries.select(
        "qid",
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        (F.lit(k) if k is not None else F.col("k")).alias("k"),
    )
    qcells = q.withColumn(
        "cell", F.explode(_h3_disc_cells_col(F.col("qlon"), F.col("qlat"), res, disc_deg))
    )
    pts = points.select(
        "id", "lon", "lat",
        (F.col(cell_col) if cell_col is not None
         else C.cell_h3(F.col("lon"), F.col("lat"), res)).alias("cell"),
    )
    if salt > 1:
        qcells = qcells.withColumn(
            "__salt", F.explode(F.array(*[F.lit(s) for s in range(salt)]))
        )
        pts = pts.withColumn("__salt", F.pmod(F.col("id"), F.lit(salt)).cast("int"))
        cand = pts.join(F.broadcast(qcells), ["cell", "__salt"]).drop("__salt")
    else:
        cand = pts.join(F.broadcast(qcells), "cell")
    coslat = F.cos(F.radians(F.col("qlat")))
    dx = (F.col("lon") - F.col("qlon")) * coslat
    dy = F.col("lat") - F.col("qlat")
    cand = cand.withColumn("dist2", dx * dx + dy * dy)
    found = _topk(cand)
    w_all = Window.partitionBy("qid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        found.withColumn("__maxd", F.max("dist2").over(w_all))
        .withColumn("__n", F.count("*").over(w_all))
        .withColumn(
            "exact",
            (F.col("__n") >= F.col("k")) & (F.col("__maxd") <= F.lit(disc_deg**2)),
        )
        .select("qid", "id", "lon", "lat", "dist2", "rank", "exact")
    )


def knn_h3_exact(
    points: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    res: int = 8,
    disc_deg: float | None = None,
    max_doublings: int = 6,
    salt: int = 1,
) -> DataFrame:
    """Doubling driver loop over ``knn_h3`` (same shape as knn_kring_exact):
    re-query only the still-inexact queries with a doubled disc; brute-force
    the pathological remainder."""
    if disc_deg is None:
        disc_deg = 2.0 * h3_max_circumradius_deg(res)
    pending = queries
    results: list[DataFrame] = []
    d = disc_deg
    brute_rest = False
    for _ in range(max_doublings):
        if d > h3_max_disc_deg(res):
            brute_rest = True  # disc outgrew the cover sampler: brute-force
            break
        res_df = knn_h3(points, pending, k, res, d, salt).cache()
        done_q = res_df.filter(F.col("exact")).select("qid").distinct()
        results.append(res_df.join(done_q, "qid", "left_semi").localCheckpoint())
        pending = pending.join(done_q, "qid", "left_anti").localCheckpoint()
        res_df.unpersist()
        if pending.isEmpty():
            break
        d *= 2
    else:
        brute_rest = True
    if brute_rest:
        results.append(_knn_brute_equirect(points, pending, k))
    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out
