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
