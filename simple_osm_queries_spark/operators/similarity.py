"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``     — brute-force exact top-k against one query vector:
  column-math dot/norm (F.zip_with + F.aggregate, JVM-side) then a global
  top-k. Exact baseline; scans everything but never shuffles more than k
  rows per partition (Spark's TakeOrdered).
* ``cosine_topk_ann`` — LSH-bucketed approximate variant (the scale path):
  candidates share a hyperplane-signature band with the query, exact cosine
  re-rank on candidates only. Probes a bounded fraction of the table.
* ``knn_join``        — k nearest rows of B for every row of A (brute,
  broadcast B) — the embedding analogue of operators/knn.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simple_osm_queries_spark.operators.dedup import (
    cosine_col,
    dot_col,
    hyperplane_signature_col,
    norm_col,
)


def _qvec_lit(qvec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in qvec])


def cosine_topk(
    df: DataFrame, qvec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    q = _qvec_lit(qvec)
    scored = df.select(
        F.col(id_col),
        cosine_col(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _chunks(sig_col, sig_bits: int, chunks: int):
    width = sig_bits // chunks
    mask = (1 << width) - 1
    return [
        F.shiftright(sig_col, c * width).bitwiseAND(F.lit(mask)).alias(f"chunk_{c}")
        for c in range(chunks)
    ]


def cosine_topk_ann(
    df: DataFrame,
    qvec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sig_bits: int = 32,
    chunks: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidate = shares >=1 signature chunk with the
    query. Recall < 1 by design; precision exact on candidates."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.choice([-1.0, 1.0], size=(sig_bits, dim))
    qsig = 0
    q = np.asarray(qvec, dtype=np.float64)
    for b in range(sig_bits):
        if float(planes[b] @ q) > 0:
            qsig |= 1 << b
    width = sig_bits // chunks
    mask = (1 << width) - 1
    qchunks = [(qsig >> (c * width)) & mask for c in range(chunks)]

    sig = hyperplane_signature_col(F.col(vec_col), dim, sig_bits, seed)
    with_sig = df.select(F.col(id_col), F.col(vec_col), sig.alias("sig"))
    cond = None
    for c in range(chunks):
        this = (
            F.shiftright(F.col("sig"), c * width).bitwiseAND(F.lit(mask)) == F.lit(qchunks[c])
        )
        cond = this if cond is None else (cond | this)
    cands = with_sig.filter(cond)
    scored = cands.select(
        F.col(id_col),
        cosine_col(F.col(vec_col).cast("array<double>"), _qvec_lit(qvec)).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each left row, the k nearest right rows by cosine (broadcast right)."""
    l = left.select(F.col(left_id).alias("qid"), F.col(vec_col).alias("qvec"))
    r = right.select(F.col(right_id).alias("id"), F.col(vec_col).alias("vec"))
    cand = (
        l.crossJoin(F.broadcast(r))
        .filter(F.col("qid") != F.col("id"))  # before ranking: self must not eat a slot
        .withColumn(
            "cosine",
            cosine_col(F.col("qvec").cast("array<double>"), F.col("vec").cast("array<double>")),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "cosine", "rank")
    )


__all__ = [
    "cosine_topk",
    "cosine_topk_ann",
    "knn_join",
    "cosine_col",
    "dot_col",
    "norm_col",
]
