"""Temporal operators Spark lacks natively: as-of join and sessionization.

Both are shuffle-minimal compositions of built-in operators (no UDFs):

* ``asof_join`` — for each left row, the latest right row with the same key
  and right_ts <= left_ts. Implemented with the UNION + last_value trick:
  tag both sides, union, and carry the most recent right payload forward
  with a running window per key — ONE shuffle on (key), no per-row probe
  join. This beats the per-group ``pd.merge_asof`` pattern (no Python, no
  per-group materialization) and the naive range join (quadratic).
* ``sessionize`` — gap-based sessions per key: a new session starts when
  the gap from the previous event exceeds ``gap``; session_id = running
  count of session starts (lag + cumsum). Same single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + the payload of the latest right row at-or-before left_ts.

    Tie rules: a right row with right_ts == left_ts IS visible to that left
    row (rights sort before lefts at equal timestamps); among right rows
    sharing the same timestamp, the one with the largest ``right_tiebreak``
    wins (pass one for deterministic results when right timestamps collide).

    The payload is carried as ONE struct with a single last(ignorenulls) —
    never per-column: per-column carry could mix values from different right
    rows when the latest right row holds NULL in one payload column but an
    earlier row doesn't. The struct is non-null whenever a right row exists,
    so the whole payload is taken atomically from exactly that row (NULLs
    inside it stay NULL, as a join would produce).
    """
    from pyspark.sql import types as T

    tb = right_tiebreak
    payload_type = T.StructType([right.schema[c] for c in payload])
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # lefts after rights at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *([F.lit(None).cast(right.schema[tb].dataType).alias("__tb")] if tb else []),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *([F.col(tb).alias("__tb")] if tb else []),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tb:
        order.append(F.col("__tb").asc_nulls_last())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__side",
        "__l",
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__p"),
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__p")[c].alias(c) for c in payload],
    )
    return out


def sessionize(
    df: DataFrame, key: str, ts: str, gap_seconds: int
) -> DataFrame:
    """Assign gap-based session ids per key (1-based, in time order)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col(ts).cast("double") - prev.cast("double") > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_session).over(w_run))


def session_stats(
    df: DataFrame, key: str, ts: str, gap_seconds: int
) -> DataFrame:
    """Per-session rollup: event count + duration + bounds."""
    s = sessionize(df, key, ts, gap_seconds)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(F.col(ts).cast("double")) - F.min(F.col(ts).cast("double"))).alias(
            "duration_sec"
        ),
    )
