"""Shared persisted-intermediate tracking.

Operators persist() plans their output consumes 2-3 times; Spark has no
unpersist-on-materialize hook, so the persisted handles ride on the
returned DataFrame and long-lived drivers (web server, notebooks) release
them after materializing the result. One protocol, used by the dedup
family and the PBF reader alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def track_persisted(result: DataFrame, handles: list[DataFrame]) -> DataFrame:
    """Attach persisted intermediates to the returned plan for cleanup."""
    result._soq_persisted = handles  # type: ignore[attr-defined]
    return result


def unpersist_intermediates(result: DataFrame) -> None:
    """Release cached intermediates attached by track_persisted (safe to
    call after the result has been materialized; no-op otherwise)."""
    for h in getattr(result, "_soq_persisted", []):
        h.unpersist()
