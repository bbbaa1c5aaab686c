"""Streaming exact dedup — a custom stateful operator.

A continuously-arriving document/image stream must drop records whose
fingerprint was already admitted in ANY earlier micro-batch. Spark's
`dropDuplicates` on a stream keeps unbounded per-key state rows; this
operator instead shards fingerprints into a fixed number of state buckets
(`groupBy(bucket)`) and keeps one compact state object (the seen-set) per
bucket via ``applyInPandasWithState`` — bounded key cardinality, and the
bucket count = shuffle parallelism is an explicit scale knob.

The reference is batch-only (SURVEY.md §2.7); this is the streaming face of
operators/dedup.exact_dup_groups.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_exact(
    stream: DataFrame,
    fingerprint_col: str,
    num_buckets: int = 32,
    output_cols: list[str] | None = None,
) -> DataFrame:
    """Emit only first-seen rows per fingerprint, across micro-batches.

    Output schema: the requested ``output_cols`` (default: fingerprint col +
    all long/string columns of the input — applyInPandasWithState needs an
    explicit schema).
    """
    cols = output_cols or [
        f.name for f in stream.schema.fields if f.dataType.typeName() in ("long", "string")
    ]
    if fingerprint_col not in cols:
        cols = [fingerprint_col] + cols
    out_schema = ", ".join(
        f"{name} {stream.schema[name].dataType.simpleString()}" for name in cols
    )
    state_schema = "seen array<string>"

    def dedup_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh_mask = []
            for fp in pdf[fingerprint_col]:
                if fp in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(fp)
                    fresh_mask.append(True)
            out = pdf.loc[fresh_mask, cols]
            if len(out):
                yield out
        state.update((list(seen),))

    bucketed = stream.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(fingerprint_col)), F.lit(num_buckets))
    )
    return bucketed.groupBy("__bucket").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_bloom(
    stream: DataFrame,
    fingerprint_col: str,
    num_buckets: int = 32,
    bits_per_bucket: int = 1 << 20,
    num_hashes: int = 4,
    output_cols: list[str] | None = None,
) -> DataFrame:
    """Bounded-memory streaming dedup: Bloom-filter state per bucket.

    ``streaming_dedup_exact`` keeps every admitted fingerprint (state grows
    with DISTINCT count — exact, but unbounded on an infinite stream). This
    variant keeps a FIXED ``bits_per_bucket`` Bloom filter per bucket:
    memory is num_buckets * bits_per_bucket / 8 bytes forever, at the cost
    of a false-positive rate (a fresh row misjudged duplicate and dropped;
    never the reverse) of ~(1 - e^(-kn/m))^k — e.g. ~1e-4 at
    n/m = 1/32 fill with k=4. The standard trade for planet-scale streams.
    """
    import hashlib

    cols = output_cols or [
        f.name for f in stream.schema.fields if f.dataType.typeName() in ("long", "string")
    ]
    if fingerprint_col not in cols:
        cols = [fingerprint_col] + cols
    out_schema = ", ".join(
        f"{name} {stream.schema[name].dataType.simpleString()}" for name in cols
    )

    if bits_per_bucket < 8:
        raise ValueError("bits_per_bucket must be >= 8")
    nbytes = (bits_per_bucket + 7) // 8  # non-multiple-of-8 sizes round up

    def positions(fp) -> list[int]:
        # str() first: fingerprint columns may be long (ids) as well as str
        d = hashlib.md5(str(fp).encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        return [((h1 + i * h2) % (1 << 63)) % bits_per_bucket for i in range(num_hashes)]

    def dedup_fn(key, pdfs, state: GroupState):
        bits = bytearray(state.get[0]) if state.exists else bytearray(nbytes)
        for pdf in pdfs:
            fresh_mask = []
            for fp in pdf[fingerprint_col]:
                pos = positions(fp)
                seen = all(bits[p >> 3] & (1 << (p & 7)) for p in pos)
                if not seen:
                    for p in pos:
                        bits[p >> 3] |= 1 << (p & 7)
                fresh_mask.append(not seen)
            out = pdf.loc[fresh_mask, cols]
            if len(out):
                yield out
        state.update((bytes(bits),))

    bucketed = stream.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(fingerprint_col)), F.lit(num_buckets))
    )
    return bucketed.groupBy("__bucket").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="bits binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
