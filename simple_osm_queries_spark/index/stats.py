"""Index observability: per-partition layout stats and commit history.

At 100 TB the first question about an index is never a query — it is
"how fragmented is it, how skewed, what changed last night". The
reference has no maintenance surface at all (write-once grid,
/root/reference/src/importing/import.go); these are the read-only
counterparts of `index/compact.py` and `index/upsert.py`:

* ``index_stats``  — one row per partition directory: file count, bytes,
  min/max/avg file size (driver-side Hadoop listStatus per partition —
  the same O(partitions) metadata cost as the compaction planner — then
  ``createDataFrame`` so the result composes with joins/filters). Pass
  ``include_rows=True`` to add exact per-partition row counts (one
  column-pruned scan; parquet count reads footers, not data).
* ``index_history`` — one row per committed manifest: version, kind
  (build upserts have none, compactions say 'compact'), partitions
  touched, rows written, duration, gc state. The audit log of the
  snapshot protocol.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_osm_queries_spark.index import fsio
from simple_osm_queries_spark.index.upsert import (
    _applied_manifests,
    _data_path,
)


def index_stats(
    spark: SparkSession,
    out_path: str,
    partition_col: str = "cell_x",
    include_rows: bool = False,
) -> DataFrame:
    """Per-partition layout stats of the index at ``out_path``."""
    data = _data_path(out_path)
    prefix = f"{partition_col}="
    rows = []
    for name in fsio.fs_listdir(spark, data):
        if not name.startswith(prefix):
            continue
        files = [
            sz
            for f, sz in fsio.fs_list_files(spark, os.path.join(data, name))
            if not f.startswith(("_", "."))
        ]
        if not files:
            continue
        # unquote like compaction_plan (ADVICE r5): directory names carry
        # URL-escaped partition values for string columns; the raw suffix
        # would miss the include_rows join and leave n_rows NULL
        from urllib.parse import unquote

        raw = unquote(name[len(prefix):])
        rows.append(
            (
                raw,
                len(files),
                sum(files),
                min(files),
                max(files),
                float(sum(files)) / len(files),
            )
        )
    out = spark.createDataFrame(
        rows,
        f"{partition_col} string, n_files int, bytes long, "
        "min_file_bytes long, max_file_bytes long, avg_file_bytes double",
    )
    if include_rows:
        counts = (
            spark.read.parquet(data)
            .groupBy(F.col(partition_col).cast("string").alias(partition_col))
            .count()
            .withColumnRenamed("count", "n_rows")
        )
        out = out.join(counts, partition_col, "left")
    return out


def index_history(spark: SparkSession, out_path: str) -> DataFrame:
    """Commit audit log: one row per applied manifest, version order."""
    rows = [
        (
            int(m.get("version", 0)),
            m.get("kind", "upsert"),
            m.get("digest", ""),
            m.get("delta_fingerprint", ""),
            len(m.get("partitions", [])),
            int(m.get("rows_written", 0)),
            float(m.get("duration_sec", 0.0)),
            bool(m.get("gc", False)),
        )
        for m in _applied_manifests(spark, out_path)
    ]
    return spark.createDataFrame(
        rows,
        "version int, kind string, digest string, fingerprint string, "
        "n_partitions int, rows_written long, duration_sec double, "
        "gc boolean",
    )
