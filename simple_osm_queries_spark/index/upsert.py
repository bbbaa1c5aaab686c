"""Partition-scoped incremental upsert into the cell-partitioned index.

The reference can only re-import from scratch (/root/reference/src/
importing/import.go:17-163 — the grid is write-once); at 100 TB a full
rebuild for a daily OSM diff is absurd. This module maintains the layout
``index/build.py`` writes WITHOUT an external table format: an upsert
rewrites exactly the partition directories its delta touches (Spark's
dynamic partition overwrite — the same mechanism the band builder uses for
idempotent restarts) and records an atomic manifest for lineage, so the
incremental path keeps the north rule's per-partition lineage + resume
story.

Semantics (OSM-diff shaped):
* a delta row REPLACES the stored row with the same id (tags changed,
  position changed — including across partitions);
* unseen ids are inserts;
* ``deletes`` removes ids entirely.

The tag dictionary (sources/tag_index.py) is additive-only metadata — run
``build_tag_index`` over just the delta and fold it in with
``tag_index.merge_tag_index``; entries for deleted rows are harmless
vocabulary (the reference never removes dictionary entries either).

Moved/deleted rows live in partitions the delta's own partition values do
not name, so affected partitions are found by an id lookup against the
stored index — a TWO-COLUMN (id, partition) scan, column-pruned at the
parquet reader. That scan is the honest cost of upsert without a secondary
index; pipelines running frequent small diffs should maintain the
(id, partition) projection as its own compact table and pass it via
``id_lookup``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _affected_partitions(
    index_df: DataFrame,
    delta: DataFrame,
    touched_ids: DataFrame,
    id_col: str,
    partition_col: str,
    id_lookup: DataFrame | None,
) -> list:
    """Distinct partition values touched by the upsert: every partition a
    delta row lands in, plus every partition currently holding a delta or
    deleted id (covers moves and deletes)."""
    lookup = (
        id_lookup.select(id_col, partition_col)
        if id_lookup is not None
        else index_df.select(id_col, partition_col)
    )
    # touched ids are diff-sized by the operator's nature — broadcast
    # explicitly (createDataFrame/localCheckpoint sides carry no size
    # stats, and an unbidden SMJ here shuffles the whole projection)
    old_parts = lookup.join(
        F.broadcast(touched_ids), id_col, "left_semi"
    ).select(partition_col)
    parts = (
        delta.select(partition_col).unionByName(old_parts).distinct().collect()
    )
    return sorted(r[0] for r in parts)


def upsert_index(
    spark: SparkSession,
    out_path: str,
    delta: DataFrame,
    delta_fingerprint: str,
    deletes: DataFrame | None = None,
    id_col: str = "id",
    partition_col: str = "cell_x",
    files_per_cell: int = 16,
    id_lookup: DataFrame | None = None,
) -> dict:
    """Apply ``delta`` (and optional ``deletes`` of (id) rows) to the index
    at ``out_path``, rewriting ONLY the affected partition directories.

    Returns a report dict; also written as an atomic manifest under
    ``_upserts/`` (idempotence: a manifest whose fingerprint matches
    short-circuits the whole upsert — same protocol as the band builder).

    Durability: the dynamic-overwrite commit swaps each affected partition
    directory (write staging files, delete old, move new). A hard crash
    inside that window can lose an affected partition's SURVIVOR rows —
    and unlike a band build, an upsert cannot recompute them from source.
    Run upserts against storage with its own versioning/snapshots (or keep
    the previous index snapshot until the manifest lands) when the index
    is the only copy of the data.
    """
    report = {"affected_partitions": 0, "rows_written": 0, "skipped": False, "t_sec": 0.0}
    t0 = time.time()
    mdir = os.path.join(out_path, "_upserts")
    os.makedirs(mdir, exist_ok=True)
    # fingerprints are caller strings (the CLI default embeds a PATH) — the
    # manifest filename is a digest; the raw fingerprint lives in the json
    fp_digest = hashlib.sha256(delta_fingerprint.encode()).hexdigest()[:24]
    mpath = os.path.join(mdir, f"{fp_digest}.json")
    if os.path.exists(mpath):
        report["skipped"] = True
        report["t_sec"] = time.time() - t0
        return report

    data_path = os.path.join(out_path, "data")
    index_df = spark.read.parquet(data_path)
    idx_types = {f.name: f.dataType.simpleString() for f in index_df.schema.fields}
    delta_types = {f.name: f.dataType.simpleString() for f in delta.schema.fields}
    if delta_types != idx_types:
        raise ValueError(
            f"delta schema {sorted(delta_types.items())} != index schema "
            f"{sorted(idx_types.items())} (names AND types must match — a "
            "coerced union would write mixed parquet schemas across partitions)"
        )

    # contract enforcement (diff-sized jobs, both checks are cheap):
    # deletes WIN over delta rows for the same id ("removes ids entirely"),
    # and duplicate ids within one delta are rejected — silently writing
    # both versions would break the index's id uniqueness
    if deletes is not None:
        delta = delta.join(F.broadcast(deletes.select(id_col)), id_col, "left_anti")
    # the delta lineage feeds the dup check, both touched-id broadcasts, and
    # the rewrite union — persist once (diff-sized) instead of 4 evaluations;
    # try/finally so the raise/early-return paths release the cache too
    delta = delta.persist()
    try:
        return _apply(
            spark, report, t0, data_path, mpath, delta, deletes, delta_fingerprint,
            id_col, partition_col, files_per_cell, id_lookup, index_df,
        )
    finally:
        delta.unpersist()


def _apply(
    spark, report, t0, data_path, mpath, delta, deletes, delta_fingerprint,
    id_col, partition_col, files_per_cell, id_lookup, index_df,
) -> dict:
    dup = (
        delta.groupBy(id_col).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "delta contains duplicate ids — resolve to one row per id "
            "(e.g. keep the latest version) before upserting"
        )
    touched_ids = delta.select(id_col)
    if deletes is not None:
        touched_ids = touched_ids.unionByName(deletes.select(id_col))

    parts = _affected_partitions(
        index_df, delta, touched_ids, id_col, partition_col, id_lookup
    )
    if not parts:
        report["t_sec"] = time.time() - t0
        return report

    # survivors in the affected partitions: partition-pruned read, minus
    # every touched id (replaced rows and deletes alike), plus the delta.
    # Reading the same path the dynamic overwrite replaces is safe WITHIN
    # the write job (task reads happen before the commit swaps partition
    # directories) — but any OTHER DataFrame created over the index before
    # the upsert holds a stale file listing afterwards; re-read after.
    old_kept = index_df.filter(F.col(partition_col).isin(parts)).join(
        F.broadcast(touched_ids), id_col, "left_anti"
    )
    new_rows = old_kept.unionByName(delta.select(*old_kept.columns))

    from simple_osm_queries_spark.index.build import cluster_for_write

    clustered = cluster_for_write(new_rows, partition_col, files_per_cell)
    # persist: consumed by the count, the surviving-partition list, AND the
    # write — without it the whole rewrite pipeline computes three times
    clustered = clustered.persist()
    n = clustered.count()
    surviving = {
        r[0] for r in clustered.select(partition_col).distinct().collect()
    }
    (
        clustered.write.mode("overwrite")
        # dynamic overwrite replaces exactly the affected partition
        # directories; every other directory's files are untouched
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(data_path)
    )
    clustered.unpersist()
    # dynamic overwrite only rewrites partitions PRESENT in the output — an
    # affected partition whose survivor set is EMPTY (all rows deleted or
    # moved away) must be dropped explicitly, or its stale directory keeps
    # serving the old rows (and a moved row would exist twice)
    from urllib.parse import quote

    for p in parts:
        if p not in surviving:
            # partition directory names escape special chars the way Spark
            # does (URL-style); try the raw form first for the common
            # integer columns, then the escaped form
            for val in (str(p), quote(str(p), safe="")):
                d = os.path.join(data_path, f"{partition_col}={val}")
                if os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)
                    break
    report["affected_partitions"] = len(parts)
    report["rows_written"] = n
    report["t_sec"] = time.time() - t0
    tmp = mpath + f".{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "delta_fingerprint": delta_fingerprint,
                "partitions": [str(p) for p in parts],
                "rows_written": n,
                "duration_sec": report["t_sec"],
            },
            f,
        )
    os.replace(tmp, mpath)
    return report
