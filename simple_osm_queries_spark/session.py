"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the configs are chosen so the same code path
works on a multi-executor cluster (AQE on, skew-join splitting on, Arrow on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "simple_osm_queries_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` means ``local[*]``. On a real cluster, callers pass a
    builder-less spark-submit session instead; these configs are also safe
    as ``--conf`` flags there.
    """
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (cores if cores else os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # allow shuffled-hash join where its size conditions hold (guide
        # §3.1): the dedup/LSH bucket self-joins and candidate joins are
        # equi-joins of mid-sized tables where SMJ's two 16M-row sorts are
        # pure overhead (measured: 1M-doc minhash bucket join 3.4 -> 2.7 s
        # warm). Per-partition build sides stay small (rows/shuffle
        # partitions); AQE skew splitting still applies.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # fork Python workers from a daemon that has numpy/pandas/pyarrow
        # preloaded (see pydaemon.py): first-Python-stage cost at
        # local[32] drops ~9 s -> ~1 s; no behavior change
        .config("spark.python.daemon.module", "simple_osm_queries_spark.pydaemon")
        # make THIS package importable in python workers regardless of the
        # launch cwd: both the daemon module above and the operator UDF
        # bodies (which import from the package on the worker) need it on
        # the worker PYTHONPATH; merged with pyspark's own paths
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p for p in (
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                ) if p
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SOQ_DRIVER_MEM", "8g"))
        # wide whole-stage-codegen methods (e.g. a literal polygon catalog's
        # unrolled ray cast) exceed HotSpot's 8KB DontCompileHugeMethods
        # threshold and would run interpreted — measured 13x slower; lifting
        # the limit lets the JIT compile them (standard Spark prod setting)
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        # Iceberg catalog for the build_index(backend="iceberg") path.
        # Declaring the catalog is harmless without the jar (it only fails
        # on first use); WITH iceberg-spark-runtime-4.x on the classpath the
        # writeTo/overwritePartitions path below is live. Probe with
        # index.build.iceberg_available(spark).
        .config("spark.sql.catalog.soq_iceberg", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.soq_iceberg.type", "hadoop")
        .config(
            "spark.sql.catalog.soq_iceberg.warehouse",
            os.environ.get("SOQ_ICEBERG_WAREHOUSE", "/tmp/soq_iceberg_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
