"""Extra optimization benchmarks (round 6) — NOT part of the driver contract.

Isolates the expensive operators the driver's BENCH_r05.json flagged at
sf=1.0 scale, per guide §1: label jobs, time cold+warm, capture
explain("formatted") to plans/r06/. The ngram/minhash fixtures mimic the
driver's sf1.0 documents table (10x sf0.1 row count, same vocabulary) by
replicating /root/testdata/sf0.1 docs with disjoint doc_id ranges.

Usage:
  python bench_extra.py ngram            # ngram_jaccard at 50k docs
  python bench_extra.py components      # 1M-doc minhash pairs -> components
  python bench_extra.py minhash         # 1M-doc minhash
  python bench_extra.py suite            # sf0.1-suite spot checks
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from simple_osm_queries_spark.caching import unpersist_intermediates  # noqa: E402
from simple_osm_queries_spark.operators import dedup  # noqa: E402
from simple_osm_queries_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF01 = "/root/testdata/sf0.1"
DOCS50K = "/tmp/soq_opt_docs50k.parquet"
PLANS = Path(__file__).resolve().parent / "plans" / "r06"


def spark_session():
    return get_spark(
        "soq-bench-extra",
        cores=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )


def ensure_docs50k(spark):
    """sf1.0-shaped documents table: sf0.1 replicated 10x with disjoint ids
    (same ~30-word vocabulary => the shingle df distribution scales the way
    the driver's generator would)."""
    if os.path.exists(os.path.join(DOCS50K, "_SUCCESS")):
        return spark.read.parquet(DOCS50K)
    base = spark.read.parquet(f"{SF01}/documents.parquet")
    n = base.count()
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * n)) for i in range(10)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(CPUS * 2).write.mode("overwrite").parquet(DOCS50K)
    return spark.read.parquet(DOCS50K)


def timed(spark, name, fn, reps=3):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    fn()
    cold = time.time() - t0
    warm = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        warm.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"[{name}] cold={cold:.2f}s warm_min={min(warm):.2f}s warm={['%.2f' % w for w in warm]}",
          flush=True)
    return cold, min(warm)


def save_plan(df, fname):
    PLANS.mkdir(parents=True, exist_ok=True)
    (PLANS / fname).write_text(df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"))
    print(f"  plan -> plans/r06/{fname}", flush=True)


def run_ngram(spark, tag="", plan_suffix=None):
    docs = ensure_docs50k(spark)

    def make():
        return dedup.ngram_jaccard_pairs(docs, threshold=0.5)

    if plan_suffix:
        save_plan(make(), f"ngram_jaccard_{plan_suffix}.txt")
    dfs = []

    def run():
        df = make()
        dfs.append(df)
        n = df.count()
        return n

    timed(spark, f"ngram_jaccard 50k {tag}", run)
    print("  result rows:", dfs[0].count(), flush=True)
    for d in dfs:
        unpersist_intermediates(d)


def run_minhash(spark, tag="", plan_suffix=None):
    ddir = "/tmp/soq_bench_docs_1000000"
    if not os.path.exists(os.path.join(ddir, "_SUCCESS")):
        print("1M docs fixture missing; run bench.py once first", flush=True)
        return
    docs = spark.read.parquet(ddir)

    def make():
        return dedup.minhash_near_dups(docs, threshold=0.5)

    if plan_suffix:
        save_plan(make(), f"minhash_lsh_{plan_suffix}.txt")
    dfs = []

    def run():
        df = make()
        dfs.append(df)
        df.count()

    timed(spark, f"minhash 1M {tag}", run, reps=2)
    for d in dfs:
        unpersist_intermediates(d)


def run_components(spark, tag="", plan_suffix=None):
    ddir = "/tmp/soq_bench_docs_1000000"
    docs = spark.read.parquet(ddir)
    mh = dedup.minhash_near_dups(docs, threshold=0.5)
    pairs = mh.select("id_a", "id_b").localCheckpoint()
    unpersist_intermediates(mh)

    def run():
        return dedup.connected_components(pairs).count()

    timed(spark, f"components 1M {tag}", run, reps=2)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ngram"
    spark = spark_session()
    tag = sys.argv[2] if len(sys.argv) > 2 else ""
    plan_suffix = sys.argv[3] if len(sys.argv) > 3 else None
    if which == "ngram":
        run_ngram(spark, tag, plan_suffix)
    elif which == "minhash":
        run_minhash(spark, tag, plan_suffix)
    elif which == "components":
        run_components(spark, tag, plan_suffix)
    spark.stop()


if __name__ == "__main__":
    main()
