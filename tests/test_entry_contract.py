"""Driver-contract sanity: entry() runs, every oracle key has a query, and a
sample of queries executes at sf0.001. (The full Spark-vs-DuckDB comparison
is tools/check_oracles.py — too slow for the unit suite.)"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # the vast majority must be SQL-checked
    assert len(os_) >= 0.75 * len(qs)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"id", "lon", "lat", "tags"} <= set(df.columns)


def test_sample_queries_run(spark):
    qs = entry_mod.queries()
    for name in ["osm_flagship", "knn_kring", "dedup_ngram_jaccard", "lang_id"]:
        df = qs[name](spark, SF)
        assert df.count() >= 0
