"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf dir, compare
row count, column names, and the order-insensitive multiset of values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    return str(v)


# -- type-faithful schema compare ------------------------------------------
# The driver's value hash is type-sensitive: a DuckDB HUGEINT (sum/agg over
# ints -> arrow decimal128) hashes differently from Spark's BIGINT even when
# values stringify identically (VERDICT r01 "What's wrong" #1). Compare type
# *categories* so the local gate predicts the driver's result.

def _arrow_category(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_category(t.value_type)}>"
    return str(t)


def _spark_category(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_category(dt.elementType)}>"
    return dt.simpleString()


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from simple_osm_queries_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    unknown_oracles = set(os_) - set(qs)
    assert not unknown_oracles, f"oracle_sql keys without queries: {unknown_oracles}"

    import time

    failures = []
    total_t0 = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        spark_sec = time.time() - t0
        # release operator-tracked persisted intermediates (dedup family):
        # 50 entries in one session would otherwise stack cached plans
        from simple_osm_queries_spark.caching import unpersist_intermediates

        unpersist_intermediates(sdf)
        scols = sdf.columns
        if name not in os_:
            print(f"  {name:28s} rows-only: {len(srows)} rows [{spark_sec:.1f}s]")
            continue
        t0 = time.time()
        drel = con.sql(os_[name])
        dtab = drel.arrow()
        duck_sec = time.time() - t0
        drows = [tuple(r.values()) for r in dtab.to_pylist()]
        dcols = dtab.schema.names
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA spark={scols} duck={dcols}")
        else:
            stypes = {f.name: _spark_category(f.dataType) for f in sdf.schema.fields}
            dtypes = {f.name: _arrow_category(f.type) for f in dtab.schema}
            mism = {c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]}
            if mism:
                status.append(f"TYPES spark-vs-duck {mism}")
        if len(srows) != len(drows):
            status.append(f"COUNT spark={len(srows)} duck={len(drows)}")
        if not status:
            a, b = _rowset(srows, scols), _rowset(drows, dcols)
            if a != b:
                diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
                diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
                status.append(f"VALUES spark-only={diff_a} duck-only={diff_b}")
        if status:
            failures.append(name)
            print(f"  {name:28s} FAIL  " + " | ".join(status))
        else:
            print(
                f"  {name:28s} OK    {len(srows)} rows"
                f" [spark {spark_sec:.1f}s, duck {duck_sec:.1f}s]"
            )

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass"
          f" ({len(os_)} SQL-checked, {len(qs) - len(os_)} rows-only)"
          f" in {time.time() - total_t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
