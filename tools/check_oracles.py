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

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in os_:
            print(f"  {name:28s} rows-only: {len(srows)} rows")
            continue
        drel = con.sql(os_[name])
        drows = drel.fetchall()
        dcols = [d[0] for d in drel.description]
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA spark={scols} duck={dcols}")
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
            print(f"  {name:28s} OK    {len(srows)} rows")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass"
          f" ({len(os_)} SQL-checked, {len(qs) - len(os_)} rows-only)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
