"""Bit-exact oracle sweep: run every cataloged query in Spark AND its
DuckDB oracle, compare raw repr values (no lossy float formatting).

Stricter than the driver's hash gate can possibly be — if this passes,
any value-normalization the driver applies also matches. Usage:

    python tools/raw_oracle_sweep.py [sf_dir] [name ...]   # default sf0.01, all
"""

from __future__ import annotations

import datetime
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def norm(v):
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v + 0.0)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return repr([norm(x) for x in v])
    return repr(v)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    only = set(sys.argv[2:])
    if only:
        unknown = only - set(osql)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        osql = {n: s for n, s in osql.items() if n in only}

    bad = []
    for name, sql in sorted(osql.items()):
        sdf = qs[name](spark, sf_dir)
        order = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        s = sorted(tuple(norm(r[i]) for i in order) for r in sdf.collect())
        rel = con.sql(sql)
        dorder = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
        d = sorted(tuple(norm(r[i]) for i in dorder) for r in rel.fetchall())
        if s != d:
            bad.append(name)
            ds, dd = set(d), set(s)
            print(f"MISMATCH {name}")
            print("  spark-only:", [r for r in s if r not in ds][:2])
            print("  duck-only: ", [r for r in d if r not in dd][:2])
    print(f"checked {len(osql)} oracles at {sf_dir}: {len(bad)} mismatches {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
