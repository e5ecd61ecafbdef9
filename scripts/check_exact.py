"""Exact-value (no rounding slack) oracle comparison for selected queries —
a stricter local rehearsal of the driver's value-hash than tests/oracle_utils
(which rounds floats to 6dp). Usage:

    python scripts/check_exact.py [sf_dir] [query ...]

Runs each query under several shuffle-partition counts to prove the result is
partition-order independent, then compares repr-exact values to the DuckDB
oracle.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from tests.oracle_utils import TABLES

import duckdb
from pyspark.sql import SparkSession


def exact_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(row[c]) for c in cols) for row in df.collect())


def oracle_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in cur.fetchall())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or ["emb_covariance"]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )

    fail = 0
    for name in names:
        per_parts = {}
        for parts in (3, 7, 32):
            spark = (
                SparkSession.builder.master("local[8]")
                .config("spark.sql.shuffle.partitions", str(parts))
                .config("spark.sql.adaptive.enabled", "false")
                .appName(f"exact-{parts}")
                .getOrCreate()
            )
            per_parts[parts] = exact_rows(queries[name](spark, sf_dir))
            spark.stop()
        base = per_parts[3]
        stable = all(v == base for v in per_parts.values())
        orows = oracle_rows(con, oracles[name]) if name in oracles else None
        match = orows == base if orows is not None else None
        print(f"{name}: partition-stable={stable} oracle-exact-match={match}")
        if not stable or match is False:
            fail += 1
            if orows is not None:
                diffs = [
                    (a, b) for a, b in zip(base, orows) if a != b
                ][:5]
                for a, b in diffs:
                    print(f"  spark={a}\n  oracle={b}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
