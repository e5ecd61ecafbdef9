"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark query
and the oracle SQL on the same parquet tables, sort columns by name, compare
order-insensitive values."""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:  # decimal → float-ish string
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    spark_cols = sorted(spark_df.columns)
    spark_rows = sorted(
        tuple(_norm(row[c]) for c in spark_cols) for row in spark_df.collect()
    )
    ora = con.execute(oracle_sql)
    ora_cols = [d[0] for d in ora.description]
    order = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
    ora_sorted_cols = sorted(ora_cols)
    ora_rows = sorted(tuple(_norm(r[i]) for i in order) for r in ora.fetchall())

    if spark_cols != ora_sorted_cols:
        return False, f"schema mismatch: spark={spark_cols} oracle={ora_sorted_cols}"
    if len(spark_rows) != len(ora_rows):
        return False, f"row count: spark={len(spark_rows)} oracle={len(ora_rows)}"
    for i, (a, b) in enumerate(zip(spark_rows, ora_rows)):
        if a != b:
            return False, f"row {i}: spark={a!r} oracle={b!r}"
    return True, f"ok ({len(spark_rows)} rows)"
