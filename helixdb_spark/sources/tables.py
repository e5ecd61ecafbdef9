"""Loaders for the driver's deterministic parquet corpus (TESTDATA.md).

All reads are plain ``spark.read.parquet`` so Catalyst owns pushdown/pruning;
no schema inference happens at read time (parquet carries its schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from helixdb_spark.operators.util import ensure_session_tuned

    ensure_session_tuned(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). How it arrives depends on
        # the session that reads it: with spark.sql.legacy.parquet.nanosAsLong
        # it is long nanoseconds; a default Spark 4 session reads it as
        # TIMESTAMP_NTZ (micros-truncated). Normalize both to TimestampType
        # (micros, UTC session) so every downstream plan — unix_micros()
        # included, which rejects NTZ — sees one type, matching what DuckDB
        # sees when it reads the same file.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_entries(
    spark: SparkSession, path: str, fmt: str = "parquet", **options: str
) -> DataFrame:
    """Read KV entries from any Spark-supported format into the engine's
    entry shape (ts long, key binary, value binary) — the connector surface
    the reference lacks (its only format is its own rick log, SURVEY.md
    §2.1). Text formats (csv/json) carry key/value as UTF-8 strings and are
    encoded to binary here; parquet may carry binary natively.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if fmt in ("csv", "json"):
        schema = "ts long, key string, value string"
        reader = spark.read.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", "true")
        df = getattr(reader.options(**options), fmt)(path)
        return df.select(
            "ts",
            F.encode("key", "utf-8").alias("key"),
            F.encode("value", "utf-8").alias("value"),
        )
    df = spark.read.options(**options).format(fmt).load(path)
    out = []
    for name, want in (("ts", T.LongType()), ("key", T.BinaryType()), ("value", T.BinaryType())):
        col = F.col(name)
        if df.schema[name].dataType != want:
            col = (
                F.encode(col.cast("string"), "utf-8")
                if isinstance(want, T.BinaryType)
                else col.cast(want)
            )
        out.append(col.alias(name))
    return df.select(*out)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so SQL-surface queries work
    (SURVEY.md §7.1 phase 6 — the analytics layer the reference lacks)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
