"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
engine-added analytics/pipeline operators, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted only for
genuinely non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary on sf0.001."""
    from helixdb_spark.plans import tpch

    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from helixdb_spark.plans import events, kv, media, pipeline, tpch

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(tpch.QUERIES)
    out.update(events.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(media.QUERIES)
    out.update(kv.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from helixdb_spark.plans import events, kv, media, pipeline, tpch

    out: dict[str, str] = {}
    out.update(tpch.ORACLES)
    out.update(events.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(media.ORACLES)
    out.update(kv.ORACLES)
    return out
