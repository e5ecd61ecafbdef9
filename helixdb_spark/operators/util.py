"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow input out to the session's full parallelism before
    CPU-heavy per-row stages (shingling, hashing, scoring, mapInPandas).

    At 100 TB the scan already arrives in thousands of partitions and this
    is a no-op; locally a small parquet file reads as ONE partition and
    would serialize every downstream stage onto one core. The round-robin
    exchange carries only the narrow projected columns, so its cost is
    bounded by the data the stage needed to read anyway.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
