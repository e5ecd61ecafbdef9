"""Data-quality validation: declarative rule checks over a table.

The dbt-test / Deequ-style gate a pipeline runs before promoting a batch:
every predicate rule folds into ONE aggregation pass over the table
(``sum(CASE WHEN NOT rule)`` per rule — a single scan regardless of rule
count, map-side combinable), and referential rules are broadcast
anti-joins. Output is a (rule, n_violations, n_checked) report — integer
exact, trivially oracle-checkable, and cheap enough at 100 TB to run on
every ingest.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One row per rule: how many rows violate it (NULL predicate counts as
    a violation — unknown is not a pass). Single scan, single 1-row
    aggregate, then an explode to the report rows."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
            ).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v{i}").cast("long").alias("n_violations"),
                F.col("__n").cast("long").alias("n_checked"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return row.select(F.explode(report).alias("r")).select(
        "r.rule", "r.n_violations", "r.n_checked"
    )


def check_foreign_key(
    df: DataFrame,
    key_col: str,
    dim: DataFrame,
    dim_key: str,
    rule_name: str | None = None,
) -> DataFrame:
    """Referential rule: rows whose ``key_col`` has no match in ``dim`` —
    a broadcast anti-join count (NULL keys violate)."""
    name = rule_name or f"{key_col}_references_{dim_key}"
    orphans = df.join(
        F.broadcast(dim.select(F.col(dim_key).alias("__dk")).distinct()),
        df[key_col] == F.col("__dk"),
        "left_anti",
    )
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(name).alias("rule"),
            F.col("n_violations").cast("long"),
            F.col("__n").cast("long").alias("n_checked"),
        )
    )
