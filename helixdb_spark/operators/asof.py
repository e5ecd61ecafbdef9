"""As-of (most-recent-match) join — an operator Spark lacks natively.

The reference's closest analog is its point probe into a time-compressed
chunk (reference src/level.rs:486-509), which is exact-match only; a true
as-of lookup ("value at or before t") is the natural generalization for a
time-series store and is implemented here as a composition of built-in ops:

    union(left tagged, right tagged)
      → window last(right_payload, ignorenulls) over
        partitionBy(keys).orderBy(ts, side) rows unbounded-preceding..current
      → filter left rows

One shuffle on (keys), no pandas, no row-at-a-time Python: at 100 TB this is
a single sort-within-partition pass, and skewed keys are handled by AQE. The
alternative (`applyInPandas` + ``pd.merge_asof`` per key) serializes every
row through Arrow — kept out deliberately.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the ``right_values`` of the right row with
    the greatest ``right_ts`` <= ``left_ts`` within the same ``on`` group
    (backward as-of, inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics). Left rows with no prior right row keep nulls."""
    on = list(on)
    left_cols = left.columns

    right_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in right_values]).alias("_payload"),
        F.lit(0).alias("_side"),
    )
    # carry left columns as typed nulls on the right side so the union aligns
    left_types = dict(left.dtypes)
    for c in left_cols:
        if c not in on:
            right_tagged = right_tagged.withColumn(c, F.lit(None).cast(left_types[c]))

    left_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(right_tagged.schema["_payload"].dataType).alias("_payload"),
        F.lit(1).alias("_side"),
    )
    unioned = left_tagged.unionByName(right_tagged.select(*left_tagged.columns))

    # right rows (side 0) sort before left rows at equal ts → inclusive match
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
