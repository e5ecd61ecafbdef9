"""Bucketed range (interval/band) join.

Spark executes a join whose condition is *only* a range predicate
(``point BETWEEN lo AND hi``) as BroadcastNestedLoopJoin — O(|L|·|R|)
comparisons, a non-starter at 100 TB. The standard scale pattern (same idea
as Databricks' range-join optimization and interval joins in Flink) is to
coarsen both sides onto a bucket grid:

1. points get bucket ``floor(point / width)``;
2. each interval explodes to every bucket it overlaps
   (``sequence(floor(lo/w), floor(hi/w))`` — cheap when ``width`` is chosen
   near the typical interval length, so intervals span O(1) buckets);
3. equi-join on the bucket (hash shuffle, AQE-friendly, skew-saltable);
4. re-check the exact range predicate to discard grid false positives.

The reference has no joins at all (SURVEY.md §2.3); its closest analog is
time-level routing of a timestamp into the level whose range contains it
(reference src/types/level_info.rs:98-111) — which is exactly this
bucket-grid idea applied to one point at a time.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    extra_keys: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (both ends inclusive), optionally also matching on
    ``extra_keys`` equi-columns, without a nested-loop plan.

    ``bucket_width`` trades replication for selectivity: an interval
    produces ``(hi-lo)/width + 1`` bucket rows, a point exactly one. Pick it
    near the typical interval width. Column names must be disjoint between
    the two inputs (standard join hygiene).
    """
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    on: Column = p[_BUCKET] == i[_BUCKET]
    for k in extra_keys or ():
        on = on & (p[k] == i[k])
    refined = p.join(i, on, how).where(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    dup = list(extra_keys or ())
    return refined.drop(p[_BUCKET]).drop(i[_BUCKET]).drop(
        *[i[k] for k in dup]
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
    extra_keys: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Join interval rows on **overlap** (``l_lo <= r_hi AND r_lo <= l_hi``,
    closed ends) without a nested loop: both sides explode to the bucket
    grid, equi-join on the bucket, re-check the exact predicate.

    A pair that shares several buckets would match once per shared bucket;
    instead of a (shuffling) ``distinct``, each pair is attributed to its
    FIRST shared bucket — ``max(floor(l_lo/w), floor(r_lo/w))`` — so exactly
    one joined row survives per overlapping pair, for free. Same plan
    shape at 100 TB as the point-range join above: hash shuffle on the
    bucket key, AQE-friendly, skew-saltable.
    """
    lb = F.floor(F.col(l_lo) / F.lit(float(bucket_width))).cast("long")
    rb = F.floor(F.col(r_lo) / F.lit(float(bucket_width))).cast("long")
    lhb = F.floor(F.col(l_hi) / F.lit(float(bucket_width))).cast("long")
    rhb = F.floor(F.col(r_hi) / F.lit(float(bucket_width))).cast("long")
    lx = left.withColumn(_BUCKET, F.explode(F.sequence(lb, lhb)))
    rx = right.withColumn(_BUCKET, F.explode(F.sequence(rb, rhb)))
    keys = [_BUCKET, *(extra_keys or [])]
    first_shared = F.greatest(
        F.floor(F.col(l_lo) / F.lit(float(bucket_width))).cast("long"),
        F.floor(F.col(r_lo) / F.lit(float(bucket_width))).cast("long"),
    )
    return (
        lx.join(rx, keys)
        .where(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col(_BUCKET) == first_shared)
        )
        .drop(_BUCKET)
    )
