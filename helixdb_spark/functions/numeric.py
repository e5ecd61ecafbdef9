"""Overflow-bounded integer moment algebra (r9 VERDICT #7).

The exact-sum discipline used across the events/pipeline rows keeps
aggregation sums in int64 so partition order cannot move a bit. Its
hazard is the MOMENT products (y*y, x*y, n*syy): at adversarial volumes
(daily centi-sums ~1e7+ over years) those exceed 2^63, where ANSI Spark
and DuckDB raise loudly and non-ANSI Spark silently wraps — the
wrong-vs-error divergence flagged in r8/r9 ADVICE for the
ACF/periodogram/ANOVA/OLS family. This module is the ONE place that
decides: stay int64 when the worst case provably fits (exact,
order-independent), fall back to double otherwise (order-dependent only
in the last ulp, which the rows' round(.., 6) quantization absorbs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT64_MAX = (1 << 63) - 1


def int64_sum_product_fits(
    max_abs_a: int, max_abs_b: int, max_terms: int
) -> bool:
    """True iff ``sum over <= max_terms of a*b`` provably fits int64 for
    |a| <= max_abs_a, |b| <= max_abs_b — checked in unbounded Python int
    arithmetic, so the predicate itself cannot overflow."""
    if max_abs_a < 0 or max_abs_b < 0 or max_terms < 0:
        raise ValueError("bounds must be non-negative")
    return max_abs_a * max_abs_b * max_terms <= INT64_MAX


def bounded_moment_sum(
    a: Column,
    b: Column,
    max_abs_a: int,
    max_abs_b: int,
    max_terms: int,
) -> Column:
    """``sum(a*b)`` with the representation chosen by the PROVEN bound:
    int64 (exact, partition-order independent) when
    ``max_abs_a * max_abs_b * max_terms <= 2^63 - 1``, else double
    (the products form on doubles BEFORE summing, so no intermediate
    ever overflows — the ev_changepoint/ACF discipline). Callers pass
    worst-case magnitudes they can defend (a domain cap, a quantization
    bound, a calendar-bounded term count); the helper guarantees the
    chosen path cannot raise or wrap at those volumes."""
    if int64_sum_product_fits(max_abs_a, max_abs_b, max_terms):
        return F.sum(a.cast("long") * b.cast("long")).cast("long")
    return F.sum(a.cast("double") * b.cast("double"))


def bounded_square_sum(
    y: Column, max_abs_y: int, max_terms: int
) -> Column:
    """``sum(y*y)`` under the same proof rule — the syy/q moment of the
    ANOVA/ACF/periodogram/OLS family."""
    return bounded_moment_sum(y, y, max_abs_y, max_abs_y, max_terms)
