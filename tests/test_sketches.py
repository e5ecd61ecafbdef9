"""Sketch operators: HLL / count-min / Bloom invariants and plan shapes.

Oracle parity for the graded queries is covered by test_oracle_parity
(auto-parametrized); here we pin the sketch-specific contracts — the
integer-exact state, the one-sided error guarantees, and the broadcast
probe plans that make the sketches cheap at scale.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from helixdb_spark.operators import sketches
from helixdb_spark.sources import load_table
from tests.test_plan_quality import plan_of


def _py_hll_state(keys):
    """Reference HLL register state computed in plain Python."""
    regs: dict[int, int] = {}
    for key in keys:
        h = hashlib.md5(str(key).encode()).hexdigest()
        reg = int(h[:2], 16)
        w = int(h[2:14], 16)
        rho = 49 - w.bit_length() if w > 0 else 49
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["register"]: r["max_rho"]
        for r in sketches.hll_registers(ev, "user_id").collect()
    }
    want = _py_hll_state(r["user_id"] for r in ev.select("user_id").collect())
    assert got == want


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """HLL with m=256 has ~6.5% standard error; assert a generous 4-sigma
    envelope so the test checks the algorithm, not the noise."""
    ev = load_table(spark, sf_dir, "events")
    row = sketches.hll_distinct(ev, "event_id").collect()[0]
    exact = row["exact_distinct"]
    assert abs(row["estimate"] - exact) <= 0.26 * exact + 2


def test_cms_never_undercounts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = sketches.cms_heavy_hitters(ev, "user_id", top_n=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_cms_probe_is_broadcast_hash_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = plan_of(sketches.cms_heavy_hitters(ev, "user_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_no_false_negatives_and_counts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    row = sketches.bloom_probe_summary(
        orders, "o_custkey", customer, "c_custkey"
    ).collect()[0]
    assert row["false_negatives"] == 0  # Bloom's one-sided guarantee
    assert row["probed"] == customer.count()
    assert (
        row["true_members"]
        == orders.select("o_custkey").distinct().join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).count()
    )
    assert row["bloom_positive"] >= row["true_members"]


def test_bloom_probe_side_never_shuffles(spark, sf_dir):
    """The probe side must consume the bitset via broadcast: no Exchange may
    sit between the customer scan and the probe evaluation. The only
    exchanges in the whole plan belong to building the (≤ m row) bit set
    and the membership ground truth, plus the final single-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    df = sketches.bloom_probe_summary(orders, "o_custkey", customer, "c_custkey")
    plan = plan_of(df)
    # probe rows reach the final agg through broadcast joins only (the
    # collected bitset via nested-loop broadcast, membership ground truth
    # via broadcast hash); a sort-merge join would mean the probe side
    # shuffled. The only shuffle exchanges are on the tiny build sides —
    # bit-position distinct, bitset gather, members distinct — plus the
    # final single-row aggregate.
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 4


def test_hll_registers_single_shuffle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = plan_of(sketches.hll_registers(ev, "user_id"))
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "partial_max" in plan  # map-side combine


def test_hll_merges_register_states(spark, sf_dir):
    """Sketch state is mergeable: union-then-sketch == sketch-then-max —
    the property that lets 1000 executors each fold locally and merge."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("user_id") % 2 == 0)
    b = ev.where(F.col("user_id") % 2 == 1)
    whole = {
        (r["register"], r["max_rho"])
        for r in sketches.hll_registers(ev, "user_id").collect()
    }
    merged_df = (
        sketches.hll_registers(a, "user_id")
        .unionByName(sketches.hll_registers(b, "user_id"))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    merged = {(r["register"], r["max_rho"]) for r in merged_df.collect()}
    assert whole == merged


def test_histogram_quantile_estimates_bracket_exact(spark, sf_dir):
    """The interpolated estimate must land within one bin width of the
    exact percentile — the sketch's deterministic error bound."""
    from helixdb_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    vmin, vmax = ev.agg(F.min("value"), F.max("value")).first()
    width = (vmax - vmin) / sketches.HIST_BINS
    for r in sketches.histogram_quantiles(ev, "value").collect():
        assert abs(r["estimate"] - r["exact"]) <= width + 1e-6, r


def test_histogram_single_small_shuffle(spark, sf_dir):
    """The histogram build is the only data-sized shuffle; everything after
    operates on ≤ bins rows."""
    from helixdb_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    hist_rows = (
        sketches.histogram_quantiles(ev, "value").count()
    )
    assert hist_rows == 3  # one row per requested quantile


def test_engine_approx_key_count(spark, tmp_path):
    from helixdb_spark.engine import HelixOptions, HelixSpark

    db = HelixSpark.open(
        spark,
        str(tmp_path / "db"),
        HelixOptions(rick_range=1000, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put([(t, f"key{k}".encode(), b"v") for t in range(50) for k in range(40)])
    exact = db.user_keys().count()
    approx = db.approx_key_count()
    assert exact == 40
    assert abs(approx - exact) <= 0.3 * exact + 2
    db.close()


def test_hll_sliding_full_window_equals_global_sketch(spark):
    # With window_days >= the whole span, the LAST day's sliding estimate
    # must equal the single global sketch over all rows (register max is
    # associative, so the frame union degenerates to the full union).
    import datetime

    from pyspark.sql import functions as F

    from helixdb_spark.operators import sketches as sk

    rows = [
        (datetime.datetime(2024, 1, 1 + d, 12, 0), f"u{i % 37}")
        for d in range(3)
        for i in range(40 * (d + 1))
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user string")
    sliding = sk.hll_sliding_estimate_by_day(df, "ts", "user", window_days=30)
    last = sliding.orderBy(F.desc("key_name")).first()
    glob = sk.hll_estimate(sk.hll_registers(df, "user"), "g").first()
    assert last["sum_scaled"] == glob["sum_scaled"]
    assert last["estimate"] == glob["estimate"]
