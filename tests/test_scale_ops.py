"""Tests for the scale-pattern operators: bucketed shuffle-free joins,
salted aggregation/join correctness, and the plan properties they exist
to guarantee."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from helixdb_spark.operators import scale


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    scale.write_bucketed(left, "t_bleft", ["k"], 8, sorted_by=["k"])
    scale.write_bucketed(right, "t_bright", ["k"], 8, sorted_by=["k"])
    joined = spark.table("t_bleft").join(spark.table("t_bright"), "k")
    plan = plan_of(joined)
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    assert joined.count() == 500
    # same join without bucketing DOES shuffle — the pattern is the point
    unbucketed = left.join(right, "k")
    assert "Exchange" in plan_of(unbucketed)


def test_salted_agg_matches_plain(spark):
    # skewed: 90% of rows share key 0
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    salted = scale.salted_agg(df, ["k"], {"v": "sum"}, num_salts=8)
    plain = df.groupBy("k").agg(F.sum("v").alias("v_sum"))
    a = {(r["k"], r["v_sum"]) for r in salted.collect()}
    b = {(r["k"], r["v_sum"]) for r in plain.collect()}
    assert a == b


def test_salted_agg_count_min_max(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    salted = scale.salted_agg(df, ["k"], {"v": "count"}, num_salts=4)
    got = {(r["k"], r["v_count"]) for r in salted.collect()}
    want = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k").agg(F.count("v").alias("cnt")).collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark, no_broadcast):
    left = spark.range(2000).select(
        F.when(F.col("id") % 5 < 4, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("a"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("b")
    )
    salted = scale.salted_join(left, right, ["k"], num_salts=4)
    plain = left.join(right, "k")
    a = {(r["k"], r["a"], r["b"]) for r in salted.collect()}
    b = {(r["k"], r["a"], r["b"]) for r in plain.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark, no_broadcast):
    left = spark.range(50).select(F.col("id").alias("k"), F.col("id").alias("a"))
    right = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("b"))
    out = scale.salted_join(left, right, ["k"], num_salts=3, how="left")
    assert out.count() == 50
    assert out.where(F.col("b").isNull()).count() == 40


# ------------------------------------------------------ bucketed range join
def test_bucketed_range_join_matches_nested_loop(spark):
    from helixdb_spark.operators.rangejoin import bucketed_range_join

    points = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 1.5).alias("x")
    )
    # overlapping intervals of varied width, some spanning many buckets
    intervals = spark.range(30).select(
        F.col("id").alias("iid"),
        (F.col("id") * 9.0).alias("lo"),
        (F.col("id") * 9.0 + (F.col("id") % 4) * 25.0 + 5.0).alias("hi"),
    )
    got = bucketed_range_join(
        points, intervals, "x", "lo", "hi", bucket_width=10.0
    )
    want = points.join(
        intervals, F.col("x").between(F.col("lo"), F.col("hi"))
    )
    g = {(r["pid"], r["iid"]) for r in got.collect()}
    w = {(r["pid"], r["iid"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_bucketed_range_join_inclusive_bounds_and_extra_keys(spark):
    from helixdb_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 10.0)], "pid int, k string, x double"
    )
    intervals = spark.createDataFrame(
        [(100, "a", 10.0, 20.0), (200, "b", 15.0, 30.0)],
        "iid int, k string, lo double, hi double",
    )
    got = bucketed_range_join(
        points, intervals, "x", "lo", "hi", bucket_width=7.0, extra_keys=["k"]
    )
    pairs = {(r["pid"], r["iid"]) for r in got.collect()}
    # both ends inclusive; key 'b' point at 10.0 misses [15,30]
    assert pairs == {(1, 100), (2, 100)}
    assert got.columns.count("k") == 1


def test_bucketed_range_join_plan_has_no_nested_loop(spark, sf_dir):
    from helixdb_spark.plans import events

    df = events.ev_value_band_join(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_matches_nested_loop(spark):
    """Exactly one row per overlapping pair (first-shared-bucket
    attribution), identical to the brute-force inequality join — including
    pairs spanning many buckets and touching endpoints."""
    from helixdb_spark.operators.rangejoin import interval_overlap_join

    left = spark.range(40).select(
        F.col("id").alias("lid"),
        (F.col("id") * 7.0).alias("l_lo"),
        (F.col("id") * 7.0 + (F.col("id") % 5) * 23.0).alias("l_hi"),
    )
    right = spark.range(25).select(
        F.col("id").alias("rid"),
        (F.col("id") * 11.0).alias("r_lo"),
        (F.col("id") * 11.0 + 16.0).alias("r_hi"),
    )
    got = interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", bucket_width=10.0
    ).collect()
    want = left.join(
        right,
        (F.col("l_lo") <= F.col("r_hi")) & (F.col("r_lo") <= F.col("l_hi")),
    ).collect()
    g = [(r["lid"], r["rid"]) for r in got]
    w = {(r["lid"], r["rid"]) for r in want}
    assert len(g) == len(set(g)), "pair emitted more than once"
    assert set(g) == w and len(w) > 0


def test_interval_overlap_join_plan_is_equi(spark, sf_dir):
    from helixdb_spark.plans import events

    df = events.ev_session_overlap(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# -------------------------------------------------- connected components
def test_connected_components_transitive_closure(spark):
    from helixdb_spark.operators.dedup import connected_components

    # two chains (1-2-3-4, 10-11) and an isolated pair (20,21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_bloom_filtered_join_matches_plain_join(spark, sf_dir):
    from helixdb_spark.operators.scale import bloom_filtered_join
    from helixdb_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    got = bloom_filtered_join(li, urgent, "l_orderkey", "o_orderkey")
    want = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"])
    assert got.count() == want.count() > 0
    g = got.agg(F.sum("l_extendedprice")).first()[0]
    w = want.agg(F.sum("l_extendedprice")).first()[0]
    assert abs(g - w) < 1e-6


def test_bloom_filtered_join_filters_map_side(spark, sf_dir):
    """The might_contain probe must sit on the fact side BELOW the join —
    rows are dropped before the shuffle, which is the whole point."""
    from helixdb_spark.operators.scale import bloom_filtered_join
    from helixdb_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    df = bloom_filtered_join(li, urgent, "l_orderkey", "o_orderkey")
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # build side folds into or-ed words; probe is k broadcast HASH joins on
    # the word index (never a nested loop / never a scan of the filter)
    assert "bit_or" in plan
    assert plan.count("BroadcastHashJoin") >= 5
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the bit-test Filter exists on the fact side (scratch cols are dropped
    # only after the filter), so non-matching fact rows die before the
    # exact join
    assert "__bm0" in plan


def test_zorder_value_interleaves():
    from pyspark.sql import SparkSession

    from helixdb_spark.operators.scale import zorder_value

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long").select(
        zorder_value(F.col("a"), F.col("b"), bits=3).alias("z")
    )
    # a=101, b=011 -> bit pairs (b2 a2)(b1 a1)(b0 a0) = (01)(10)(11) = 0b011011
    assert df.first()["z"] == 0b011011


def test_zorder_layout_prunes_2d_boxes(spark, sf_dir, tmp_path):
    """The z-ordered copy must (a) hold identical data and (b) let a 2-D box
    predicate skip most files on parquet footer stats, where a 1-D sort
    layout cannot skip on the second dimension."""
    import pyarrow.parquet as pq

    from helixdb_spark.operators.scale import write_zordered
    from helixdb_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    zpath = str(tmp_path / "z")
    write_zordered(
        ev, zpath, "user_id", lo_u, hi_u + 1, "value", lo_v, hi_v, num_files=16
    )

    zdf = spark.read.parquet(zpath)
    assert zdf.count() == ev.count()
    assert zdf.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]

    # box: middle quarter of both dimensions
    u_mid = (lo_u + hi_u) / 2
    v_mid = (lo_v + hi_v) / 2
    u_box = (u_mid - (hi_u - lo_u) / 8, u_mid + (hi_u - lo_u) / 8)
    v_box = (v_mid - (hi_v - lo_v) / 8, v_mid + (hi_v - lo_v) / 8)

    import glob as _glob

    touched = total = 0
    for f in _glob.glob(f"{zpath}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        fu_min = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        fu_max = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        fv_min = min(md.row_group(i).column(2).statistics.min for i in range(md.num_row_groups))
        fv_max = max(md.row_group(i).column(2).statistics.max for i in range(md.num_row_groups))
        total += 1
        if fu_min <= u_box[1] and u_box[0] <= fu_max and fv_min <= v_box[1] and v_box[0] <= fv_max:
            touched += 1
    assert total >= 8
    # a 2-D box covering 1/16 of the plane should prune well over half the
    # files; linear layout touches all files on at least one dimension
    assert touched <= total // 2, (touched, total)

    # and the query over the layout is transparent
    got = zdf.where(
        F.col("user_id").between(*u_box) & F.col("value").between(*v_box)
    ).count()
    want = ev.where(
        F.col("user_id").between(*u_box) & F.col("value").between(*v_box)
    ).count()
    assert got == want


# ------------------------------------------------------ skew-stress evidence
def _hot_key_df(spark, n_hot=90_000, n_cold=10_000):
    """Pathological reduce-key skew: one key owns 90% of the rows."""
    hot = spark.range(n_hot).selectExpr("'HOT' AS k", "id AS v")
    cold = spark.range(n_cold).selectExpr("concat('c', id % 997) AS k", "id AS v")
    return hot.unionAll(cold)


def _max_partition_rows(df, *cols, parts=16):
    counts = (
        df.repartition(parts, *cols)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def test_salting_spreads_hot_key_partitions(spark):
    """The measured skew claim behind salted_agg/salted_join: hashing the
    hot key alone pins ~90% of rows on one reduce partition; adding the
    deterministic row-hash salt to the partitioning key spreads the hot
    group, dropping the max-partition load >=4x (here close to the 16x
    partition-count bound)."""
    df = _hot_key_df(spark)
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(32)).alias("_salt")
    unsalted_max = _max_partition_rows(df, "k")
    salted_max = _max_partition_rows(df.withColumn("_salt", salt), "k", "_salt")
    assert unsalted_max >= 90_000  # the hot key really did pin one partition
    assert unsalted_max / salted_max >= 4, (unsalted_max, salted_max)


def test_salted_agg_oracle_equal_under_hot_key(spark):
    df = _hot_key_df(spark)
    got = {
        r["k"]: (r["v_sum"], r["v_count"], r["v_min"], r["v_max"])
        for r in scale.salted_agg(
            df, ["k"], {"v": "sum"} | {}, num_salts=32
        ).join(
            scale.salted_agg(df, ["k"], {"v": "count"}, num_salts=32), "k"
        ).join(
            scale.salted_agg(df, ["k"], {"v": "min"}, num_salts=32), "k"
        ).join(
            scale.salted_agg(df, ["k"], {"v": "max"}, num_salts=32), "k"
        ).collect()
    }
    want = {
        r["k"]: (r["v_sum"], r["v_count"], r["v_min"], r["v_max"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("v_sum"),
            F.count("v").alias("v_count"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .collect()
    }
    assert got == want
    assert got["HOT"][1] == 90_000


def test_salted_join_oracle_equal_under_hot_key(spark, no_broadcast):
    left = _hot_key_df(spark, n_hot=30_000, n_cold=5_000)
    right = (
        left.select("k").distinct().withColumn("tag", F.length("k"))
    )
    got = sorted(
        (r["k"], r["v"], r["tag"])
        for r in scale.salted_join(left, right, ["k"], num_salts=8).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect()
    )
    assert got == want and len(got) == 35_000


def test_salted_and_bloom_joins_reject_unsafe_how(spark):
    df = spark.range(4).selectExpr("id AS k", "id AS v")
    with pytest.raises(ValueError, match="unsupported"):
        scale.salted_join(df, df, ["k"], how="full")
    with pytest.raises(ValueError, match="unsupported"):
        scale.salted_join(df, df, ["k"], how="right")
    with pytest.raises(ValueError, match="unsupported"):
        scale.bloom_filtered_join(df, df, "k", "k", how="left")
    with pytest.raises(ValueError, match="unsupported"):
        scale.bloom_filtered_join(df, df, "k", "k", how="left_anti")
