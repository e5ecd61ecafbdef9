"""Unit contracts for the graph (PageRank) and validation operators —
oracle parity for the graded queries is covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from helixdb_spark.operators.graph import pagerank
from helixdb_spark.operators.validate import check_foreign_key, check_rules


def test_pagerank_two_node_cycle(spark):
    """A↔B must converge to 0.5/0.5 regardless of damping."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert abs(ranks[1] - 0.5) < 1e-9
    assert abs(ranks[2] - 0.5) < 1e-9


def test_pagerank_sums_to_one_with_dangling(spark):
    """Node 3 has no out-edges; dangling redistribution must conserve
    total rank mass exactly (up to FP)."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    ranks = pagerank(edges, iterations=7).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-9
    by_node = {r["node"]: r["rank"] for r in ranks}
    # 3 receives from both and leaks back uniformly: strictly the largest
    assert by_node[3] > by_node[2] > 0
    assert by_node[3] > by_node[1]


def test_pagerank_weights_steer_rank(spark):
    """1 sends 9x more weight to 2 than to 3 — 2 must outrank 3."""
    edges = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, w double",
    )
    by_node = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight_col="w", iterations=8).collect()
    }
    assert by_node[2] > by_node[3]


def test_check_rules_counts_null_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, x double"
    )
    rows = {
        r["rule"]: (r["n_violations"], r["n_checked"])
        for r in check_rules(
            df, {"x_positive": F.col("x") > 0, "id_small": F.col("id") < 100}
        ).collect()
    }
    assert rows["x_positive"] == (2, 3)  # -5 and NULL both violate
    assert rows["id_small"] == (0, 3)


def test_check_foreign_key_orphans(spark):
    facts = spark.createDataFrame([(1,), (2,), (7,), (None,)], "k long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "dk long")
    row = check_foreign_key(facts, "k", dim, "dk").collect()[0]
    assert row["n_violations"] == 2  # 7 and NULL
    assert row["n_checked"] == 4


def test_triangle_counts_k4_plus_pendant(spark):
    """K4 (every node in 3 triangles) plus a pendant node (0 triangles);
    reversed and duplicated edges must canonicalize away."""
    from helixdb_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(b, a) for a, b in k4] + [(1, 5), (5, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: (r["deg"], r["n_triangles"])
        for r in triangle_counts(df).collect()
    }
    assert got == {1: (4, 3), 2: (3, 3), 3: (3, 3), 4: (3, 3), 5: (1, 0)}


def test_triangle_counts_no_triangles(spark):
    """A path graph has no triangles but every node is still reported."""
    from helixdb_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    rows = triangle_counts(df).collect()
    assert {r["node"] for r in rows} == {1, 2, 3, 4}
    assert all(r["n_triangles"] == 0 for r in rows)


def test_k_anonymity_flags_only_small_groups(spark):
    from helixdb_spark.plans.tpch import K_ANONYMITY, validate_k_anonymity
    import __spark_entry__ as entry

    qs = entry.queries()
    rows = qs["validate_k_anonymity"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "sf0.001 has 150 customers over 125 groups — risk must exist"
    assert all(r["group_size"] < K_ANONYMITY for r in rows)


def test_attribution_weights_hand_computed(spark, monkeypatch):
    """3 touches before one purchase: 0.4 / 0.2 / 0.4 of the value, order
    by time; a second purchase with one touch credits 100%."""
    import datetime as dt

    from helixdb_spark.plans import events as evp

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(eid, t_off_s, typ, user, value):
        return (eid, base + dt.timedelta(seconds=t_off_s), user, typ, value, "{}")

    data = [
        mk(1, 0, "click", 7, 0.0),
        mk(2, 60, "view", 7, 0.0),
        mk(3, 120, "click", 7, 0.0),
        mk(4, 300, "purchase", 7, 100.0),
        mk(5, 0, "view", 8, 0.0),
        mk(6, 200, "purchase", 8, 50.0),
        mk(7, 999999, "click", 9, 0.0),  # no purchase follows in-window
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    monkeypatch.setattr(evp, "load_table", lambda s, d, t: df)
    got = {r["touch_type"]: r for r in evp.ev_attribution(spark, "ignored").collect()}
    # clicks: 0.4*100 (first) + 0.4*100 (last) = 80; views: 0.2*100 + 1.0*50 = 70
    assert got["click"]["credited_value"] == 80.0
    assert got["view"]["credited_value"] == 70.0
    assert got["click"]["n_touches"] == 2 and got["view"]["n_touches"] == 2
    assert got["click"]["n_purchases"] == 1 and got["view"]["n_purchases"] == 2


def test_rolling_corr_perfect_linear(spark, monkeypatch):
    """y = 2x daily series -> corr exactly 1 once the window has 2+ days."""
    import datetime as dt

    from helixdb_spark.plans import events as evp

    rows = []
    eid = 0
    for d in range(5):
        for i in range(d + 1):  # x = d+1 events on day d
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 1, 0, 0), 1, "click",
                 2.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    monkeypatch.setattr(evp, "load_table", lambda s, d, t: df)
    out = evp.ev_rolling_corr(spark, "ignored").collect()
    assert out[0]["rolling_corr"] is None  # 1-day window
    for r in out[1:]:
        assert abs(r["rolling_corr"] - 1.0) < 1e-6


def test_kcore_peels_to_clique(spark):
    """K5 with a pendant path attached: the 4-core is exactly the K5 (the
    path nodes peel away over the fixed rounds, cascading)."""
    from helixdb_spark.operators.graph import kcore_peel

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tail = [(4, 5), (5, 6), (6, 7)]  # chain hanging off the clique
    edges = spark.createDataFrame(k5 + tail, "src int, dst int")
    core = {r["node"]: r["core_deg"] for r in kcore_peel(edges, k=4, rounds=3).collect()}
    assert core == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # k=5 peels everything (K5 max degree is 4)
    assert kcore_peel(edges, k=5, rounds=3).count() == 0


def test_kcore_cascade_needs_rounds(spark):
    """A chain into a triangle: each round peels one more chain node —
    rounds=1 leaves chain remnants, rounds=3 reaches the stable 2-core."""
    from helixdb_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 2)], "src int, dst int"
    )  # path 0-1-2 into triangle {2,3,4}
    one = {r["node"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    full = {r["node"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert full == {2, 3, 4}
    assert one >= full and one != full  # round 1 still holds node 1


def test_profile_columns_doubles_render_fixed_point(spark):
    """Float/double min/max must render fixed-point ('10000000.000000'),
    never Spark's scientific cast ('1.0E7') — the string must match what
    DuckDB's printf('%.6f', x) produces for the same value (round-5
    advice: engine-independent report strings)."""
    from helixdb_spark.operators.validate import profile_columns

    df = spark.createDataFrame(
        [(1e7,), (0.0001,), (123.456,)], "x double"
    )
    row = {
        r["column_name"]: r
        for r in profile_columns(df, ["x"]).collect()
    }["x"]
    assert row["min_val"] == "0.000100"
    assert row["max_val"] == "10000000.000000"
    assert "E" not in row["max_val"]
