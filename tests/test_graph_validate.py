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
