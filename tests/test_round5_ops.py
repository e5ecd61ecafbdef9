"""Unit tests for the round-5 operators: winnow-overlap pairs, passage-level
chunk dedup, LSH range search, and the profile_columns report. The graded
oracle replay in test_oracle_parity.py covers end-to-end parity; these pin
operator-level contracts on small synthetic inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_winnow_overlap_pairs_detects_shared_passage(spark):
    from helixdb_spark.operators.dedup import winnow_overlap_pairs

    shared = (
        "the quick brown fox jumps over the lazy dog again and again and "
        "then once more for good measure"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "omega " + shared + " zeta"),
            (3, "completely different content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = winnow_overlap_pairs(docs, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)  # disjoint doc never pairs


def test_winnow_overlap_df_cap_drops_boilerplate_fingerprints(spark):
    # A passage shared by MORE than max_df docs is corpus boilerplate: its
    # posting list is dropped whole, so no pairs are emitted from it.
    from helixdb_spark.operators.dedup import winnow_overlap_pairs

    shared = "identical boilerplate passage repeated in every document here"
    docs = spark.createDataFrame(
        [(i, f"prefix {i} " + shared) for i in range(6)],
        "doc_id long, text string",
    )
    out = winnow_overlap_pairs(docs, max_df=3, min_shared=2).collect()
    # every fingerprint of the shared run occurs in all 6 docs > max_df=3
    # (per-doc prefixes contribute doc-unique fingerprints only)
    assert out == []


def test_chunk_dup_passages_counts_docs_and_occurrences(spark):
    from helixdb_spark.operators.dedup import chunk_dup_passages

    chunk = " ".join(f"w{i}" for i in range(16))
    other = " ".join(f"x{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, chunk + " " + other),       # chunk at aligned offset 0
            (2, chunk + " " + chunk),       # chunk twice, both aligned
            (3, "solo " + chunk),           # misaligned: shifted by 1 token
        ],
        "doc_id long, text string",
    )
    rows = chunk_dup_passages(docs).collect()
    assert len(rows) == 1  # only the aligned repeats are visible
    r = rows[0]
    assert r["n_docs"] == 2 and r["n_occurrences"] == 3


def test_lsh_range_search_excludes_self_and_applies_threshold(spark):
    from helixdb_spark.operators.similarity import lsh_range_search

    dim = 8
    base = [1.0] * dim
    near = [1.0] * (dim - 1) + [0.9]
    far = [1.0, -1.0] * (dim // 2)
    corpus = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, base)], "query_id long, embedding array<float>"
    )
    out = lsh_range_search(
        corpus, queries, threshold=0.9, dim=dim
    ).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 0 not in ids  # self excluded
    assert 1 in ids      # near neighbor above threshold
    assert 2 not in ids  # orthogonal-ish vector below threshold
    for r in out:
        assert r["cosine"] >= 0.9


def test_profile_columns_reports_nulls_distinct_minmax(spark):
    from helixdb_spark.operators.validate import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 10.0), (2, "b", None)],
        "k long, s string, v double",
    )
    rows = {r["column_name"]: r for r in profile_columns(df, ["k", "s", "v"]).collect()}
    assert rows["k"]["n_nulls"] == 0 and rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_val"] == "1" and rows["k"]["max_val"] == "2"
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_nulls"] == 1
    # min/max computed on the NATIVE type (numeric order, not lexicographic)
    # doubles render fixed-point %.6f since the round-6 engine-independent
    # report-format change (see operators.validate.profile_columns)
    assert rows["v"]["min_val"] == "2.500000"
    assert rows["v"]["max_val"] == "10.000000"


def test_covariance_arrow_and_expr_paths_identical(spark):
    # The round-intermediates discipline (sxy 4 dp, mu 8 dp) makes the
    # accumulation strategy swappable: JVM expression explode and Arrow
    # BLAS Gram partials must produce BIT-identical covariance rows.
    import numpy as np

    from helixdb_spark.operators.similarity import embedding_covariance

    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 12).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, embedding_covariance(emb).collect()))
    b = sorted(
        map(tuple, embedding_covariance(emb, accumulate="arrow").collect())
    )
    assert a == b
    assert len(a) == 12 * 13 // 2


def _toy_weighted_graph(spark):
    # 5 nodes, weighted, includes a dangling node (4 has no out-edges)
    return spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 4, 1.0)],
        "src int, dst int, w double",
    )


def test_pagerank_driver_and_distributed_paths_identical(spark, monkeypatch):
    import helixdb_spark.operators.graph as G

    edges = _toy_weighted_graph(spark)
    fast = sorted(
        map(tuple, G.pagerank(edges, weight_col="w", round_dp=6).collect())
    )
    monkeypatch.setattr(G, "SMALL_GRAPH_DRIVER_NODES", 0)
    slow = sorted(
        map(tuple, G.pagerank(edges, weight_col="w", round_dp=6).collect())
    )
    assert fast == slow


def test_components_driver_and_distributed_paths_identical(spark, monkeypatch):
    import helixdb_spark.operators.graph as G

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (20, 21)],
        "src int, dst int",
    )
    fast = sorted(map(tuple, G.connected_components(edges, rounds=4).collect()))
    monkeypatch.setattr(G, "SMALL_GRAPH_DRIVER_NODES", 0)
    slow = sorted(map(tuple, G.connected_components(edges, rounds=4).collect()))
    assert fast == slow


def test_kcore_driver_and_distributed_paths_identical(spark, monkeypatch):
    import helixdb_spark.operators.graph as G

    # K4 plus a pendant chain: the 3-core is exactly the K4
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(3, 4), (4, 5)],
        "src int, dst int",
    )
    fast = sorted(map(tuple, G.kcore_peel(edges, k=3, rounds=3).collect()))
    monkeypatch.setattr(G, "SMALL_GRAPH_DRIVER_NODES", 0)
    slow = sorted(map(tuple, G.kcore_peel(edges, k=3, rounds=3).collect()))
    assert fast == slow
    assert {t[0] for t in fast} == {0, 1, 2, 3}


def test_power_iteration_driver_and_distributed_paths_identical(
    spark, monkeypatch
):
    import numpy as np

    import helixdb_spark.operators.similarity as sim

    rng = np.random.RandomState(3)
    vecs = rng.randn(100, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    cov = sim.embedding_covariance(emb)
    fast = sorted(
        map(
            tuple,
            sim.power_iteration_top_eigen(cov, dim=8, iterations=3).collect(),
        )
    )
    monkeypatch.setattr(sim, "BROADCAST_DIM_THRESHOLD", 0)
    cov2 = sim.embedding_covariance(emb)
    slow = sorted(
        map(
            tuple,
            sim.power_iteration_top_eigen(cov2, dim=8, iterations=3).collect(),
        )
    )
    assert fast == slow


def test_weighted_sampling_favors_heavier_docs(spark):
    # Efraimidis-Spirakis: P(doc in top-N) scales with weight. With weights
    # 1000 vs 1, the 100-doc sample over 200 heavy + 1800 light docs should
    # be overwhelmingly heavy — a statistical sanity check of the race key
    # -ln(u)/w (deterministic here: md5-uniforms are fixed by doc_id).
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, 1000 if i < 200 else 1) for i in range(2000)],
        "doc_id long, n_chars long",
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
        ).cast("double")
        / F.lit(4503599627370496.0)
    )
    key = -F.log(u) / F.col("n_chars")
    top = (
        docs.select("doc_id", "n_chars", key.alias("k"))
        .orderBy("k", "doc_id")
        .limit(100)
        .collect()
    )
    heavy = sum(1 for r in top if r["n_chars"] == 1000)
    assert heavy >= 90  # expected ~99+; light docs win only on extreme u
