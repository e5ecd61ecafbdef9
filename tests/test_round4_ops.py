"""Unit tests for the round-4 operators: graph connected components,
record linkage, product quantization (encode + ADC search), and MIPS LSH.
The graded-oracle replay in test_oracle_parity.py covers end-to-end parity;
these pin the operator-level contracts on small synthetic inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helixdb_spark.operators import similarity as sim
from helixdb_spark.operators.graph import connected_components


def test_connected_components_two_chains(spark):
    # two disjoint chains: 0-1-2-3 and 10-11-12; singleton edges only
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)], "src int, dst int"
    )
    out = {
        r["node"]: r["comp"]
        for r in connected_components(edges, rounds=4).collect()
    }
    assert {k: v for k, v in out.items() if k < 10} == {0: 0, 1: 0, 2: 0, 3: 0}
    assert {k: v for k, v in out.items() if k >= 10} == {10: 10, 11: 10, 12: 10}


def test_connected_components_underprovisioned_rounds_still_deterministic(spark):
    # a 5-hop path with rounds=2: labels are a partial refinement, but the
    # SAME partial refinement every run (min over a fixed-radius ball)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src int, dst int"
    )
    a = sorted(map(tuple, connected_components(edges, rounds=2).collect()))
    b = sorted(map(tuple, connected_components(edges, rounds=2).collect()))
    assert a == b
    # node 6 is 6 hops from 0; after 2 rounds its label cannot be 0 yet
    assert dict(a)[6] != 0


def test_record_linkage_scores_duplicates_above_unrelated(spark):
    from helixdb_spark.operators.dedup import record_linkage_pairs

    recs = spark.createDataFrame(
        [
            (1, "cold widget", "Brand#1", "ECONOMY", 10, 100.0),
            (2, "cold widget", "Brand#1", "ECONOMY", 11, 101.0),  # near-dup of 1
            (3, "warm widget", "Brand#1", "ECONOMY", 30, 500.0),  # same block, weak
            (4, "cold bolt", "Brand#1", "ECONOMY", 10, 100.0),    # other block
        ],
        "id long, name string, brand string, typ string, sz int, price double",
    )
    out = record_linkage_pairs(
        recs, "id", "name", "brand", "typ", "sz", "price", threshold=4.0
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["score"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == pytest.approx(5.5, abs=1e-6)
    assert (1, 3) not in pairs and (3, 4) not in pairs  # weak / cross-block


def test_record_linkage_block_cap_keeps_pair_growth_linear(spark):
    # Degenerate catalog: EVERY record lands in one (noun, brand) cell.
    # Uncapped, pairs would be n(n-1)/2 (quadratic); with the
    # LINKAGE_MAX_BLOCK sub-blocking, each join cell holds <= cap members,
    # so doubling the catalog at most doubles the pair count (+ one extra
    # partially-filled cell).
    from helixdb_spark.operators.dedup import (
        LINKAGE_MAX_BLOCK,
        record_linkage_pairs,
    )

    def catalog(n):
        return spark.createDataFrame(
            [(i, "cold widget", "Brand#1", "ECONOMY", 10, 100.0)
             for i in range(n)],
            "id long, name string, brand string, typ string,"
            " sz int, price double",
        )

    def npairs(n):
        return record_linkage_pairs(
            catalog(n), "id", "name", "brand", "typ", "sz", "price",
            threshold=0.0,
        ).count()

    cap = LINKAGE_MAX_BLOCK
    n1, n2 = 4 * cap, 8 * cap
    p1, p2 = npairs(n1), npairs(n2)
    full_cell = cap * (cap - 1) // 2
    assert p1 == (n1 // cap) * full_cell  # every cell bounded at cap
    assert p2 == 2 * p1  # linear, not quadratic (uncapped would be ~4x)


def _pattern_corpus(spark, n_rows=64, dim=8):
    # 8 distinct patterns, ids 0..7 are the patterns themselves (the
    # deterministic lowest-id k-means init), the rest repeat them
    pats = [[float(p + 1)] * dim for p in range(8)]
    rows = [(i, pats[i % 8]) for i in range(n_rows)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), pats


def test_pq_encode_zero_error_on_pattern_corpus(spark):
    corpus, _ = _pattern_corpus(spark)
    out = sim.pq_encode(corpus, m=4, k=8, n_iter=2).collect()
    assert len(out) == 64
    for r in out:
        assert r["recon_err"] == pytest.approx(0.0, abs=1e-5)
        # all four subspaces of a constant vector land in one codebook entry
        codes = {r[f"code_{j}"] for j in range(4)}
        assert len(codes) == 1
    # identical vectors get identical codes
    by_pat = {}
    for r in out:
        by_pat.setdefault(r["vec_id"] % 8, set()).add(
            tuple(r[f"code_{j}"] for j in range(4))
        )
    assert all(len(v) == 1 for v in by_pat.values())


def test_pq_adc_topk_exact_on_pattern_corpus(spark):
    corpus, pats = _pattern_corpus(spark)
    queries = spark.createDataFrame(
        [(0, pats[3])], "query_id long, embedding array<float>"
    )
    out = sim.pq_adc_topk(corpus, queries, k_nn=8, m=4, k=8, n_iter=2).collect()
    assert len(out) == 8
    # the 8 nearest are exactly the 8 copies of pattern 3, at distance ~0
    top = [r for r in out if r["adc_dist"] < 1e-3]
    assert sorted(r["neighbor_id"] for r in top) == [3, 11, 19, 27, 35, 43, 51, 59]


def test_pq_encode_rejects_indivisible_dim(spark):
    corpus, _ = _pattern_corpus(spark, dim=6)
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_encode(corpus, m=4, k=2, n_iter=1)


def test_mips_topk_returns_true_inner_products(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])],
        "query_id long, embedding array<float>",
    )
    # num_planes=2 -> 4 buckets over 40 vectors, so the query's augmented
    # bucket is populated (augmentation is asymmetric: the corpus copy of
    # the query vector gets a positive extra coordinate, the query a zero,
    # so same-bucket membership is probabilistic — the LSH recall dial)
    out = sim.mips_lsh_topk(corpus, queries, k=5, dim=16, num_planes=2).collect()
    assert out, "a 4-bucket index over 40 vectors must populate the query bucket"
    for r in out:
        true_dot = float(
            np.dot(
                vecs[0].astype("float64"), vecs[r["neighbor_id"]].astype("float64")
            )
        )
        assert r["dot"] == pytest.approx(true_dot, abs=1e-4)
    # ranked by descending inner product
    dots = [r["dot"] for r in out]
    assert dots == sorted(dots, reverse=True)


def test_kmeans_train_fraction_one_is_bit_identical(spark):
    corpus, _ = _pattern_corpus(spark)
    a = sorted(map(tuple, sim.kmeans_fit(corpus, k=8, n_iter=2).collect()))
    b = sorted(
        map(
            tuple,
            sim.kmeans_fit(
                corpus, k=8, n_iter=2, train_fraction=1.0
            ).collect(),
        )
    )
    assert a == b


def test_kmeans_sampled_training_assigns_full_corpus(spark):
    corpus, _ = _pattern_corpus(spark)
    out = sim.kmeans_fit(corpus, k=4, n_iter=2, train_fraction=0.5)
    # the fit read only the hash sample, but EVERY point gets an assignment
    assert out.count() == corpus.count()
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            sim.kmeans_fit(
                corpus, k=4, n_iter=2, train_fraction=0.5
            ).collect(),
        )
    )
    assert a == b  # hash sample, not RNG: stable across runs


def test_pq_encode_prefit_matches_internal_fit(spark):
    corpus, _ = _pattern_corpus(spark)
    books = sim.pq_fit_codebooks(corpus, m=2, k=4, n_iter=2)
    a = sorted(
        map(tuple, sim.pq_encode(corpus, m=2, k=4, n_iter=2).collect())
    )
    b = sorted(
        map(
            tuple,
            sim.pq_encode(corpus, m=2, k=4, n_iter=2, prefit=books).collect(),
        )
    )
    assert a == b
