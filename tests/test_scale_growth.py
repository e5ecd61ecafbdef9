"""Dedup scale-growth smoke (round 7, verdict #8): the 100 TB posture of
the dedup family rests on candidate generation staying ~LINEAR in corpus
size (banding, df-caps, rank windows). This test measures candidate-pair
counts on a synthetic skewed corpus at 1x and 4x and asserts the growth
slope — a quadratic candidate generator (the classic hot-bucket failure)
blows the bound immediately."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SMALL = 1200
SCALE = 4
# vocab sized so RANDOM doc pairs stay far below the LSH threshold: the
# skew still concentrates mass on hot tokens (t0 is white-hot), but the
# trigram space is diverse enough that candidate mass comes from the
# PLANTED near-dups (linear by construction), not corpus self-similarity —
# self-similar corpora legitimately have quadratically many near-dup pairs,
# which is recall, not a generator bug.
VOCAB = 5000
DOC_TOKENS = 50
# linear-with-noise bound: a healthy generator grows ~SCALE; hot-bucket
# quadratic growth would be ~SCALE^2 = 16
MAX_GROWTH = SCALE * 1.8


def synth_corpus(spark, n_docs: int):
    """Deterministic skewed corpus: token ids follow a power-law (u^3 over
    a small vocab — token t0 is white-hot, the boilerplate/stopword shape
    that melts naive inverted indexes), and every 10th doc is a near-dup
    of its predecessor (copy + one extra token)."""
    base = (
        spark.range(n_docs)
        .select(
            "id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
                    lambda i: F.concat(
                        F.lit("t"),
                        F.floor(
                            F.lit(VOCAB)
                            * F.pow(
                                F.pmod(
                                    F.xxhash64(F.col("id"), i), 10000
                                )
                                / 10000.0,
                                3,
                            )
                        )
                        .cast("int")
                        .cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )
    dups = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return base.where(F.col("doc_id") % 10 != 1).unionByName(dups)


@pytest.fixture(scope="module")
def corpora(spark):
    small = synth_corpus(spark, SMALL).persist()
    big = synth_corpus(spark, SMALL * SCALE).persist()
    yield small, big
    small.unpersist()
    big.unpersist()


def _minhash_candidates(spark, docs, tmp) -> int:
    """Band-bucket candidate count under the MAX_LSH_BUCKET cap — what the
    verification join would fan into."""
    from helixdb_spark.index_store import AnnIndexStore
    from helixdb_spark.operators.dedup import MAX_LSH_BUCKET

    store = AnnIndexStore(spark, tmp)
    store.write_minhash(docs)
    _, bands, _ = store.read_minhash()
    sizes = bands.groupBy("band_key").agg(F.count("*").alias("n"))
    row = (
        sizes.where(F.col("n") <= MAX_LSH_BUCKET)
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cand"))
        .first()
    )
    return int(row["cand"] or 0)


def _snm_candidates(docs) -> int:
    from helixdb_spark.functions.text import normalized_text
    from helixdb_spark.operators.dedup import (
        SNM_WINDOW,
        _snm_band_candidates,
        global_rank,
    )

    base = docs.select(
        "doc_id", normalized_text(F.col("text")).alias("__sortkey")
    )
    ranked = global_rank(base, ["__sortkey", F.col("doc_id")])
    return _snm_band_candidates(ranked, "doc_id", SNM_WINDOW).count()


def test_minhash_lsh_candidates_grow_linearly(spark, corpora, tmp_path):
    small, big = corpora
    c_small = _minhash_candidates(spark, small, str(tmp_path / "s"))
    c_big = _minhash_candidates(spark, big, str(tmp_path / "b"))
    assert c_small > 0  # the planted near-dups collide in full bands
    assert c_big / c_small <= MAX_GROWTH, (c_small, c_big)


def test_snm_candidates_grow_linearly(spark, corpora):
    from helixdb_spark.operators.dedup import SNM_WINDOW

    small, big = corpora
    c_small, c_big = _snm_candidates(small), _snm_candidates(big)
    # hard structural bound first: ≤ n·(W−1) by construction
    assert c_small <= small.count() * (SNM_WINDOW - 1)
    assert c_big <= big.count() * (SNM_WINDOW - 1)
    assert c_big / c_small <= MAX_GROWTH, (c_small, c_big)


def test_winnow_pairs_grow_linearly(spark, corpora):
    from helixdb_spark.operators.dedup import winnow_overlap_pairs

    small, big = corpora
    c_small = winnow_overlap_pairs(small).count()
    c_big = winnow_overlap_pairs(big).count()
    assert c_small > 0
    assert c_big / c_small <= MAX_GROWTH, (c_small, c_big)


def test_multik_span_anchors_grow_linearly(spark, corpora):
    """The multi-k ladder's shuffle mass is the anchor count — Σ_k (len-k+1)
    per doc, linear in corpus chars by construction; and its HIT rows (the
    only fan-in to the island windows) must also grow ~linearly on the
    planted-near-dup corpus (a hot-gram quadratic join would blow this)."""
    from helixdb_spark.operators.dedup import duplicate_spans_multik

    small, big = corpora
    ks = (30, 100)  # the synthetic docs are ~150-250 chars; 400 never fires

    def stats(docs):
        prof = duplicate_spans_multik(docs, ks=ks)
        row = prof.agg(
            F.sum("n_spans").alias("anchors"),
            F.sum("n_dup_spans").alias("hits"),
        ).first()
        return int(row["anchors"]), int(row["hits"])

    a_small, h_small = stats(small)
    a_big, h_big = stats(big)
    assert a_small > 0 and h_small > 0  # planted dups produce hits
    assert a_big / a_small <= MAX_GROWTH, (a_small, a_big)
    assert h_big / h_small <= MAX_GROWTH, (h_small, h_big)
