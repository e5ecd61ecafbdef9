"""Incremental index maintenance (round 7): LSH / IVF / MinHash segment
appends under frozen hash state must answer bit-identically to a full
rebuild over the same frozen state (the append_pq contract extended to the
whole family — reference analog: per-level index rebuild folded into
compaction, src/file/sstable.rs:94-143 driven by src/level.rs:430-447),
chain compaction must be a pure rewrite, and the CAS generation reservation
must stop a stale same-name writer BEFORE it can clobber committed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helixdb_spark.fsio import ConcurrentWriterError
from helixdb_spark.index_store import AnnIndexStore, source_fingerprint
from helixdb_spark.operators import similarity as sim
from helixdb_spark.sources import load_table


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture()
def queries(emb):
    return emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_append_lsh_matches_full_rebuild(spark, emb, queries, tmp_path):
    old = emb.where(F.col("vec_id") % 3 != 0)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    d0 = store.write_lsh(old)
    d1 = store.append_lsh(emb)  # delta = the % 3 == 0 rows
    assert d1["n_rows"] == emb.count() > d0["n_rows"]
    assert d1["segments"] == [d0["gen"], d1["gen"]]
    got = _rows(
        AnnIndexStore(spark, str(tmp_path / "idx")).lsh_topk(queries, k=4)
    )
    full = AnnIndexStore(spark, str(tmp_path / "full"))
    full.write_lsh(emb)  # planes are corpus-independent (md5-derived)
    assert got == _rows(full.lsh_topk(queries, k=4))
    # idempotent: appending with no new rows burns no generation
    gen_before = store._state["gen_seq"]
    store.append_lsh(emb)
    assert store._state["gen_seq"] == gen_before


def test_append_ivf_matches_frozen_centroid_rebuild(spark, emb, queries, tmp_path):
    old = emb.where(F.col("vec_id") % 3 != 0)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    d0 = store.write_ivf(old)
    d1 = store.append_ivf(emb)
    assert d1["n_rows"] == emb.count() > d0["n_rows"]
    got = _rows(
        AnnIndexStore(spark, str(tmp_path / "idx")).ivf_topk(queries, k=4)
    )
    # full rebuild over the SAME frozen centroids (re-clustering would
    # legitimately answer differently — that is a write_ivf, not an append)
    _, _, centroids = store.read_ivf()
    full = AnnIndexStore(spark, str(tmp_path / "full"))
    full.write_ivf(emb, centroids=centroids)
    assert got == _rows(full.ivf_topk(queries, k=4))


def test_append_minhash_matches_full_rebuild(spark, sf_dir, tmp_path):
    from helixdb_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 4 != 0)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    d0 = store.write_minhash(old)
    d1 = store.append_minhash(docs)
    assert d1["n_rows"] == docs.count() > d0["n_rows"]
    got = _rows(
        AnnIndexStore(spark, str(tmp_path / "idx")).minhash_pairs(
            threshold=0.4
        )
    )
    want = _rows(dd.minhash_lsh_pairs(docs, threshold=0.4))
    assert got == want and len(got) > 0


def test_compact_index_is_pure_rewrite(spark, emb, queries, tmp_path):
    base = str(tmp_path / "idx")
    store = AnnIndexStore(spark, base)
    store.write_lsh(emb.where(F.col("vec_id") % 3 == 1))
    store.append_lsh(emb.where(F.col("vec_id") % 3 != 0))
    store.append_lsh(emb)
    before = _rows(store.lsh_topk(queries, k=4))
    assert len(store._segments(store._descriptor("lsh", "lsh"))) == 3
    d = store.compact_index("lsh")
    assert d["segments"] == [d["gen"]]
    assert _rows(AnnIndexStore(spark, base).lsh_topk(queries, k=4)) == before
    # superseded segments are trashed; vacuum drops them
    store.vacuum()
    import os

    segs = [
        n
        for n in os.listdir(f"{base}/lsh/buckets")
        if n.startswith("seg=")
    ]
    assert segs == [f"seg={d['gen']}"]


def test_stale_same_name_writer_cannot_clobber(spark, emb, tmp_path):
    """The round-6 advice scenario: two writers to the SAME index name.
    The loser must die at the CAS generation reservation — before any
    staging write — leaving the winner's committed segment untouched."""
    base = str(tmp_path / "idx")
    a = AnnIndexStore(spark, base)
    b = AnnIndexStore(spark, base)  # same state version as a
    da = a.write_lsh(emb, name="x")
    with pytest.raises(ConcurrentWriterError):
        b.write_lsh(emb.limit(5), name="x")
    fresh = AnnIndexStore(spark, base)
    assert fresh._descriptor("x", "lsh")["gen"] == da["gen"]
    assert fresh.read_lsh("x")[1].count() == da["n_rows"]
    # the loser staged nothing: only the winner's segment dir exists
    import os

    segs = sorted(os.listdir(f"{base}/x/buckets"))
    assert [s for s in segs if s.startswith("seg=")] == [f"seg={da['gen']}"]


def test_auto_index_refresh_on_compact(spark, emb, queries, tmp_path):
    """Verdict #3: a registered index rides the maintenance loop — after a
    compact the persisted probe answers as if freshly appended, with no
    manual rebuild (the reference rebuilds its index INSIDE compaction)."""
    from helixdb_spark.engine import HelixOptions, HelixSpark

    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb.where(F.col("vec_id") % 3 != 0))

    db = HelixSpark.open(
        spark, str(tmp_path / "db"),
        HelixOptions(rick_range=10, auto_maintain=False),
    )
    # corpus_fn returns the CURRENT corpus — here the table simply grew
    db.register_index(store, "lsh", lambda _db: emb)
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    db.compact(0, 9)
    db.close()

    got = _rows(
        AnnIndexStore(spark, str(tmp_path / "idx")).lsh_topk(queries, k=4)
    )
    full = AnnIndexStore(spark, str(tmp_path / "full"))
    full.write_lsh(emb)
    assert got == _rows(full.lsh_topk(queries, k=4))
    # the refresh appended a segment rather than rebuilding
    d = AnnIndexStore(spark, str(tmp_path / "idx"))._descriptor("lsh", "lsh")
    assert len(d["segments"]) == 2 and d["n_rows"] == emb.count()


def test_fingerprint_detects_regenerated_corpus(spark, emb, tmp_path):
    src = tmp_path / "corpus"
    emb.limit(50).write.parquet(str(src))
    fp1 = source_fingerprint(str(src))
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    corpus = spark.read.parquet(str(src))
    store.write_lsh(corpus, fingerprint=fp1)
    assert store.validate("lsh", corpus, fingerprint=fp1)
    # regenerate the corpus: same rows, same count — new file identity
    import shutil

    tmp2 = str(tmp_path / "corpus2")
    emb.limit(50).write.parquet(tmp2)
    shutil.rmtree(str(src))
    shutil.move(tmp2, str(src))
    corpus2 = spark.read.parquet(str(src))
    fp2 = source_fingerprint(str(src))
    assert fp2 != fp1
    assert not store.validate("lsh", corpus2, fingerprint=fp2)
    # row-count-only validation (no fingerprint passed) still passes —
    # the fingerprint is what closes the round-6 advice hole
    assert store.validate("lsh", corpus2)


def test_appended_chain_keeps_partition_pruning(spark, emb, queries, tmp_path):
    """The segmented read must stay ONE scan with BOTH prunings: committed
    segments as a static partition filter, probed buckets as dynamic
    partition pruning — the plan shape the 100 TB posture rests on."""
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb.where(F.col("vec_id") % 3 != 0))
    store.append_lsh(emb)
    plan = (
        AnnIndexStore(spark, str(tmp_path / "idx"))
        .lsh_topk(queries, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    low = plan.lower()
    assert "dynamicpruning" in low
    pf = low.split("partitionfilters", 1)[1][:300]
    assert "seg" in pf and "_bucket" in pf


def test_ivfpq_chain_keeps_partition_pruning_and_matches_full(
    spark, emb, queries, tmp_path
):
    """IVFADC chain: (a) the probe plan keeps both prunings (committed
    segments static, probed list dynamic) on ONE scan of the code lists;
    (b) a frozen-state append answers bit-identically to a full rebuild
    under the same frozen centroids + codebooks."""
    from helixdb_spark.operators.similarity import (
        IVF_CENTROID_STRIDE,
        ivfpq_fit,
    )

    prefit = ivfpq_fit(emb)
    base = emb.where(
        (F.col("vec_id") % 3 != 0)
        | (F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
    )
    store = AnnIndexStore(spark, str(tmp_path / "idxpq"))
    store.write_ivfpq(base, prefit=prefit)
    store.append_ivfpq(emb)
    full = AnnIndexStore(spark, str(tmp_path / "idxpq_full"))
    full.write_ivfpq(emb, prefit=prefit)
    chain_df = store.ivfpq_adc_topk(queries, k_nn=4)
    assert sorted(map(tuple, chain_df.collect())) == sorted(
        map(tuple, full.ivfpq_adc_topk(queries, k_nn=4).collect())
    )
    plan = (
        chain_df._jdf.queryExecution().executedPlan().toString()
    )
    low = plan.lower()
    # the probed list ids ride the LUT collect, so the code scan carries a
    # STATIC centroid_id partition filter alongside the committed-segment
    # filter — both prunings in one scan's PartitionFilters
    pf = low.split("partitionfilters", 1)[1][:300]
    assert "seg" in pf and "centroid_id" in pf
