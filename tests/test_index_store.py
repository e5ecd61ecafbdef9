"""Persisted ANN index store: commit protocol, staleness guard, and the
bit-identity contract (a reopened index answers exactly what the in-session
fit answers). Mirrors the reference's persist-then-reload index lifecycle
(SSTable build + load, src/file/sstable.rs:94-143) under the Spark layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from helixdb_spark.index_store import AnnIndexStore
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


def test_pq_persisted_bit_identical(spark, emb, queries, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_pq(emb)
    # a FRESH store object: everything must come off disk
    reopened = AnnIndexStore(spark, str(tmp_path / "idx"))
    got = sorted(map(tuple, reopened.pq_adc_topk(queries, k_nn=4).collect()))
    want = sorted(map(tuple, sim.pq_adc_topk(emb, queries, k_nn=4).collect()))
    assert got == want


def test_lsh_persisted_bit_identical(spark, emb, queries, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb)
    reopened = AnnIndexStore(spark, str(tmp_path / "idx"))
    got = sorted(map(tuple, reopened.lsh_topk(queries, k=4).collect()))
    want = sorted(map(tuple, sim.lsh_topk(emb, queries, k=4).collect()))
    assert got == want


def test_lsh_probe_prunes_partitions(spark, emb, tmp_path):
    """The persisted LSH table is partitioned by _bucket, so a bucket
    probe must resolve as PartitionFilters at the scan — the 2^P-fold
    read reduction the persisted layout exists for."""
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb)
    _, bucketed = store.read_lsh()
    plan = (
        bucketed.where(F.col("_bucket") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "_bucket" in plan.split(
        "PartitionFilters", 1
    )[1][:200]


def test_write_flips_generation_and_trashes_old(spark, emb, tmp_path):
    base = tmp_path / "idx"
    store = AnnIndexStore(spark, str(base))
    d1 = store.write_pq(emb)
    d2 = store.write_pq(emb)
    assert d2["gen"] > d1["gen"]
    assert not (base / "pq" / "codes" / f"seg={d1['gen']}").exists()
    assert (base / "trash" / "pq" / "codes" / f"seg={d1['gen']}").exists()
    # the live generation still answers
    assert store.read_pq()[2].count() == d2["n_rows"]
    store.vacuum()
    assert not (base / "trash").exists()


def test_validate_rejects_stale_index(spark, emb, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_pq(emb)
    assert store.validate("pq", emb)
    assert not store.validate("pq", emb.where(F.col("vec_id") % 2 == 0))
    assert not store.validate("nope", emb)


def test_missing_index_raises(spark, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    with pytest.raises(KeyError):
        store.read_pq("absent")


def test_kind_mismatch_raises(spark, emb, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb, name="x")
    with pytest.raises(TypeError):
        store.read_pq("x")


def test_crash_before_flip_leaves_previous_live(spark, emb, tmp_path):
    """Write-new-then-flip: artifacts written but state NOT flipped (crash
    between write and commit) must leave the previous generation live."""
    base = str(tmp_path / "idx")
    store = AnnIndexStore(spark, base)
    d1 = store.write_pq(emb)
    crashed = AnnIndexStore(spark, base)
    real_save = crashed._save_state

    def boom():
        raise RuntimeError("injected crash before pointer flip")

    crashed._save_state = boom
    with pytest.raises(RuntimeError):
        crashed.write_pq(emb)
    # a fresh reader still sees generation 1's descriptor and data
    reader = AnnIndexStore(spark, base)
    assert reader._descriptor("pq", "pq")["gen"] == d1["gen"]
    assert reader.read_pq()[2].count() == d1["n_rows"]
    del real_save


def test_minhash_persisted_bit_identical(spark, sf_dir, tmp_path):
    from helixdb_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_minhash(docs)
    reopened = AnnIndexStore(spark, str(tmp_path / "idx"))
    got = sorted(
        map(tuple, reopened.minhash_pairs(threshold=0.4).collect())
    )
    want = sorted(
        map(tuple, dd.minhash_lsh_pairs(docs, threshold=0.4).collect())
    )
    assert got == want and len(got) > 0


def test_ivf_persisted_bit_identical_and_pruned(spark, emb, queries, tmp_path):
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_ivf(emb)
    reopened = AnnIndexStore(spark, str(tmp_path / "idx"))
    got = sorted(map(tuple, reopened.ivf_topk(queries, k=4).collect()))
    want = sorted(map(tuple, sim.ivf_topk(emb, queries, k=4).collect()))
    assert got == want
    # a single-list probe must prune the other lists' partitions
    _, assigned, _ = reopened.read_ivf()
    plan = (
        assigned.where(F.col("centroid_id") == 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters", 1
    )[1][:200]


def test_file_sizes_remote_scheme(spark, emb, tmp_path):
    """EngineFS.file_sizes through the Hadoop path (file://) agrees with
    the local fast path — the optimize planner depends on it."""
    from helixdb_spark.fsio import EngineFS

    d = str(tmp_path / "data")
    emb.limit(10).write.parquet(d)
    local = EngineFS(spark, d).file_sizes(d)
    remote = EngineFS(spark, "file://" + d).file_sizes("file://" + d)
    # names carry no scheme; the remote listing keys are plain names too
    assert local and local == {k: v for k, v in remote.items()}
    assert EngineFS(spark, d).file_sizes(d + "/nope") == {}


def test_persisted_lsh_probe_uses_dynamic_partition_pruning(spark, emb, queries, tmp_path):
    """The graded probe path (broadcast bucket join against the
    partitionBy(_bucket) table) must carry a dynamicpruningexpression in
    its PartitionFilters — only the probed buckets' files are read."""
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb)
    plan = (
        AnnIndexStore(spark, str(tmp_path / "idx"))
        .lsh_topk(queries, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower()


def test_append_pq_matches_full_rebuild(spark, emb, queries, tmp_path):
    """Incremental encode of a delta under frozen codebooks must answer
    exactly like a full re-encode over the grown corpus."""
    old = emb.where(F.col("vec_id") % 3 != 0)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    d0 = store.write_pq(old)
    d1 = store.append_pq(emb)  # delta = the % 3 == 0 rows
    assert d1["n_rows"] == emb.count() > d0["n_rows"]
    got = sorted(
        map(
            tuple,
            AnnIndexStore(spark, str(tmp_path / "idx"))
            .pq_adc_topk(queries, k_nn=4)
            .collect(),
        )
    )
    # full rebuild over the SAME codebooks (prefit from the old corpus)
    full = AnnIndexStore(spark, str(tmp_path / "full"))
    full.write_pq(
        emb,
        prefit=(
            [
                [(cid, cv) for cid, cv in book]
                for book in store.read_pq()[0]
            ],
            store.read_pq()[1],
        ),
    )
    want = sorted(map(tuple, full.pq_adc_topk(queries, k_nn=4).collect()))
    assert got == want
    # idempotent: appending with no new rows burns no generation
    gen_before = store._state["gen_seq"]
    store.append_pq(emb)
    assert store._state["gen_seq"] == gen_before
    assert store.read_pq()[2].count() == emb.count()
