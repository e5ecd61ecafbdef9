"""Round-9 operator tests: retention-path index invalidation without
corpus jobs (VERDICT r8 #5), plus the round's new operators (hub-capped
link prediction, rolling-hash span dedup, index drift policy)."""

from __future__ import annotations

import pytest

from helixdb_spark.engine import HelixOptions, HelixSpark
from helixdb_spark.index_store import AnnIndexStore
from helixdb_spark.sources import load_table


# ------------------------------------------------ outdate: zero corpus jobs
def test_outdate_launches_no_corpus_jobs(spark, sf_dir, tmp_path):
    """VERDICT r8 #5: outdate() with K registered indexes must launch NO
    corpus-scan jobs — the purge decision comes from the commit's own
    facts. Pinned two ways: corpus_fn is never invoked, and no Spark job
    at all runs inside the outdate() calls (job-group capture)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb)
    db = HelixSpark.open(
        spark,
        str(tmp_path / "db"),
        HelixOptions(rick_range=10, outdate_range=1 << 30, auto_maintain=False),
    )
    calls = {"n": 0}

    def corpus(_db):
        calls["n"] += 1
        return emb

    for name in ("a", "b", "c"):  # K=3 registered indexes
        store._state["indexes"][name] = dict(store._state["indexes"]["lsh"])
        db.register_index(store, name, corpus)
    db.put([(25, b"k", b"v")])  # occupies bucket 2 only
    calls["n"] = 0

    sc = spark.sparkContext
    sc.setJobGroup("outdate_no_jobs", "retention path must be job-free")
    try:
        # cutoff below every occupied bucket: nothing can have purged
        db.outdate(15)
        assert calls["n"] == 0
        for name in ("a", "b", "c"):
            assert not store._state["indexes"][name].get("stale")
        # cutoff inside the occupied bucket: conservative invalidation,
        # still decided without touching the corpus
        db.outdate(26)
        assert calls["n"] == 0
        for name in ("a", "b", "c"):
            assert store._state["indexes"][name].get("stale")
        jobs = sc.statusTracker().getJobIdsForGroup("outdate_no_jobs")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == [], f"outdate() launched Spark jobs: {jobs}"
    db.close()


def test_outdate_below_data_keeps_index_valid(spark, sf_dir, tmp_path):
    """An outdate whose cutoff sits entirely under unoccupied buckets
    drops nothing and must NOT flip registered indexes stale."""
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb)
    db = HelixSpark.open(
        spark,
        str(tmp_path / "db"),
        HelixOptions(rick_range=10, outdate_range=1 << 30, auto_maintain=False),
    )
    db.register_index(store, "lsh", lambda _db: emb)
    db.put([(55, b"k", b"v")])
    db.outdate(29)  # buckets 0-1 empty, bucket 2 partially covered but empty
    assert not store._state["indexes"]["lsh"].get("stale")
    store.read_lsh("lsh")  # still readable
    db.close()
