"""Writer mutual exclusion on the state pointer (round-5 verdict #3): two
engine instances sharing one table must never silently interleave
commit/compact state flips. The pointer publish is compare-and-swap
(fsio.write_text_cas) — the losing writer raises ConcurrentWriterError and
the winner's commit is provably untouched. The reference never faces this
(single-process by construction, src/db.rs:27-30); a Spark-native engine
with two jobs on one table does."""

from __future__ import annotations

import pytest

from helixdb_spark import HelixOptions, HelixSpark
from helixdb_spark.fsio import ConcurrentWriterError, EngineFS


OPTS = HelixOptions(rick_range=100, auto_maintain=False)


def _rows(db, lo=0, hi=10**9):
    return {
        (r["ts"], bytes(r["key"])): bytes(r["value"])
        for r in db.scan((lo, hi)).collect()
    }


def test_stale_writer_loses_and_winner_survives(spark, tmp_path):
    base = str(tmp_path / "db")
    a = HelixSpark.open(spark, base, OPTS)
    b = HelixSpark.open(spark, base, OPTS)  # same base, both at v(-1)...v0

    a.put([(1, b"ka", b"va")])  # a commits first
    with pytest.raises(ConcurrentWriterError):
        b.put([(2, b"kb", b"vb")])  # b's state is stale: must lose, not clobber

    fresh = HelixSpark.open(spark, base, OPTS)
    got = _rows(fresh)
    assert got[(1, b"ka")] == b"va"  # winner's commit intact
    assert fresh._state["seq"] == a._state["seq"]
    a.close()
    fresh.close()


def test_loser_reopens_and_retries(spark, tmp_path):
    base = str(tmp_path / "db")
    a = HelixSpark.open(spark, base, OPTS)
    b = HelixSpark.open(spark, base, OPTS)
    a.put([(1, b"ka", b"va")])
    with pytest.raises(ConcurrentWriterError):
        b.put([(2, b"kb", b"vb")])
    # the documented recovery: reload state, retry the operation
    b2 = HelixSpark.open(spark, base, OPTS)
    b2.put([(2, b"kb", b"vb")])
    got = _rows(b2)
    assert got[(1, b"ka")] == b"va" and got[(2, b"kb")] == b"vb"
    a.close()
    b2.close()


def test_interleaved_compact_and_put(spark, tmp_path):
    """The dangerous interleave: A compacts (manifest flip) while B, opened
    earlier, tries to put — B must not publish a state whose cold_manifest
    predates A's flip (which would orphan the compacted generation)."""
    base = str(tmp_path / "db")
    a = HelixSpark.open(spark, base, OPTS)
    a.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    b = HelixSpark.open(spark, base, OPTS)
    a.compact(0, 99)
    assert a._state["cold_manifest"]  # manifest flipped
    with pytest.raises(ConcurrentWriterError):
        b.put([(50, b"k50", b"w50")])
    fresh = HelixSpark.open(spark, base, OPTS)
    assert fresh._state["cold_manifest"] == a._state["cold_manifest"]
    assert len(_rows(fresh)) == 10
    a.close()
    fresh.close()


def test_cas_on_remote_scheme(spark, tmp_path):
    """Same mutual exclusion through the Hadoop FileSystem path (file://):
    the loser's rename hits an existing destination and fails cleanly."""
    base = "file://" + str(tmp_path / "rdb")
    a = HelixSpark.open(spark, base, OPTS)
    b = HelixSpark.open(spark, base, OPTS)
    a.put([(1, b"ka", b"va")])
    with pytest.raises(ConcurrentWriterError):
        b.put([(2, b"kb", b"vb")])
    fresh = HelixSpark.open(spark, base, OPTS)
    assert _rows(fresh)[(1, b"ka")] == b"va"
    a.close()
    fresh.close()


def test_cas_primitive_race_semantics(spark, tmp_path):
    """write_text_cas at the fsio level: both writers read v0; the first
    publish wins v1, the second raises and leaves v1's content untouched."""
    fs = EngineFS(spark, str(tmp_path))
    p = str(tmp_path / "_meta" / "state.json")
    v = fs.write_text_cas(p, '{"who": "init"}', -1)
    assert v == 0
    text, ver = fs.read_text_versioned(p)
    assert ver == 0
    v1 = fs.write_text_cas(p, '{"who": "winner"}', ver)
    assert v1 == 1
    with pytest.raises(ConcurrentWriterError):
        fs.write_text_cas(p, '{"who": "loser"}', ver)  # same stale expectation
    assert fs.read_text_versioned(p) == ('{"who": "winner"}', 1)


def test_index_store_cas(spark, tmp_path):
    """The ANN index store shares the CAS publish: a stale store instance
    cannot clobber a newer index commit."""
    from pyspark.sql import functions as F

    from helixdb_spark.index_store import AnnIndexStore
    from helixdb_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = str(tmp_path / "idx")
    a = AnnIndexStore(spark, base)
    b = AnnIndexStore(spark, base)
    a.write_lsh(emb, name="one")
    with pytest.raises(ConcurrentWriterError):
        b.write_lsh(emb.where(F.col("vec_id") < 5), name="two")
    fresh = AnnIndexStore(spark, base)
    assert set(fresh.list_indexes()) == {"one"}  # loser published nothing
