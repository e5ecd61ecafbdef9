"""E2E parity with the reference's public-API tests (SURVEY.md §5):

- put→get roundtrip (reference src/db.rs:281-298 ``example``)
- scan cardinality = num_ts × num_key grid (db.rs:300-354 scan_test_scaffold)
- overwrite same (ts, key) ⇒ last write wins (level.rs:787-819, rick.rs:403-417)
- compaction transparency: reads identical across hot/cold (level.rs:823-875)
- outdated reads return None / retention boundary
- restart durability (db.rs:372-402)
"""

from __future__ import annotations

import struct

import pytest

from helixdb_spark import comparators
from helixdb_spark.engine import HelixOptions, HelixSpark


def le_u64(i: int) -> bytes:
    return struct.pack("<Q", i)


@pytest.fixture
def db_path(tmp_path):
    return str(tmp_path / "db")


def test_put_get_roundtrip(spark, db_path):
    db = HelixSpark.open(spark, db_path)
    db.put([(0, b"key", b"value")])
    assert db.get(0, b"key") == b"value"
    assert db.get(0, b"missing") is None
    assert db.get(999, b"key") is None
    # direct_get names a shard for API parity (reference db.rs:57-65);
    # placement is Spark's, so any shard id resolves identically
    assert db.direct_get(3, 0, b"key") == b"value"
    db.close()
    with pytest.raises(RuntimeError):
        db.put([(1, b"k", b"v")])


def test_scan_grid_cardinality(spark, db_path):
    """Grid (ts=8, keys=16): scan returns exactly ts×keys rows, key-major
    then ts order (reference scan_test_scaffold, db.rs:300-354, scaled
    down for CI speed)."""
    num_ts, num_key = 8, 16
    db = HelixSpark.open(spark, db_path, HelixOptions(rick_range=1024, auto_maintain=False))
    rows = [(t, le_u64(k), b"v") for t in range(num_ts) for k in range(num_key)]
    db.put(rows)
    got = db.scan((0, num_ts - 1), comparator=comparators.le_u64).collect()
    assert len(got) == num_ts * num_key
    keys_order = [struct.unpack("<Q", bytes(r["key"]))[0] for r in got]
    assert keys_order == sorted(keys_order)
    # per-key ts ordering (SURVEY.md O5: assert set + per-key ts order)
    per_key_ts = {}
    for r in got:
        per_key_ts.setdefault(bytes(r["key"]), []).append(r["ts"])
    for ts_list in per_key_ts.values():
        assert ts_list == list(range(num_ts))


def test_scan_ranges_inclusive(spark, db_path):
    db = HelixSpark.open(spark, db_path, HelixOptions(auto_maintain=False))
    rows = [(t, le_u64(k), b"v") for t in range(10) for k in range(4)]
    db.put(rows)
    got = db.scan((2, 5), (le_u64(1), le_u64(2))).collect()
    assert len(got) == 4 * 2  # ts 2..5 inclusive × keys 1..2 inclusive


def test_overwrite_last_write_wins(spark, db_path):
    db = HelixSpark.open(spark, db_path, HelixOptions(auto_maintain=False))
    db.put([(5, b"key1", b"old")])
    db.put([(5, b"key1", b"new")])
    assert db.get(5, b"key1") == b"new"
    got = db.scan((0, 10)).collect()
    assert len(got) == 1 and bytes(got[0]["value"]) == b"new"


def test_compaction_transparency(spark, db_path):
    """One key, ts 0..25, rick_range=10: reads identical across the hot/cold
    boundary (reference level.rs:823-875)."""
    db = HelixSpark.open(
        spark, db_path, HelixOptions(rick_range=10, outdate_range=1000, num_shard=2)
    )
    for t in range(26):
        db.put([(t, b"key", f"value{t}".encode())])
    # reviewer should have compacted [0,9] and [10,19] by now
    assert db.reviewer.last_compacted == 20
    for t in range(26):
        assert db.get(t, b"key") == f"value{t}".encode(), f"ts={t}"
    got = db.scan((0, 25)).collect()
    assert [r["ts"] for r in got] == list(range(26))


def test_compaction_with_blob_codec(spark, db_path):
    from helixdb_spark.codecs import CodecRegistry

    reg = CodecRegistry()
    reg.register_dispatch(lambda key: "delta_zlib")
    db = HelixSpark.open(
        spark,
        db_path,
        HelixOptions(rick_range=10, outdate_range=1000, auto_maintain=False),
        codecs=reg,
    )
    rows = [(t, le_u64(k), f"v{k}@{t}".encode()) for t in range(10) for k in range(3)]
    db.put(rows)
    db.compact(0, 9)
    for t in (0, 5, 9):
        for k in range(3):
            assert db.get(t, le_u64(k)) == f"v{k}@{t}".encode()
    assert len(db.scan((0, 9)).collect()) == 30


def test_outdate_retention(spark, db_path):
    db = HelixSpark.open(
        spark, db_path, HelixOptions(rick_range=10, outdate_range=30, num_shard=2)
    )
    for t in range(40):
        db.put([(t, b"k", le_u64(t))])
    # per the reviewer trace (level.rs:734-753): ts<=19 outdated by now
    assert db.get(5, b"k") is None
    assert db.get(19, b"k") is None
    assert db.get(20, b"k") == le_u64(20)
    assert db.get(39, b"k") == le_u64(39)
    got = db.scan((0, 100)).collect()
    assert [r["ts"] for r in got] == list(range(20, 40))


def test_restart_durability(spark, db_path):
    """50 ts spanning compactions; reopen and re-read all
    (reference db.rs:372-402: compact_interval=5, retention=100)."""
    db = HelixSpark.open(spark, db_path, HelixOptions(rick_range=5, outdate_range=100))
    db.put([(t, b"durable", le_u64(t)) for t in range(50)])
    db.close()
    db2 = HelixSpark.open(spark, db_path, HelixOptions(rick_range=5, outdate_range=100))
    probes = db2.get_many([(t, b"durable") for t in range(50)])
    assert len(probes) == 50
    for t in range(50):
        assert probes[(t, b"durable")] == le_u64(t)


def test_get_many_batched(spark, db_path):
    db = HelixSpark.open(spark, db_path, HelixOptions(auto_maintain=False))
    db.put([(t, le_u64(k), le_u64(t * k)) for t in range(4) for k in range(4)])
    out = db.get_many([(1, le_u64(2)), (3, le_u64(3)), (99, le_u64(0))])
    assert out == {(1, le_u64(2)): le_u64(2), (3, le_u64(3)): le_u64(9)}


def test_user_keys_and_counts(spark, db_path):
    db = HelixSpark.open(spark, db_path, HelixOptions(auto_maintain=False))
    db.put([(1, b"a", b"x"), (2, b"a", b"y"), (3, b"b", b"z")])
    keys = {bytes(r["key"]) for r in db.user_keys().collect()}
    assert keys == {b"a", b"b"}
    counts = {bytes(r["key"]): r["count"] for r in db.key_counts().collect()}
    assert counts == {b"a": 2, b"b": 1}


def test_scan_key_range_uses_comparator(spark, db_path):
    """LE-u64 keys range numerically through the comparator, not bytewise
    (reference passes cmp into the range check — level.rs:145-149)."""
    db = HelixSpark.open(spark, db_path, HelixOptions(auto_maintain=False))
    db.put([(0, le_u64(k), b"v") for k in range(300)])
    got = db.scan((0, 0), (le_u64(0), le_u64(299)), comparator=comparators.le_u64)
    assert got.count() == 300  # bytewise would exclude most keys >= 256
    got2 = db.scan((0, 0), (le_u64(10), le_u64(20)), comparator=comparators.le_u64)
    assert got2.count() == 11


def test_sql_surface_over_entries(spark, db_path):
    """SQL view over the engine's logical entry set (SURVEY §7.1 phase 6)."""
    db = HelixSpark.open(spark, db_path, HelixOptions(auto_maintain=False))
    db.put([(t, b"a" if t % 2 else b"b", str(t).encode()) for t in range(10)])
    row = db.sql(
        "SELECT count(*) AS n, count(DISTINCT key) AS k FROM entries"
    ).first()
    assert (row["n"], row["k"]) == (10, 2)
    agg = db.sql(
        "SELECT key, max(ts) AS max_ts FROM entries GROUP BY key ORDER BY key"
    ).collect()
    assert [(bytes(r["key"]), r["max_ts"]) for r in agg] == [(b"a", 9), (b"b", 8)]


def test_read_entries_csv_json(spark, tmp_path):
    """CSV/JSON connector surface feeding the engine's entry schema."""
    import json as _json

    from helixdb_spark.sources import read_entries

    csv_p = tmp_path / "in_csv"
    csv_p.mkdir()
    (csv_p / "part.csv").write_text("ts,key,value\n1,a,v1\n2,b,v2\n")
    got = read_entries(spark, str(csv_p), fmt="csv").collect()
    assert {(r["ts"], bytes(r["key"]), bytes(r["value"])) for r in got} == {
        (1, b"a", b"v1"),
        (2, b"b", b"v2"),
    }

    json_p = tmp_path / "in_json"
    json_p.mkdir()
    (json_p / "part.json").write_text(
        "\n".join(_json.dumps({"ts": t, "key": f"k{t}", "value": "x"}) for t in range(3))
    )
    got = read_entries(spark, str(json_p), fmt="json").collect()
    assert {(r["ts"], bytes(r["key"])) for r in got} == {(t, f"k{t}".encode()) for t in range(3)}


def test_compaction_late_data_recompact(spark, db_path):
    """Re-compacting a bucket after late puts must MERGE with the existing
    cold rows, not replace them (SURVEY.md §7.2 late-data stance; the
    reference loses late puts instead — §2.10 caveat)."""
    db = HelixSpark.open(spark, db_path, HelixOptions(rick_range=10, auto_maintain=False))
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    db.compact(0, 9)
    assert db.scan((0, 9)).count() == 10
    # late arrival: one new key, one overwrite of a compacted entry
    db.put([(5, b"late", b"lv"), (3, b"k3", b"v3new")])
    db.compact(0, 9)
    assert db.scan((0, 9)).count() == 11
    assert db.get(5, b"late") == b"lv"
    assert db.get(3, b"k3") == b"v3new"  # hot overwrite beats cold
    assert db.get(7, b"k7") == b"v7"     # untouched cold entry survives
    # partial-range compaction first must not lose out-of-range cold rows
    db.put([(15, b"p", b"q"), (16, b"r", b"s")])
    db.compact(10, 15)
    db.compact(10, 19)
    assert db.get(16, b"r") == b"s"


def test_custom_sharding_expr(spark, db_path):
    """Pluggable ShardingKeyFn analog (reference fn_registry.rs:50-55):
    entries route to write partitions by a user expression; reads are
    placement-independent."""
    from pyspark.sql import functions as F

    db = HelixSpark.open(
        spark,
        db_path,
        HelixOptions(
            auto_maintain=False,
            num_shard=4,
            sharding_expr=lambda key: F.crc32(key) % 2,
        ),
    )
    db.put([(t, le_u64(k), le_u64(t + k)) for t in range(4) for k in range(8)])
    assert db.get(2, le_u64(5)) == le_u64(7)
    assert db.scan((0, 3)).count() == 32


def test_get_asof(spark, db_path):
    """As-of read: latest entry at or before ts (engine addition — the
    reference's compressed-chunk probe is exact-match only,
    src/level.rs:503-505). Must see across hot/cold and respect retention."""
    db = HelixSpark.open(
        spark, db_path, HelixOptions(rick_range=10, outdate_range=1 << 40,
                                     auto_maintain=False)
    )
    db.put([(0, b"k", b"v0"), (5, b"k", b"v5"), (25, b"k", b"v25")])
    assert db.get_asof(5, b"k") == (5, b"v5")     # exact hit
    assert db.get_asof(7, b"k") == (5, b"v5")     # between points
    assert db.get_asof(100, b"k") == (25, b"v25")  # after last
    assert db.get_asof(4, b"missing") is None
    # transparent across compaction (bucket [0,9] goes cold)
    db.compact(0, 9)
    assert db.get_asof(7, b"k") == (5, b"v5")
    # retention: outdating through ts=9 hides the old points
    db.outdate(9)
    assert db.get_asof(7, b"k") is None
    assert db.get_asof(100, b"k") == (25, b"v25")
    db.close()


def test_stream_ingest_to_engine(spark, db_path, sf_dir):
    """foreachBatch streaming ingest lands the same logical entries as a
    batch put (the reference's WriteBatch micro-batching, level.rs:593-721,
    with Spark owning the trigger)."""
    from pyspark.sql import functions as F

    from helixdb_spark.sources import load_table
    from helixdb_spark.streaming import stream_ingest_to_engine

    db = HelixSpark.open(
        spark, db_path,
        HelixOptions(rick_range=86400, outdate_range=1 << 60, auto_maintain=False),
    )
    stream_ingest_to_engine(spark, sf_dir, db)
    events = load_table(spark, sf_dir, "events")
    n_logical = events.select(
        F.unix_timestamp("ts"), F.col("user_id")
    ).distinct().count()
    lo, hi = events.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    # scan dedups (ts, key) last-write-wins, so the count is the distinct
    # (second, user) grid, not the raw event count
    assert db.scan((lo, hi)).count() == n_logical
    row = events.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
    ).first()
    assert db.get(row["ts"], bytes(row["key"])) is not None
    db.close()


def test_compact_crash_before_commit(spark, db_path, monkeypatch):
    """Crash injected between the staged generation write and the manifest
    flip: the old manifest stays live, readers never see the staged gen,
    and a retried compact commits the same data (reference contract: the
    LEVEL_INFO superblock flip, src/types/level_info.rs:98-111)."""
    db = HelixSpark.open(spark, db_path, HelixOptions(rick_range=10, auto_maintain=False))
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    expected = [(t, b"k%d" % t, b"v%d" % t) for t in range(10)]

    # let the gen RESERVATION save succeed (it precedes staging), then
    # crash the COMMIT save — the original staged-but-unflipped window
    real_save = HelixSpark._save_state
    calls = {"n": 0}

    def boom(self):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("injected crash before commit")
        real_save(self)

    monkeypatch.setattr(HelixSpark, "_save_state", boom)
    with pytest.raises(RuntimeError, match="injected"):
        db.compact(0, 9)
    monkeypatch.undo()

    db2 = HelixSpark.open(spark, db_path, HelixOptions(rick_range=10, auto_maintain=False))
    assert db2._state.get("cold_manifest") in (None, {})  # nothing committed
    got = [(r["ts"], bytes(r["key"]), bytes(r["value"])) for r in db2.scan((0, 9)).collect()]
    assert sorted(got) == expected
    # retry: a FRESH reserved gen is staged (reserved numbers are never
    # reused); the crashed reservation's dir is unreferenced garbage
    db2.compact(0, 9)
    got = [(r["ts"], bytes(r["key"]), bytes(r["value"])) for r in db2.scan((0, 9)).collect()]
    assert sorted(got) == expected
    assert db2.get(3, b"k3") == b"v3"
    # vacuum collects the orphaned staged generation from the crashed run
    import os as _os

    gen0 = f"{db2.layout.cold_path}/gen=0"
    assert _os.path.isdir(gen0)  # crashed staging leftover
    db2.vacuum()
    assert not _os.path.isdir(gen0)
    assert db2.get(3, b"k3") == b"v3"


def test_compact_crash_after_commit_before_gc(spark, db_path, monkeypatch):
    """Crash injected after the manifest flip but before GC: superseded cold
    dirs and undropped hot partitions linger, but the manifest prunes the
    former and LWW dedup absorbs the latter; vacuum() collects the rest."""
    from helixdb_spark.fsio import EngineFS

    db = HelixSpark.open(spark, db_path, HelixOptions(rick_range=10, auto_maintain=False))
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    db.compact(0, 9)           # gen=0 committed and GC'd normally
    db.put([(3, b"k3", b"late")])  # late overwrite forces a re-compaction

    real_delete = EngineFS.delete

    def boom(self, p):
        # crash only the DATA-dir GC (the step under test); the state
        # pointer's own version GC inside write_text_cas stays live —
        # the gen reservation and the commit both publish through it
        if "time_bucket=" in p:
            raise RuntimeError("injected crash during GC")
        real_delete(self, p)

    monkeypatch.setattr(EngineFS, "delete", boom)
    with pytest.raises(RuntimeError, match="injected"):
        db.compact(0, 9)       # gen=1 commits, then GC dies
    monkeypatch.undo()

    db2 = HelixSpark.open(spark, db_path, HelixOptions(rick_range=10, auto_maintain=False))
    # the commit landed: manifest points every bucket at gen=1
    assert set(db2._state["cold_manifest"].values()) == {1}
    got = {(r["ts"], bytes(r["key"])): bytes(r["value"]) for r in db2.scan((0, 9)).collect()}
    assert len(got) == 10
    assert got[(3, b"k3")] == b"late"      # hot leftover re-wins LWW, same value as cold
    assert got[(7, b"k7")] == b"v7"
    # vacuum collects the superseded gen=0 bucket dirs the crashed GC left
    import os as _os
    gen0 = f"{db2.layout.cold_path}/gen=0"
    assert _os.path.isdir(gen0)
    db2.vacuum()
    assert not _os.path.isdir(gen0)
    got2 = {(r["ts"], bytes(r["key"])): bytes(r["value"]) for r in db2.scan((0, 9)).collect()}
    assert got2 == got


def test_read_cache_point_gets(spark, db_path):
    """Opt-in read cache (M7, reference src/cache.rs:12-162): the second
    probe batch reads the persisted entry view (InMemoryTableScan in the
    plan), results identical, and any mutation invalidates."""
    db = HelixSpark.open(
        spark, db_path,
        HelixOptions(rick_range=10, auto_maintain=False, cache_reads=True),
    )
    db.put([(t, le_u64(k), le_u64(t * k)) for t in range(8) for k in range(8)])
    probes = [(t, le_u64(k)) for t in range(8) for k in range(8)]
    first = db.get_many(probes)
    assert len(first) == 64
    # the cached view is now materialized; the probe plan must hit it
    plan = db._entries_df(ts_lo=0, ts_hi=7)._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    second = db.get_many(probes)
    assert second == first
    assert db.get(3, le_u64(5)) == le_u64(15)
    # mutation invalidates: new data must be visible immediately
    db.put([(3, le_u64(5), b"fresh")])
    assert db.get(3, le_u64(5)) == b"fresh"
    db.compact(0, 9)
    assert db.get(3, le_u64(5)) == b"fresh"
    assert db.get(2, le_u64(2)) == le_u64(4)


def test_scan_iter_streamed_order(spark, db_path):
    """scan_iter yields the full grid incrementally in (key, ts) order —
    the reference's bounded-prefetch pull iterator (src/option.rs:150-153,
    db.rs:215) as toLocalIterator over the range-partitioned sort."""
    num_ts, num_key = 6, 12
    db = HelixSpark.open(spark, db_path, HelixOptions(rick_range=16, auto_maintain=False))
    db.put([(t, le_u64(k), b"v") for t in range(num_ts) for k in range(num_key)])
    it = db.scan_iter((0, num_ts - 1), comparator=comparators.le_u64)
    import collections.abc
    assert isinstance(it, collections.abc.Iterator)  # lazy, not a list
    seen = []
    for row in it:
        seen.append((struct.unpack("<Q", bytes(row["key"]))[0], row["ts"]))
    assert len(seen) == num_ts * num_key
    assert seen == sorted(seen)  # key-major, then ts — the scan contract


# ------------------------------------------------- compaction rollback
def _rollback_db(spark, path, keep=2):
    return HelixSpark.open(
        spark,
        path,
        HelixOptions(
            rick_range=100,
            outdate_range=1 << 40,
            auto_maintain=False,
            keep_generations=keep,
        ),
    )


def _grid(n_ts=300, n_key=4):
    return [
        (t, f"k{k}".encode(), f"v{t}-{k}".encode())
        for t in range(n_ts)
        for k in range(n_key)
    ]


def _snapshot(db):
    return sorted(
        (r["ts"], bytes(r["key"]), bytes(r["value"]))
        for r in db.scan((0, 1 << 40)).collect()
    )


def test_rollback_restores_pre_compaction_state(spark, db_path):
    db = _rollback_db(spark, db_path)
    db.put(_grid())
    before = _snapshot(db)
    db.compact(0, 199)
    assert _snapshot(db) == before  # transparency
    assert db.rollback_compaction()
    assert _snapshot(db) == before  # exact pre-compaction data
    # the engine is fully functional after rollback: compact again, read
    db.compact(0, 199)
    assert _snapshot(db) == before
    assert db.rollback_compaction()
    assert not db.rollback_compaction()  # history exhausted
    db.close()


def test_rollback_survives_restart(spark, db_path):
    db = _rollback_db(spark, db_path)
    db.put(_grid())
    before = _snapshot(db)
    db.compact(0, 199)
    db.close()
    db2 = _rollback_db(spark, db_path)
    assert db2.rollback_compaction()  # history rode the atomic state flip
    assert _snapshot(db2) == before
    db2.close()


def test_rollback_merges_with_new_puts(spark, db_path):
    db = _rollback_db(spark, db_path)
    db.put(_grid())
    db.compact(0, 199)
    db.put([(50, b"k0", b"amended")])  # recreates a parked bucket dir
    assert db.rollback_compaction()
    # the post-compaction put must survive the restore and win LWW
    assert db.get(50, b"k0") == b"amended"
    # and the pre-compaction neighbors are back
    assert db.get(50, b"k1") == b"v50-1"
    db.close()


def test_deferred_gc_expires_beyond_keep(spark, db_path):
    import os

    db = _rollback_db(spark, db_path, keep=1)
    db.put(_grid())
    db.compact(0, 99)
    trash1 = db.layout.trash_path(0)
    assert os.path.exists(trash1)
    db.put([(150, b"k9", b"x")])
    db.compact(100, 199)  # second commit pushes the first out of keep=1
    assert not os.path.exists(trash1)
    # only the newest commit remains rollbackable
    assert db.rollback_compaction()
    assert not db.rollback_compaction()
    db.close()


def test_vacuum_preserves_rollback_capability(spark, db_path):
    db = _rollback_db(spark, db_path)
    db.put(_grid())
    before = _snapshot(db)
    db.compact(0, 199)
    db.compact(200, 299)
    db.vacuum()  # must not collect dirs the rollback history references
    assert db.rollback_compaction()
    assert db.rollback_compaction()
    assert _snapshot(db) == before
    db.close()


# --------------------------------------------------------------- remote FS
# file:// URIs exercise the SAME py4j Hadoop FileSystem code path as
# hdfs:// / s3a:// (EngineFS.remote is True), so these tests cover the
# remote pointer protocol end-to-end on the local disk.


@pytest.fixture
def remote_db_path(tmp_path):
    return "file://" + str(tmp_path / "rdb")


def _kv_state(db):
    return {
        (r["ts"], bytes(r["key"])): bytes(r["value"])
        for r in db.scan((0, 10**9)).collect()
    }


def test_remote_pointer_versioned_roundtrip(spark, remote_db_path):
    """On a scheme:// store the state pointer is versioned: every commit
    publishes state.json.v{N} by rename-to-a-fresh-name (no delete window),
    reads fold checkpoint + deltas, old versions are GC'd down to the fold
    base (round-3 verdict 'What's wrong #1'; round-7 delta log)."""
    opts = HelixOptions(rick_range=10, auto_maintain=False)
    db = HelixSpark.open(spark, remote_db_path, opts)
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    db.compact(0, 9)
    db.put([(t + 10, b"k%d" % t, b"w%d" % t) for t in range(10)])
    expect = _kv_state(db)
    assert len(expect) == 20
    db.close()

    local_meta_dir = remote_db_path[len("file://"):] + "/_meta"
    import os as _os

    names = sorted(_os.listdir(local_meta_dir))
    versioned = [n for n in names if n.startswith("state.json.v")]
    assert versioned, names
    assert "state.json" not in names or len(versioned) == 1  # legacy gone once v1 lands
    assert not [n for n in names if ".tmp-" in n]  # tmp debris collected
    # GC floor: everything from the fold-base checkpoint (v0 here) stays
    # readable, bounded by the checkpoint interval
    from helixdb_spark.engine import STATE_CHECKPOINT_EVERY

    assert len(versioned) <= STATE_CHECKPOINT_EVERY + 1
    import json as _json

    oldest = min(versioned, key=lambda n: int(n.rsplit(".v", 1)[1]))
    with open(f"{local_meta_dir}/{oldest}") as f:
        assert "__delta__" not in _json.load(f)  # fold base is a snapshot

    db2 = HelixSpark.open(spark, remote_db_path, opts)
    assert set(db2._state["cold_manifest"]) == {"0"}
    assert _kv_state(db2) == expect
    db2.close()


def test_remote_pointer_crash_before_publish_keeps_old_state(spark, remote_db_path, monkeypatch):
    """Crash injected between the tmp write and the versioned rename: the
    previous pointer version is untouched, so a reopen sees the last
    committed state (the delete-then-rename protocol this replaces would
    have left NO pointer here)."""
    from helixdb_spark.fsio import EngineFS

    opts = HelixOptions(rick_range=10, auto_maintain=False)
    db = HelixSpark.open(spark, remote_db_path, opts)
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    expect = _kv_state(db)

    def boom(self, tmp, target):
        raise RuntimeError("injected crash before pointer publish")

    monkeypatch.setattr(EngineFS, "_publish_pointer", boom)
    with pytest.raises(RuntimeError, match="injected"):
        db.put([(99, b"k99", b"v99")])
    monkeypatch.undo()

    db2 = HelixSpark.open(spark, remote_db_path, opts)
    got = _kv_state(db2)
    # the data parquet landed before the crashed state flip; what matters is
    # the committed manifest/watermark state survived — and every committed
    # row is still exactly readable
    for k, v in expect.items():
        assert got[k] == v
    assert db2._state["seq"] >= 1
    db2.compact(0, 9)  # engine still fully operational
    assert _kv_state(db2)[(0, b"k0")] == b"v0"
    db2.close()


def test_remote_pointer_missing_adopts_complete_tmp(spark, remote_db_path):
    """Recovery branch: pointer versions deleted (simulating the legacy
    delete-then-rename crash window) but a COMPLETE tmp remains — reopen
    adopts the tmp instead of silently re-initializing with an empty cold
    manifest, and the kv scan stays exact."""
    opts = HelixOptions(rick_range=10, auto_maintain=False)
    db = HelixSpark.open(spark, remote_db_path, opts)
    db.put([(t, b"k%d" % t, b"v%d" % t) for t in range(10)])
    db.compact(0, 9)
    expect = _kv_state(db)
    state_text = __import__("json").dumps(db._state)
    db.close()

    import os as _os

    meta = remote_db_path[len("file://"):] + "/_meta"
    for n in _os.listdir(meta):
        _os.remove(f"{meta}/{n}")
    # a garbage (torn) tmp plus the complete one: adoption must skip the torn
    with open(f"{meta}/state.json.tmp-deadbeef", "w") as f:
        f.write(state_text[: len(state_text) // 2])
    with open(f"{meta}/state.json.tmp-cafebabe", "w") as f:
        f.write(state_text)

    db2 = HelixSpark.open(spark, remote_db_path, opts)
    assert set(db2._state["cold_manifest"]) == {"0"}  # manifest recovered
    assert _kv_state(db2) == expect
    db2.close()


def test_rollback_refuses_stale_history(spark, db_path):
    """A keep==0 compact bumps cold_gen_seq without appending history and
    GC's superseded dirs immediately — a later rollback must detect the
    retained entry is stale (gen != cold_gen_seq - 1) and refuse rather
    than restore a manifest whose directories are gone."""
    db = _rollback_db(spark, db_path, keep=2)
    db.put(_grid())
    db.compact(0, 199)          # history entry for gen=0
    db.close()
    db0 = _rollback_db(spark, db_path, keep=0)  # reopened without retention
    db0.put([(50, b"k0", b"late")])
    db0.compact(0, 199)         # gen=1 commits, no history, immediate GC
    after = _snapshot(db0)
    assert not db0.rollback_compaction()  # stale gen=0 entry refused
    assert _snapshot(db0) == after        # state untouched
    assert db0.get(50, b"k0") == b"late"
    db0.close()


def test_vacuum_collects_orphan_trash(spark, db_path):
    """trash/commit=G dirs no retained history entry references (crash
    debris or a lowered keep_generations) are collected by vacuum();
    referenced parking dirs survive."""
    import os

    db = _rollback_db(spark, db_path, keep=2)
    db.put(_grid())
    before = _snapshot(db)
    db.compact(0, 199)  # trash/commit=0 parked, referenced by history
    live_trash = db.layout.trash_path(0)
    orphan = db.layout.trash_path(99)
    os.makedirs(orphan + "/time_bucket=7", exist_ok=True)
    with open(orphan + "/time_bucket=7/part-junk.parquet", "w") as f:
        f.write("debris")
    db.vacuum()
    assert not os.path.exists(orphan)      # orphan collected
    assert os.path.exists(live_trash)      # referenced parking survives
    assert db.rollback_compaction()        # and still restores exactly
    assert _snapshot(db) == before
    db.close()


def test_scan_asof_commit_time_travel(spark, db_path):
    """Snapshot reads at 1 and 2 commits back see exactly the historical
    states, read-only (the live scan is untouched); depth beyond retention
    raises."""
    db = _rollback_db(spark, db_path, keep=2)
    db.put(_grid(n_ts=150))  # seq 0
    v0 = _snapshot(db)
    db.compact(0, 99)        # commit 1 (seq_at=1)
    db.put([(50, b"k0", b"amended")])  # seq 1
    v1 = sorted(set(v0) - {(50, b"k0", "v50-0".encode())} | {(50, b"k0", b"amended")})
    db.compact(0, 99)        # commit 2 folds the amendment (seq_at=2)
    db.put([(120, b"k1", b"newest")])  # seq 2, outside compacted range

    def snap(n):
        return sorted(
            (r["ts"], bytes(r["key"]), bytes(r["value"]))
            for r in db.scan_asof_commit(n, (0, 1 << 40)).collect()
        )

    assert snap(2) == v0                      # before commit 1: original
    assert snap(1) == v1                      # before commit 2: + amendment
    live = _snapshot(db)
    assert (120, b"k1", b"newest") in live    # live state unaffected
    assert (50, b"k0", b"amended") in live
    with pytest.raises(ValueError, match="not retained"):
        db.scan_asof_commit(3, (0, 1 << 40))
    # key-range + comparator path
    few = db.scan_asof_commit(2, (0, 1 << 40), (b"k0", b"k0")).collect()
    assert all(bytes(r["key"]) == b"k0" for r in few)
    assert len(few) == 150
    db.close()


def test_scan_asof_commit_refuses_broken_chain(spark, db_path):
    """A keep=0 compact between commits breaks history contiguity — the
    snapshot must refuse rather than mix epochs."""
    db = _rollback_db(spark, db_path, keep=2)
    db.put(_grid(n_ts=150))
    db.compact(0, 99)
    db.close()
    db0 = _rollback_db(spark, db_path, keep=0)
    db0.put([(10, b"k0", b"x")])
    db0.compact(0, 99)  # bumps gen without history
    with pytest.raises(ValueError, match="not contiguous"):
        db0.scan_asof_commit(1, (0, 1 << 40))
    db0.close()


def test_commit_diff_classifies_all_three(spark, db_path):
    """commit_diff emits added / updated / deleted (and nothing for the
    untouched majority): overwrite one key, insert one new identity, and
    outdate a prefix so rows the snapshot could see are gone live."""
    db = _rollback_db(spark, db_path, keep=2)
    db.put(_grid(n_ts=150))  # identities (t, k) for t in 0..149
    db.compact(0, 99)        # commit 1 — the snapshot point
    db.put([(50, b"k0", b"amended"), (200, b"k0", b"brandnew")])
    db.compact(0, 99)        # commit 2
    db.outdate(9)            # drops ts <= 9 from the live view only

    rows = {
        (r["ts"], bytes(r["key"]), r["change"]): (
            None if r["old_value"] is None else bytes(r["old_value"]),
            None if r["new_value"] is None else bytes(r["new_value"]),
        )
        for r in db.commit_diff(2, (0, 1 << 40)).collect()
    }
    assert rows[(50, b"k0", "updated")] == (b"v50-0", b"amended")
    assert rows[(200, b"k0", "added")] == (None, b"brandnew")
    # every grid key at each outdated ts shows as deleted
    assert rows[(5, b"k1", "deleted")][1] is None
    n_keys = len({k for (_, k, c) in rows if c == "deleted"})
    n_deleted = sum(1 for (_, _, c) in rows if c == "deleted")
    assert n_deleted == 10 * n_keys
    # nothing else: untouched identities never appear
    assert len(rows) == 2 + n_deleted
    db.close()
