"""Engine OPTIMIZE (small-file bin-packing): file count drops to the
planned target, scan results are byte-identical across the rewrite, the
commit rides the standard write-new-then-flip protocol (rollback-able,
crash-safe), and a packed table is a no-op. Reference analog: the
background compaction scheduler QueueUpCompSched (src/compact_sched.rs:
16-143), applied to the file-count axis."""

from __future__ import annotations

import os

import pytest

from helixdb_spark import HelixOptions, HelixSpark


def _entries(n, lo=0):
    return [(t, b"k%03d" % (t % 40), b"v%d" % t) for t in range(lo, lo + n)]


def _snapshot(db):
    return sorted(
        (r["ts"], bytes(r["key"]), bytes(r["value"]))
        for r in db.scan((0, 10**9)).collect()
    )


def _bucket_files(base, gen, bucket):
    d = f"{base}/cold/gen={gen}/time_bucket={bucket}"
    if not os.path.isdir(d):
        return []
    return [
        n
        for n in os.listdir(d)
        if not n.startswith(("_", ".")) and os.path.isfile(f"{d}/{n}")
    ]


@pytest.fixture()
def packed_db(spark, tmp_path):
    base = str(tmp_path / "db")
    db = HelixSpark.open(
        spark, base, HelixOptions(rick_range=100, auto_maintain=False)
    )
    # several puts into the same buckets -> the compact shuffle writes
    # multiple files per bucket dir (one per task holding that bucket).
    # AQE would coalesce this toy shuffle into one task and defeat the
    # small-file setup, so switch it off for the compact only.
    db.put(_entries(200))
    db.put(_entries(200))
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        db.compact(0, 199)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    return db, base


def test_optimize_packs_files_and_preserves_scan(spark, packed_db):
    db, base = packed_db
    before = _snapshot(db)
    gen0 = db._state["cold_manifest"]["0"]
    n_before = len(_bucket_files(base, gen0, 0))
    assert n_before > 1, "fixture must start with a small-file bucket"

    packed = db.optimize(target_file_bytes=1 << 30)  # everything fits one file
    assert set(packed) == {0, 1}
    gen1 = db._state["cold_manifest"]["0"]
    assert gen1 != gen0
    assert len(_bucket_files(base, gen1, 0)) == 1
    assert not _bucket_files(base, gen0, 0)  # superseded dir GC'd (keep=0)
    assert _snapshot(db) == before  # byte-identical rows across the rewrite

    # reopen: the flipped manifest is the durable truth
    db.close()
    db2 = HelixSpark.open(
        spark, base, HelixOptions(rick_range=100, auto_maintain=False)
    )
    assert _snapshot(db2) == before
    db2.close()


def test_optimize_is_noop_when_packed(spark, packed_db):
    db, _ = packed_db
    assert db.optimize(target_file_bytes=1 << 30)
    gen_seq = db._state["cold_gen_seq"]
    assert db.optimize(target_file_bytes=1 << 30) == {}  # already packed
    assert db._state["cold_gen_seq"] == gen_seq  # no gen burned on a no-op
    db.close()


def test_optimize_respects_target_split_count(spark, packed_db):
    """A tiny target forces multi-file packing: the bucket ends up with
    more than one file but no more than ceil(bytes/target)."""
    import math

    db, base = packed_db
    before = _snapshot(db)
    gen0 = db._state["cold_manifest"]["0"]
    d = f"{base}/cold/gen={gen0}/time_bucket=0"
    total = sum(
        os.path.getsize(f"{d}/{n}") for n in _bucket_files(base, gen0, 0)
    )
    target = max(1, total // 3)
    want = math.ceil(total / target)
    packed = db.optimize(target_file_bytes=target)
    if 0 in packed:
        gen1 = db._state["cold_manifest"]["0"]
        got = len(_bucket_files(base, gen1, 0))
        assert 1 <= got <= want
    assert _snapshot(db) == before
    db.close()


def test_optimize_rollback(spark, tmp_path):
    """With keep_generations the optimize commit appends rollback history:
    rollback restores the previous (small-file) manifest and the scan."""
    base = str(tmp_path / "db")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=100, auto_maintain=False, keep_generations=2),
    )
    db.put(_entries(200))
    db.put(_entries(200))
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        db.compact(0, 199)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    before = _snapshot(db)
    manifest_before = dict(db._state["cold_manifest"])
    assert db.optimize(target_file_bytes=1 << 30)
    assert db._state["cold_manifest"] != manifest_before
    assert db.rollback_compaction()
    assert db._state["cold_manifest"] == manifest_before
    assert _snapshot(db) == before
    db.close()


def test_auto_optimize_rides_maintenance(spark, tmp_path):
    """With optimize_target_bytes set, a reviewer-triggered compaction is
    followed by the bin-pack pass automatically — the QueueUpCompSched
    scheduler hook. Scan stays exact throughout."""
    base = str(tmp_path / "db")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        db = HelixSpark.open(
            spark,
            base,
            HelixOptions(
                rick_range=100,
                outdate_range=100_000,
                auto_maintain=True,
                optimize_target_bytes=1 << 30,
            ),
        )
        # advance time far enough that the reviewer schedules a compact
        db.put(_entries(200))
        db.put([(t, b"k%03d" % (t % 40), b"z%d" % t) for t in range(300, 500)])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    manifest = db._state["cold_manifest"]
    assert manifest, "reviewer should have compacted at least one bucket"
    for b, g in manifest.items():
        files = _bucket_files(base, g, int(b))
        assert len(files) == 1, (b, g, files)
    got = _snapshot(db)
    assert len(got) == 400
    db.close()


def test_optimize_on_remote_scheme(spark, tmp_path):
    """optimize() through the Hadoop FileSystem path (file://): planner
    file listing, staged write, manifest flip, and GC all work on a
    scheme:// store; scan parity holds."""
    base = "file://" + str(tmp_path / "rdb")
    db = HelixSpark.open(
        spark, base, HelixOptions(rick_range=100, auto_maintain=False)
    )
    db.put(_entries(200))
    db.put(_entries(200))
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        db.compact(0, 199)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    before = _snapshot(db)
    local_base = str(tmp_path / "rdb")
    gen0 = db._state["cold_manifest"]["0"]
    had_many = len(_bucket_files(local_base, gen0, 0)) > 1
    packed = db.optimize(target_file_bytes=1 << 30)
    if had_many:
        assert packed
        gen1 = db._state["cold_manifest"]["0"]
        assert len(_bucket_files(local_base, gen1, 0)) == 1
    assert _snapshot(db) == before
    db.close()
