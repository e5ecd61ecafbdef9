"""bulk_load: the single-write cold-ingest path (RocksDB
IngestExternalFile analog). Pins the three contract points the graded
kv_bulk_scan row cannot see: equivalence with put+compact, the
whole-bucket disjointness refusal (with the staged generation cleaned
up), and late-data LWW over a bulk-loaded bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helixdb_spark.engine import HelixOptions, HelixSpark
from helixdb_spark.plans.kv import _scratch_dir

DAY = 86400


def _open(spark, **kw):
    opts = HelixOptions(
        rick_range=DAY, outdate_range=1 << 40, auto_maintain=False, **kw
    )
    return HelixSpark.open(spark, _scratch_dir("kvbulktest"), opts)


def _rows(db, lo=0, hi=1 << 40):
    return sorted(
        (r["ts"], bytes(r["key"]), bytes(r["value"]))
        for r in db.scan((lo, hi)).collect()
    )


ENTRIES = [
    (100, b"a", b"v1"),
    (100, b"a", b"v2"),  # batch-internal dup: max value (v2) must win
    (200, b"b", b"vb"),
    (DAY + 50, b"a", b"day2"),
]


def test_bulk_load_equals_put_compact(spark):
    bulk = _open(spark)
    bulk.bulk_load(ENTRIES)
    ref = _open(spark)
    ref.put(ENTRIES[:1] + ENTRIES[2:])  # same LWW winner, explicit
    ref.put(ENTRIES[1:2])  # higher seq: v2 wins, like bulk's max-value rule
    ref.compact(0, 2 * DAY)
    assert _rows(bulk) == _rows(ref)
    # bulk data is COLD: no hot partitions remain
    assert bulk._fs.list_buckets(bulk.layout.hot_path) == []
    assert len(bulk._fs.list_buckets(bulk.layout.cold_gen_path(0))) == 2
    bulk.close()
    ref.close()


def test_bulk_load_refuses_overlapping_buckets(spark):
    db = _open(spark)
    db.put([(150, b"x", b"hot")])  # bucket 0 now holds hot data
    with pytest.raises(ValueError, match="already hold data"):
        db.bulk_load([(100, b"a", b"v")])
    # the staged generation was cleaned up and nothing was published
    assert dict(db._state.get("cold_manifest") or {}) == {}
    assert _rows(db) == [(150, b"x", b"hot")]
    # a disjoint-bucket bulk load still works afterwards
    db.bulk_load([(DAY + 10, b"y", b"cold")])
    assert (DAY + 10, b"y", b"cold") in _rows(db)
    db.close()


def test_late_put_wins_lww_over_bulk_bucket(spark):
    db = _open(spark)
    db.bulk_load([(100, b"a", b"old"), (200, b"b", b"vb")])
    db.put([(100, b"a", b"new")])  # hot seq > cold seq=-1
    assert (100, b"a", b"new") in _rows(db)
    assert (100, b"a", b"old") not in _rows(db)
    # re-compaction folds the overwrite into cold, result unchanged
    db.compact(0, DAY - 1)
    assert (100, b"a", b"new") in _rows(db)
    db.close()


def test_bulk_load_time_travel_commit(spark):
    """With keep_generations, a bulk commit is a first-class history entry:
    scan_asof_commit before/after it sees the corpus without/with the
    loaded buckets."""
    db = _open(spark, keep_generations=4)
    db.put([(100, b"a", b"v")])
    db.compact(0, DAY - 1)  # commit 1
    db.bulk_load([(DAY + 10, b"y", b"bulk")])  # commit 2
    now = _rows(db)
    assert (DAY + 10, b"y", b"bulk") in now
    before = sorted(
        (r["ts"], bytes(r["key"]), bytes(r["value"]))
        for r in db.scan_asof_commit(1, (0, 1 << 40)).collect()
    )
    assert (DAY + 10, b"y", b"bulk") not in before
    assert (100, b"a", b"v") in before
    db.close()
