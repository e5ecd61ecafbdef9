"""KV-engine queries for the graded contract.

These put the reference's actual surface — put / compact / scan
(reference src/db.rs:32-80) — under the same DuckDB-oracle gate as the
relational plans: the roundtrip query
writes the events table through the engine (hot parquet), compacts a
sub-range (hot → cold chunks, reference src/level.rs:356-459), and scans it
back; the result must equal a plain SQL range select over the source table,
which is exactly the compaction-transparency contract (reference
src/level.rs:823-875).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from helixdb_spark.sources import load_table

# Scratch engine dirs for the graded kv queries. The returned DataFrames
# read their parquet LAZILY (the driver collects after the query function
# returns), so the dir must outlive the call — but minting a fresh
# mkdtemp per invocation leaked ~300 MB per call per round (80 GB of
# /tmp/helix_kv* found in round 6: bench min-of-N re-runs each query).
# Every scratch dir is registered for removal at interpreter exit.
import atexit as _atexit
import shutil as _shutil

_SCRATCH_DIRS: list[str] = []


def _scratch_dir(tag: str) -> str:
    base = tempfile.mkdtemp(prefix=f"helix_{tag}_")
    _SCRATCH_DIRS.append(base)
    return base


@_atexit.register
def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        _shutil.rmtree(d, ignore_errors=True)

# first week of the events corpus (all sf share the 2024-01 time span)
SCAN_TS_LO = 1704067200  # 2024-01-01 00:00:00 UTC
SCAN_TS_HI = 1704672000  # 2024-01-08 00:00:00 UTC
COMPACT_TS_HI = 1704239999  # first two days -> cold, rest stays hot
KEY_LO, KEY_HI = "1", "5"


def kv_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact -> scan roundtrip through the engine.

    Entries are (ts=floor(epoch), key=event_id, value=props) — event_id is
    unique so the roundtrip is insensitive to last-write-wins tie order.
    The scan exercises time-bucket pruning (F1), the inclusive time & key
    range predicates (F2/F3), hot+cold union with chunk explode, and the
    key-major ordering contract (O1) in one graded query.
    """
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvq")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    scanned = db.scan(
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_ROUNDTRIP_SQL = f"""
SELECT ts, key, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         event_id::VARCHAR AS key,
         props AS value
  FROM events
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}
  AND key >= '{KEY_LO}' AND key <= '{KEY_HI}'
ORDER BY key, ts
"""


def kv_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct user keys + per-key counts through the engine after a
    put+compact cycle (reference MemIndex key bookkeeping, src/index.rs:9-15,
    A4) — here keys are user_ids, so (ts, key) collisions exist and the
    engine's last-write-wins dedup (rick.rs:403-417) is part of the
    contract: counts are counts of distinct (ts, key), not raw rows.
    """
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("user_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvc")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400 * 7, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    return (
        db.key_counts()
        .select(F.decode("key", "utf-8").alias("key"), "count")
        .orderBy("key")
    )


KV_KEY_COUNTS_SQL = """
SELECT user_id::VARCHAR AS key, count(*) AS count FROM (
  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id
  FROM events
)
GROUP BY user_id
ORDER BY key
"""


QUERIES = {
    "kv_roundtrip_scan": kv_roundtrip_scan,
    "kv_key_counts": kv_key_counts,
}

ORACLES = {
    "kv_roundtrip_scan": KV_ROUNDTRIP_SQL,
    "kv_key_counts": KV_KEY_COUNTS_SQL,
}


# probe instants for the as-of query: mid-day-1 (cold after compact),
# mid-day-3 (hot), day-7 (hot, far from any write)
ASOF_PROBES = (1704110400, 1704283200, 1704585600)


def kv_asof_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk as-of reads through the engine: every user key probed at three
    fixed instants, each answered with the latest entry at or before the
    probe (the distributed form of ``HelixSpark.get_asof`` — the as-of
    semantics the reference's exact-match chunk probe lacks,
    src/level.rs:503-505). Entries are pre-deduped to one row per
    (second, user) with ``max(props)`` so the content is deterministic on
    both engines; probes span the compacted AND hot ranges, so the as-of
    window reads across the hot/cold boundary. The oracle is a DuckDB
    ``ASOF LEFT JOIN``. One shuffle on the key (operators.asof tagged-union
    window); probes with no prior entry keep nulls."""
    from helixdb_spark.engine import HelixOptions, HelixSpark
    from helixdb_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    entries = (
        ev.groupBy(
            F.unix_timestamp("ts").alias("ts"),
            F.col("user_id").cast("string").alias("k"),
        )
        .agg(F.max("props").alias("v"))
        .select(
            "ts",
            F.encode("k", "utf-8").alias("key"),
            F.encode("v", "utf-8").alias("value"),
        )
    )
    base = _scratch_dir("kva")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    ent = db.scan((SCAN_TS_LO, SCAN_TS_HI))
    probes = (
        ent.select("key")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(t,) for t in ASOF_PROBES], "p_ts long"
                )
            )
        )
    )
    out = asof_join(
        probes, ent, on=["key"], left_ts="p_ts", right_ts="ts",
        right_values=["ts", "value"],
    )
    # no-match probes coalesce to sentinels: the gate compare sorts rows
    # and NULLs don't order against ints
    return out.select(
        F.decode("key", "utf-8").alias("key"),
        "p_ts",
        F.coalesce(F.col("ts_asof"), F.lit(-1)).alias("found_ts"),
        F.coalesce(F.decode("value_asof", "utf-8"), F.lit("")).alias("value"),
    ).orderBy("key", "p_ts")


KV_ASOF_SQL = f"""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id::VARCHAR AS key,
         max(props) AS value
  FROM events
  GROUP BY 1, 2
),
er AS (SELECT * FROM e WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}),
probes AS (
  SELECT key, unnest([{", ".join(str(t) for t in ASOF_PROBES)}])::BIGINT AS p_ts
  FROM (SELECT DISTINCT key FROM er)
)
SELECT p.key, p.p_ts, coalesce(e.ts, -1) AS found_ts,
       coalesce(e.value, '') AS value
FROM probes p ASOF LEFT JOIN er e ON p.key = e.key AND p.p_ts >= e.ts
ORDER BY p.key, p.p_ts
"""


QUERIES["kv_asof_probes"] = kv_asof_probes
ORACLES["kv_asof_probes"] = KV_ASOF_SQL


# retention boundary for kv_retention_scan: everything before day 3 is
# outdated; the cutoff lands MID-bucket (rick_range=1 day, cutoff at noon of
# day 2) so the query exercises both the whole-bucket drop and the read-path
# filter for the partially-retired bucket (reference level_info.rs:130-134 +
# our outdate read filter).
OUTDATE_CUTOFF = 1704196800  # 2024-01-02 12:00:00 UTC


def kv_retention_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact -> OUTDATE -> scan: the reference's time-driven
    retention (TimestampAction::Outdate, reference src/level.rs:527-537;
    its actual deletion is todo!() at level.rs:476-484 — ours deletes).
    Scan after outdate must see exactly the rows with ts > cutoff; the
    oracle is the same range select with the cutoff predicate. Also proves
    outdated timestamps return nothing across the hot/cold split."""
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvr")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    db.outdate(OUTDATE_CUTOFF)
    scanned = db.scan((SCAN_TS_LO, SCAN_TS_HI), (KEY_LO.encode(), KEY_HI.encode()))
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_RETENTION_SQL = f"""
SELECT ts, key, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         event_id::VARCHAR AS key,
         props AS value
  FROM events
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI} AND ts > {OUTDATE_CUTOFF}
  AND key >= '{KEY_LO}' AND key <= '{KEY_HI}'
ORDER BY key, ts
"""


def kv_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact THROUGH A CUSTOM UDCF CODEC -> scan: the reference's
    per-key pluggable compression surface (UDCF compress/decompress +
    dispatch, reference src/fn_registry.rs:8-49, applied at
    level.rs:412-419 and 496-499). Keys are dispatched per-key — even
    user_ids to the delta_zlib blob codec, odd ones to native array storage
    — and the scan after compaction must still equal the plain SQL range
    select: codec choice is storage-transparent. This grades U2/U3/U4 of
    SURVEY.md §2.9 end-to-end under the oracle gate."""
    from helixdb_spark.codecs import ARRAY_CODEC, CodecRegistry
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = (
        ev.groupBy(
            F.unix_timestamp("ts").alias("ts"),
            F.col("user_id").cast("string").alias("k"),
        )
        .agg(F.max("props").alias("v"))
        .select(
            "ts",
            F.encode("k", "utf-8").alias("key"),
            F.encode("v", "utf-8").alias("value"),
        )
    )
    registry = CodecRegistry()
    registry.register_dispatch(
        lambda key: "delta_zlib" if int(key.decode()) % 2 == 0 else ARRAY_CODEC
    )
    base = _scratch_dir("kvcodec")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
        codecs=registry,
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    scanned = db.scan((SCAN_TS_LO, COMPACT_TS_HI))
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_CODEC_SQL = f"""
SELECT ts, key, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id::VARCHAR AS key,
         max(props) AS value
  FROM events
  GROUP BY 1, 2
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {COMPACT_TS_HI}
ORDER BY key, ts
"""


QUERIES["kv_retention_scan"] = kv_retention_scan
ORACLES["kv_retention_scan"] = KV_RETENTION_SQL
QUERIES["kv_codec_roundtrip"] = kv_codec_roundtrip
ORACLES["kv_codec_roundtrip"] = KV_CODEC_SQL


# numeric key range for the comparator scan: lexical byte order of
# little-endian u64 keys would both SELECT a different key set and ORDER
# it differently, so a hash match proves the pluggable comparator is
# actually applied to the range predicate AND the sort (reference passes
# the comparator into the range check at src/level.rs:145-149).
U64_KEY_LO, U64_KEY_HI = 17, 113


def _le_u64_bytes(col):
    """8-byte little-endian u64 key from a long column, JVM-side."""
    h = F.lpad(F.hex(col), 16, "0")
    return F.unhex(
        F.concat(*[F.substring(h, i, 2) for i in (15, 13, 11, 9, 7, 5, 3, 1)])
    )


def kv_comparator_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through a CUSTOM comparator (reference ``Comparator`` trait,
    src/util.rs:21-109; U6/O2): keys are little-endian u64 user_ids — the
    reference benchmark's exact key shape (benchmarks/src/main.rs:220-234)
    — and both the key-range predicate and the emission order go through
    ``comparators.le_u64``, i.e. numeric order, not byte order. The scan
    result decodes keys back to numbers so the DuckDB oracle is a plain
    numeric range select."""
    from helixdb_spark import comparators
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = (
        ev.groupBy(
            F.unix_timestamp("ts").alias("ts"),
            F.col("user_id").alias("uid"),
        )
        .agg(F.max("props").alias("v"))
        .select(
            "ts",
            _le_u64_bytes(F.col("uid")).alias("key"),
            F.encode("v", "utf-8").alias("value"),
        )
    )
    base = _scratch_dir("kvcmp")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400 * 7, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    import struct as _struct

    lo = _struct.pack("<Q", U64_KEY_LO)
    hi = _struct.pack("<Q", U64_KEY_HI)
    scanned = db.scan(
        (SCAN_TS_LO, COMPACT_TS_HI), (lo, hi), comparator=comparators.le_u64
    )
    return scanned.select(
        "ts",
        comparators.le_u64(F.col("key")).cast("long").alias("user_id"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_COMPARATOR_SQL = f"""
SELECT ts, user_id, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id,
         max(props) AS value
  FROM events
  GROUP BY 1, 2
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {COMPACT_TS_HI}
  AND user_id >= {U64_KEY_LO} AND user_id <= {U64_KEY_HI}
ORDER BY user_id, ts
"""


QUERIES["kv_comparator_scan"] = kv_comparator_scan
ORACLES["kv_comparator_scan"] = KV_COMPARATOR_SQL


def kv_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact -> LATE put into the compacted bucket -> re-compact ->
    scan, under the full oracle gate: the engine's bucket-idempotent MERGE
    re-compaction (late hot rows + previously compacted cold rows of the
    bucket fold together, hot seq beating cold's seq=-1) and the
    write-new-then-flip generation commit, end to end. This is the exact
    late-data scenario the reference silently loses (its compaction leaves
    late puts unreachable behind the advanced LEVEL_INFO watermark —
    SURVEY.md §2.10, src/types/level_info.rs:98-111); here the scan must
    equal a plain SQL last-write-wins select, proving we beat that caveat.

    The late batch overwrites every 7th event of the compacted range with
    an amended value; LWW makes the amended value win on both engines.
    """
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvlate")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    late = ev.where(
        (F.unix_timestamp("ts") <= COMPACT_TS_HI)
        & (F.col("event_id") % 7 == 0)
    ).select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.col("props"), F.lit("+late")), "utf-8").alias("value"),
    )
    db.put(late)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)  # bucket MERGE, not replace
    scanned = db.scan(
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_LATE_DATA_SQL = f"""
SELECT ts, key, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         event_id::VARCHAR AS key,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) <= {COMPACT_TS_HI}
                   AND event_id % 7 = 0
              THEN props || '+late' ELSE props END AS value
  FROM events
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}
  AND key >= '{KEY_LO}' AND key <= '{KEY_HI}'
ORDER BY key, ts
"""


QUERIES["kv_late_data"] = kv_late_data
ORACLES["kv_late_data"] = KV_LATE_DATA_SQL


def kv_rollback_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact -> amend some rows -> ROLLBACK the compaction -> scan.

    Exercises the deferred-GC commit history (HelixOptions.keep_generations):
    the rollback must restore the exact pre-compaction hot layout from
    trash/ while keeping the amendment that was put AFTER the compaction
    (file-level merge into the restored bucket; LWW reconciles). The scan
    must equal the plain SQL last-write-wins select — the amended values
    win, everything else reads as originally written. The reference cannot
    express this at all: its LEVEL_INFO advance is one-way
    (src/types/level_info.rs:98-111).
    """
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvrb")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(
            rick_range=86400,
            outdate_range=1 << 40,
            auto_maintain=False,
            keep_generations=2,
        ),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    amend = ev.where(
        (F.unix_timestamp("ts") <= COMPACT_TS_HI) & (F.col("event_id") % 11 == 0)
    ).select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.col("props"), F.lit("+amended")), "utf-8").alias("value"),
    )
    db.put(amend)
    assert db.rollback_compaction()
    scanned = db.scan(
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_ROLLBACK_SQL = f"""
SELECT ts, key, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         event_id::VARCHAR AS key,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) <= {COMPACT_TS_HI}
                   AND event_id % 11 = 0
              THEN props || '+amended' ELSE props END AS value
  FROM events
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}
  AND key >= '{KEY_LO}' AND key <= '{KEY_HI}'
ORDER BY key, ts
"""

QUERIES["kv_rollback_scan"] = kv_rollback_scan
ORACLES["kv_rollback_scan"] = KV_ROLLBACK_SQL


def kv_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: put -> compact -> amended put -> compact -> read the
    snapshot as of BEFORE the first commit (``scan_asof_commit(2)``) — the
    original data, with both later mutations invisible, while the live scan
    would show the amendments. Read-only (nothing restored or mutated),
    built on the deferred-GC commit history: parked hot partitions + the
    historical cold manifest + the per-commit put-sequence watermark. The
    reference's LEVEL_INFO advance is one-way (src/types/level_info.rs:
    98-111) — engine addition. Oracle: the plain original rows."""
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvsnap")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(
            rick_range=86400,
            outdate_range=1 << 40,
            auto_maintain=False,
            keep_generations=2,
        ),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)  # commit 1
    amend = ev.where(
        (F.unix_timestamp("ts") <= COMPACT_TS_HI) & (F.col("event_id") % 5 == 0)
    ).select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.col("props"), F.lit("+v2")), "utf-8").alias("value"),
    )
    db.put(amend)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)  # commit 2 folds the amendment in
    snap = db.scan_asof_commit(
        2,
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return snap.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


KV_SNAPSHOT_SQL = f"""
SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts,
       event_id::VARCHAR AS key,
       props AS value
FROM events
WHERE CAST(floor(epoch(ts)) AS BIGINT) >= {SCAN_TS_LO}
  AND CAST(floor(epoch(ts)) AS BIGINT) <= {SCAN_TS_HI}
  AND event_id::VARCHAR >= '{KEY_LO}' AND event_id::VARCHAR <= '{KEY_HI}'
ORDER BY key, ts
"""


QUERIES["kv_snapshot_scan"] = kv_snapshot_scan
ORACLES["kv_snapshot_scan"] = KV_SNAPSHOT_SQL


def kv_commit_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture: put -> compact (commit 1) -> put amendments
    ('+v2' overwrites of every 5th key in the compacted window) AND brand-new
    entries (ts+1 echoes of every 7th key) -> compact (commit 2) -> diff the
    snapshot from before commit 2 against the live view
    (``HelixSpark.commit_diff``). The result is exactly the incremental
    feed: one ``updated`` row per overwrite, one ``added`` row per new
    entry, nothing for the untouched majority. Oracle: the same amendment /
    insert arithmetic replayed over the source table.
    """
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvdiff")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(
            rick_range=86400,
            outdate_range=1 << 40,
            auto_maintain=False,
            keep_generations=2,
        ),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)  # commit 1: the "before" snapshot
    amend = ev.where(
        (F.unix_timestamp("ts") <= COMPACT_TS_HI) & (F.col("event_id") % 5 == 0)
    ).select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.col("props"), F.lit("+v2")), "utf-8").alias("value"),
    )
    inserts = ev.where(
        (F.col("event_id") % 7 == 0)
        & (F.unix_timestamp("ts") + 1 <= SCAN_TS_HI)
    ).select(
        (F.unix_timestamp("ts") + 1).alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.col("props"), F.lit("+new")), "utf-8").alias("value"),
    )
    db.put(amend.unionByName(inserts))
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)  # commit 2 folds both in
    # commits_back=2: the snapshot sequence watermark is commit 1's, so the
    # amendment/insert puts (staged between the commits) are invisible in
    # the "old" side — the diff is exactly those two put batches
    diff = db.commit_diff(
        2,
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return diff.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        "change",
        F.decode("old_value", "utf-8").alias("old_value"),
        F.decode("new_value", "utf-8").alias("new_value"),
    )


KV_COMMIT_DIFF_SQL = f"""
WITH src AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts,
         event_id,
         event_id::VARCHAR AS key,
         props
  FROM events
),
updated AS (
  SELECT ts, key, 'updated' AS change,
         props AS old_value, props || '+v2' AS new_value
  FROM src
  WHERE ts <= {COMPACT_TS_HI} AND event_id % 5 = 0
),
added AS (
  SELECT ts + 1 AS ts, key, 'added' AS change,
         NULL AS old_value, props || '+new' AS new_value
  FROM src
  WHERE event_id % 7 = 0 AND ts + 1 <= {SCAN_TS_HI}
)
SELECT ts, key, change, old_value, new_value
FROM (SELECT * FROM updated UNION ALL SELECT * FROM added)
WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}
  AND key >= '{KEY_LO}' AND key <= '{KEY_HI}'
ORDER BY key, ts
"""


QUERIES["kv_commit_diff"] = kv_commit_diff
ORACLES["kv_commit_diff"] = KV_COMMIT_DIFF_SQL


def kv_optimize_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact -> OPTIMIZE -> scan: the small-file bin-packing
    maintenance op (engine.optimize, round 6 — the QueueUpCompSched
    file-count analog, reference src/compact_sched.rs:16-143) under the
    oracle gate. The compact runs with AQE coalescing off so each cold
    bucket lands as multiple task files; optimize must then rewrite them
    to the packed target under a new generation WITHOUT changing a single
    row — the scan must still equal the plain SQL range select. File-count
    mechanics are pinned in tests/test_optimize.py; this row pins the
    data across the rewrite at grading scale."""
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvopt")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    db.optimize()  # packs every multi-file cold bucket to one file
    scanned = db.scan(
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


QUERIES["kv_optimize_scan"] = kv_optimize_scan
ORACLES["kv_optimize_scan"] = KV_ROUNDTRIP_SQL


def kv_statelog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 delta-log lifecycle under the oracle gate: 7 per-day puts +
    5 per-day compactions drive the commit count past
    STATE_CHECKPOINT_EVERY, so the reopened engine must fold a full
    checkpoint PLUS a delta chain (engine._load_state) — and the scan over
    the mixed cold(5 days)/hot(2 days) layout must still equal the plain
    SQL range select. The reference rewrites its whole LEVEL_INFO
    superblock per advance (src/types/level_info.rs:44-52); this row
    proves the O(changed)-per-commit replacement loses nothing across a
    put/compact/reopen lifecycle. Log mechanics (record sizes, checkpoint
    compaction, gap refusal) are pinned in tests/test_state_log.py; this
    row pins the DATA across the log at grading scale."""
    from helixdb_spark.engine import (
        STATE_CHECKPOINT_EVERY,
        HelixOptions,
        HelixSpark,
    )

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    ).where((F.col("ts") >= SCAN_TS_LO) & (F.col("ts") <= SCAN_TS_HI))
    base = _scratch_dir("kvlog")
    opts = HelixOptions(
        rick_range=86400, outdate_range=1 << 40, auto_maintain=False
    )
    db = HelixSpark.open(spark, base, opts)
    day = 86400
    for d in range(7):  # one commit per ingest day
        lo = SCAN_TS_LO + d * day
        # the last day is HI-inclusive: the scan (and oracle) bound is
        # both-inclusive, and SCAN_TS_HI == SCAN_TS_LO + 7 days exactly
        hi = (F.col("ts") <= SCAN_TS_HI) if d == 6 else (F.col("ts") < lo + day)
        db.put(entries.where((F.col("ts") >= lo) & hi))
    for d in range(5):  # five separate maintenance commits
        lo = SCAN_TS_LO + d * day
        db.compact(lo, lo + day - 1)
    db.close()
    db2 = HelixSpark.open(spark, base, opts)  # folds checkpoint + deltas
    assert db2._state["seq"] >= 7
    assert db2._state_version + 1 > STATE_CHECKPOINT_EVERY  # chain crossed
    scanned = db2.scan(
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


QUERIES["kv_statelog_scan"] = kv_statelog_scan
ORACLES["kv_statelog_scan"] = KV_ROUNDTRIP_SQL


def kv_codec_gorilla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put -> compact through the Gorilla-style UDCF (ts_delta_xor:
    zigzag-varint timestamp deltas + XOR'd 8-byte values with zero-byte
    elision — Pelkonen et al. VLDB'15, byte-aligned) -> scan. The metrics
    payload is the event value scaled to int64 and packed big-endian, the
    fixed-width shape the codec compresses; even user keys route through
    the codec, odd ones stay native array (the per-key dispatch surface,
    reference fn_registry.rs:46-49). Compression must be storage-
    transparent: the scan equals a plain SQL range select."""
    from helixdb_spark.codecs import ARRAY_CODEC, CodecRegistry
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    val = F.round(F.lit(1e-9) + F.col("value") * 1000, 0).cast("long")
    entries = (
        ev.groupBy(
            F.unix_timestamp("ts").alias("ts"),
            F.col("user_id").cast("string").alias("k"),
        )
        .agg(F.max(val).alias("v"))
        .select(
            "ts",
            F.encode("k", "utf-8").alias("key"),
            # 8-byte big-endian payload — the codec's fixed-width contract
            F.unhex(F.lpad(F.hex("v"), 16, "0")).alias("value"),
        )
    )
    registry = CodecRegistry()
    registry.register_dispatch(
        lambda key: "ts_delta_xor" if int(key.decode()) % 2 == 0 else ARRAY_CODEC
    )
    base = _scratch_dir("kvgor")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
        codecs=registry,
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)
    scanned = db.scan((SCAN_TS_LO, COMPACT_TS_HI))
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.conv(F.hex("value"), 16, 10).cast("long").alias("value"),
    )


KV_GORILLA_SQL = f"""
SELECT ts, key, value FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id::VARCHAR AS key,
         max(CAST(round(1e-9 + value * 1000, 0) AS BIGINT)) AS value
  FROM events
  GROUP BY 1, 2
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {COMPACT_TS_HI}
ORDER BY key, ts
"""

QUERIES["kv_codec_gorilla"] = kv_codec_gorilla
ORACLES["kv_codec_gorilla"] = KV_GORILLA_SQL


def kv_replicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw replication end-to-end, graded: the source engine compacts
    through the per-key UDCF dispatch (even user keys -> delta_zlib blobs,
    odd -> native array), ``scan_raw`` exports the stored chunks — no
    decompress UDF runs, compressed bytes move as-is — and a FRESH engine
    at a different root ingests them with ``restore_chunks`` (CAS-reserved
    generation, manifest flip). The replica's decoded scan must equal the
    plain SQL range select over the original source table: replication of
    stored bytes is end-to-end transparent, decompress happens exactly
    once, at the replica's read. This is the backup/replicate pair the
    reference's ReadOption::no_decompress exists for (src/option.rs:
    131-148), completed with the import half the reference lacks."""
    from helixdb_spark.codecs import ARRAY_CODEC, CodecRegistry
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = (
        ev.groupBy(
            F.unix_timestamp("ts").alias("ts"),
            F.col("user_id").cast("string").alias("k"),
        )
        .agg(F.max("props").alias("v"))
        .select(
            "ts",
            F.encode("k", "utf-8").alias("key"),
            F.encode("v", "utf-8").alias("value"),
        )
    )

    def registry() -> CodecRegistry:
        r = CodecRegistry()
        r.register_dispatch(
            lambda key: "delta_zlib" if int(key.decode()) % 2 == 0 else ARRAY_CODEC
        )
        return r

    opts = HelixOptions(
        rick_range=86400, outdate_range=1 << 40, auto_maintain=False
    )
    src = HelixSpark.open(spark, _scratch_dir("kvrepA"), opts, codecs=registry())
    src.put(entries)
    src.compact(SCAN_TS_LO, COMPACT_TS_HI)
    exported = src.scan_raw(time_range=(SCAN_TS_LO, COMPACT_TS_HI))

    dst = HelixSpark.open(spark, _scratch_dir("kvrepB"), opts, codecs=registry())
    dst.restore_chunks(exported)
    scanned = dst.scan((SCAN_TS_LO, COMPACT_TS_HI))
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


QUERIES["kv_replicate_scan"] = kv_replicate_scan
ORACLES["kv_replicate_scan"] = KV_CODEC_SQL


def kv_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface graded (SURVEY §7.1 phase 6 — the layer
    the reference lacks entirely): after put + a partial compact, ``db.sql``
    runs an aggregation over the registered logical entry view (hot ∪
    decoded cold under LWW dedup), so the SQL layer sees exactly what
    ``scan`` sees — per-key counts, time extent, and bytewise-max value
    over the first week, equal to the plain SQL rollup over the source
    table."""
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = (
        ev.groupBy(
            F.unix_timestamp("ts").alias("ts"),
            F.col("user_id").cast("string").alias("k"),
        )
        .agg(F.max("props").alias("v"))
        .select(
            "ts",
            F.encode("k", "utf-8").alias("key"),
            F.encode("v", "utf-8").alias("value"),
        )
    )
    db = HelixSpark.open(
        spark,
        _scratch_dir("kvsql"),
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.put(entries)
    db.compact(SCAN_TS_LO, COMPACT_TS_HI)  # rollup spans hot AND cold
    return db.sql(f"""
        SELECT CAST(key AS STRING) AS key,
               count(*) AS n_entries,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               CAST(max(value) AS STRING) AS max_value
        FROM entries
        WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}
        GROUP BY 1
        ORDER BY 1
    """)


KV_SQL_ROLLUP_SQL = f"""
SELECT key, count(*) AS n_entries, min(ts) AS first_ts, max(ts) AS last_ts,
       max(value) AS max_value
FROM (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts, user_id::VARCHAR AS key,
         max(props) AS value
  FROM events
  GROUP BY 1, 2
)
WHERE ts >= {SCAN_TS_LO} AND ts <= {SCAN_TS_HI}
GROUP BY 1
ORDER BY 1
"""

QUERIES["kv_sql_rollup"] = kv_sql_rollup
ORACLES["kv_sql_rollup"] = KV_SQL_ROLLUP_SQL


def kv_bulk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk cold ingest -> scan: the whole events batch lands as ONE
    committed cold generation via ``HelixSpark.bulk_load`` (one shuffle +
    one partitioned write — no hot churn, no second compaction pass; the
    backfill path at 100 TB) and the same pruned range scan must read it
    back exactly like the put+compact roundtrip (same oracle as
    kv_roundtrip_scan). event_id keys are unique, so the result is
    insensitive to the batch-internal LWW tie rule."""
    from helixdb_spark.engine import HelixOptions, HelixSpark

    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        F.unix_timestamp("ts").alias("ts"),
        F.encode(F.col("event_id").cast("string"), "utf-8").alias("key"),
        F.encode(F.col("props"), "utf-8").alias("value"),
    )
    base = _scratch_dir("kvbulk")
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=86400, outdate_range=1 << 40, auto_maintain=False),
    )
    db.bulk_load(entries)
    scanned = db.scan(
        (SCAN_TS_LO, SCAN_TS_HI),
        (KEY_LO.encode(), KEY_HI.encode()),
    )
    return scanned.select(
        "ts",
        F.decode("key", "utf-8").alias("key"),
        F.decode("value", "utf-8").alias("value"),
    )


QUERIES["kv_bulk_scan"] = kv_bulk_scan
ORACLES["kv_bulk_scan"] = KV_ROUNDTRIP_SQL
