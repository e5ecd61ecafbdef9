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
    base = tempfile.mkdtemp(prefix="helix_kvq_")
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
    base = tempfile.mkdtemp(prefix="helix_kvc_")
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
