"""Physical layout: schemas, time-bucketing, hot/cold table paths.

Reference mapping (SURVEY.md §1.3):

- ``Entry{timestamp: i64, key: bytes, value: bytes}``
  (reference src/types/entry.rs:17-23) → a fixed explicit Spark schema.
- Time levels / ``LevelInfo`` (reference src/level.rs:26-36,
  src/types/level_info.rs:98-111) → a ``time_bucket`` **partition column**
  ``ts // rick_range``; Catalyst partition pruning replaces ``get_level_id``.
- Shards (reference src/db.rs:108-132) → hash partitioning on ``key`` inside
  each bucket; at 100 TB each bucket is written with enough files that every
  executor reads locally and point lookups prune to one bucket directory +
  parquet row groups via min/max key stats (which replace the SSTable index,
  reference src/file/sstable.rs).

Two tables:

- ``hot``  — append-only rows, the reference's rick L0 (src/file/rick.rs).
- ``cold`` — compacted: one row per (key, bucket) holding the key's
  time-sorted series, the reference's L>=1 compressed rick + SSTable
  (src/level.rs:356-459). Default codec keeps a native
  ``array<struct<ts,value>>`` so Parquet stats/encodings still apply; blob
  codecs from the registry store ``binary`` instead (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

# The single record type of the reference engine (src/types/entry.rs:17-23).
ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType(), False),
        T.StructField("key", T.BinaryType(), False),
        T.StructField("value", T.BinaryType(), False),
    ]
)

# Hot table adds lineage columns: seq (monotonic write sequence for
# last-write-wins overwrite semantics — reference rebuild dedup
# src/file/rick.rs:403-417) and the derived partition column.
HOT_SCHEMA = T.StructType(
    list(ENTRY_SCHEMA.fields)
    + [
        T.StructField("seq", T.LongType(), False),
        T.StructField("time_bucket", T.LongType(), False),
    ]
)

# Cold (compacted) table: per-(key, bucket) series. `chunk` carries the
# native array payload for the default codec; `blob` carries a custom
# codec's bytes (exactly one of the two is non-null). `codec` names the
# registry entry that produced it (reference fn_registry.rs:46-49 dispatch).
CHUNK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("ts", T.LongType(), False),
            T.StructField("value", T.BinaryType(), False),
        ]
    )
)
COLD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("chunk", CHUNK_TYPE, True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("time_bucket", T.LongType(), False),
    ]
)

# On disk the cold table is versioned: ``cold/gen=N/time_bucket=B/`` — a
# compaction writes a fresh generation dir and COMMITS it by flipping the
# bucket→gen manifest in the (atomically replaced) JSON state. ``gen`` is a
# partition column on read so the manifest predicate prunes uncommitted or
# superseded generations without ever opening their files.
COLD_GEN_SCHEMA = T.StructType(
    list(COLD_SCHEMA.fields) + [T.StructField("gen", T.LongType(), False)]
)


def time_bucket_expr(ts_col: str = "ts", rick_range: int = 1024) -> F.Column:
    """``floor(ts / rick_range)`` — the partition column replacing LevelInfo.

    Works for negative logical timestamps too (floor division), unlike a
    plain integer divide.
    """
    return F.floor(F.col(ts_col) / F.lit(rick_range)).cast("long")


class Layout:
    """Paths + bucketing arithmetic for one engine instance."""

    def __init__(self, base_path: str, rick_range: int = 1024) -> None:
        if rick_range <= 0:
            raise ValueError("rick_range must be positive")
        self.base_path = base_path.rstrip("/")
        self.rick_range = rick_range

    @property
    def hot_path(self) -> str:
        return f"{self.base_path}/hot"

    @property
    def cold_path(self) -> str:
        return f"{self.base_path}/cold"

    def cold_gen_path(self, gen: int) -> str:
        return f"{self.cold_path}/gen={int(gen)}"

    @property
    def meta_path(self) -> str:
        return f"{self.base_path}/_meta/state.json"

    def trash_path(self, commit_gen: int) -> str:
        """Deferred-GC parking for the hot partitions a compaction dropped —
        restorable by ``rollback_compaction`` while the commit stays inside
        the ``keep_generations`` window."""
        return f"{self.base_path}/trash/commit={int(commit_gen)}"

    def bucket_of(self, ts: int) -> int:
        return ts // self.rick_range

    def bucket_expr(self, ts_col: str = "ts") -> F.Column:
        return time_bucket_expr(ts_col, self.rick_range)
