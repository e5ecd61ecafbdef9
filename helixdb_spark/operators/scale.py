"""Scale-pattern operators: co-located (bucketed) joins and skew salting.

The reference co-locates work by routing keys to shards with a pluggable
hash (reference src/fn_registry.rs:50-55) so point ops touch one shard.
The Spark-native generalization is table **bucketing**: both join sides
pre-hashed into the same bucket layout means a join with NO shuffle at all
— at 100 TB the difference between moving terabytes and moving nothing.

Skew is the other failure mode of hash distribution (the reference's
per-key compaction groups have the same exposure, src/level.rs:387-397).
AQE's skew-join splitting handles sort-merge joins automatically (enabled
in our session factory); the **salted** helpers here cover the cases AQE
does not: skewed aggregations and skewed joins against a side too big to
broadcast.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}

# final-phase re-aggregation for each partial aggregate
_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    sorted_by: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``keys`` (Spark's durable analog of
    the reference's sharding fn — every row's bucket is decided by the same
    hash on both sides of a future join, so joins/aggregations on ``keys``
    read co-located data and skip the shuffle)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a table dir can survive a previous session whose in-memory catalog is
    # gone; managed-table creation refuses to reuse the location
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        import shutil
        from urllib.parse import urlparse

        shutil.rmtree(
            f"{urlparse(warehouse).path}/{table.lower()}", ignore_errors=True
        )
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    if sorted_by:
        writer = writer.sortBy(*sorted_by)
    writer.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, str],
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial-aggregate on
    (keys, salt), then merge on keys. Only algebraic aggregates (sum, count,
    min, max) decompose this way. Output columns are named ``<col>_<fn>``.

    Spark's own map-side partial aggregation covers mild skew; explicit
    salting is for the pathological case where one reduce key exceeds a
    single task (the classic hot-user/hot-null problem).
    """
    keys = list(keys)
    # Deterministic salt — hash of EVERY input column, taken before the
    # projection: monotonically_increasing_id() would re-deal salts when a
    # failed task replays, making plans nondeterministic under fault
    # recovery and defeating AQE statistics reuse. Hashing the full row
    # spreads a hot group across salts as long as its rows differ anywhere
    # (only byte-identical duplicate rows share a salt); the salt is purely
    # a routing key — both phases re-merge on the true keys either way.
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(num_salts)).alias("_salt")
    partial = (
        df.select(*keys, salt, *[F.col(c) for c in aggs])
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _AGG_FNS[fn](c).alias(f"{c}_{fn}")
                for c, fn in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE_FNS[fn](f"{c}_{fn}").alias(f"{c}_{fn}")
            for c, fn in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: the (big, skewed) left side gets a random
    salt in [0, num_salts); the right side is replicated num_salts times via
    an exploded sequence; the join key becomes (on..., salt), spreading each
    hot key over num_salts reduce partitions.

    Use when the right side is too large to broadcast and AQE's skew
    splitting doesn't apply (e.g. shuffled hash join, or aggregated
    downstream state). Cost: right side shuffles num_salts x its size —
    choose num_salts ~ (hot-key rows / target partition rows).

    Only inner/left/left_semi/left_anti are supported: the right side is
    replicated num_salts times, so right/full outer would emit each
    unmatched right row num_salts times instead of once.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — right-side replication "
            "duplicates unmatched right rows under right/full outer joins"
        )
    on = list(on)
    # deterministic salt (see salted_agg): hash every left column so equal
    # join-key rows still spread across salts, but a task retry re-derives
    # the identical routing
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*left.columns), F.lit(num_salts)).cast("int"),
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_left.join(replicated_right, on + ["_salt"], how).drop("_salt")


def bloom_filtered_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 23,
    how: str = "inner",
) -> DataFrame:
    """Semi-join reduction: pre-filter ``left`` with a Bloom filter of
    ``right``'s keys before the real join.

    At 100 TB the fact side of a selective join pays a full shuffle for
    rows that can never match. Spark injects this pattern itself for some
    shapes (runtime row-level filtering); this makes it explicit and
    composable — and the result is bit-identical to the plain join, because
    the exact join afterwards eliminates the filter's false positives (the
    oracle runs the plain join).

    Plan shape: the build side folds into a packed-word table (``word →
    or-ed bit mask``, ≤ num_bits/32 rows, one map-side-combined shuffle of
    the SMALL side). The fact side then probes each of its k bit positions
    through a **broadcast hash join** on the word index — O(1) hash lookup
    per probe, never a scan of the filter, and the fact side itself moves
    through zero exchanges before the surviving rows reach the join. k
    small broadcast joins beat one dense-array broadcast here because
    densifying num_bits/32 words costs O(words²) in a single-row fold,
    which caps the filter size; the word table has no such cap.

    Sizing: ~10 bits/item ≈ 1% false positives; FPs cost shuffle bytes,
    not correctness.

    Only inner/left_semi are supported: the pre-filter drops left rows
    with no build-side match, which is exactly what left/full outer must
    keep and what left_anti must OUTPUT — those joins would silently lose
    rows.
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_filtered_join: how={how!r} unsupported — the Bloom "
            "pre-filter drops unmatched left rows, breaking outer/anti joins"
        )
    import functools
    import operator

    from pyspark import StorageLevel

    from helixdb_spark.operators import sketches

    k = sketches.BLOOM_K
    word_bits = sketches._BLOOM_WORD

    # the filter is semantics-transparent (the exact join removes its false
    # positives), so unlike the oracle-replicated sketches this one uses
    # the native xxhash64 family — an order of magnitude cheaper per probe
    # than md5+hex on the 100-TB fact side
    def _positions(key_col):
        return [
            F.pmod(F.xxhash64(F.lit(i), key_col), F.lit(num_bits)) for i in range(k)
        ]

    build_pos = F.array(*_positions(F.col(right_key)))
    words = (
        right.select(F.explode(build_pos).alias("pos"))
        .select(
            (F.col("pos") / word_bits).cast("long").alias("w"),
            F.pow(F.lit(2.0), (F.col("pos") % word_bits).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("mask"))
        # each of the k probe joins broadcasts this table; the per-join
        # column renames block BroadcastExchange reuse, so without the
        # persist the build-side fold would run k times
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cur = left
    conds = []
    for i, p in enumerate(_positions(F.col(left_key))):
        wcol, mcol, tcol = f"__bw{i}", f"__bm{i}", f"__bt{i}"
        cur = (
            cur.withColumn(wcol, (p / word_bits).cast("long"))
            .withColumn(
                tcol,
                F.pow(F.lit(2.0), (p % word_bits).cast("double")).cast("long"),
            )
            .join(
                F.broadcast(
                    words.select(F.col("w").alias(wcol), F.col("mask").alias(mcol))
                ),
                wcol,
                "left",
            )
        )
        conds.append(
            F.col(mcol).isNotNull()
            & (F.col(mcol).bitwiseAND(F.col(tcol)) != 0)
        )
    scratch = [f"__b{ch}{i}" for i in range(k) for ch in "wmt"]
    filtered = cur.where(functools.reduce(operator.and_, conds)).drop(*scratch)
    from helixdb_spark.operators.util import unpersist_on_gc

    return unpersist_on_gc(
        filtered.join(right, filtered[left_key] == right[right_key], how), words
    )


def zorder_value(a, b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative long columns into a
    Morton (Z-order) value: a's bit i lands at 2i, b's at 2i+1.

    All shifts are Python-literal, so the whole thing folds into one
    codegen'd projection — no UDF. Inputs must already be quantized to
    [0, 2^bits); see ``quantize_col``.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1).cast("long")), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1
            )
        )
    return z


def quantize_col(c, lo, hi, bits: int = 16):
    """Min-max-normalize a numeric column onto the [0, 2^bits) integer grid
    (the rank proxy Z-ordering interleaves). ``lo``/``hi`` are plain Python
    numbers — at scale they come from table stats or a prior pass."""
    buckets = 1 << bits
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(buckets - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((c.cast("double") - float(lo)) / span * buckets).cast("long"),
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    lo_a,
    hi_a,
    col_b: str,
    lo_b,
    hi_b,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Z-order of two columns.

    A range-partition + within-partition sort on the interleaved value
    gives every output file a tight min/max envelope on BOTH columns, so a
    two-dimensional box predicate prunes most files from their parquet
    footer stats alone — one-dimensional sorting can only ever prune one of
    the two. This is the same layout trick Delta's OPTIMIZE ZORDER BY and
    Hudi clustering apply, built from plain Spark primitives
    (repartitionByRange + sortWithinPartitions + parquet min/max stats).
    The data itself is unchanged — queries over the z-ordered copy return
    identical results, they just read fewer bytes.
    """
    z = zorder_value(
        quantize_col(F.col(col_a), lo_a, hi_a, bits),
        quantize_col(F.col(col_b), lo_b, hi_b, bits),
        bits,
    ).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
