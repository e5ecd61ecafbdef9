#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric","value","unit","queries","sf"}.

Also self-measures the db_bench-shaped KV engine analogs (fill / batched
random read / scan — shapes from BASELINE.md: LE-u64 keys, value_size 1024,
uniform probes) as kv_* entries.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "running_revenue_by_nation",
    "ev_hourly_rollup",
    "ev_sessionize",
    "ev_click_asof_purchase",
    "ev_kv_scan",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_quality",
    "mm_frame_sample",
    "stream_hourly_rollup",
]

# db_bench-shaped KV micro-bench (scaled to keep the wall clock sane on CI;
# the shape — key/value layout, batched probes — matches BASELINE.md)
KV_NUM_KEY = 256
KV_NUM_TS = 64
KV_VALUE_SIZE = 1024
KV_READ_PROBES = 256


def le_u64(i: int) -> bytes:
    return struct.pack("<Q", i)


def kv_bench(spark) -> dict[str, float]:
    from helixdb_spark import comparators
    from helixdb_spark.engine import HelixOptions, HelixSpark

    base = tempfile.mkdtemp(prefix="helix_bench_")
    out: dict[str, float] = {}
    try:
        db = HelixSpark.open(
            spark,
            f"{base}/db",
            HelixOptions(rick_range=KV_NUM_TS, outdate_range=KV_NUM_TS * 128,
                         num_shard=int(CPUS) if CPUS.isdigit() else 8,
                         auto_maintain=False),
        )
        value = b"\x00" * KV_VALUE_SIZE
        rows = [(t, le_u64(k), value) for t in range(KV_NUM_TS) for k in range(KV_NUM_KEY)]

        t0 = time.monotonic()
        db.put(rows)
        out["kv_fill"] = time.monotonic() - t0

        import random

        rng = random.Random(42)
        probes = [
            (rng.randrange(KV_NUM_TS), le_u64(rng.randrange(KV_NUM_KEY)))
            for _ in range(KV_READ_PROBES)
        ]
        t0 = time.monotonic()
        found = db.get_many(probes)
        out["kv_read"] = time.monotonic() - t0
        assert len(found) > 0

        t0 = time.monotonic()
        n = db.scan((0, 4), (le_u64(0), le_u64(KV_NUM_KEY)),
                    comparator=comparators.le_u64).count()
        out["kv_scan"] = time.monotonic() - t0
        assert n == 5 * KV_NUM_KEY

        db.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    from helixdb_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session("helixdb_spark_bench")
    qs = entrymod.queries()

    # warm the JVM/session on a trivial action so q1 doesn't pay startup
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        rows = fn(spark, SF_DIR).collect()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({len(rows)} rows)", file=sys.stderr)

    timings.update({k: round(v, 3) for k, v in kv_bench(spark).items()})

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
