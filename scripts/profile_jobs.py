#!/usr/bin/env python3
"""Per-query profiling harness (optimization rounds): wall seconds +
Spark job count + stage count for a named subset of registered queries.

Usage: python scripts/profile_jobs.py q1 q2 ...   (default: the heavy set)

Job/stage counts come from the status tracker's job-id delta around each
run, so the numbers include every action the query constructor fires
(isEmpty probes, count-backs, metadata reads) — exactly the fixed ladder
the bench's min-of-N timing is bound by at toy SF.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "stream_index_refresh",
    "ann_drift_refit",
    "stream_dedup_lsh",
    "ann_pq_chain_autofold",
    "stream_share_drift",
    "supplier_customer_pagerank",
    "stream_ingest_scan",
    "kv_commit_diff",
    "kv_statelog_scan",
    "supplier_customer_hits",
    "text_bpe_merges_64",
    "dedup_snm_multipass",
]


def main() -> None:
    from helixdb_spark.session import get_session
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or DEFAULT
    spark = get_session("helixdb_spark_profile")
    qs = entrymod.queries()
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()  # AppStatusStore: sees ALL jobs

    def counts() -> tuple[int, int]:
        jobs = store.jobsList(None)
        n_stages = sum(
            jobs.apply(i).stageIds().size() for i in range(jobs.size())
        )
        return jobs.size(), n_stages
    # warm-up
    spark.range(1000).count()
    from helixdb_spark.sources.tables import load_table

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        load_table(spark, SF_DIR, t).count()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    import gc

    print(f"{'query':35s} {'sec':>8s} {'jobs':>5s} {'stages':>7s}")
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        gc.collect()
        j0, s0 = counts()
        t0 = time.monotonic()
        rows = fn(spark, SF_DIR).collect()
        dt = time.monotonic() - t0
        j1, s1 = counts()
        print(f"{name:35s} {dt:8.2f} {j1 - j0:5d} {s1 - s0:7d} rows={len(rows)}")
        spark.catalog.clearCache()
        gc.collect()


if __name__ == "__main__":
    main()
