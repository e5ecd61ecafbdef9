#!/usr/bin/env python3
"""Scale-exponent bench: the most expensive graded queries at sf1 (10x)
vs the committed sf0.1 idle baseline — verdict r7 task #4. Prints one
JSON line {"queries": {name: sec}, "sf": 1.0, ...} and, when a baseline
with sf0.1 entries exists, a per-query scaling table
(exponent = log10(t_sf1 / t_sf0.1); 1.0 = linear in data volume).

Run `python scripts/make_sf1.py` first. Usage:
    python scripts/bench_sf1.py [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/testdata_sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# the 10 most expensive graded rows at the r7 idle baseline, plus the two
# round-8 heavy additions — the set where a super-linear cliff would hide
TOP = [
    "supplier_customer_pagerank",
    "kv_statelog_scan",
    "text_bpe_merges",
    "kv_commit_diff",
    "ann_pq_recall_audit",
    "ann_pq_adc_topk",
    "dedup_snm_multipass",
    "kv_optimize_scan",
    "ann_recall_audit",
    "nation_trade_pagerank",
    "text_bpe_merges_batched",
    "dedup_minhash_lsh",
    # round-8 continuation heavy rows
    "nation_trade_closeness",
    "curate_dedup_savings",
    "ann_ivfpq_rerank",
    # round-9: the streaming lifecycle rows (verdict r8 #7 — expected
    # fixed-job-count behavior, exponent ~ the kv lifecycle rows') and
    # this round's heavy additions
    "stream_ingest_scan",
    "stream_index_refresh",
    "ann_drift_refit",
    "text_bpe_merges_64",
    "dedup_spans_hashed",
    # round-10: the four heaviest r9 rows without a committed exponent
    # (verdict r9 #8), the re-based sqrt-fit drift lifecycle is already in
    # TOP above, and this round's heavy additions
    "dedup_spans_removed",
    "text_kn_lm_score",
    "supplier_customer_hits",
    "stream_share_drift",
    "dedup_spans_multik",
    "stream_dedup_lsh",
    "mm_decode_png",
    "ev_percentiles_approx",
    # round-11: the r10 media rows without a committed exponent (verdict
    # r10 #8) plus this round's heavy additions
    "mm_decode_jpeg",
    "mm_phash_dct_robust",
    "mm_decode_jpeg_progressive",
    "dedup_spans_consolidated",
    "dedup_minhash_multilingual",
    "text_nfc_normalize",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    import math

    import __spark_entry__ as entrymod

    from helixdb_spark.session import get_session
    from helixdb_spark.sources.tables import load_table

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local_sf1_r8.json"
    spark = get_session("helixdb_spark_bench_sf1")
    qs = entrymod.queries()

    spark.range(1000).count()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        load_table(spark, SF1_DIR, t).count()

    only = os.environ.get("SPARK_GRAFT_SF1_ONLY")
    top = [n for n in TOP if n in only.split(",")] if only else TOP
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in top:
        best, n_rows = float("inf"), 0
        try:
            fn = qs[name]
            for _ in range(RUNS):
                t0 = time.monotonic()
                rows = fn(spark, SF1_DIR).collect()
                best = min(best, time.monotonic() - t0)
                n_rows = len(rows)
                # same hygiene as bench.py's per-query loop: drop
                # operator-persisted caches and drain the py4j object
                # backlog BETWEEN runs, so a late row in TOP measures the
                # query, not 30 heavy sf1 queries of session aging (r11:
                # dedup_snm_multipass read 94.8s in-suite vs 21.4s in a
                # fresh session before this)
                import gc

                spark.catalog.clearCache()
                gc.collect()
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]}s ({n_rows} rows)", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"{type(ex).__name__}: {ex}"
            print(f"# {name} ERROR: {errors[name][:300]}", file=sys.stderr)
        import gc

        gc.collect()

    result = {
        "metric": "sf1_scale_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "copies_of_sf01": 10,
        "cpus": CPUS,
    }
    if errors:
        result["errors"] = errors

    import glob
    import re

    # newest committed same-box idle baseline (min-merged per round) —
    # numeric round sort, r10 > r9
    hits = [
        (p, re.search(r"_r(\d+)\.json$", p)) for p in
        glob.glob("BENCH_local_r*.json")
    ]
    candidates = sorted(
        (p for p, m in hits if m),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    base_path = candidates[-1] if candidates else "BENCH_local_r8.json"
    if os.path.exists(base_path):
        base = json.load(open(base_path)).get("queries", {})
        exps = {}
        for name, t1 in timings.items():
            t01 = base.get(name)
            if t01 and t01 > 0.05:
                exps[name] = round(math.log10(t1 / t01), 3)
        result["scaling_exponents"] = exps
        print("\n# query                      sf0.1s   sf1s   exponent")
        for name, e in sorted(exps.items(), key=lambda kv: -kv[1]):
            print(
                f"# {name:28s} {base[name]:6.2f} {timings[name]:7.2f}   {e:+.3f}"
            )

    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
