#!/usr/bin/env python3
"""One-off phase-level job attribution for ann_drift_refit's ladder."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from helixdb_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("profile_drift")
    sc = spark.sparkContext
    store_js = sc._jsc.sc().statusStore()

    def njobs() -> int:
        return store_js.jobsList(None).size()

    spark.range(1000).count()
    from helixdb_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "embeddings").count()

    from helixdb_spark.engine import HelixOptions, HelixSpark
    from helixdb_spark.index_store import AnnIndexStore
    from helixdb_spark.plans.kv import _scratch_dir
    from helixdb_spark.plans.pipeline import (
        ANN_K, DRIFT_REFIT_TV, N_QUERY_VECS, _abs_shift_corpus,
    )

    t_all = time.monotonic()
    base, grown = _abs_shift_corpus(spark, SF_DIR)
    stages = [base.where(F.col("vec_id") % 2 == 0), base, grown]
    phase = {"i": 0}
    store = AnnIndexStore(spark, _scratch_dir("profdriftrefit"))
    db = HelixSpark.open(
        spark, _scratch_dir("profdriftrefitdb"),
        HelixOptions(rick_range=10, outdate_range=1 << 40, auto_maintain=False),
    )
    db.register_index(
        store, "ivf", lambda _db: stages[phase["i"]],
        drift_threshold=DRIFT_REFIT_TV, drift_action="refit",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def mark(label, fn):
        j0, t0 = njobs(), time.monotonic()
        out = fn()
        print(f"{label:30s} {time.monotonic()-t0:7.2f}s {njobs()-j0:4d} jobs")
        return out

    try:
        mark("write_ivf fit0", lambda: store.write_ivf(stages[0], name="ivf", stride="sqrt"))
        phase["i"] = 1
        mark("put1", lambda: db.put([(5, b"k1", b"v1")]))
        mark("compact1 (+append+drift)", lambda: db.compact(0, 9))
        phase["i"] = 2
        mark("put2", lambda: db.put([(15, b"k2", b"v2")]))
        mark("compact2 (+append+drift+refit)", lambda: db.compact(10, 19))
        db.close()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    reopened = AnnIndexStore(spark, store.base)
    q = grown.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mark("probe+collect", lambda: reopened.ivf_topk(q, k=ANN_K).collect())
    print(f"{'TOTAL':30s} {time.monotonic()-t_all:7.2f}s")


if __name__ == "__main__":
    main()
