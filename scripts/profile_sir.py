#!/usr/bin/env python3
"""Phase-level job attribution for stream_index_refresh."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from helixdb_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("profile_sir")
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
    from helixdb_spark.streaming import _emb_stream_dir, _pack_f32, _unpack_f32

    def mark(label, fn):
        j0, t0 = njobs(), time.monotonic()
        out = fn()
        print(f"{label:30s} {time.monotonic()-t0:7.2f}s {njobs()-j0:4d} jobs")
        return out

    t_all = time.monotonic()
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.agg(F.max("vec_id")).first()[0] + 1
    quarter = n // 4
    bounds = [(quarter, 2 * quarter), (2 * quarter, 3 * quarter), (3 * quarter, n)]
    path = mark("stream dir build", lambda: _emb_stream_dir(spark, SF_DIR, bounds))

    def corpus_fn(db):
        return db.scan((0, n)).select(
            F.decode("key", "utf-8").cast("long").alias("vec_id"),
            _unpack_f32(F.col("value")).alias("embedding"),
        )

    db = HelixSpark.open(
        spark, _scratch_dir("profkvidxstream"),
        HelixOptions(rick_range=quarter, outdate_range=1 << 40, auto_maintain=True),
    )
    store = AnnIndexStore(spark, _scratch_dir("profannidxstream"))
    base = emb.where(F.col("vec_id") < quarter).select(
        F.col("vec_id").cast("long").alias("ts"),
        F.encode(F.col("vec_id").cast("string"), "utf-8").alias("key"),
        _pack_f32(F.col("embedding")).alias("value"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    q = None
    try:
        mark("put base (+compact q0)", lambda: db.put(base))
        mark("write_lsh", lambda: store.write_lsh(corpus_fn(db)))
        db.register_index(store, "lsh", corpus_fn, max_segments=2,
                          delta_scan=True)
        schema = spark.read.parquet(path).schema

        def run_stream():
            nonlocal q
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
            )
            entries = stream.select(
                "ts", F.encode("key", "utf-8").alias("key"), "value"
            )
            q = entries.writeStream.foreachBatch(
                lambda batch_df, _epoch: db.put(batch_df)
            ).start()
            q.processAllAvailable()

        mark("stream 3 batches", run_stream)
    finally:
        if q is not None:
            q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        db.close()
    from helixdb_spark.plans.pipeline import ANN_K, N_QUERY_VECS

    queries = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mark("probe+collect", lambda: store.lsh_topk(queries, k=ANN_K).collect())
    print(f"{'TOTAL':30s} {time.monotonic()-t_all:7.2f}s")


if __name__ == "__main__":
    main()
