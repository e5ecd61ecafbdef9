"""The streaming-ingest -> automatic-index-maintenance lifecycle: beyond
the oracle-parity rehearsal (which checks the final answer), pin that the
maintenance loop actually did its job MID-STREAM — three per-batch appends
plus the base segment would leave a 4-segment chain, so ending at the
max_segments=2 ceiling proves a fold fired while batches were still
arriving, and n_rows covering the whole corpus proves every delta was
appended by the compaction-driven refresh (no manual rebuild)."""

from __future__ import annotations

from pyspark.sql import functions as F

from helixdb_spark import streaming as stream
from helixdb_spark.sources import load_table


def test_stream_index_refresh_bounded_chain_full_coverage(spark, sf_dir):
    from helixdb_spark.plans.pipeline import _query_vecs

    dbg: dict = {}
    df = stream.stream_index_refresh(
        spark, sf_dir, _query_vecs(spark, sf_dir), debug=dbg
    )
    n = load_table(spark, sf_dir, "embeddings").count()
    assert dbg["n_rows"] == n, "a streamed delta never reached the index"
    # base + 3 per-batch appends = 4 segments if no fold ran; the
    # registered ceiling is 2, so <= 2 requires a mid-stream compact_index
    assert dbg["segments"] <= 2, f"chain not folded: {dbg['segments']}"
    rows = df.collect()
    assert len(rows) > 0
    # self-probe sanity: each query vector is in the corpus, so its own id
    # must rank first in its bucket (cosine 1.0 with lowest id tie-break)
    top1 = {r["query_id"]: r["neighbor_id"] for r in rows if r["rk"] == 1}
    assert all(q == nid for q, nid in top1.items())
