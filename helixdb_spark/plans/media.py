"""Multimodal + streaming queries for the driver gate.

The multimodal payloads are synthesized from documents (utf-8 bytes standing
in for decoded media), so the byte-level feature oracles can be expressed
over the text column in ANSI SQL while the Spark side exercises the real
binary/mapInPandas plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from helixdb_spark.operators import multimodal as mm
from helixdb_spark.sources import load_table
from helixdb_spark import streaming as stream


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.synthesize_media(load_table(spark, sf_dir, "documents"))
    return mm.extract_features(media).orderBy("doc_id")


MM_FEATURES_SQL = """
SELECT doc_id,
       strlen(text)::INT AS n_bytes,
       CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS first_byte,
       CASE WHEN length(text) > 0 THEN ascii(substr(text, -1, 1)) ELSE -1 END AS last_byte,
       substr(md5(text), 1, 8) AS checksum_hex
FROM documents
ORDER BY doc_id
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.synthesize_media(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(media).orderBy("doc_id", "frame_idx")


MM_FRAME_SQL = f"""
WITH m AS (
  SELECT doc_id, text,
         (strlen(text) // {mm.BYTES_PER_FRAME})::INT AS n_frames
  FROM documents
),
idx AS (
  SELECT doc_id, text, unnest(range(0, n_frames, {mm.FRAME_STRIDE}))::INT AS frame_idx
  FROM m
)
SELECT doc_id, frame_idx, md5(text || ':' || frame_idx) AS frame_md5
FROM idx
ORDER BY doc_id, frame_idx
"""


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.synthesize_media(load_table(spark, sf_dir, "documents"))
    return mm.resize_media(media).orderBy("doc_id")


_T = mm.RESIZE_TARGET_W * mm.RESIZE_TARGET_H
MM_RESIZE_SQL = f"""
WITH m AS (SELECT doc_id, text, strlen(text) AS n FROM documents)
SELECT doc_id,
       CASE WHEN n = 0 THEN 0 ELSE {_T} END AS out_len,
       CASE WHEN n = 0 THEN NULL
            ELSE md5(array_to_string(
                   list_transform(range(0, {_T}),
                                  i -> substr(text, (i*n // {_T}) + 1, 1)),
                   ''))
       END AS resized_md5
FROM m
ORDER BY doc_id
"""


def mm_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only predicate on the media table: by column pruning the
    payload bytes are never read (check ReadSchema in .explain)."""
    media = mm.synthesize_media(load_table(spark, sf_dir, "documents"))
    return (
        media.where((F.col("width") >= 40) & (F.col("n_frames") >= 10))
        .groupBy("format")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("format")
    )


MM_META_SQL = f"""
SELECT 'fake/raw' AS format, count(*) AS n_media,
       CAST(sum(n_frames) AS BIGINT) AS total_frames
FROM (
  SELECT (strlen(text) % 64 + 16)::INT AS width,
         (strlen(text) // {mm.BYTES_PER_FRAME})::INT AS n_frames
  FROM documents
)
WHERE width >= 40 AND n_frames >= 10
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "mm_features": mm_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize": mm_resize,
    "mm_metadata_filter": mm_metadata_filter,
    "stream_hourly_rollup": stream.stream_hourly_rollup,
    "stream_sliding_rollup": stream.stream_sliding_rollup,
    "stream_session_window": stream.stream_session_window,
    "stream_user_state": stream.stream_user_state,
    "stream_click_purchase_join": stream.stream_click_purchase_join,
    "stream_dedup": stream.stream_dedup,
    "stream_static_enrich": stream.stream_static_enrich,
}

ORACLES = {
    "mm_features": MM_FEATURES_SQL,
    "mm_frame_sample": MM_FRAME_SQL,
    "mm_resize": MM_RESIZE_SQL,
    "mm_metadata_filter": MM_META_SQL,
    "stream_hourly_rollup": stream.STREAM_HOURLY_SQL,
    "stream_sliding_rollup": stream.STREAM_SLIDING_SQL,
    "stream_session_window": stream.STREAM_SESSION_SQL,
    "stream_user_state": stream.STREAM_USER_STATE_SQL,
    "stream_click_purchase_join": stream.STREAM_JOIN_SQL,
    "stream_dedup": stream.STREAM_DEDUP_SQL,
    "stream_static_enrich": stream.STREAM_ENRICH_SQL,
}
