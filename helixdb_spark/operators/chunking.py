"""Context-window preparation operators for LLM training pipelines:
document chunking (sliding token windows) and sequence packing
(concat-and-split binning into fixed context lengths).

Both are pure ``pyspark.sql.functions`` compositions with exact SQL twins,
so the DuckDB oracles hash-check every chunk boundary and every bin
assignment. The reference engine has no analog (its values are opaque
bytes — SURVEY.md §2.8); these extend the pipeline family the north star
asks for.

Scale posture: chunking is embarrassingly row-parallel (no shuffle at
all — the explode happens inside the scan's stage); packing shuffles once
on the grouping key (``source``) and computes bins with a running-sum
window, the standard "concatenate documents, split every N tokens" layout
used to build training batches. At 100 TB the per-source window is the
only ordered region; sources partition the corpus so no global sort
exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from helixdb_spark.functions.text import normalized_text, words
from helixdb_spark.operators.util import spread

CHUNK_WINDOW = 32  # tokens per chunk
CHUNK_STRIDE = 24  # tokens between chunk starts (8-token overlap)
PACK_CONTEXT = 512  # tokens per packed training sequence


def chunk_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Sliding-window chunks of each document's token stream: chunk ``j``
    covers tokens ``[j*stride + 1, j*stride + window]`` (1-based), and the
    last chunk starts at the smallest ``j*stride`` that still reaches the
    final token, so every token lands in at least one chunk. Returns one
    row per chunk: (id, chunk_idx, n_tokens, chunk_hash).

    The word array is staged as its own projected column before the chunk
    transform — higher-order-function lambdas re-evaluate captured
    composite subtrees per element (see functions.text.char_codes).
    """
    docs = spread(docs)
    staged = docs.withColumn("__ws", words(normalized_text(F.col(text_col))))
    ws = F.col("__ws")
    n = F.size(ws)
    # number of chunk starts: 1 + ceil(max(n - window, 0) / stride)
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - window, F.lit(0)) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    # Empty docs yield an empty chunk array (explode emits nothing) instead
    # of a `where(n > 0)` pre-filter: Catalyst pushes such a filter below
    # the spread Exchange, re-running the regex split serially on the
    # narrow pre-shuffle side (see test_chunking_is_shuffle_free_before_sort).
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: F.struct(
                j.alias("chunk_idx"),
                F.slice(ws, j * stride + 1, window).alias("toks"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_idx:int,toks:array<string>>>"))
    return (
        staged.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.md5(F.array_join(F.col("c.toks"), " ")).alias("chunk_hash"),
        )
        .orderBy(id_col, "chunk_idx")
    )


def chunk_windows_sql(
    norm_sql: str, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> str:
    """DuckDB twin of chunk_windows (1-based inclusive list slicing).

    The empty-document guard differs by engine: Spark's ``words()`` filters
    empty tokens so '' -> [], but DuckDB ``string_split('', ' ')`` -> ['']
    (length 1), so the CASE maps the empty normalized string to [] before
    anything counts it."""
    return f"""
WITH w AS (SELECT doc_id,
                  CASE WHEN {norm_sql} = '' THEN []
                       ELSE string_split({norm_sql}, ' ') END AS ws
           FROM documents),
c AS (
  SELECT doc_id, ws, len(ws) AS n,
         1 + (greatest(len(ws) - {window}, 0) + {stride - 1}) // {stride}
           AS n_chunks
  FROM w WHERE len(ws) > 0
),
x AS (
  SELECT doc_id,
         unnest(list_transform(range(0, n_chunks), j -> struct_pack(
             chunk_idx := j,
             toks := ws[j*{stride} + 1 : j*{stride} + {window}]))) AS ch
  FROM c
)
SELECT doc_id, ch.chunk_idx::BIGINT AS chunk_idx,
       len(ch.toks)::BIGINT AS n_tokens,
       md5(array_to_string(ch.toks, ' ')) AS chunk_hash
FROM x
ORDER BY doc_id, chunk_idx
"""


def pack_contexts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    context: int = PACK_CONTEXT,
) -> DataFrame:
    """Concat-and-split sequence packing: within each ``group_col`` stream
    (ordered by id), documents are conceptually concatenated and the stream
    is cut every ``context`` tokens; a document's bin is the context index
    its first token falls into. Returns per-(group, bin) packing stats:
    how many documents start in each training sequence and their token
    mass — the report a batch-builder uses to audit packing efficiency.

    One shuffle (on ``group_col``) + one running-sum window; no global
    sort, no driver state. Deterministic: bin boundaries depend only on
    the id order within a group.
    """
    staged = spread(docs).withColumn(
        "__nw", F.size(words(normalized_text(F.col(text_col))))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("__nw").over(w), F.lit(0))
    binned = staged.select(
        F.col(group_col),
        F.col(id_col),
        F.col("__nw"),
        F.floor(offset / context).cast("long").alias("bin_id"),
    )
    return (
        binned.groupBy(group_col, "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nw").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .orderBy(group_col, "bin_id")
    )


def pack_contexts_sql(norm_sql: str, context: int = PACK_CONTEXT) -> str:
    """DuckDB twin of pack_contexts (empty docs count 0 tokens — see
    chunk_windows_sql on the string_split('') divergence)."""
    return f"""
WITH w AS (SELECT doc_id, source,
                  CASE WHEN {norm_sql} = ''
                       THEN 0 ELSE len(string_split({norm_sql}, ' ')) END AS nw
           FROM documents),
b AS (
  SELECT source, doc_id, nw,
         coalesce(sum(nw) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {context} AS bin_id
  FROM w
)
SELECT source, bin_id::BIGINT AS bin_id, count(*) AS n_docs,
       sum(nw)::BIGINT AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM b
GROUP BY source, bin_id
ORDER BY source, bin_id
"""
