"""Text analysis for training-data pipelines: quality scoring, language ID,
token counting, document fingerprinting. All pure ``pyspark.sql.functions``
compositions — codegen'd, zero Python per row — with exact SQL twins for the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from helixdb_spark.operators.util import spread
from helixdb_spark.functions.text import (
    fingerprint,
    normalized_text,
    token_count,
    words,
)

EN_STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]

# marker-word sets for the n-gram/stopword language heuristic; priority order
# breaks ties deterministically
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "las", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]


def _count_in(ws, vocab: list[str]):
    return F.size(F.filter(ws, lambda w: w.isin(*vocab)))


def quality_metrics(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0,1]:
    length-normalized word count, mean word length band, stopword presence.
    The score formula is arbitrary but fixed — what matters for a pipeline
    is determinism and filterability."""
    # Stage the word array once: every reference to a composite
    # words(normalized_text(...)) expression re-runs the regex split, and
    # this select references it ~6 times (see functions.text.char_codes).
    docs = docs.withColumn("__ws", words(normalized_text(F.col(text_col))))
    ws = F.col("__ws")
    n_words = F.size(ws)
    n_chars = F.length(F.col(text_col))
    avg_word_len = F.when(n_words > 0, (
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n_words
    )).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_words > 0, _count_in(ws, EN_STOPWORDS).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    score = (
        F.least(n_words.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + F.when((avg_word_len >= 3) & (avg_word_len <= 8), 0.3).otherwise(0.0)
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.3
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(F.lit(1e-9) + avg_word_len, 4).alias("avg_word_len"),
        F.round(F.lit(1e-9) + stop_ratio, 4).alias("stopword_ratio"),
        F.round(F.lit(1e-9) + score, 4).alias("quality_score"),
    ).orderBy(id_col)


def quality_sql(norm_sql: str) -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH w AS (SELECT doc_id, text, string_split({norm_sql}, ' ') AS ws FROM documents),
m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(ws) AS n_words,
         CASE WHEN len(ws) > 0
              THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)
              ELSE 0.0 END AS awl,
         CASE WHEN len(ws) > 0
              THEN len(list_filter(ws, x -> x IN ({stop})))::DOUBLE / len(ws)
              ELSE 0.0 END AS sr
  FROM w
)
SELECT doc_id, n_chars, n_words,
       round(1e-9 + awl, 4) AS avg_word_len,
       round(1e-9 + sr, 4) AS stopword_ratio,
       round(1e-9 + least(n_words::DOUBLE / 50.0, 1.0) * 0.4
             + (CASE WHEN awl >= 3 AND awl <= 8 THEN 0.3 ELSE 0.0 END)
             + least(sr * 4, 1.0) * 0.3, 4) AS quality_score
FROM m
ORDER BY doc_id
"""


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: argmax of per-language marker hit
    counts, ties broken by fixed priority, zero hits → 'und'."""
    docs = spread(docs)
    # Staged once — referenced per language below (see quality_metrics).
    docs = docs.withColumn("__ws", words(normalized_text(F.col(text_col))))
    ws = F.col("__ws")
    scored = docs.select(
        F.col(id_col),
        F.col("lang").alias("true_lang"),
        *[
            _count_in(ws, LANG_MARKERS[lang]).alias(f"score_{lang}")
            for lang in LANG_PRIORITY
        ],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        "true_lang",
        (pred == F.col("true_lang")).cast("int").alias("is_match"),
    ).orderBy(id_col)


def lang_id_sql(norm_sql: str) -> str:
    score_cols = ", ".join(
        "len(list_filter(ws, x -> x IN (%s))) AS score_%s"
        % (", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang)
        for lang in LANG_PRIORITY
    )
    best = "greatest(" + ", ".join(f"score_{l}" for l in LANG_PRIORITY) + ")"
    case = "CASE WHEN %s = 0 THEN 'und' %s END" % (
        best,
        " ".join(
            f"WHEN score_{l} = {best} THEN '{l}'" for l in LANG_PRIORITY
        ),
    )
    return f"""
WITH w AS (SELECT doc_id, lang AS true_lang, string_split({norm_sql}, ' ') AS ws
           FROM documents),
s AS (SELECT doc_id, true_lang, {score_cols} FROM w)
SELECT doc_id, {case} AS pred_lang, true_lang,
       CASE WHEN ({case}) = true_lang THEN 1 ELSE 0 END AS is_match
FROM s
ORDER BY doc_id
"""


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token counts aggregated per source."""
    return (
        spread(docs).withColumn("n_tokens", token_count(F.col(text_col)))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.lit(1e-9) + F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("source")
    )


TOKEN_STATS_SQL = r"""
SELECT source, count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       round(1e-9 + avg(n_tokens), 4) AS avg_tokens
FROM (SELECT source,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens
      FROM documents)
GROUP BY source
ORDER BY source
"""


def fingerprint_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc OpenRefine-style fingerprint + cluster sizes (docs sharing a
    fingerprint have identical word sets — token-permutation duplicates)."""
    fp = spread(docs).select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    sizes = fp.groupBy("fp").agg(F.count("*").alias("cluster_size"))
    return (
        fp.join(sizes, "fp")
        .select(id_col, "fp", "cluster_size")
        .orderBy(id_col)
    )


def fingerprint_sql(norm_sql: str) -> str:
    return f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             string_split({norm_sql}, ' '))), ' ')) AS fp
  FROM documents
),
sizes AS (SELECT fp, count(*) AS cluster_size FROM fp GROUP BY fp)
SELECT doc_id, fp, cluster_size
FROM fp JOIN sizes USING (fp)
ORDER BY doc_id
"""
