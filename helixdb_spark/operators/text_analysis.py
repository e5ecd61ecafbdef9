"""Text analysis for training-data pipelines: quality scoring, language ID,
token counting, document fingerprinting. All pure ``pyspark.sql.functions``
compositions — codegen'd, zero Python per row — with exact SQL twins for the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark import StorageLevel
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
    # The HOF lambdas below are interpreted per-element, so fan the input
    # out first — a single-file local read would otherwise run the whole
    # scoring pass on one core (spread is a no-op on a real multi-split scan).
    docs = spread(docs).withColumn("__ws", words(normalized_text(F.col(text_col))))
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
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(1e-9 + avg(n_tokens), 4) AS avg_tokens
FROM (SELECT source,
             len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS n_tokens
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


# ------------------------------------------------------------------ tf-idf
TFIDF_TOP_K = 3


def tfidf_top_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = TFIDF_TOP_K
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (``tf * ln(1 + N/df)``), rank ties broken by term. The document-
    frequency table is a separate aggregate joined back on the token key —
    deliberately NOT a ``count() over (partition by term)`` window on the
    tf table: that form is locally faster (one fewer shuffle, measured
    ~30%) but a window partition gets NO map-side partial aggregation, so
    at corpus scale a stopword's partition ("the": one row per document)
    lands in a single task. The aggregate partial-combines before the
    shuffle and the join is skew-safe under AQE. The corpus size N is a
    broadcast scalar. Ranking compares the ROUNDED score so the ordering
    is identical across engines (raw doubles differ in the last ulp
    between ln implementations).
    """
    from pyspark.sql import Window

    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    tok = staged.select(F.col(id_col), F.explode("__ws").alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_total"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.lit(1e-9)
                + F.col("tf") * F.log(F.lit(1.0) + F.col("n_total") / F.col("df")),
                6,
            ),
        )
    )

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col(id_col), F.col("rk").cast("long").alias("rk"), "term", "tfidf")
        .orderBy(id_col, "rk")
    )


def tfidf_sql(norm_sql: str, k: int = TFIDF_TOP_K) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({norm_sql}, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n_total FROM documents),
scored AS (
  SELECT doc_id, term,
         round(1e-9 + tf * ln(1.0 + n_total::DOUBLE / df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY tfidf DESC, term ASC) AS rk FROM scored)
SELECT doc_id, rk::BIGINT AS rk, term, tfidf FROM r WHERE rk <= {k}
ORDER BY doc_id, rk
"""


# -------------------------------------------------------------- repetition
def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1): the fraction of bigram occurrences taken by the single most
    frequent bigram, and the fraction of trigram occurrences whose trigram
    appears more than once. High values flag boilerplate/spam for the
    quality funnel. Docs with fewer than 3 words have no trigram and are
    excluded.

    Both metrics are DOCUMENT-LOCAL, so the whole computation is a
    projection with ZERO shuffles (the final orderBy aside): sort the
    doc's gram array and fold run-lengths with ``aggregate`` — max run =
    the top bigram's count, sum of >1 runs = the duplicated trigram mass.
    The former explode → groupBy(doc, gram) → regroup → join shape paid
    three shuffles and a join to count inside one row's array; at 100 TB
    this version is an embarrassingly parallel scan.
    """
    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    ws = F.col("__ws")

    def grams(n: int):
        return F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        )

    base = staged.where(F.size(ws) >= 3).select(
        F.col(id_col),
        F.array_sort(grams(2)).alias("__g2"),
        F.array_sort(grams(3)).alias("__g3"),
    )

    def _acc(prev, run, agg):
        return F.struct(prev.alias("prev"), run.alias("run"), agg.alias("agg"))

    def max_run(col):
        """Longest run of equal adjacent elements in a sorted array."""
        return F.aggregate(
            col,
            _acc(F.lit(None).cast("string"), F.lit(0).cast("long"),
                 F.lit(0).cast("long")),
            lambda a, x: F.when(
                x == a["prev"],
                _acc(x, a["run"] + 1, F.greatest(a["agg"], a["run"] + 1)),
            ).otherwise(_acc(x, F.lit(1).cast("long"), F.greatest(a["agg"], F.lit(1).cast("long")))),
            lambda a: a["agg"],
        )

    def dup_mass(col):
        """Sum of run lengths over runs longer than 1 (sorted array)."""
        flush = lambda a: F.when(a["run"] > 1, a["run"]).otherwise(F.lit(0).cast("long"))
        return F.aggregate(
            col,
            _acc(F.lit(None).cast("string"), F.lit(0).cast("long"),
                 F.lit(0).cast("long")),
            lambda a, x: F.when(
                x == a["prev"], _acc(x, a["run"] + 1, a["agg"])
            ).otherwise(_acc(x, F.lit(1).cast("long"), a["agg"] + flush(a))),
            lambda a: a["agg"] + flush(a),
        )

    return base.select(
        F.col(id_col),
        F.round(
            F.lit(1e-9) + max_run(F.col("__g2")) / F.size("__g2"), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.lit(1e-9) + dup_mass(F.col("__g3")) / F.size("__g3"), 6
        ).alias("dup_trigram_frac"),
    ).orderBy(id_col)


def repetition_sql(norm_sql: str) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({norm_sql}, ' ') AS ws FROM documents),
base AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 3),
bi AS (SELECT doc_id,
              unnest(list_transform(range(1, len(ws)),
                  i -> array_to_string(ws[i:i+1], ' '))) AS g
       FROM base),
tri AS (SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                   i -> array_to_string(ws[i:i+2], ' '))) AS g
        FROM base),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
b AS (SELECT doc_id, max(c) AS top_bi, sum(c) AS n_bi FROM bic GROUP BY 1),
t AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri,
             sum(c) AS n_tri FROM tric GROUP BY 1)
SELECT doc_id,
       round(1e-9 + top_bi::DOUBLE / n_bi, 6) AS top_bigram_frac,
       round(1e-9 + dup_tri::DOUBLE / n_tri, 6) AS dup_trigram_frac
FROM b JOIN t USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------------------ char entropy
def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of each document's character distribution (spaces
    excluded, over normalized text) — the cheap perplexity proxy: near-zero
    entropy flags single-character / repeated-pattern spam that length and
    stopword features miss.

    Pure built-ins via the single-pass identity
    ``H = ln(n) - sum(c*ln(c))/n``: explode to (doc, char) pairs, count per
    char (map-side combined), one re-aggregate per doc. Shuffles on the
    (doc, char) key then the doc key — both partition-parallel; docs whose
    normalized text is empty produce no rows.
    """
    staged = spread(docs).withColumn(
        "__norm", normalized_text(F.col(text_col))
    )
    chars = staged.select(
        F.col(id_col), F.explode(F.split("__norm", "")).alias("ch")
    ).where((F.col("ch") != "") & (F.col("ch") != " "))
    counts = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    n = F.sum("c")
    s = F.sum(F.col("c") * F.log(F.col("c")))
    return (
        counts.groupBy(id_col)
        .agg(
            n.cast("long").alias("n_chars"),
            F.count("*").alias("n_distinct_chars"),
            F.round(F.lit(1e-9) + F.log(n) - s / n, 6).alias("entropy"),
        )
        .orderBy(id_col)
    )


def char_entropy_sql(norm_sql: str) -> str:
    return f"""
WITH d AS (SELECT doc_id, {norm_sql} AS norm FROM documents),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(norm) + 1), i -> norm[i])) AS c
  FROM d
),
cc AS (SELECT doc_id, c, count(*) AS n FROM ch WHERE c != ' ' AND c != ''
       GROUP BY 1, 2)
SELECT doc_id, sum(n)::BIGINT AS n_chars,
       count(*) AS n_distinct_chars,
       round(1e-9 + ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy
FROM cc
GROUP BY doc_id
ORDER BY doc_id
"""


# -------------------------------------------------------------- PII scrub
# Patterns chosen to behave identically in Java regex (Spark) and RE2
# (DuckDB): character classes, +, and {n} only — no lookaround, no \b.
PII_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Regex PII redaction — the mandatory scrub pass of any training-data
    pipeline. The corpus is synthetic and contains no real PII, so each doc
    is first augmented with a deterministic email + phone derived from its
    id; the operator then redacts emails/phones and reports per-doc match
    counts plus the md5 of the scrubbed text, hash-checking every redaction
    the regex engine made. Row-parallel, shuffle-free (the final orderBy is
    presentation only); regexp_replace runs in whole-stage codegen.
    """
    aug = F.concat(
        F.col(text_col),
        F.lit(" contact user"),
        F.col(id_col).cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col(id_col) % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col(id_col) % 10000).cast("string"), 4, "0"),
    )
    staged = spread(docs).withColumn("__aug", aug)
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("__aug"), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return staged.select(
        F.col(id_col),
        F.regexp_count(F.col("__aug"), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("__aug"), F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    ).orderBy(id_col)


def pii_scrub_sql() -> str:
    email, phone = PII_EMAIL_RE, PII_PHONE_RE
    return f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-'
              || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS aug
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(aug, '{email}')) AS n_emails,
       len(regexp_extract_all(aug, '{phone}')) AS n_phones,
       md5(regexp_replace(regexp_replace(aug, '{email}', '<EMAIL>', 'g'),
                          '{phone}', '<PHONE>', 'g')) AS scrubbed_md5
FROM a
ORDER BY doc_id
"""


# ------------------------------------------------------------- boilerplate
BOILER_DF = 4  # shingle document-frequency at/above which it is boilerplate
BOILER_FRAC = 0.3  # docs with more than this fraction boilerplate are cut


def boilerplate_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_threshold: int = BOILER_DF,
    frac_threshold: float = BOILER_FRAC,
) -> DataFrame:
    """C4/CCNet-style boilerplate screen: a word 3-gram that appears in
    >= ``df_threshold`` documents is corpus boilerplate (license footers,
    nav headers, template text); a document whose distinct-shingle set is
    more than ``frac_threshold`` boilerplate is dropped. C4 (Raffel et al.
    2020) removes repeated lines; with no line structure in this corpus the
    same signal is computed over the shingle space the dedup family already
    uses.

    Scale shape: one shuffle on the shingle key for the document-frequency
    count, then the hot-shingle set — small by construction at any corpus
    size IF df_threshold scales with the corpus (production uses a df
    *fraction*; the absolute default here matches the test SF) — comes back
    as a semi-join that AQE turns into a broadcast. The per-doc ledger
    re-aggregates on doc_id. ``kept`` compares the ROUNDED fraction so both
    engines agree at the boundary.

    Returns (doc_id, n_shingles, n_boiler, boiler_frac, kept) for every
    document (empty docs: 0 shingles, frac 0.0, kept).
    """
    from helixdb_spark.operators.dedup import doc_shingles

    sh = doc_shingles(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    hot = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= df_threshold)
        .select("shingle")
    )
    n_boiler = (
        ex.join(hot, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_boiler"))
    )
    frac = F.round(
        F.lit(1e-9)
        + F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
            F.coalesce("n_boiler", F.lit(0)) / F.col("n_shingles")
        ),
        6,
    )
    from helixdb_spark.operators.util import unpersist_on_gc

    return unpersist_on_gc(
        sh.select(F.col(id_col), F.size("shingles").alias("n_shingles"))
        .join(n_boiler, id_col, "left")
        .select(
            F.col(id_col),
            "n_shingles",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            frac.alias("boiler_frac"),
        )
        .withColumn(
            "kept", (F.col("boiler_frac") <= frac_threshold).cast("int")
        )
        .orderBy(id_col),
        sh,
    )


# -------------------------------------------------------------- BM25 search
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword retrieval (Robertson/Sparck Jones; Lucene's idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``): score every document containing
    a query term, return the top ``k`` by (score desc, doc_id).

    Scale shape: the corpus pass explodes words and filters to the query
    terms IMMEDIATELY — tf rows exist only for (matched doc, query term),
    so the per-doc aggregation shuffles matched rows, never the corpus.
    N/avgdl are a 1-row corpus aggregate broadcast (the `text_tfidf`
    pattern), df comes from the already-tiny tf table. The final top-k is
    a TakeOrdered over matched docs, not a global sort. A production
    100 TB deployment would precompute the tf/df tables as an inverted
    index once and serve many queries from it; the scoring join is
    identical either way.

    Returns (doc_id, n_terms, score, rank): matched-term count, rounded
    BM25 score, dense 1-based rank.
    """
    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    stats = staged.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("__ws")).alias("avgdl"),
    )
    tf = (
        staged.select(
            F.col(id_col),
            F.size("__ws").alias("dl"),
            F.explode("__ws").alias("term"),
        )
        .where(F.col("term").isin([str(t) for t in query_terms]))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(dfs, "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms"),
            F.round(
                F.lit(1e-9) + F.sum(idf * F.col("tf") * (BM25_K1 + 1.0) / denom),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
    from pyspark.sql.window import Window as _W

    return scored.withColumn(
        "rank",
        F.row_number().over(_W.orderBy(F.desc("score"), id_col)),
    ).select(id_col, "n_terms", "score", "rank")


def bm25_sql(
    norm_sql: str, query_terms: list[str], k: int = 20
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH w AS (SELECT doc_id, string_split({norm_sql}, ' ') AS ws FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM w),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w)
  WHERE term IN ({terms})
  GROUP BY 1, 2, 3
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT t.doc_id, count(*) AS n_terms,
         round(1e-9 + sum(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * t.tf * ({BM25_K1} + 1.0)
           / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * t.dl / s.avgdl))
         ), 6) AS score
  FROM tf t JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY 1
)
SELECT doc_id, n_terms, score,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rank
FROM sc
ORDER BY rank
LIMIT {k}
"""


# ------------------------------------------------------- unigram LM scoring
def lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality score (Wenzek et al. 2020): train
    a unigram LM on the corpus itself, then score each document by its mean
    token log-probability. Low scores flag gibberish / OCR noise / token
    soup; in a production pipeline the LM comes from a trusted corpus
    (Wikipedia) and this operator's shape is identical — swap the frequency
    table's source. Laplace add-one smoothing over the observed vocabulary:
    ``p(t) = (cnt(t) + 1) / (N + V)``.

    Scale shape: one token explode, one ``groupBy(term)`` count (map-side
    partial combine, so stopword skew collapses before the shuffle), a
    corpus-totals scalar broadcast, then the tok->freq join on the term key
    and one per-doc re-aggregation. The frequency table is vocab-sized
    (Heaps' law: sublinear in corpus size) but NOT force-broadcast — at
    100 TB a web-scale vocab exceeds broadcast limits, so the join shuffles
    both sides on ``term`` and AQE handles the stopword skew; map-side
    combine on (doc, term) first would not help because the per-doc
    aggregate needs tf anyway (we fold tf in before joining, so each
    (doc, term) pair crosses the wire once, not once per occurrence).

    Returns (doc_id, n_tokens, avg_logp, lm_bits) for every document with
    at least one token; ``lm_bits = -avg_logp / ln 2`` is the standard
    bits-per-token form (lower = more predictable under the corpus LM).
    """
    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    tok = staged.select(F.col(id_col), F.explode("__ws").alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    freq = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    totals = freq.agg(
        F.sum("cnt").alias("n_corpus"), F.count("*").alias("v_vocab")
    )
    logp = F.log(
        (F.col("cnt") + 1.0) / (F.col("n_corpus") + F.col("v_vocab"))
    )
    return (
        tf.join(freq, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.lit(1e-9) + F.sum(logp * F.col("tf")) / F.sum("tf"), 6
            ).alias("avg_logp"),
            F.round(
                F.lit(1e-9)
                - (F.sum(logp * F.col("tf")) / F.sum("tf")) / F.log(F.lit(2.0)),
                6,
            ).alias("lm_bits"),
        )
        .orderBy(id_col)
    )


def lm_score_sql(norm_sql: str) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({norm_sql}, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
tok2 AS (SELECT * FROM tok WHERE term != ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
freq AS (SELECT term, count(*) AS cnt FROM tok2 GROUP BY 1),
totals AS (SELECT sum(cnt) AS n_corpus, count(*) AS v_vocab FROM freq)
SELECT t.doc_id,
       sum(t.tf)::BIGINT AS n_tokens,
       round(1e-9 + sum(ln((f.cnt + 1.0) / (s.n_corpus + s.v_vocab)) * t.tf)
                    / sum(t.tf), 6) AS avg_logp,
       round(1e-9 - (sum(ln((f.cnt + 1.0) / (s.n_corpus + s.v_vocab)) * t.tf)
                     / sum(t.tf)) / ln(2.0), 6) AS lm_bits
FROM tf t JOIN freq f USING (term) CROSS JOIN totals s
GROUP BY 1
ORDER BY 1
"""


# ----------------------------------------------------------- collocations
COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 25


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = COLLOC_MIN_COUNT,
    k: int = COLLOC_TOP_K,
) -> DataFrame:
    """Corpus collocation mining: top-k adjacent word bigrams by pointwise
    mutual information, ``pmi = ln(c_ab * N1 * N1 / (N2 * c_a * c_b))``
    (the Church-Hanks association measure) with a min-count floor so rare
    accidental pairs can't dominate.

    Scale shape: two token-key shuffles (unigram counts, bigram counts —
    both map-side partially aggregated), the min-count filter applied to
    the bigram table BEFORE its unigram joins, and the scalar totals ride
    in as broadcast 1-row crossJoins. Corpus-size-independent driver state.
    The PMI division runs in one double expression written identically in
    the oracle, so both engines evaluate the same IEEE operation order.
    """
    ws = words(normalized_text(F.col(text_col)))
    base = spread(docs).select(ws.alias("__ws"))
    toks = base.select(F.explode("__ws").alias("w"))
    pair_arr = F.when(
        F.size("__ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("__ws") - 2),
            lambda i: F.struct(
                F.get("__ws", i).alias("w1"), F.get("__ws", i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = base.select(F.explode(pair_arr).alias("p")).select("p.w1", "p.w2")

    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    n1 = toks.agg(F.count("*").cast("double").alias("n1"))
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    n2 = pairs.agg(F.count("*").cast("double").alias("n2"))
    pmi = F.log(
        F.col("c_ab").cast("double")
        * F.col("n1")
        * F.col("n1")
        / (F.col("n2") * F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(pmi + F.lit(1e-9), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )


def collocations_sql(
    norm_sql: str,
    min_count: int = COLLOC_MIN_COUNT,
    k: int = COLLOC_TOP_K,
) -> str:
    return f"""
WITH norm AS (SELECT string_split({norm_sql}, ' ') AS ws FROM documents),
t AS (SELECT unnest(ws) AS w FROM norm),
toks AS (SELECT w FROM t WHERE w != ''),
uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
n1 AS (SELECT count(*)::DOUBLE AS n1 FROM toks),
b AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM norm WHERE len(ws) >= 2)
  WHERE ws[i] != ''
),
big AS (SELECT w1, w2, count(*) AS c_ab FROM b GROUP BY 1, 2
        HAVING count(*) >= {min_count}),
n2 AS (SELECT count(*)::DOUBLE AS n2 FROM b)
SELECT w1, w2, c_ab,
       round(ln(c_ab::DOUBLE * n1 * n1 / (n2 * ca.c::DOUBLE * cb.c::DOUBLE))
             + 1e-9, 6) AS pmi
FROM big
JOIN uni ca ON ca.w = big.w1
JOIN uni cb ON cb.w = big.w2, n1, n2
ORDER BY pmi DESC, w1, w2 LIMIT {k}
"""


# ------------------------------------------------------------- readability
def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document with the classic proxies:
    sentences = runs of terminal punctuation, syllables = vowel groups per
    word (min 1). Pure JVM expression fold (regexp_extract_all + one HOF
    aggregate over the staged word array) — zero Python per row; the SQL
    twin (readability_sql) computes the identical counts, so the score is
    exactly reproducible.

    flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
    """
    docs = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    ws = F.col("__ws")
    n_words = F.size(ws)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        F.lit(1),
    )
    n_syll = F.aggregate(
        ws,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiou]+"), 0)), F.lit(1)
        ),
    )
    flesch = F.when(
        n_words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syll.cast("double") / n_words),
    ).otherwise(F.lit(0.0))
    flesch_r = F.round(flesch + F.lit(1e-9), 3)
    band = (
        F.when(flesch_r >= 60, "easy")
        .when(flesch_r >= 30, "medium")
        .otherwise("hard")
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        flesch_r.alias("flesch"),
        band.alias("band"),
    ).orderBy(id_col)


def readability_sql(norm_sql: str) -> str:
    return f"""
WITH w AS (
  SELECT doc_id, text, string_split({norm_sql}, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent,
         list_sum(list_transform(ws,
           x -> greatest(len(regexp_extract_all(x, '[aeiou]+')), 1)))::BIGINT
           AS n_syll
  FROM w
),
s AS (
  SELECT doc_id, n_words, n_sent, n_syll,
         round(CASE WHEN n_words > 0
               THEN 206.835 - 1.015 * (n_words::DOUBLE / n_sent)
                    - 84.6 * (n_syll::DOUBLE / n_words)
               ELSE 0.0 END + 1e-9, 3) AS flesch
  FROM m
)
SELECT doc_id, n_words::INT AS n_words, n_sent::INT AS n_sentences,
       n_syll::INT AS n_syllables, flesch,
       CASE WHEN flesch >= 60 THEN 'easy'
            WHEN flesch >= 30 THEN 'medium'
            ELSE 'hard' END AS band
FROM s
ORDER BY doc_id
"""


# ------------------------------------------------------ quality ensemble
# fixed logistic blend weights (arbitrary but frozen — what a trained
# fastText-style quality classifier would export; the pipeline contract is
# determinism + filterability, not the particular weights)
ENSEMBLE_W = {
    "bias": -1.0,
    "len": 2.5,
    "stop": 3.0,
    "awl_dev": -0.2,
    "digit": -4.0,
}


def quality_ensemble(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Ensemble quality classifier: a fixed logistic blend of cheap
    features (length saturation, stopword ratio, word-length deviation,
    digit density) -> per-doc score in (0,1) -> decile buckets with counts
    and mean score. This is the score-then-threshold shape of model-based
    quality filtering (e.g. CCNet/fastText-style filters) with the model
    replaced by frozen public weights, so the oracle can replay it exactly.

    One scan, one groupBy on the 10-valued bucket key; per-doc scores are
    rounded to 6 dp BEFORE the bucket floor and the bucket mean, so neither
    engine's exp() ulp noise nor double-sum order can move a result.
    """
    docs = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    ws = F.col("__ws")
    n_words = F.size(ws)
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    f_len = F.least(n_words.cast("double") / 100.0, F.lit(1.0))
    awl = F.when(
        n_words > 0,
        F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w)).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    f_stop = F.when(
        n_words > 0, _count_in(ws, EN_STOPWORDS).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    f_digit = (
        F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("double")
        / n_chars
    )
    z = (
        F.lit(ENSEMBLE_W["bias"])
        + F.lit(ENSEMBLE_W["len"]) * f_len
        + F.lit(ENSEMBLE_W["stop"]) * f_stop
        + F.lit(ENSEMBLE_W["awl_dev"]) * F.abs(awl - F.lit(5.0))
        + F.lit(ENSEMBLE_W["digit"]) * f_digit
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) + F.lit(1e-9), 6)
    bucket = F.least(F.floor(score * 10).cast("int"), F.lit(9))
    return (
        docs.select(score.alias("score"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score") + F.lit(1e-9), 4).alias("mean_score"),
        )
        .orderBy("bucket")
    )


def quality_ensemble_sql(norm_sql: str) -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    w = ENSEMBLE_W
    return f"""
WITH w0 AS (
  SELECT doc_id, text, string_split({norm_sql}, ' ') AS ws FROM documents
),
f AS (
  SELECT doc_id,
         least(len(ws)::DOUBLE / 100.0, 1.0) AS f_len,
         CASE WHEN len(ws) > 0
              THEN list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)
              ELSE 0.0 END AS awl,
         CASE WHEN len(ws) > 0
              THEN len(list_filter(ws, x -> x IN ({stop})))::DOUBLE / len(ws)
              ELSE 0.0 END AS f_stop,
         length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS f_digit
  FROM w0
),
s AS (
  SELECT round(1.0 / (1.0 + exp(-({w["bias"]} + {w["len"]} * f_len
           + {w["stop"]} * f_stop + {w["awl_dev"]} * abs(awl - 5.0)
           + {w["digit"]} * f_digit))) + 1e-9, 6) AS score
  FROM f
)
SELECT least(floor(score * 10), 9)::INT AS bucket,
       count(*) AS n_docs,
       round(avg(score) + 1e-9, 4) AS mean_score
FROM s
GROUP BY 1
ORDER BY 1
"""


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-2 LM quality score: the bigram upgrade of ``lm_score``
    (CCNet filters in production use n-gram KenLM models, not unigrams —
    a bigram already separates fluent word ORDER from token-soup with the
    same unigram mix). Laplace-smoothed conditional
    ``p(w | w_prev) = (c2(w_prev, w) + 1) / (c1(w_prev) + V)`` trained on
    the corpus itself; per-doc mean log-prob over its bigram positions.

    Scale shape: one posexplode, a per-doc lag window (shuffles on doc_id
    — same key the per-doc aggregate needs, so AQE reuses the exchange),
    one (prev, term) count shuffle for the bigram table, the unigram
    count shuffle, and the two count joins on token keys (NOT broadcast —
    a web-scale bigram vocab exceeds broadcast limits). Per-bigram log
    terms are quantized to scaled int64 BEFORE the per-doc sum (the
    exact-sum discipline), so both engines' group aggregation order is
    irrelevant.

    Returns (doc_id, n_bigrams, avg_logp, lm_bits) for docs with >= 2
    tokens.
    """
    from pyspark.sql.window import Window

    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    tok = staged.select(
        F.col(id_col), F.posexplode("__ws").alias("pos", "term")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = (
        tok.withColumn("prev", F.lag("term").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy(id_col, "prev", "term")
        .agg(F.count("*").alias("tf"))
    )
    c2 = bg.groupBy("prev", "term").agg(F.sum("tf").alias("c2"))
    c1 = tok.groupBy(F.col("term").alias("prev")).agg(
        F.count("*").alias("c1")
    )
    v = tok.agg(F.count_distinct("term").alias("v_vocab"))
    logp = F.log(
        (F.col("c2") + 1.0) / (F.col("c1") + F.col("v_vocab"))
    )
    term_q = F.round(F.lit(1e-9) + logp * F.lit(1e9), 0).cast("long")
    return (
        bg.join(c2, ["prev", "term"])
        .join(c1, "prev")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                F.lit(1e-9)
                + (F.sum(term_q * F.col("tf")) / F.lit(1e9)) / F.sum("tf"),
                6,
            ).alias("avg_logp"),
            F.round(
                F.lit(1e-9)
                - (F.sum(term_q * F.col("tf")) / F.lit(1e9))
                / F.sum("tf")
                / F.log(F.lit(2.0)),
                6,
            ).alias("lm_bits"),
        )
        .orderBy(id_col)
    )


def bigram_lm_score_sql(norm_sql: str) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({norm_sql}, ' ') AS ws FROM documents
           WHERE {norm_sql} != ''),
tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS term
        FROM w),
lagged AS (
  SELECT doc_id, term,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
),
bg AS (SELECT doc_id, prev, term, count(*)::BIGINT AS tf FROM lagged
       WHERE prev IS NOT NULL GROUP BY 1, 2, 3),
c2 AS (SELECT prev, term, sum(tf)::BIGINT AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT term AS prev, count(*)::BIGINT AS c1 FROM tok GROUP BY 1),
v AS (SELECT count(DISTINCT term)::BIGINT AS v_vocab FROM tok),
terms AS (
  SELECT bg.doc_id, bg.tf,
         CAST(round(1e-9 + ln((c2 + 1.0) / (c1 + v_vocab)) * 1e9, 0)
              AS BIGINT) AS term_q
  FROM bg JOIN c2 USING (prev, term) JOIN c1 USING (prev) CROSS JOIN v
)
SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
       round(1e-9 + (sum(term_q * tf)::DOUBLE / 1e9) / sum(tf), 6)
         AS avg_logp,
       round(1e-9 - (sum(term_q * tf)::DOUBLE / 1e9) / sum(tf) / ln(2.0), 6)
         AS lm_bits
FROM terms
GROUP BY doc_id
ORDER BY doc_id
"""


KN_DISCOUNT = 0.75  # the standard absolute-discount value (Chen & Goodman)

# The per-bigram interpolated-KN log-prob, quantized to a scaled int64 —
# ONE SQL text parsed by BOTH engines (the PROBE_SOLVE_EXPRS discipline),
# so the double arithmetic runs in the identical expression order and the
# int64 term survives any aggregation order. Column contract:
#   c2     bigram count c(prev, term)            BIGINT
#   c1b    left total   sum_w c(prev, w)         BIGINT
#   n1_fwd distinct continuations |{w: c(prev,w)>0}|   BIGINT
#   n1_rev distinct left contexts |{v: c(v,term)>0}|   BIGINT
#   n1_all total distinct bigram types           BIGINT
_KN_TERM_Q = (
    "CAST(round(1e-9 + ln((c2 - {d} + {d} * n1_fwd * (n1_rev / n1_all))"
    " / c1b) * 1e9, 0) AS BIGINT)"
).format(d=KN_DISCOUNT)


def kn_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality score (Kneser & Ney 1995;
    Chen & Goodman 1999) — the smoothing the production CCNet/KenLM
    perplexity filters actually use, upgrading ``bigram_lm_score``'s
    Laplace conditionals. Absolute discount D={d} with the mass
    redistributed by CONTINUATION probability:

        p_kn(w | v) = (c(v,w) - D + D * N1+(v,.) * p_cont(w)) / c(v,.)
        p_cont(w)   = N1+(.,w) / N1+(.,.)

    (every scored bigram occurs in training, so the max(.,0) clamp is
    never active and the formula above is exact). Continuation counts are
    what distinguish "francisco" (frequent but only ever after "san") from
    a genuinely productive word — the signal Laplace smoothing cannot see.

    Scale shape: identical to bigram_lm_score — one posexplode, the per-doc
    lag window, one (prev, term) count shuffle; the KN statistics (left
    totals, forward/reverse continuation type counts) are three map-side-
    combined aggregates OVER THE BIGRAM-TYPE table (vocab^2-bounded, far
    smaller than the corpus), joined back on token keys (not broadcast — a
    web-scale bigram vocab exceeds broadcast limits); N1+(.,.) is a 1-row
    broadcast. Per-bigram log terms quantize to scaled int64 before the
    per-doc sum via a shared SQL expression text both engines parse.

    Returns (doc_id, n_bigrams, avg_logp_kn, kn_bits) for docs with >= 2
    tokens.
    """
    from pyspark.sql.window import Window

    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    tok = staged.select(
        F.col(id_col), F.posexplode("__ws").alias("pos", "term")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = (
        tok.withColumn("prev", F.lag("term").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy(id_col, "prev", "term")
        .agg(F.count("*").alias("tf"))
    )
    c2 = bg.groupBy("prev", "term").agg(F.sum("tf").alias("c2"))
    fwd = c2.groupBy("prev").agg(
        F.sum("c2").alias("c1b"), F.count("*").alias("n1_fwd")
    )
    rev = c2.groupBy("term").agg(F.count("*").alias("n1_rev"))
    nall = c2.agg(F.count("*").alias("n1_all"))
    term_q = F.expr(_KN_TERM_Q)
    return (
        bg.join(c2, ["prev", "term"])
        .join(fwd, "prev")
        .join(rev, "term")
        .crossJoin(F.broadcast(nall))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                F.lit(1e-9)
                + (F.sum(term_q * F.col("tf")) / F.lit(1e9)) / F.sum("tf"),
                6,
            ).alias("avg_logp_kn"),
            F.round(
                F.lit(1e-9)
                - (F.sum(term_q * F.col("tf")) / F.lit(1e9))
                / F.sum("tf")
                / F.log(F.lit(2.0)),
                6,
            ).alias("kn_bits"),
        )
        .orderBy(id_col)
    )


kn_lm_score.__doc__ = kn_lm_score.__doc__.replace("{d}", str(KN_DISCOUNT))


def kn_lm_score_sql(norm_sql: str) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({norm_sql}, ' ') AS ws FROM documents
           WHERE {norm_sql} != ''),
tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS term
        FROM w),
lagged AS (
  SELECT doc_id, term,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tok
),
bg AS (SELECT doc_id, prev, term, count(*)::BIGINT AS tf FROM lagged
       WHERE prev IS NOT NULL GROUP BY 1, 2, 3),
c2t AS (SELECT prev, term, sum(tf)::BIGINT AS c2 FROM bg GROUP BY 1, 2),
fwd AS (SELECT prev, sum(c2)::BIGINT AS c1b, count(*)::BIGINT AS n1_fwd
        FROM c2t GROUP BY 1),
rev AS (SELECT term, count(*)::BIGINT AS n1_rev FROM c2t GROUP BY 1),
nall AS (SELECT count(*)::BIGINT AS n1_all FROM c2t),
terms AS (
  SELECT bg.doc_id, bg.tf, {_KN_TERM_Q} AS term_q
  FROM bg JOIN c2t USING (prev, term) JOIN fwd USING (prev)
  JOIN rev USING (term) CROSS JOIN nall
)
SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
       round(1e-9 + (sum(term_q * tf)::DOUBLE / 1e9) / sum(tf), 6)
         AS avg_logp_kn,
       round(1e-9 - (sum(term_q * tf)::DOUBLE / 1e9) / sum(tf) / ln(2.0), 6)
         AS kn_bits
FROM terms
GROUP BY doc_id
ORDER BY doc_id
"""


RAKE_N_STOPWORDS = 15
RAKE_TOP_K = 20


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_stopwords: int = RAKE_N_STOPWORDS,
    top_k: int = RAKE_TOP_K,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al., "Automatic Keyword Extraction
    from Individual Documents", 2010): candidate phrases are maximal token
    runs between stopwords; each word scores degree/frequency over the
    phrase graph; a phrase scores the sum of its member word scores.
    Stopwords here are CORPUS-ADAPTIVE — the ``n_stopwords`` most frequent
    tokens (deterministic count-desc/token-asc cut), the data-driven
    stand-in for a language stopword list.

    Scale shape: one posexplode, a broadcast stopword join, the per-doc
    segment window (shuffles on doc_id once), then two token-key count
    shuffles for freq/degree and a phrase-key rollup. Per-member scores
    quantize to scaled int64 before the phrase sum (exact-sum
    discipline). Returns the corpus top-``top_k`` phrases by
    (rake_score desc, phrase asc) with occurrence counts.
    """
    from pyspark.sql.window import Window

    staged = spread(docs).withColumn(
        "__ws", words(normalized_text(F.col(text_col)))
    )
    tok = staged.select(
        F.col(id_col), F.posexplode("__ws").alias("pos", "term")
    )
    stop = (
        tok.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(n_stopwords)
        .select("term", F.lit(1).alias("__stop"))
    )
    marked = tok.join(F.broadcast(stop), "term", "left")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = marked.withColumn(
        "seg", F.sum(F.coalesce("__stop", F.lit(0))).over(w)
    ).where(F.col("__stop").isNull())
    phrases = (
        seg.groupBy(id_col, "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
    )
    members = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("term")
    )
    wstat = members.groupBy("term").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("degree")
    )
    # per-term score quantized to 1e9-scaled int64: the phrase sum below
    # is then order-independent exact in both engines
    score_q = F.round(
        F.lit(1e-9) + F.col("degree") / F.col("freq") * F.lit(1e9), 0
    ).cast("long")
    scored = (
        members.join(wstat.withColumn("score_q", score_q), "term")
        .groupBy("phrase")
        .agg(
            F.max("plen").alias("n_words"),
            F.sum("score_q").alias("_sq"),
        )
    )
    # every OCCURRENCE of a phrase contributed its full member set to the
    # sum, so dividing by the occurrence count recovers the per-phrase
    # member-score sum — RAKE's phrase score
    occ = phrases.groupBy("phrase").agg(F.count("*").alias("n_occurrences"))
    return (
        scored.join(occ, "phrase")
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.round(
                F.lit(1e-9)
                + F.col("_sq") / F.col("n_occurrences") / F.lit(1e9),
                6,
            ).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(top_k)
    )


# ------------------------------------------------ BPE merge training (r7)
BPE_MERGES = 8
BPE_TRAIN_BATCH = 2  # graded batch size for the batched-merge variant


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = BPE_MERGES,
    batch: int = 1,
    stats: dict | None = None,
):
    """Train byte-pair-encoding merges over the corpus (Sennrich et al.
    2016) — tokenizer TRAINING, completing the subword family whose
    APPLICATION side is functions.text.subword_count's fixed vocab.

    Returns the learned merge table as a list of Rows
    ``(merge_rank, left_sym, right_sym, merged, pair_count)`` — driver
    data by design: the merge table IS the trained artifact (like
    PQ codebooks), k rows of frozen state.

    Scale shape — the textbook distributed BPE trainer: ONE corpus pass
    builds the (word, count) vocabulary (a single shuffle with map-side
    combine; the corpus is never touched again), then every merge round
    runs over the compressed vocab table: adjacent-pair counts weighted by
    word frequency (map-side-combined aggregate over ~|vocab| rows), a
    1-row argmax collected to the driver (count DESC, pair ASC — integer
    counts, so partition order cannot move the winner), and the greedy
    left-to-right merge fold applied per word as a JVM higher-order
    ``aggregate`` — no Python in any per-row path. Each round's vocab
    persists and MATERIALIZES INSIDE the next round's pair-count job (the
    fold caches mid-plan; the previous round's cache releases right after
    — one job per round, not a fold job plus a count job), so fold
    execution never recomputes through nested lineage.

    ``batch > 1`` is the production path at real tokenizer scale (32k+
    merges): each round applies up to ``batch`` mutually NON-INTERACTING
    top pairs (greedy admission in (count DESC, pair ASC) order; a pair
    is admitted only if its left/right/merged symbols are disjoint from
    every earlier admitted pair's), cutting driver round-trips from
    O(n_merges) to O(n_merges/batch). The candidate head is a FIXED
    ``batch**2`` every round — never shrunk as the merge budget runs out —
    so the round sequence depends only on the corpus and the global pick
    list trims to ``n_merges``; that is what lets a static SQL oracle
    replay the rounds exactly. Applying symbol-disjoint pairs in
    one simultaneous fold is exact: a merge of (a,b) can neither create
    nor destroy an adjacency of symbols outside {a,b,ab}, so each
    admitted pair's occurrence set — and hence the fold result — equals
    one-at-a-time application in admission order. Where it can diverge
    from fully serial training is only the RANKING: a serial trainer
    re-counts after every single merge, so a newly created pair (x,ab)
    may outrank the batch's later picks; batched training is therefore
    its own documented variant (the standard batched/parallel BPE
    trade), identical to serial whenever no such interaction occurs
    (pinned in tests/test_round8_ops.py on a non-interacting corpus and
    on the graded corpus at the graded batch size).
    """
    from pyspark.sql import functions as F

    from helixdb_spark.functions.text import normalized_text, words
    from helixdb_spark.operators.util import spread

    vocab = (
        spread(docs)
        .select(F.explode(words(normalized_text(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(F.split("w", "").alias("syms"), "n")
        .persist()
    )
    vocab.count()
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    merges = []
    rounds = 0
    cur = vocab
    prev = None  # last round's vocab: released once `cur` materializes
    try:
        while len(merges) < n_merges:
            pair_idx = F.when(
                F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
            ).otherwise(F.array().cast("array<int>"))
            pairs = cur.select(
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "n",
            )
            ranked = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            )
            # batch=1: the exact 1-row argmax of the serial trainer.
            # batch>1: a FIXED batch^2 candidate head every round (never
            # shrunk near the merge budget) so the round sequence is a pure
            # function of the corpus — statically replayable by the SQL
            # oracle; the global pick list is trimmed to n_merges below.
            # Greedy disjoint admission may admit fewer than `batch` (a hot
            # symbol can dominate the head) — the top-1 is always admitted,
            # so a shortfall only costs an extra round, never a stall.
            cands = ranked.take(1 if batch == 1 else batch * batch)
            # the take() job just materialized `cur`'s cache (the fold ran
            # inside it, mid-plan) — the previous round's cache is now dead
            if prev is not None and prev is not vocab:
                prev.unpersist()
                prev = None
            if not cands:
                break
            rounds += 1
            admitted: list = []
            used: set = set()
            for row in cands:
                if len(admitted) == batch:
                    break
                a, b, m = row["l"], row["r"], row["l"] + row["r"]
                if used & {a, b, m}:
                    continue  # interacts with an earlier admitted pair
                used |= {a, b, m}
                admitted.append((a, b, m, int(row["c"])))
            for a, b, m, c in admitted:
                if len(merges) == n_merges:
                    break  # budget hit mid-batch: trim the overshoot
                merges.append((len(merges) + 1, a, b, m, c))
            if len(merges) >= n_merges:
                break  # skip the final fold — nothing downstream reads it

            def folded_expr(pairs_=tuple(admitted)):
                def step(acc, s):
                    out = F.concat(acc, F.array(s))
                    # at most one pair can match (symbol-disjoint): fold
                    # checks run in admission order, first match wins
                    for a, b, m in reversed([(p[0], p[1], p[2]) for p in pairs_]):
                        out = F.when(
                            (F.size(acc) > 0)
                            & (F.element_at(acc, -1) == F.lit(a))
                            & (s == F.lit(b)),
                            F.concat(
                                F.slice(acc, 1, F.size(acc) - 1),
                                F.array(F.lit(m)),
                            ),
                        ).otherwise(out)
                    return out

                return F.aggregate(
                    "syms", F.array().cast("array<string>"), step
                )

            # no count() here: the persist materializes inside the NEXT
            # round's take() job, halving the jobs per merge round
            # (measured 13.5s -> 4.3s on the 64-merge trainer at sf0.1);
            # `prev` keeps the parent cache alive until then so the fold
            # never recomputes through nested lineage
            nxt = cur.select(folded_expr().alias("syms"), "n").persist()
            prev, cur = cur, nxt
    finally:
        for df in (cur, prev):
            if df is not None and df is not vocab:
                df.unpersist()
        vocab.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def bpe_segment_words(
    docs: DataFrame,
    merges,
    text_col: str = "text",
):
    """Apply learned BPE merges (rank order) to the corpus vocabulary:
    returns the (word, n, n_subwords) segmentation table — the APPLY side
    of bpe_train_merges, sharing its greedy fold semantics exactly.

    Scale shape: merges apply to the DISTINCT-word table (one corpus
    shuffle, then ~|vocab| rows per round), never to raw documents; the
    caller broadcasts the result back onto the corpus. Each fold round is
    re-materialized so lineage never nests (the same discipline as
    training)."""
    from pyspark.sql import functions as F

    from helixdb_spark.functions.text import normalized_text, words
    from helixdb_spark.operators.util import spread

    cur = (
        spread(docs)
        .select(F.explode(words(normalized_text(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select("w", F.split("w", "").alias("syms"), "n")
        .persist()
    )
    cur.count()
    try:
        for rec in merges:
            a, b, m = rec[1], rec[2], rec[3]
            folded = F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (s == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            )
            nxt = cur.select("w", folded.alias("syms"), "n").persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    except BaseException:
        cur.unpersist()
        raise
    out = cur.select(
        "w", "n", F.size("syms").cast("long").alias("n_subwords")
    )
    # the final fold stage stays cached until the caller drops the result
    # (cache-lifecycle contract) — never collected: at 100 TB the vocab is
    # millions of rows, broadcast-sized but not driver-list-sized
    from helixdb_spark.operators.util import unpersist_on_gc

    return unpersist_on_gc(out, cur)


# --------------------------- DSIR importance resampling (round 8)
DSIR_BUCKETS = 1024
DSIR_LOG_SCALE = 1_000_000_000  # per-bucket log-ratio quantum (the KL recipe)


def dsir_importance(
    docs,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
):
    """DSIR-style data selection (Xie et al., NeurIPS 2023 — "Data
    Selection for Language Models via Importance Resampling"): score every
    document by how target-domain-like its hashed-unigram profile is,
    ``log p_target(doc) - log p_raw(doc)`` under bag-of-hashed-buckets
    multinomials with add-one smoothing. ``target_pred`` is a Column
    predicate naming the target slice (e.g. ``lang == 'en'``); the raw
    distribution is the whole corpus. Returns one row per doc:
    ``(id, n_tokens, log_importance, selected)`` with ``selected`` =
    more target-like than raw (log importance > 0) — the keep set an
    importance-resampling pass feeds the sampler.

    Scale shape: one token explode feeds BOTH distributions (a single
    map-side-combined aggregate to the B-bucket count table: raw count +
    conditional target count per bucket); the per-bucket log-ratio is
    quantized ONCE to int64 (B rows, broadcast), and the per-doc score is
    an INTEGER sum over a second explode joined against that broadcast —
    partition-order independent by construction (the text_source_kl
    exact-sum discipline). Nothing driver-side, no UDFs; at 100 TB the
    corpus is touched twice and shuffles only token-bucket and doc keys.
    """
    from pyspark.sql import functions as F

    from helixdb_spark.functions.text import normalized_text, words
    from helixdb_spark.operators.util import spread

    toks = spread(docs).select(
        F.col(id_col),
        target_pred.cast("long").alias("_t"),
        F.explode(words(normalized_text(F.col(text_col)))).alias("w"),
    )
    b = toks.withColumn(
        "b",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
        % n_buckets,
    )
    counts = b.groupBy("b").agg(
        F.count("*").alias("n_raw"), F.sum("_t").alias("n_tgt")
    )
    tot = counts.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    lw = F.round(
        F.lit(1e-9)
        + (
            F.log((F.col("n_tgt") + 1) / (F.col("t_tgt") + n_buckets))
            - F.log((F.col("n_raw") + 1) / (F.col("t_raw") + n_buckets))
        )
        * DSIR_LOG_SCALE,
        0,
    ).cast("long")
    ratio = counts.crossJoin(F.broadcast(tot)).select("b", lw.alias("lw"))
    per_doc = (
        b.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("lw").alias("_s"))
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        (
            F.round(
                F.lit(1e-9) + F.col("_s") / DSIR_LOG_SCALE, 6
            )
            + F.lit(0.0)
        ).alias("log_importance"),
        (F.col("_s") > 0).cast("int").alias("selected"),
    ).orderBy(id_col)


# ------------------------------------------------------------- TextRank ----
TEXTRANK_MIN_LEN = 3
TEXTRANK_ITERS = 5
TEXTRANK_DAMPING = 0.85
TEXTRANK_ROUND_DP = 9
TEXTRANK_TOP_K = 20


def textrank_keywords(
    docs: DataFrame,
    top_k: int = TEXTRANK_TOP_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): build
    the corpus-wide word co-occurrence graph (adjacent CONTENT words —
    stopwords and words under TEXTRANK_MIN_LEN chars dropped before
    windowing, the paper's syntactic filter reduced to a deterministic
    rule both engines replay), weight each undirected edge by its
    co-occurrence count, and rank words with the module-shared weighted
    PageRank (operators.graph.pagerank — fixed rounds, per-round 9 dp
    rounding, so the oracle unrolls bit-equal CTEs). Returns the top_k
    keywords by rounded rank, ties to the lexicographically smaller word.

    The graph-family composition for text: RAKE (text_rake_keywords)
    scores phrases from degree/frequency in one pass; TextRank is its
    global-recursive counterpart. Scale shape: the pair explode is
    O(total words) with a map-side-combined count; the graph that reaches
    the iteration is vocabulary-sized (<< corpus), and the PageRank
    rounds ride the operator's broadcast-rank path.
    """
    from helixdb_spark.operators.graph import pagerank
    from helixdb_spark.operators.util import carry_caches

    stop = list(EN_STOPWORDS)
    d = spread(docs).select(
        F.col(id_col),
        F.filter(
            words(normalized_text(F.col(text_col))),
            lambda w: (F.length(w) >= TEXTRANK_MIN_LEN) & ~w.isin(stop),
        ).alias("_cw"),
    )
    pairs = (
        d.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(_cw) - 1, 0)), "
                    "i -> struct(element_at(_cw, i) AS a, "
                    "element_at(_cw, i + 1) AS b))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    und = (
        pairs.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("w"))
    )
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    ranks = pagerank(
        edges,
        weight_col="w",
        damping=TEXTRANK_DAMPING,
        iterations=TEXTRANK_ITERS,
        round_dp=TEXTRANK_ROUND_DP,
    )
    from pyspark.sql.window import Window as W

    scored = ranks.select(
        F.col("node").alias("keyword"),
        F.round(F.col("rank") + F.lit(1e-9), 6).alias("rank"),
    )
    # Distributed top-k (TakeOrderedAndProject) FIRST, then number the
    # <= top_k survivors — the unpartitioned rank window never sees the
    # vocabulary-sized input (plan-pinned: test_plan_quality gate).
    top = scored.orderBy(F.desc("rank"), F.asc("keyword")).limit(top_k)
    w = W.orderBy(F.desc("rank"), F.asc("keyword"))
    return carry_caches(
        top.withColumn("rk", F.row_number().over(w))
        .select("rk", "keyword", "rank")
        .orderBy("rk"),
        ranks,
    )


# --------------------------------------------------- linear quality probe ----
PROBE_SCALE = 10_000  # 4-dp feature quantization -> exact int64 moments

# Closed-form 3x3 normal-equation solve (adjugate / Cramer), written ONCE
# as SQL text and parsed by BOTH engines, so the double arithmetic runs in
# the identical expression order. Inputs are the exact int64 moment sums
# (n plus scaled sums); every division below is deterministic IEEE double
# math on identical operands.
PROBE_SOLVE_EXPRS: dict[str, str] = {}


def _probe_solve_exprs() -> dict[str, str]:
    if PROBE_SOLVE_EXPRS:
        return PROBE_SOLVE_EXPRS
    s1 = float(PROBE_SCALE)
    s2 = float(PROBE_SCALE) * float(PROBE_SCALE)
    # moments as doubles (same int -> double conversion both sides)
    m = {
        "N": "CAST(n AS DOUBLE)",
        "X1": f"CAST(sx1 AS DOUBLE) / {s1}",
        "X2": f"CAST(sx2 AS DOUBLE) / {s1}",
        "X11": f"CAST(s11 AS DOUBLE) / {s2}",
        "X12": f"CAST(s12 AS DOUBLE) / {s2}",
        "X22": f"CAST(s22 AS DOUBLE) / {s2}",
        "Y": f"CAST(sy AS DOUBLE) / {s1}",
        "X1Y": f"CAST(s1y AS DOUBLE) / {s2}",
        "X2Y": f"CAST(s2y AS DOUBLE) / {s2}",
        "YY": f"CAST(syy AS DOUBLE) / {s2}",
    }
    n, x1, x2 = m["N"], m["X1"], m["X2"]
    x11, x12, x22 = m["X11"], m["X12"], m["X22"]
    y, x1y, x2y, yy = m["Y"], m["X1Y"], m["X2Y"], m["YY"]
    # A = [[n,x1,x2],[x1,x11,x12],[x2,x12,x22]], b = [y, x1y, x2y]
    det = (
        f"(({n}) * (({x11}) * ({x22}) - ({x12}) * ({x12}))"
        f" - ({x1}) * (({x1}) * ({x22}) - ({x12}) * ({x2}))"
        f" + ({x2}) * (({x1}) * ({x12}) - ({x11}) * ({x2})))"
    )
    # Cramer: replace column i of A with b
    b0 = (
        f"((({y}) * (({x11}) * ({x22}) - ({x12}) * ({x12}))"
        f" - ({x1}) * (({x1y}) * ({x22}) - ({x12}) * ({x2y}))"
        f" + ({x2}) * (({x1y}) * ({x12}) - ({x11}) * ({x2y}))) / {det})"
    )
    b1 = (
        f"((({n}) * (({x1y}) * ({x22}) - ({x2y}) * ({x12}))"
        f" - ({y}) * (({x1}) * ({x22}) - ({x12}) * ({x2}))"
        f" + ({x2}) * (({x1}) * ({x2y}) - ({x1y}) * ({x2}))) / {det})"
    )
    b2 = (
        f"((({n}) * (({x11}) * ({x2y}) - ({x12}) * ({x1y}))"
        f" - ({x1}) * (({x1}) * ({x2y}) - ({x1y}) * ({x2}))"
        f" + ({y}) * (({x1}) * ({x12}) - ({x11}) * ({x2}))) / {det})"
    )
    # R^2 = 1 - SSE/SST with SSE = YY - b0*Y - b1*X1Y - b2*X2Y (normal-eq
    # identity) and SST = YY - Y*Y/N — all from the same moment set
    sse = f"(({yy}) - {b0} * ({y}) - {b1} * ({x1y}) - {b2} * ({x2y}))"
    sst = f"(({yy}) - ({y}) * ({y}) / ({n}))"
    PROBE_SOLVE_EXPRS.update(
        {
            "intercept": b0,
            "b_mean_word_len": b1,
            "b_stopword_ratio": b2,
            "r2": f"(1.0 - {sse} / {sst})",
        }
    )
    return PROBE_SOLVE_EXPRS


def quality_probe_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train a linear quality probe in ONE corpus pass: regress token
    density (words per normalized char — a crude fluency signal) on mean
    word length and stopword ratio via the closed-form normal equations.
    This is the distributed-training shape every feature-based quality
    classifier reduces to (fastText-style linear probes, the logistic
    scorers of CCNet/Gopher-class pipelines — here the least-squares
    special case, which has an exact closed form both engines can replay):

    - features quantize to 4 dp and accumulate as EXACT int64 moment sums
      (the scaled-int discipline of embedding_covariance) — one map-side-
      combined aggregate, O(1) driver state, partition-order independent;
    - the 3x3 solve + R^2 run as ONE shared SQL expression text parsed by
      both engines, so every double op has identical operands and order.

    Returns (term, value): intercept, the two coefficients, and r2,
    each rounded to 6 dp. Documents with no words are excluded from the
    fit on both sides.
    """
    exprs = _probe_solve_exprs()
    feats = _probe_features(docs, text_col=text_col)
    moments = _probe_moments(feats)
    cols = [
        F.struct(
            F.lit(term).alias("term"),
            F.round(F.expr(expr) + F.lit(1e-9), 6).alias("value"),
        )
        for term, expr in exprs.items()
    ]
    return (
        moments.select(F.explode(F.array(*cols)).alias("s"))
        .select("s.term", "s.value")
        .orderBy("term")
    )


def _probe_features(
    docs: DataFrame,
    id_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """The probe's quantized feature rows (x1, x2, y as scaled int64),
    optionally keeping the document id — shared by fit and scoring so
    both see bit-identical inputs."""
    keep = [F.col(id_col)] if id_col else []
    d = spread(docs).select(
        *keep, normalized_text(F.col(text_col)).alias("_norm")
    )
    ws = words(F.col("_norm"))
    n_words = F.size(ws)
    n_chars = F.length("_norm")
    sum_len = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_stop = F.size(F.filter(ws, lambda w: w.isin(list(EN_STOPWORDS))))
    return (
        d.select(
            *keep,
            n_words.alias("_nw"),
            n_chars.alias("_nc"),
            sum_len.alias("_sl"),
            n_stop.alias("_ns"),
        )
        .where((F.col("_nw") > 0) & (F.col("_nc") > 0))
        .select(
            *keep,
            F.round(
                F.round(
                    F.lit(1e-9) + F.col("_sl") / F.col("_nw"), 4
                ) * PROBE_SCALE
            ).cast("long").alias("x1"),
            F.round(
                F.round(
                    F.lit(1e-9) + F.col("_ns") / F.col("_nw"), 4
                ) * PROBE_SCALE
            ).cast("long").alias("x2"),
            F.round(
                F.round(
                    F.lit(1e-9) + F.col("_nw") / F.col("_nc"), 4
                ) * PROBE_SCALE
            ).cast("long").alias("y"),
        )
    )


def _probe_moments(feats: DataFrame) -> DataFrame:
    return feats.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


# prediction/residual in ONE shared text so both engines evaluate the
# identical expression tree over (b0, b1, b2, x1, x2, y)
PROBE_PRED_EXPR = (
    "(b0 + b1 * (CAST(x1 AS DOUBLE) / 10000.0)"
    " + b2 * (CAST(x2 AS DOUBLE) / 10000.0))"
)
PROBE_RESID_EXPR = f"(CAST(y AS DOUBLE) / 10000.0 - {PROBE_PRED_EXPR})"


def quality_probe_scores(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the trained probe corpus-wide and surface the k documents
    whose token density falls FURTHEST BELOW the model's prediction — the
    residual-outlier cut a probe-based curation pass makes (CCNet-style:
    score with a cheap model, drop the tail). The unrounded coefficients
    broadcast as one row (the 1-row scalar-broadcast pattern); scoring is
    a pure projection over the feature rows. Returns
    (rk, doc_id, density, predicted, residual), residual ascending."""
    from pyspark.sql.window import Window as W

    exprs = _probe_solve_exprs()
    feats = _probe_features(docs, id_col=id_col, text_col=text_col)
    sol = _probe_moments(feats).select(
        F.expr(exprs["intercept"]).alias("b0"),
        F.expr(exprs["b_mean_word_len"]).alias("b1"),
        F.expr(exprs["b_stopword_ratio"]).alias("b2"),
    )
    scored = feats.crossJoin(F.broadcast(sol)).select(
        F.col(id_col),
        F.round(F.col("y") / F.lit(float(PROBE_SCALE)) + F.lit(1e-9), 6).alias(
            "density"
        ),
        F.round(F.expr(PROBE_PRED_EXPR) + F.lit(1e-9), 6).alias("predicted"),
        F.round(F.expr(PROBE_RESID_EXPR) + F.lit(1e-9), 6).alias("residual"),
    )
    # Distributed top-k first; the unpartitioned numbering window runs over
    # the <= k survivors, never the corpus (plan-pinned: test_plan_quality).
    top = scored.orderBy(F.asc("residual"), F.asc(id_col)).limit(k)
    w = W.orderBy(F.asc("residual"), F.asc(id_col))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("rk", id_col, "density", "predicted", "residual")
        .orderBy("rk")
    )
