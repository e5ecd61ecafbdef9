"""Graded sketch queries (HLL / count-min / Bloom) with DuckDB oracles.

The oracles replicate the md5-derived hash families exactly (the same
discipline as plans/pipeline.py), so both engines build bit-identical
sketch state: register maxima, cells, and bit positions are integers, and
even the approximate estimates agree after the shared rounding nudge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from helixdb_spark.operators import sketches
from helixdb_spark.operators.sketches import (
    BLOOM_K,
    BLOOM_M,
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    HLL_RHO_BITS,
)
from helixdb_spark.sources import load_table

_RB1 = HLL_RHO_BITS + 1  # 49
_SCALE = 1 << _RB1  # 2^49 — the absent-register (rho=0) contribution


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality report over two event keys: the low-cardinality
    user_id (exercises the linear-counting branch) and the unique event_id
    (exercises the raw-estimate branch)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        sketches.hll_distinct(ev, "user_id")
        .unionByName(sketches.hll_distinct(ev, "event_id"))
        .orderBy("key_name")
    )


SKETCH_HLL_SQL = f"""
WITH keys AS (
  SELECT 'user_id' AS key_name, user_id::VARCHAR AS k FROM events
  UNION ALL
  SELECT 'event_id', event_id::VARCHAR FROM events
),
h AS (
  SELECT key_name,
         ('0x' || substr(md5(k), 1, 2))::BIGINT AS register,
         ('0x' || substr(md5(k), 3, 12))::BIGINT AS w
  FROM keys
),
regs AS (
  SELECT key_name, register,
         max(CASE WHEN w > 0 THEN {_RB1} - length(bin(w)) ELSE {_RB1} END) AS max_rho
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT key_name,
         count(*)::BIGINT AS nonzero,
         ({HLL_M} - count(*))::BIGINT AS v_zero,
         (sum((1::BIGINT << ({_RB1} - max_rho)))
            + ({HLL_M} - count(*)) * (1::BIGINT << {_RB1}))::BIGINT AS sum_scaled
  FROM regs GROUP BY 1
),
est AS (
  SELECT key_name, {HLL_M}::BIGINT AS m, nonzero, v_zero, sum_scaled,
         round(CASE WHEN (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled <= 2.5 * {HLL_M}.0
                         AND v_zero > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v_zero)
                    ELSE (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled
               END + 1e-9, 4) AS estimate
  FROM agg
),
ex AS (
  SELECT 'user_id' AS key_name, count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events
  UNION ALL
  SELECT 'event_id', count(DISTINCT event_id)::BIGINT FROM events
)
SELECT est.key_name, m, nonzero, v_zero, sum_scaled, estimate, exact_distinct
FROM est JOIN ex ON est.key_name = ex.key_name
ORDER BY est.key_name
"""


def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates for the exact top-10 event users — the sketch's
    overcount is itself integer-exact and oracle-checked."""
    ev = load_table(spark, sf_dir, "events")
    return sketches.cms_heavy_hitters(ev, "user_id", top_n=10)


SKETCH_CMS_SQL = f"""
WITH cells AS (
  SELECT j AS r,
         ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT
           % {CMS_WIDTH} AS c,
         count(*)::BIGINT AS cnt
  FROM events, range({CMS_DEPTH}) t(j)
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id AS key, count(*)::BIGINT AS exact_cnt FROM events
  GROUP BY 1 ORDER BY exact_cnt DESC, key LIMIT 10
),
probes AS (
  SELECT key, exact_cnt, j AS r,
         ('0x' || substr(md5(j::VARCHAR || ':' || key::VARCHAR), 1, 15))::BIGINT
           % {CMS_WIDTH} AS c
  FROM exact, range({CMS_DEPTH}) t(j)
),
est AS (
  SELECT key, exact_cnt, min(cnt)::BIGINT AS cms_est
  FROM probes JOIN cells USING (r, c)
  GROUP BY 1, 2
)
SELECT key, exact_cnt, cms_est, (cms_est - exact_cnt)::BIGINT AS overcount
FROM est ORDER BY exact_cnt DESC, key
"""


def sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter over the custkeys that have orders, probed by every
    customer — exact false-positive accounting, zero probe-side shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return sketches.bloom_probe_summary(orders, "o_custkey", customer, "c_custkey")


SKETCH_BLOOM_SQL = f"""
WITH bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5(i::VARCHAR || ':' || o_custkey::VARCHAR), 1, 15))::BIGINT
           % {BLOOM_M} AS pos
  FROM orders, range({BLOOM_K}) t(i)
),
members AS (SELECT DISTINCT o_custkey AS mk FROM orders),
probes AS (
  SELECT c_custkey AS key,
         ('0x' || substr(md5(i::VARCHAR || ':' || c_custkey::VARCHAR), 1, 15))::BIGINT
           % {BLOOM_M} AS pos
  FROM customer, range({BLOOM_K}) t(i)
),
flags AS (
  SELECT probes.key, (count(bits.pos) = {BLOOM_K}) AS bloom_positive
  FROM probes LEFT JOIN bits ON probes.pos = bits.pos
  GROUP BY probes.key
),
truth AS (
  SELECT f.key, f.bloom_positive, (m.mk IS NOT NULL) AS is_member
  FROM flags f LEFT JOIN members m ON f.key = m.mk
)
SELECT count(*)::BIGINT AS probed,
       sum(CASE WHEN bloom_positive THEN 1 ELSE 0 END)::BIGINT AS bloom_positive,
       sum(CASE WHEN is_member THEN 1 ELSE 0 END)::BIGINT AS true_members,
       sum(CASE WHEN bloom_positive AND NOT is_member THEN 1 ELSE 0 END)::BIGINT
         AS false_positives,
       sum(CASE WHEN NOT bloom_positive AND is_member THEN 1 ELSE 0 END)::BIGINT
         AS false_negatives
FROM truth
"""


QUERIES = {
    "sketch_hll_distinct": sketch_hll_distinct,
    "sketch_cms_topk": sketch_cms_topk,
    "sketch_bloom_probe": sketch_bloom_probe,
}

ORACLES = {
    "sketch_hll_distinct": SKETCH_HLL_SQL,
    "sketch_cms_topk": SKETCH_CMS_SQL,
    "sketch_bloom_probe": SKETCH_BLOOM_SQL,
}


def sketch_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram p50/p95/p99 of event values next to the exact
    percentiles — O(bins) mergeable state vs a full sort."""
    ev = load_table(spark, sf_dir, "events")
    return sketches.histogram_quantiles(ev, "value")


_HB = sketches.HIST_BINS

SKETCH_HIST_SQL = f"""
WITH stats AS (
  SELECT min(value) AS vmin, max(value) AS vmax, count(value)::BIGINT AS n
  FROM events
),
b AS (
  SELECT least({_HB - 1}, greatest(0,
           floor((value - vmin) / ((vmax - vmin) / {_HB}.0))))::BIGINT AS bin
  FROM events, stats WHERE value IS NOT NULL
),
hist AS (SELECT bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM hist
),
qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q),
picked AS (
  SELECT q, min(bin) AS bin FROM qs, cum, stats WHERE cum >= q * n GROUP BY q
),
prow AS (
  SELECT p.q, p.bin, c.cnt, c.cum FROM picked p JOIN cum c ON p.bin = c.bin
),
ex AS (
  SELECT unnest([0.5, 0.95, 0.99]) AS q,
         unnest([quantile_cont(value, 0.5), quantile_cont(value, 0.95),
                 quantile_cont(value, 0.99)]) AS exact_raw
  FROM events
)
SELECT pr.q, s.n,
       round(s.vmin + (pr.bin + (pr.q * s.n - (pr.cum - pr.cnt)) / pr.cnt)
               * (s.vmax - s.vmin) / {_HB}.0 + 1e-9, 4) AS estimate,
       round(ex.exact_raw + 1e-9, 6) AS exact
FROM prow pr, stats s
JOIN ex ON pr.q = ex.q
ORDER BY pr.q
"""

QUERIES.update({"sketch_hist_quantiles": sketch_hist_quantiles})
ORACLES.update({"sketch_hist_quantiles": SKETCH_HIST_SQL})


def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof: per-event-type HLL register sets unioned by
    register-wise max (``hll_merge``) next to each per-type estimate. At
    100 TB this is the whole point of the sketch — per-shard/day states are
    ≤ m rows each and the union never re-reads raw data; the __merged__ row
    must equal a direct fold over everything (max is associative), which the
    oracle checks bit-for-bit through sum_scaled."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    regs = sketches.hll_registers_by(ev, "event_type", "user_id")
    est = sketches.hll_estimate_by(regs.unionByName(sketches.hll_merge(regs)))
    exact = (
        ev.groupBy(F.col("event_type").alias("key_name"))
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
        .unionByName(
            ev.agg(
                F.lit("__merged__").alias("key_name"),
                F.count_distinct("user_id").alias("exact_distinct"),
            )
        )
    )
    return est.join(exact, "key_name").orderBy("key_name")


SKETCH_HLL_MERGE_SQL = f"""
WITH keys AS (
  SELECT event_type AS key_name, user_id::VARCHAR AS k FROM events
  UNION ALL
  SELECT '__merged__', user_id::VARCHAR FROM events
),
h AS (
  SELECT key_name,
         ('0x' || substr(md5(k), 1, 2))::BIGINT AS register,
         ('0x' || substr(md5(k), 3, 12))::BIGINT AS w
  FROM keys
),
regs AS (
  SELECT key_name, register,
         max(CASE WHEN w > 0 THEN {_RB1} - length(bin(w)) ELSE {_RB1} END) AS max_rho
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT key_name,
         count(*)::BIGINT AS nonzero,
         ({HLL_M} - count(*))::BIGINT AS v_zero,
         (sum((1::BIGINT << ({_RB1} - max_rho)))
            + ({HLL_M} - count(*)) * (1::BIGINT << {_RB1}))::BIGINT AS sum_scaled
  FROM regs GROUP BY 1
),
est AS (
  SELECT key_name, {HLL_M}::BIGINT AS m, nonzero, v_zero, sum_scaled,
         round(CASE WHEN (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled <= 2.5 * {HLL_M}.0
                         AND v_zero > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v_zero)
                    ELSE (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled
               END + 1e-9, 4) AS estimate
  FROM agg
),
ex AS (
  SELECT event_type AS key_name, count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY 1
  UNION ALL
  SELECT '__merged__', count(DISTINCT user_id)::BIGINT FROM events
)
SELECT est.key_name, m, nonzero, v_zero, sum_scaled, estimate, exact_distinct
FROM est JOIN ex ON est.key_name = ex.key_name
ORDER BY est.key_name
"""

QUERIES.update({"sketch_hll_merge": sketch_hll_merge})
ORACLES.update({"sketch_hll_merge": SKETCH_HLL_MERGE_SQL})


# --------------------------------------------------- sliding HLL window
HLL_SLIDING_DAYS = 7


def sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from daily HLL sketches
    (operators.sketches.hll_sliding_estimate_by_day): the register-wise
    window max merges every day's frame in one pass over days*m state —
    the "7-day actives" rollup that never rescans raw events per window
    position. The exact trailing distinct rides along as the accuracy
    audit."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    est = sketches.hll_sliding_estimate_by_day(
        ev, "ts", "user_id", window_days=HLL_SLIDING_DAYS
    )
    days = est.select(F.to_date("key_name").alias("day"))
    edays = ev.select(F.to_date("ts").alias("eday"), "user_id")
    exact = (
        days.join(
            edays,
            (F.col("eday") >= F.date_sub(F.col("day"), HLL_SLIDING_DAYS - 1))
            & (F.col("eday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_distinct_7d"))
        .select(F.col("day").cast("string").alias("key_name"), "exact_distinct_7d")
    )
    return est.join(exact, "key_name").orderBy("key_name")


SKETCH_HLL_SLIDING_SQL = f"""
WITH daily AS (
  SELECT ts::DATE AS day,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS register,
         max(CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 3, 12))::BIGINT > 0
                  THEN {_RB1} - length(bin(
                       ('0x' || substr(md5(user_id::VARCHAR), 3, 12))::BIGINT))
                  ELSE {_RB1} END) AS rho_day
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM daily),
grid AS (
  SELECT d.day, r.register
  FROM days d CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS register) r
),
j AS (
  SELECT g.day, g.register, daily.rho_day,
         (g.day - DATE '1970-01-01') AS day_num
  FROM grid g LEFT JOIN daily ON daily.day = g.day AND daily.register = g.register
),
merged AS (
  SELECT day, register,
         max(rho_day) OVER (PARTITION BY register ORDER BY day_num
                            RANGE BETWEEN {HLL_SLIDING_DAYS - 1} PRECEDING
                                      AND CURRENT ROW) AS max_rho
  FROM j
),
regs AS (
  SELECT day::VARCHAR AS key_name, register, max_rho
  FROM merged WHERE max_rho IS NOT NULL
),
agg AS (
  SELECT key_name,
         count(*)::BIGINT AS nonzero,
         ({HLL_M} - count(*))::BIGINT AS v_zero,
         (sum((1::BIGINT << ({_RB1} - max_rho)))
            + ({HLL_M} - count(*)) * (1::BIGINT << {_RB1}))::BIGINT AS sum_scaled
  FROM regs GROUP BY 1
),
est AS (
  SELECT key_name, {HLL_M}::BIGINT AS m, nonzero, v_zero, sum_scaled,
         round(CASE WHEN (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled <= 2.5 * {HLL_M}.0
                         AND v_zero > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v_zero)
                    ELSE (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled
               END + 1e-9, 4) AS estimate
  FROM agg
),
ex AS (
  SELECT d.day::VARCHAR AS key_name,
         count(DISTINCT e.user_id)::BIGINT AS exact_distinct_7d
  FROM days d
  JOIN (SELECT ts::DATE AS eday, user_id FROM events) e
    ON e.eday BETWEEN d.day - {HLL_SLIDING_DAYS - 1} AND d.day
  GROUP BY 1
)
SELECT est.key_name, m, nonzero, v_zero, sum_scaled, estimate,
       ex.exact_distinct_7d
FROM est JOIN ex ON est.key_name = ex.key_name
ORDER BY est.key_name
"""

QUERIES.update({"sketch_hll_sliding": sketch_hll_sliding})
ORACLES.update({"sketch_hll_sliding": SKETCH_HLL_SLIDING_SQL})


# ------------------------------------ count-min shard merge (round 6)
def sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS mergeability proof (the additive counterpart of
    sketch_hll_merge): per-event-type cell tables summed cellwise into one
    sketch, probed for the exact top-10 users — and because counts are
    additive, the merged estimate must equal the direct whole-corpus
    sketch's estimate BIT-FOR-BIT, which the output exposes as a graded
    column. At 100 TB this is how per-day/shard CMS states roll up to any
    window without re-reading raw keys."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    merged = sketches.cms_merge(sketches.cms_cells_by(ev, "event_type", "user_id"))
    direct = sketches.cms_cells(ev, "user_id")
    exact = (
        ev.groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.col("key"))
        .limit(10)
    )
    probes = exact.select(
        "key",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":",
                                            F.lit(str(j)),
                                            F.col("key").cast("string"),
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % CMS_WIDTH
                        ).alias("col"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("key", "exact_cnt", "p.row", "p.col")
    est_m = (
        probes.join(F.broadcast(merged), ["row", "col"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est_merged"))
    )
    est_d = (
        probes.join(F.broadcast(direct), ["row", "col"])
        .groupBy("key")
        .agg(F.min("cnt").alias("cms_est_direct"))
    )
    return (
        est_m.join(est_d, "key")
        .select(
            "key",
            "exact_cnt",
            "cms_est_merged",
            "cms_est_direct",
            (F.col("cms_est_merged") == F.col("cms_est_direct"))
            .cast("int")
            .alias("merge_exact"),
        )
        .orderBy(F.desc("exact_cnt"), "key")
    )


SKETCH_CMS_MERGE_SQL = f"""
WITH by_grp AS (
  SELECT event_type AS grp, j AS r,
         ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT
           % {CMS_WIDTH} AS c,
         count(*)::BIGINT AS cnt
  FROM events, range({CMS_DEPTH}) t(j)
  GROUP BY 1, 2, 3
),
merged AS (SELECT r, c, sum(cnt)::BIGINT AS cnt FROM by_grp GROUP BY 1, 2),
direct AS (
  SELECT j AS r,
         ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 15))::BIGINT
           % {CMS_WIDTH} AS c,
         count(*)::BIGINT AS cnt
  FROM events, range({CMS_DEPTH}) t(j)
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id AS key, count(*)::BIGINT AS exact_cnt FROM events
  GROUP BY 1 ORDER BY exact_cnt DESC, key LIMIT 10
),
probes AS (
  SELECT key, exact_cnt, j AS r,
         ('0x' || substr(md5(j::VARCHAR || ':' || key::VARCHAR), 1, 15))::BIGINT
           % {CMS_WIDTH} AS c
  FROM exact, range({CMS_DEPTH}) t(j)
),
em AS (SELECT key, exact_cnt, min(cnt)::BIGINT AS cms_est_merged
       FROM probes JOIN merged USING (r, c) GROUP BY 1, 2),
ed AS (SELECT key, min(cnt)::BIGINT AS cms_est_direct
       FROM probes JOIN direct USING (r, c) GROUP BY 1)
SELECT em.key, exact_cnt, cms_est_merged, cms_est_direct,
       (cms_est_merged = cms_est_direct)::INT AS merge_exact
FROM em JOIN ed ON ed.key = em.key
ORDER BY exact_cnt DESC, em.key
"""

QUERIES.update({"sketch_cms_merge": sketch_cms_merge})
ORACLES.update({"sketch_cms_merge": SKETCH_CMS_MERGE_SQL})


# ------------------------- HLL set-intersection estimate (round 7)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set INTERSECTION estimated from sketches alone via
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    union sketch is the register-wise max merge — at 100 TB this answers
    "how many users both clicked and purchased" from three m-row register
    states without ever shuffling a user set; the exact intersection rides
    along as the audit column. All three estimates come off the same
    integer-exact register states the merge row already grades, so both
    engines agree bit-for-bit after the shared rounding."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    ab = ev.where(F.col("event_type").isin("click", "purchase"))
    regs = sketches.hll_registers_by(ab, "event_type", "user_id")
    est = sketches.hll_estimate_by(
        regs.unionByName(sketches.hll_merge(regs, "__union__"))
    )

    def pick(key):
        return F.max(F.when(F.col("key_name") == key, F.col("estimate")))

    one = est.agg(
        pick("click").alias("est_click"),
        pick("purchase").alias("est_purchase"),
        pick("__union__").alias("est_union"),
    ).select(
        "est_click",
        "est_purchase",
        "est_union",
        F.round(
            F.lit(1e-9)
            + F.col("est_click") + F.col("est_purchase") - F.col("est_union"),
            4,
        ).alias("est_intersection"),
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    exact = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .join(clicks, "user_id", "left_semi")
        .agg(F.count_distinct("user_id").alias("exact_intersection"))
    )
    return one.crossJoin(F.broadcast(exact))


SKETCH_HLL_INTERSECTION_SQL = f"""
WITH keys AS (
  SELECT event_type AS key_name, user_id::VARCHAR AS k FROM events
  WHERE event_type IN ('click', 'purchase')
  UNION ALL
  SELECT '__union__', user_id::VARCHAR FROM events
  WHERE event_type IN ('click', 'purchase')
),
h AS (
  SELECT key_name,
         ('0x' || substr(md5(k), 1, 2))::BIGINT AS register,
         ('0x' || substr(md5(k), 3, 12))::BIGINT AS w
  FROM keys
),
regs AS (
  SELECT key_name, register,
         max(CASE WHEN w > 0 THEN {_RB1} - length(bin(w)) ELSE {_RB1} END) AS max_rho
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT key_name,
         count(*)::BIGINT AS nonzero,
         ({HLL_M} - count(*))::BIGINT AS v_zero,
         (sum((1::BIGINT << ({_RB1} - max_rho)))
            + ({HLL_M} - count(*)) * (1::BIGINT << {_RB1}))::BIGINT AS sum_scaled
  FROM regs GROUP BY 1
),
est AS (
  SELECT key_name,
         round(CASE WHEN (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled <= 2.5 * {HLL_M}.0
                         AND v_zero > 0
                    THEN {HLL_M}.0 * ln({HLL_M}.0 / v_zero)
                    ELSE (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                           * {float(_SCALE)} / sum_scaled
               END + 1e-9, 4) AS estimate
  FROM agg
),
one AS (
  SELECT max(CASE WHEN key_name = 'click' THEN estimate END) AS est_click,
         max(CASE WHEN key_name = 'purchase' THEN estimate END) AS est_purchase,
         max(CASE WHEN key_name = '__union__' THEN estimate END) AS est_union
  FROM est
),
ex AS (
  SELECT count(*)::BIGINT AS exact_intersection FROM (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  )
)
SELECT est_click, est_purchase, est_union,
       round(1e-9 + est_click + est_purchase - est_union, 4)
         AS est_intersection,
       exact_intersection
FROM one, ex
"""

QUERIES.update({"sketch_hll_intersection": sketch_hll_intersection})
ORACLES.update({"sketch_hll_intersection": SKETCH_HLL_INTERSECTION_SQL})
