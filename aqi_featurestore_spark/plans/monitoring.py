"""Feature-store monitoring & data-quality operators (round 4): the
audits an operating team runs against the store every cycle.

The reference's operational surface is implicit (its Airflow DAG
re-runs batch jobs and overwrites Redis; staleness/consistency are
assumed, never measured — SURVEY.md §2.9). These queries make the
guarantees measurable:

- ``freshness_audit`` — per-entity last-observation lag against the
  corpus watermark, bucketed (the freshness SLO report for the online
  store).
- ``store_consistency_audit`` — offline-latest vs online-latest (the
  online store modeled as the state at the last hourly refresh):
  which entities would serve a stale value right now, and by how much.
- ``ks_drift`` — exact two-sample Kolmogorov-Smirnov statistic between
  the first and second half of the month (the unbinned complement of
  ``drift_psi``: PSI needs bin design, KS does not).
- ``data_contract_audit`` — one row per contract rule (nulls, range,
  time bounds, key uniqueness) with exact violation counts — the
  expectation-suite gate before a partition is published.

All determinism rules as elsewhere: integer microsecond lags, integer
counts, cross-engine-pinned double division only at output. Scale
shapes: every query is one or two map-combined hash aggregates plus a
1-row scalar rebroadcast (BroadcastNestedLoopJoin on one row) — no
fact-to-fact shuffles; the KS value-domain window is bounded by the
DISTINCT VALUE domain (centi-units of a bounded sensor range), not by
row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aqi_featurestore_spark.plans._base import _q, _read

_FRESHNESS_SQL = """
WITH wm AS (SELECT max(ts) AS max_ts FROM events),
last AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
SELECT l.user_id, l.last_ts,
       epoch_us(w.max_ts) - epoch_us(l.last_ts) AS lag_us,
       CASE WHEN epoch_us(w.max_ts) - epoch_us(l.last_ts) <= 3600000000 THEN 'fresh_1h'
            WHEN epoch_us(w.max_ts) - epoch_us(l.last_ts) <= 21600000000 THEN 'fresh_6h'
            WHEN epoch_us(w.max_ts) - epoch_us(l.last_ts) <= 86400000000 THEN 'fresh_24h'
            ELSE 'stale' END AS bucket
FROM last l CROSS JOIN wm w"""


@_q("freshness_audit", _FRESHNESS_SQL)
def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity freshness against the corpus watermark: integer
    microsecond lag + SLO bucket (1h / 6h / 24h / stale). The report
    behind the online store's freshness guarantee — the reference
    assumes hourly refresh keeps everything fresh; this measures it.

    Scale shape: one (user)-keyed max aggregate + a 1-row watermark
    scalar rebroadcast. Lags are exact integers, so bucket edges cannot
    drift between engines."""
    e = _read(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("max_ts"))
    last = e.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    lag = F.unix_micros(F.col("max_ts").cast("timestamp")) - F.unix_micros(
        F.col("last_ts").cast("timestamp")
    )
    bucket = (
        F.when(lag <= 3_600_000_000, "fresh_1h")
        .when(lag <= 21_600_000_000, "fresh_6h")
        .when(lag <= 86_400_000_000, "fresh_24h")
        .otherwise("stale")
    )
    return last.crossJoin(F.broadcast(wm)).select(
        "user_id", "last_ts", lag.alias("lag_us"), bucket.alias("bucket")
    )


_CONSISTENCY_SQL = """
WITH wm AS (SELECT max(ts) AS max_ts FROM events),
ranked AS (
  SELECT user_id, ts, event_id,
         CAST(round("value" * 100, 0) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
offline AS (SELECT user_id, ts AS off_ts, vc AS off_vc FROM ranked WHERE rn = 1),
online_ranked AS (
  SELECT e.user_id, e.ts, e.event_id,
         CAST(round(e."value" * 100, 0) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM events e CROSS JOIN wm w
  WHERE e.ts <= w.max_ts - INTERVAL '1 hour'),
online AS (SELECT user_id, ts AS on_ts, vc AS on_vc
           FROM online_ranked WHERE rn = 1)
SELECT o.user_id, o.off_ts, o.off_vc, n.on_ts, n.on_vc,
       CAST(CASE WHEN n.on_vc IS NOT NULL AND n.on_vc = o.off_vc
                 THEN 1 ELSE 0 END AS INT) AS consistent,
       epoch_us(o.off_ts) - COALESCE(epoch_us(n.on_ts), 0) AS staleness_us
FROM offline o LEFT JOIN online n USING (user_id)"""


@_q("store_consistency_audit", _CONSISTENCY_SQL)
def q_store_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline-vs-online consistency: the online store is modeled as
    the latest-per-entity state at the LAST HOURLY REFRESH (watermark
    minus 1h — the reference's refresh cadence); the offline store is
    latest overall. Entities whose latest hour of data changed their
    value serve stale reads until the next refresh — this query is the
    skew report (who, and by how many microseconds).

    Scale shape: two latest-per-key reductions over one scan lineage
    (rank windows partitioned BY ENTITY) + one (user)-keyed join; the
    watermark is a 1-row scalar rebroadcast."""
    e = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    wm = e.agg(F.max("ts").alias("max_ts"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    offline = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("off_ts"), F.col("vc").alias("off_vc"))
    )
    online = (
        e.crossJoin(F.broadcast(wm))
        .where(F.col("ts") <= F.col("max_ts") - F.expr("INTERVAL 1 HOUR"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("on_ts"), F.col("vc").alias("on_vc"))
    )
    return offline.join(online, ["user_id"], "left").select(
        "user_id", "off_ts", "off_vc", "on_ts", "on_vc",
        F.when(
            F.col("on_vc").isNotNull() & (F.col("on_vc") == F.col("off_vc")), 1
        ).otherwise(0).cast("int").alias("consistent"),
        (
            F.unix_micros(F.col("off_ts").cast("timestamp"))
            - F.coalesce(F.unix_micros(F.col("on_ts").cast("timestamp")), F.lit(0))
        ).alias("staleness_us"),
    )


_KS_SQL = """
WITH t AS (
  SELECT CAST(round("value" * 100, 0) AS BIGINT) AS vc,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS is_a
  FROM events WHERE "value" IS NOT NULL),
n AS (SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(SUM(1 - is_a) AS BIGINT) AS nb FROM t),
g AS (
  SELECT vc, CAST(SUM(is_a) AS BIGINT) AS ca_i,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb_i
  FROM t GROUP BY vc),
cum AS (
  SELECT vc,
         SUM(ca_i) OVER (ORDER BY vc
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(cb_i) OVER (ORDER BY vc
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM g),
d AS (
  SELECT c.vc,
         abs(CAST(c.ca AS DOUBLE) / n.na - CAST(c.cb AS DOUBLE) / n.nb) AS diff,
         n.na, n.nb
  FROM cum c CROSS JOIN n)
SELECT round(diff, 6) AS ks_stat, vc AS at_value_c, na, nb FROM (
  SELECT *, row_number() OVER (ORDER BY diff DESC, vc ASC) AS rk FROM d) t
WHERE rk = 1"""


@_q("ks_drift", _KS_SQL)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the first
    (day <= 15) and second half of the month: max ECDF gap over the
    value domain, plus the value where it occurs. The unbinned
    complement of ``drift_psi`` — no bin design to get wrong, the
    standard trigger for "did the distribution move".

    Exactness: cumulative counts are exact integers; the two divisions
    and subtraction run in pinned double order so the max and its
    argmax agree bit-for-bit. Scale shape: one (value)-keyed aggregate
    reduces the corpus to the DISTINCT VALUE DOMAIN (bounded —
    centi-units of a bounded sensor range, ~5.6e4 rows max) before the
    cumulative window runs over that bounded domain; sample sizes are a
    1-row scalar rebroadcast."""
    e = _read(spark, sf_dir, "events").where(F.col("value").isNotNull())
    t = e.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("is_a"),
    )
    n = t.agg(
        F.sum("is_a").cast("long").alias("na"),
        F.sum(1 - F.col("is_a")).cast("long").alias("nb"),
    )
    g = t.groupBy("vc").agg(
        F.sum("is_a").cast("long").alias("ca_i"),
        F.sum(1 - F.col("is_a")).cast("long").alias("cb_i"),
    )
    wc = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "vc", F.sum("ca_i").over(wc).alias("ca"), F.sum("cb_i").over(wc).alias("cb")
    )
    d = cum.crossJoin(F.broadcast(n)).select(
        "vc",
        F.abs(
            F.col("ca").cast("double") / F.col("na")
            - F.col("cb").cast("double") / F.col("nb")
        ).alias("diff"),
        "na",
        "nb",
    )
    wr = Window.orderBy(F.desc("diff"), F.asc("vc"))
    return (
        d.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select(
            F.round("diff", 6).alias("ks_stat"),
            F.col("vc").alias("at_value_c"),
            "na",
            "nb",
        )
    )


_CONTRACT_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN "value" IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
         CAST(SUM(CASE WHEN "value" < 0 OR "value" > 1000 THEN 1 ELSE 0 END) AS BIGINT)
           AS value_range,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
                         OR ts >= TIMESTAMP '2024-02-01 00:00:00'
                  THEN 1 ELSE 0 END) AS BIGINT) AS ts_bounds,
         CAST(SUM(CASE WHEN user_id IS NULL OR user_id < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS bad_entity,
         CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_event_id
  FROM events)
SELECT r.rule, r.n_violations, m.n_total,
       CAST(CASE WHEN r.n_violations = 0 THEN 1 ELSE 0 END AS INT) AS pass
FROM m, LATERAL (VALUES
  ('null_value',  m.null_value),
  ('value_range', m.value_range),
  ('ts_bounds',   m.ts_bounds),
  ('bad_entity',  m.bad_entity),
  ('dup_event_id', m.dup_event_id)) AS r(rule, n_violations)"""


@_q("data_contract_audit", _CONTRACT_SQL)
def q_data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract (expectation-suite) audit: one row per rule with
    exact violation counts — null values, value out of [0, 1000],
    timestamps outside the month partition, invalid entity keys,
    duplicate event ids. The publish gate a pipeline runs before
    promoting a partition; the rule list is the contract.

    Scale shape: ONE pass over the fact computes every rule as a
    conditional count inside the same map-combined aggregate (the
    distinct-count for key uniqueness is the only partial-distinct
    state); the 5-row rule table unpivots from that single row."""
    e = _read(spark, sf_dir, "events")
    m = e.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long").alias("null_value"),
        F.sum(F.when((F.col("value") < 0) | (F.col("value") > 1000), 1).otherwise(0))
        .cast("long").alias("value_range"),
        F.sum(
            F.when(
                (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp"))
                | (F.col("ts") >= F.lit("2024-02-01 00:00:00").cast("timestamp")),
                1,
            ).otherwise(0)
        ).cast("long").alias("ts_bounds"),
        F.sum(F.when(F.col("user_id").isNull() | (F.col("user_id") < 0), 1).otherwise(0))
        .cast("long").alias("bad_entity"),
        (F.count("*") - F.count_distinct("event_id")).cast("long").alias("dup_event_id"),
    )
    rules = ["null_value", "value_range", "ts_bounds", "bad_entity", "dup_event_id"]
    stacked = m.select(
        "n_total",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("rule"), F.col(r).alias("n_violations"))
                for r in rules
            ])
        ).alias("x"),
    )
    return stacked.select(
        F.col("x.rule").alias("rule"),
        F.col("x.n_violations").alias("n_violations"),
        "n_total",
        F.when(F.col("x.n_violations") == 0, 1).otherwise(0).cast("int").alias("pass"),
    )


_EMB_DRIFT_SQL = """
WITH vc AS (
  SELECT CAST(vec_id % 2 AS BIGINT) AS grp,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS v
  FROM embeddings),
cells AS (
  SELECT dim, grp, CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT grp, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM vc) q
  GROUP BY dim, grp),
m AS (
  SELECT dim,
         CAST(SUM(CASE WHEN grp = 0 THEN s END) AS DOUBLE)
           / CAST(SUM(CASE WHEN grp = 0 THEN c END) * 1000000 AS DOUBLE) AS m_ref,
         CAST(SUM(CASE WHEN grp = 1 THEN s END) AS DOUBLE)
           / CAST(SUM(CASE WHEN grp = 1 THEN c END) * 1000000 AS DOUBLE) AS m_cur
  FROM cells GROUP BY dim)
SELECT CAST(dim - 1 AS INT) AS dim_id,
       round(m_ref, 6) AS mean_ref, round(m_cur, 6) AS mean_cur,
       round(m_cur - m_ref, 6) AS shift
FROM m"""


@_q("embedding_drift", _EMB_DRIFT_SQL)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per-dimension centroid of
    the reference snapshot (even vec_id — the deterministic stand-in for
    'last month's index build') vs the current one (odd vec_id), and the
    per-dimension mean shift. The audit run before trusting a static ANN
    index against a moving corpus: centroid shift is the cheapest signal
    that the coarse quantizer's cells no longer fit the data
    (`ann_index_stats` then shows WHERE the imbalance lands).

    Exactness: per-cell sums are exact BIGINT micro-units; each mean is
    ONE int/int division (IEEE-exact both engines); the shift subtracts
    the two unrounded quotients before its own round, so it is the
    rounding of the exact difference, not a difference of rounded
    values.

    100 TB shape: the dim-fold explodes map-side and combines straight
    into dim x 2 sum/count cells — the only shuffled rows; no windows,
    no joins, one bounded final aggregate."""
    e = _read(spark, sf_dir, "embeddings")
    vc = e.select(
        (F.col("vec_id") % 2).cast("long").alias("grp"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1_000_000, 0).cast("long"),
        ).alias("_v"),
    )
    cells = (
        vc.select("grp", F.posexplode("_v").alias("dim", "x"))
        .groupBy("dim", "grp")
        .agg(F.sum("x").cast("long").alias("s"), F.count("*").cast("long").alias("c"))
    )
    m = cells.groupBy("dim").agg(
        (
            F.sum(F.when(F.col("grp") == 0, F.col("s"))).cast("double")
            / (F.sum(F.when(F.col("grp") == 0, F.col("c"))) * F.lit(1_000_000)).cast(
                "double"
            )
        ).alias("m_ref"),
        (
            F.sum(F.when(F.col("grp") == 1, F.col("s"))).cast("double")
            / (F.sum(F.when(F.col("grp") == 1, F.col("c"))) * F.lit(1_000_000)).cast(
                "double"
            )
        ).alias("m_cur"),
    )
    return m.select(
        F.col("dim").cast("int").alias("dim_id"),
        F.round("m_ref", 6).alias("mean_ref"),
        F.round("m_cur", 6).alias("mean_cur"),
        F.round(F.col("m_cur") - F.col("m_ref"), 6).alias("shift"),
    )


_K_ANON = 5


_K_ANONYMITY_SQL = f"""
WITH qi AS (
  SELECT c_nationkey,
         c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
  FROM customer),
grp AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM qi GROUP BY 1, 2, 3),
hist AS (
  SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(group_size * COUNT(*) AS BIGINT) AS n_rows
  FROM grp GROUP BY group_size),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM hist)
SELECT group_size, n_groups, n_rows,
       round(CAST(n_rows AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS row_share,
       CAST(CASE WHEN group_size < {_K_ANON} THEN 1 ELSE 0 END AS INT)
         AS under_k
FROM hist, tot"""


@_q("k_anonymity_audit", _K_ANONYMITY_SQL)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment, account-balance kilobucket): the group-size
    histogram with each size's row share and a k<5 re-identification
    flag — the privacy gate before exporting joined training features
    (a row in a group of 1 is identifiable from the QI alone; Sweeney's
    k-anonymity, method only). Summing row_share over under_k rows gives
    the at-risk fraction.

    Exactness: group sizes and the histogram are exact BIGINTs; the
    bucket floor is one deterministic double op; row_share is one
    int/int division.

    100 TB shape: two map-combined hash aggregates (rows -> QI groups ->
    size histogram) plus a 1-row total broadcast; the histogram domain
    is bounded by the max group size, not row count."""
    c = _read(spark, sf_dir, "customer")
    grp = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").cast("long").alias("group_size"))
    )
    hist = grp.groupBy("group_size").agg(
        F.count("*").cast("long").alias("n_groups"),
        (F.col("group_size") * F.count("*")).cast("long").alias("n_rows"),
    )
    tot = hist.agg(F.sum("n_rows").cast("long").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "group_size",
        "n_groups",
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("t").cast("double"), 6).alias(
            "row_share"
        ),
        F.when(F.col("group_size") < _K_ANON, 1).otherwise(0).cast("int").alias(
            "under_k"
        ),
    )
