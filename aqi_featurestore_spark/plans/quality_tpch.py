"""Distribution monitoring and robust stats, blocked edit distance,
prefix-filter Jaccard, TPC-H Q3/Q4/Q16/Q21/Q12/Q20 shapes, gap filling,
kNN vote, FK audits, mergeable aggregation, trend features, as-of joins
(forward/nearest), TPC-H Q13/Q17/Q22 shapes, Bloom semi-join scan
reduction and its prefiltered-revenue composition.

Split out of plans/queries.py (round 4); registration still via the
shared ``@_q`` registry in plans/_base.py. Reference citations live on
each query docstring.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aqi_featurestore_spark import pipeline
from aqi_featurestore_spark.functions import portable_hash as _ph
from aqi_featurestore_spark.plans import approx_oracles
from aqi_featurestore_spark.functions.aqi import aqi_case_sql
from aqi_featurestore_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count,
)
from aqi_featurestore_spark.functions.time_features import entity_key
from aqi_featurestore_spark.operators.dedup import append_if_absent, dedup_exact
from aqi_featurestore_spark.operators.near_dedup import (
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from aqi_featurestore_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)
from aqi_featurestore_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_cosine_pairs,
)
from aqi_featurestore_spark.operators.snapshot import latest_per_key, online_lookup
from aqi_featurestore_spark.plans._base import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
    _FEAT_CTE,
    _NGRAM_JACCARD_SQL,
    _PIT_CTES,
    _SIM_NORM_CTE,
    _SIM_NORM_DOT,
    _SPINE_CTE,
    _TOKENS,
    _q,
    _read,
)


# ---------------------------------------------------------------------------
# Distribution monitoring & robust stats (SURVEY §2.11 extensions)
# ---------------------------------------------------------------------------


@_q(
    "value_histogram",
    """
SELECT CAST(floor("value" / 25.0) AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS sum_c
FROM events GROUP BY 1""",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (25.0) value histogram over events: data-independent
    floor bins so runs/engines/days align without edge negotiation; exact
    cent sums. Shuffle key space = bin domain, not row count."""
    from aqi_featurestore_spark.operators.drift import value_histogram

    return value_histogram(_read(spark, sf_dir, "events"), "value", width=25.0)


_PSI_SQL = """
WITH b AS (
  SELECT CAST(floor("value" / 25.0) AS BIGINT) AS bin,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
  FROM events),
per_bin AS (
  SELECT bin, CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
  FROM b GROUP BY bin),
tot AS (
  SELECT bin, n_ref, n_cur,
         CAST(SUM(n_ref) OVER () AS BIGINT) AS tot_ref,
         CAST(SUM(n_cur) OVER () AS BIGINT) AS tot_cur,
         CAST(COUNT(*) OVER () AS BIGINT) AS nb
  FROM per_bin)
SELECT bin, n_ref, n_cur,
       round(((n_cur + 1.0) / (tot_cur + 1.0 * nb)
              - (n_ref + 1.0) / (tot_ref + 1.0 * nb))
             * ln(((n_cur + 1.0) / (tot_cur + 1.0 * nb))
                  / ((n_ref + 1.0) / (tot_ref + 1.0 * nb))), 6) AS psi_term
FROM tot"""


@_q("drift_psi", _PSI_SQL)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two halves of the events stream
    (even event_id = reference, odd = current): single scan, conditional
    agg per bin, totals via a window over the TINY aggregated bin table
    (O(bins) rows at any data scale). sum(psi_term) is the drift index."""
    from aqi_featurestore_spark.operators.drift import psi_drift

    e = _read(spark, sf_dir, "events")
    return psi_drift(e, "value", F.col("event_id") % 2 == 0, width=25.0)


_WINSOR_SQL = """
WITH bounds AS (
  SELECT event_type,
         round(quantile_cont("value", 0.01), 4) AS lo_bound,
         round(quantile_cont("value", 0.99), 4) AS hi_bound
  FROM events GROUP BY event_type)
SELECT e.event_type,
       any_value(b.lo_bound) AS lo_bound,
       any_value(b.hi_bound) AS hi_bound,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN e."value" < b.lo_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       CAST(SUM(CASE WHEN e."value" > b.hi_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       CAST(SUM(CAST(round(least(greatest(e."value", b.lo_bound), b.hi_bound) * 100, 0)
                AS BIGINT)) AS BIGINT) AS sum_wins_c,
       round(CAST(SUM(CAST(round(least(greatest(e."value", b.lo_bound), b.hi_bound) * 100, 0)
                      AS BIGINT)) AS BIGINT) / (COUNT(*) * 100.0), 6) AS mean_wins
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type"""


@_q("winsorized_stats", _WINSOR_SQL)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorized mean: clip at exact p01/p99 (rounded to
    4dp — the bound IS the spec), count clips, fixed-point sum. Exact
    percentile is the oracle-parity path; `approx=True` swaps in the
    mergeable sketch for unbounded key domains at 100 TB."""
    from aqi_featurestore_spark.operators.robust_stats import winsorized_stats

    return winsorized_stats(_read(spark, sf_dir, "events"), "value", ["event_type"])


_MAD_SQL = """
WITH med AS (
  SELECT event_type, round(quantile_cont("value", 0.5), 4) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type, any_value(m.med) AS med,
         round(quantile_cont(abs(e."value" - m.med), 0.5), 4) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
SELECT e.event_type, any_value(d.med) AS med, any_value(d.mad) AS mad,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN abs(e."value" - d.med) > d.mad * 4.4478 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM events e JOIN mad d USING (event_type)
GROUP BY e.event_type"""


@_q("mad_outliers", _MAD_SQL)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median + MAD (both exact,
    rounded 4dp before reuse so engines compare identical doubles),
    outlier = |v - med| > 4.4478 * MAD (3 Gaussian sigmas). Three
    key-pruned passes with broadcast one-row-per-key intermediates."""
    from aqi_featurestore_spark.operators.robust_stats import mad_outliers

    return mad_outliers(_read(spark, sf_dir, "events"), "value", ["event_type"])


# ---------------------------------------------------------------------------
# Near-dedup additions: blocked edit distance + prefix-filter Jaccard
# ---------------------------------------------------------------------------

_EDIT_DIST_SQL = """
WITH base AS (
  SELECT doc_id,
         substring(lower(trim(text)), 1, 16) AS blk,
         substring(lower(trim(text)), 1, 80) AS snip
  FROM documents)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(levenshtein(a.snip, b.snip) AS INT) AS dist
FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.snip, b.snip) <= 8"""


@_q("edit_distance_pairs", _EDIT_DIST_SQL)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein near-dup pairs (16-char prefix block, distance
    over first 80 normalized chars <= 8). O(len^2)-per-pair metric made
    tractable by prefix-bucket candidate generation — the shuffle carries
    80-char snippets, never bodies."""
    from aqi_featurestore_spark.operators.near_dedup import edit_distance_pairs

    return edit_distance_pairs(_read(spark, sf_dir, "documents"))


@_q("jaccard_prefix_filter", _NGRAM_JACCARD_SQL.replace(">= 0.2", ">= 0.7"))
def q_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered EXACT Jaccard at threshold 0.7: same
    semantics as `ngram_jaccard_pairs` (the oracle is the same
    brute-force SQL at the same threshold), but candidates come only
    from each doc's rarest ``n - ceil(t*n) + 1`` shingles (~30% at
    t=0.7) under a global document-frequency order — hot boilerplate
    shingles sort last and never generate candidates, so the skewed join
    buckets of the naive self-join are gone by construction. Prefix
    filtering's pruning power is proportional to t (at t=0.2 the prefix
    is 80% of the set and prunes nothing), which is why this is the
    DUP-DETECTION configuration; threshold-0.2 similarity mining stays
    on the shingle self-join path. Lossless: thresholded on TRUE
    Jaccard."""
    from aqi_featurestore_spark.operators.near_dedup import jaccard_prefix_pairs

    d = _read(spark, sf_dir, "documents")
    return jaccard_prefix_pairs(d, k=3, threshold=0.7)


_CONTAINMENT_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE CAST([] AS VARCHAR[]) END) AS s
  FROM tok),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT d1, d2, inter, n1.n AS n1, n2.n AS n2,
       CAST(inter AS DOUBLE) / n1.n AS c1,
       CAST(inter AS DOUBLE) / n2.n AS c2
FROM inter
JOIN sizes n1 ON d1 = n1.doc_id
JOIN sizes n2 ON d2 = n2.doc_id
WHERE greatest(CAST(inter AS DOUBLE) / n1.n, CAST(inter AS DOUBLE) / n2.n) >= 0.3"""


@_q("containment_dedup_pairs", _CONTAINMENT_SQL)
def q_containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs at max(c1, c2) >= 0.3: the
    quote-inclusion / subset-duplicate detector — a short document fully
    embedded in a long one has near-zero Jaccard but containment 1.0,
    so this catches what `ngram_jaccard_pairs` structurally cannot.
    Same shingle equi-join candidate generation (bodies never shuffle);
    see operators/near_dedup.py:containment_pairs for the 100 TB
    blocking note (the Jaccard prefix-filter bound does not transfer to
    one-sided containment)."""
    from aqi_featurestore_spark.operators.near_dedup import containment_pairs

    return containment_pairs(_read(spark, sf_dir, "documents"), threshold=0.3)


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: selective dim filter -> two-level join -> top-k
# ---------------------------------------------------------------------------

_SHIP_PRIORITY_SQL = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * CAST(round((1 - l.l_discount) * 10000, 0) AS BIGINT))
            AS BIGINT) AS revenue_c,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_c DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10"""


@_q("shipping_priority", _SHIP_PRIORITY_SQL)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast the segment-filtered customer dim into
    orders, shuffle-join the date-filtered lineitem on orderkey, partial
    agg below the exchange, global top-10 via take-ordered (no full
    sort). Ship/order date predicates reach the parquet scans as pushed
    filters."""
    cust = (
        _read(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _read(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _read(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev_i = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * F.round(
        (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev_i).alias("revenue_c"))
        .select("l_orderkey", "revenue_c", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_c"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Time-series densification + kNN classification (SURVEY §2.11)
# ---------------------------------------------------------------------------

_GAP_FILL_SQL = """
WITH pb AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, COUNT(*) AS n,
         CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_c
  FROM events GROUP BY 1),
bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM pb),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds)
SELECT s.bucket, COALESCE(pb.n, 0) AS n, pb.sum_value_c
FROM spine s LEFT JOIN pb USING (bucket)"""


@_q("gap_filled_hourly", _GAP_FILL_SQL)
def q_gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup: empty hours surface as n=0 rows instead of
    silently missing (which would shift every downstream lag feature by
    one slot). The spine explodes from a single-row min/max aggregate —
    O(time-range) rows regardless of fact size."""
    from aqi_featurestore_spark.operators.timeseries import fill_time_gaps

    e = _read(spark, sf_dir, "events")
    return fill_time_gaps(
        e,
        "ts",
        step="1 hour",
        trunc="hour",
        aggs=(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_c"
            ),
        ),
    )


_INTER_ARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id"""


@_q("inter_arrival_stats", _INTER_ARRIVAL_SQL)
def q_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap summary (microsecond integers end to
    end — no float time math): one window sort per user partition, then
    a hash aggregate. The monitoring counterpart to sessionization:
    max_gap is the outage detector, sum/n is the mean cadence."""
    from aqi_featurestore_spark.operators.timeseries import inter_arrival_stats

    e = _read(spark, sf_dir, "events")
    return inter_arrival_stats(e, "ts", ["user_id"], tie_break="event_id")


_KNN_VOTE_SQL = f"""
WITH {_SIM_NORM_CTE},
q AS (SELECT vec_id AS q_id, v AS q_vec FROM norm WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q.q_id, c.vec_id AS n_id,
         round({_SIM_NORM_DOT.format(a='q.q_vec', b='c.v')}, 6) AS cos_sim
  FROM q CROSS JOIN norm c
  WHERE q.q_id <> c.vec_id),
topk AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS rk
    FROM pairs) t
  WHERE rk <= 10),
votes AS (
  SELECT t.q_id, e.label, COUNT(*) AS votes
  FROM topk t JOIN embeddings e ON t.n_id = e.vec_id
  GROUP BY 1, 2),
pick AS (
  SELECT q_id, label AS pred_label, votes,
         row_number() OVER (
             PARTITION BY q_id ORDER BY votes DESC, label ASC) AS rn
  FROM votes)
SELECT p.q_id, CAST(p.pred_label AS INT) AS pred_label, p.votes,
       CAST(e.label AS INT) AS true_label,
       CAST(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END AS INT) AS correct
FROM pick p JOIN embeddings e ON p.q_id = e.vec_id
WHERE p.rn = 1"""


@_q("knn_label_vote", _KNN_VOTE_SQL)
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification by majority vote over the exact cosine top-10
    (ties: most votes, then smallest label): the standard label-quality /
    weak-supervision probe over an embedded corpus. Reuses the
    brute-force top-k operator; the label join is a broadcast (labels
    are (id, int) pairs)."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0)
    topk = cosine_topk_bruteforce(q, e, k=10)
    labels = e.select(F.col("vec_id").alias("n_id"), "label")
    votes = (
        topk.join(F.broadcast(labels), "n_id")
        .groupBy("q_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("label"))
    pick = (
        votes.select(
            "q_id",
            F.col("label").alias("pred_label"),
            "votes",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    truth = e.select(F.col("vec_id").alias("q_id"), F.col("label").alias("true_label"))
    return pick.join(F.broadcast(truth), "q_id").select(
        "q_id",
        "pred_label",
        "votes",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("correct"),
    )


# ---------------------------------------------------------------------------
# Semi-join / distinct-agg / dedup-resolution compositions
# ---------------------------------------------------------------------------

_ORDER_PRIORITY_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority"""


@_q("order_priority_check", _ORDER_PRIORITY_SQL)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS correlated subquery as a LEFT SEMI join:
    orders in a date window having at least one lineitem shipped after
    the order date. The semi join short-circuits on first match (never
    multiplies rows, no post-join dedup), and both date predicates reach
    the parquet scans."""
    o = (
        _read(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    l = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_BRAND_SUPPLIER_SQL = """
SELECT p.p_brand, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt,
       COUNT(*) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 15
GROUP BY p.p_brand, p.p_size"""


@_q("brand_supplier_distinct", _BRAND_SUPPLIER_SQL)
def q_brand_supplier_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped COUNT(DISTINCT) (TPC-H Q16 shape): Spark plans it as the
    two-phase expand/partial-distinct aggregate — the distinct set never
    materializes per group. part is the broadcast dim; the size filter
    prunes it before the join."""
    p = (
        _read(spark, sf_dir, "part")
        .where(F.col("p_size") <= 15)
        .select("p_partkey", "p_brand", "p_size")
    )
    l = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 / Q12 shapes on a DERIVED column (SURVEY §2.11 notes the
# testdata schema lacks l_commitdate/l_receiptdate/l_shipmode; both
# queries derive the missing attribute deterministically from
# md5(l_orderkey|l_linenumber) — mirrored exactly in the oracle SQL — so
# the distinct PLAN SHAPES get exercised without inventing data).
# ---------------------------------------------------------------------------

# late flag: 1 for ~1/3 of lineitems, keyed on (orderkey, linenumber) so
# it varies within an order. Identical md5-hex-parse arithmetic on both
# engines (functions/portable_hash.py).
_LATE_DUCK = (
    _ph.duck_hex_int(
        "md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))",
        1, 8,
    )
    + " % 3 = 0"
)

_SUPPLIERS_WAITING_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN {_LATE_DUCK} THEN 1 ELSE 0 END AS late
  FROM lineitem)
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN li l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.late = 1
  AND EXISTS (
    SELECT 1 FROM li l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM li l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.late = 1)
  AND n.n_name = 'NATION_7'
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100"""


def _late_flag() -> F.Column:
    key = F.concat_ws("|", "l_orderkey", "l_linenumber")
    return (_ph.md5_int32(key) % 3 == 0).cast("int")


@_q("suppliers_kept_waiting", _SUPPLIERS_WAITING_SQL)
def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the one plan the registry otherwise never
    exercises: TWO correlated subqueries on the SAME fact per outer row
    (EXISTS another-supplier lineitem -> LEFT SEMI; NOT EXISTS
    another-supplier LATE lineitem -> LEFT ANTI), both keyed on
    l_orderkey with a suppkey<> residual.

    Scale shape: the late filter (~1/3) and orderstatus='F' prune the
    outer side first; the orders join, the semi join, and the anti join
    all hash-partition on the SAME key (l_orderkey / o_orderkey), so
    after the first shuffle the outer side never re-exchanges — Spark
    chains the three joins within one partitioning. supplier and nation
    are broadcast dims. The oracle is DuckDB's native correlated
    EXISTS/NOT EXISTS."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _late_flag().alias("late")
    )
    orders = (
        _read(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nat = (
        _read(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    supp = _read(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    l1 = li.where(F.col("late") == 1).join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        "late",
    )
    waited = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            others.where(F.col("late") == 1),
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_AVAIL_DUCK = _ph.duck_hex_int(
    "md5(CAST(l.l_partkey AS VARCHAR) || '#' || CAST(l.l_suppkey AS VARCHAR))",
    1, 8,
)

_EXCESS_STOCK_SQL = f"""
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty,
         min({_AVAIL_DUCK} % 20) AS availqty
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
  HAVING SUM(CAST(round(l.l_quantity, 0) AS BIGINT)) >= 30)
SELECT s.s_name, s.s_suppkey
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM shipped sh
  JOIN part p ON p.p_partkey = sh.l_partkey
  WHERE sh.l_suppkey = s.s_suppkey
    AND p.p_name LIKE '%red%'
    AND sh.availqty > sh.qty / 2)
ORDER BY s.s_name"""


@_q("excess_stock_suppliers", _EXCESS_STOCK_SQL)
def q_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — EXISTS over an AGGREGATE subquery: suppliers
    holding excess stock (derived availqty > half the quantity they
    shipped of some 'red' part in a year window). The nested structure —
    semi join against a grouped-and-HAVING-filtered fact aggregate that
    itself joins a filtered dim — is the remaining distinct TPC-H plan
    family (the schema lacks partsupp, so availqty derives from
    md5(partkey#suppkey), mirrored in the oracle).

    Scale shape: the aggregate reduces lineitem to (part, supp) pairs
    BEFORE any join; the part dim is broadcast after its name filter;
    the final supplier probe is a left-semi against the distinct
    qualifying suppkeys (itself a map-side aggregate output)."""
    avail = _ph.md5_int32(F.concat_ws("#", "l_partkey", "l_suppkey")) % 20
    qty_i = F.round(F.col("l_quantity"), 0).cast("long")
    shipped = (
        _read(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", qty_i.alias("q"), avail.alias("av"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("qty"), F.min("av").alias("availqty"))
        .where(F.col("qty") >= 30)
    )
    red_parts = (
        _read(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    qualifying = (
        shipped.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("availqty") > F.col("qty") / 2)
        .select("l_suppkey")
    )
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


_SHIPMODE_DUCK = _ph.duck_hex_int(
    "md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
    " || '|m')",
    1, 8,
)

_SHIPMODE_PRIORITY_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_shipdate, {_SHIPMODE_DUCK} % 7 AS shipmode
  FROM lineitem)
SELECT l.shipmode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN li l ON o.o_orderkey = l.l_orderkey
WHERE l.shipmode IN (2, 5)
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l.shipmode
ORDER BY l.shipmode"""


@_q("shipmode_priority", _SHIPMODE_PRIORITY_SQL)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-to-fact equi-join (lineitem x orders on
    orderkey) feeding a conditional two-way pivot aggregate
    (SUM(CASE...)). The shipmode IN-filter (derived column, ~2/7
    selectivity) and the shipdate year window prune the probe side
    before the join; the priority CASE folds into the partial aggregate
    below the exchange."""
    key = F.concat_ws("|", "l_orderkey", "l_linenumber", F.lit("m"))
    li = (
        _read(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", (_ph.md5_int32(key) % 7).alias("shipmode"))
        .where(F.col("shipmode").isin(2, 5))
    )
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


_EMB_RESOLVE_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE) /
                 sqrt(list_reduce(
                   list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
                   (p, q) -> p + q))) AS v
        FROM embeddings) a
  JOIN (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE) /
                 sqrt(list_reduce(
                   list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
                   (p, q) -> p + q))) AS v
        FROM embeddings) b
    ON a.vec_id < b.vec_id
  WHERE round(list_reduce(list_transform(range(1, len(a.v) + 1),
                                         i -> a.v[i] * b.v[i]), (p, q) -> p + q), 6) >= 0.92),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION SELECT d2, d1 FROM pairs),
reach(node, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
labels AS (SELECT node, min(root) AS cluster FROM reach GROUP BY node)
SELECT CAST(node AS BIGINT) AS vec_id, CAST(cluster AS BIGINT) AS canonical_id
FROM labels WHERE node <> cluster"""


@_q("embedding_dedup_resolve", _EMB_RESOLVE_SQL)
def q_embedding_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: exact cosine near-dup pairs (>= 0.92) -> connected
    components (label propagation) -> every non-canonical vector mapped
    to its cluster's min id. The full dedup-resolution pipeline for an
    embedded corpus in one plan; the oracle recomputes components with a
    recursive CTE. Returns (vec_id, canonical_id) for DROPPED vectors
    only — the keep-list is the anti-join complement."""
    from aqi_featurestore_spark.operators.dedup_groups import connected_components
    from aqi_featurestore_spark.operators.similarity import embedding_cosine_pairs

    e = _read(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs(e, threshold=0.92, lsh=False)
    comp = connected_components(pairs.select("d1", "d2"))
    return (
        comp.where(F.col("doc_id") != F.col("group_id"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.col("group_id").alias("canonical_id"),
        )
    )


# ---------------------------------------------------------------------------
# Data-quality audit, mergeable-state aggregation, trend features,
# forward as-of
# ---------------------------------------------------------------------------

_FK_SQL = """
SELECT 'orders->customer' AS fk,
       (SELECT COUNT(*) FROM orders) AS n_child_rows,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
         AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))"""


@_q("fk_violations", _FK_SQL)
def q_fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts per FK edge via
    LEFT ANTI joins (the NOT EXISTS plan). The parent key sets broadcast;
    each fact table is scanned once per edge with only its key column.
    The load-validation step every warehouse runs before promoting a
    batch."""
    o = _read(spark, sf_dir, "orders").select("o_custkey")
    c = _read(spark, sf_dir, "customer").select("c_custkey")
    l = _read(spark, sf_dir, "lineitem").select("l_orderkey")
    ok = _read(spark, sf_dir, "orders").select("o_orderkey")
    r1 = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
        .crossJoin(o.agg(F.count("*").alias("n_child_rows")))
        .select(F.lit("orders->customer").alias("fk"), "n_child_rows", "n_orphans")
    )
    r2 = (
        l.join(F.broadcast(ok), l.l_orderkey == ok.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
        .crossJoin(l.agg(F.count("*").alias("n_child_rows")))
        .select(F.lit("lineitem->orders").alias("fk"), "n_child_rows", "n_orphans")
    )
    return r1.unionByName(r2)


_INC_MERGE_SQL = """
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS sum_c,
       CAST(MAX(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS max_c
FROM events GROUP BY user_id"""


@_q("incremental_agg_merge", _INC_MERGE_SQL)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial aggregation — the pattern behind incremental
    materialized views: the already-aggregated 'yesterday' state (events
    with event_id % 10 != 0, pre-rolled to per-user partials) merges
    with today's delta partials by SUM/SUM/MAX — the base rows are never
    re-scanned. The oracle aggregates the union directly, proving
    merge(partial(A), partial(B)) == aggregate(A ∪ B). Works because
    count/sum/max are commutative monoids; avg must ship (sum, n), and
    quantiles need a sketch (see approx_quantiles)."""
    e = _read(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("sum_c"),
            F.max(cents).alias("max_c"),
        )

    base = partial(e.where(F.col("event_id") % 10 != 0))
    delta = partial(e.where(F.col("event_id") % 10 == 0))
    return (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_c").alias("sum_c"),
            F.max("max_c").alias("max_c"),
        )
    )


_TREND_SQL = """
WITH xy AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 - 788918400 AS x,
         CAST(round("value" * 100, 0) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
         CAST(CAST(SUM((x * y) // 10000000) AS BIGINT) AS DOUBLE) * 10000000.0
           + CAST(CAST(SUM((x * y) % 10000000) AS BIGINT) AS DOUBLE) AS sxy,
         CAST(CAST(SUM((x * x) // 1000000000) AS BIGINT) AS DOUBLE) * 1000000000.0
           + CAST(CAST(SUM((x * x) % 1000000000) AS BIGINT) AS DOUBLE) AS sxx,
         CAST(CAST(SUM((y * y) // 100000) AS BIGINT) AS DOUBLE) * 100000.0
           + CAST(CAST(SUM((y * y) % 100000) AS BIGINT) AS DOUBLE) AS syy
  FROM xy GROUP BY user_id)
SELECT user_id, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 8) AS pearson_r
FROM s"""


@_q("trend_features", _TREND_SQL)
def q_trend_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend slope + Pearson correlation of value vs time —
    closed-form from five sums, one hash aggregate, no window/sort/UDF.
    Per-row products stay in int64 (seconds-since-1995 x cents); the
    product sums (x*x reaches ~4e16/row — past 2^53) accumulate in TWO
    exact int64 limbs each (hi = p div S, lo = p mod S) reconstructed
    in pinned double order, because wide-decimal/HUGEINT sums past 2^63
    narrow to double differently across engines (the round-4 sf0.1 q1
    finding); only the final closed-form arithmetic runs in doubles
    with engine-identical op order. The forecasting-feature op (is this
    sensor drifting?) at any scale."""
    e = _read(spark, sf_dir, "events")
    x = (F.expr("unix_micros(cast(ts as timestamp)) div 1000000") - F.lit(788918400)).alias("x")
    y = F.round(F.col("value") * 100, 0).cast("long").alias("y")
    # x*x > 2^53 per row, so the %-and-divide trick is inexact — use SQL
    # `div` (true integral division) on the named columns instead
    xy = e.select("user_id", x, y).selectExpr(
        "user_id", "x", "y",
        "(x * y) div 10000000 AS xy_hi", "(x * y) % 10000000 AS xy_lo",
        "(x * x) div 1000000000 AS xx_hi", "(x * x) % 1000000000 AS xx_lo",
        "(y * y) div 100000 AS yy_hi", "(y * y) % 100000 AS yy_lo",
    )

    def limb(hi, lo, scale):
        return F.sum(hi).cast("double") * F.lit(scale) + F.sum(lo).cast("double")

    agg = xy.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        limb("xy_hi", "xy_lo", 10_000_000.0).alias("sxy"),
        limb("xx_hi", "xx_lo", 1_000_000_000.0).alias("sxx"),
        limb("yy_hi", "yy_lo", 100_000.0).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    return agg.select(
        "user_id",
        "n",
        F.round(num / (n * sxx - sx * sx), 8).alias("slope"),
        F.round(num / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 8).alias(
            "pearson_r"
        ),
    )


_NEXT_OBS_SQL = f"""
WITH {_FEAT_CTE},
{_SPINE_CTE},
nxt AS (
  SELECT s.entity_id, s.event_timestamp,
         f.aqi, f.feature_timestamp,
         row_number() OVER (
           PARTITION BY s.entity_id, s.event_timestamp
           ORDER BY f.feature_timestamp ASC, f.event_id ASC) AS rn
  FROM (SELECT DISTINCT entity_id, event_timestamp FROM spine) s
  JOIN feat f
    ON s.entity_id = f.entity_id
   AND f.feature_timestamp >= s.event_timestamp
   AND f.feature_timestamp <= s.event_timestamp + INTERVAL '7 days')
SELECT sp.entity_id, sp.event_timestamp, c.aqi, c.feature_timestamp
FROM (SELECT DISTINCT entity_id, event_timestamp FROM spine) sp
LEFT JOIN (SELECT * FROM nxt WHERE rn = 1) c
  ON sp.entity_id = c.entity_id AND sp.event_timestamp = c.event_timestamp"""


@_q("next_observation_join", _NEXT_OBS_SQL)
def q_next_observation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror of the PIT join: for each spine
    row, the EARLIEST feature at-or-after the event time within a 7-day
    horizon (label lookup for forecasting: 'what did the sensor read
    next'). Same range-join + min_by shape as pit_join's join strategy,
    ties broken on event_id; left join preserves spine rows with no
    future observation."""
    feat = pipeline.derive_features(_read(spark, sf_dir, "events"))
    spine = pipeline.build_spine(_read(spark, sf_dir, "events")).dropDuplicates(
        ["entity_id", "event_timestamp"]
    )
    horizon = F.expr("INTERVAL 7 DAYS")
    cand = spine.join(
        feat.select("entity_id", "feature_timestamp", "aqi", "event_id"),
        (spine.entity_id == feat.entity_id)
        & (F.col("feature_timestamp") >= F.col("event_timestamp"))
        & (F.col("feature_timestamp") <= F.col("event_timestamp") + horizon),
    ).select(
        spine.entity_id, "event_timestamp", "aqi", "feature_timestamp", "event_id"
    )
    first = cand.groupBy("entity_id", "event_timestamp").agg(
        F.min_by(
            F.struct("aqi", "feature_timestamp"),
            F.struct(F.col("feature_timestamp"), F.col("event_id")),
        ).alias("f")
    )
    return spine.join(first, ["entity_id", "event_timestamp"], "left").select(
        "entity_id",
        "event_timestamp",
        F.col("f.aqi").alias("aqi"),
        F.col("f.feature_timestamp").alias("feature_timestamp"),
    )


# ---------------------------------------------------------------------------
# Decision-support shapes round 2: distribution-of-aggregates, per-group
# scalar gates, global-scalar anti-join
# ---------------------------------------------------------------------------

_CUST_DIST_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) per_cust
GROUP BY c_count"""


@_q("customer_order_distribution", _CUST_DIST_SQL)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of per-customer order counts,
    including zero-order customers (the LEFT OUTER join is load-bearing:
    an inner join would drop them). Two-level aggregate: the first
    groupBy is a shuffle on c_custkey, the second reduces to at most
    max(c_count) rows — negligible. The join-side filter lives in the
    join condition, not a WHERE (a WHERE would turn the outer join
    inner)."""
    c = _read(spark, sf_dir, "customer").select("c_custkey")
    o = _read(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_SMALL_QTY_SQL = """
WITH qc AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100, 0) AS BIGINT) AS qc,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
  FROM lineitem),
s AS (SELECT l_partkey, SUM(qc) AS sum_qc, COUNT(*) AS n
      FROM qc GROUP BY l_partkey)
SELECT CAST(SUM(q.pc) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM qc q JOIN s ON q.l_partkey = s.l_partkey
WHERE q.qc * 5 * s.n < s.sum_qc"""


@_q("small_quantity_revenue", _SMALL_QTY_SQL)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from lineitems whose quantity is below
    20% of the per-part average: the correlated-scalar-subquery pattern
    as a self-aggregate join. The threshold test is pure int64 cross-
    multiplication (qc*5*n < sum_qc) — exactly the 0.2*avg gate with no
    division, no doubles, no ulp risk. One shuffle on l_partkey serves
    both the aggregate and the join (AQE coalesces); revenue accumulates
    in exact cents and converts to dollars once at the end."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qc"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
    )
    s = li.groupBy("l_partkey").agg(
        F.sum("qc").alias("sum_qc"), F.count("*").alias("n")
    )
    gated = li.join(s, "l_partkey").where(
        F.col("qc") * 5 * F.col("n") < F.col("sum_qc")
    )
    return gated.agg(
        (F.sum("pc").cast("double") / 100.0 / 7.0).alias("avg_yearly")
    )


_HIGH_BAL_SQL = """
WITH bal AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bc
  FROM customer),
g AS (SELECT SUM(CASE WHEN bc > 0 THEN bc ELSE 0 END) AS s,
             SUM(CASE WHEN bc > 0 THEN 1 ELSE 0 END) AS n FROM bal)
SELECT n.n_name, COUNT(*) AS numcust,
       CAST(SUM(b.bc) AS DOUBLE) / 100.0 AS totacctbal
FROM bal b CROSS JOIN g
JOIN nation n ON b.c_nationkey = n.n_nationkey
WHERE b.bc * g.n > g.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = b.c_custkey)
GROUP BY n.n_name"""


@_q("high_balance_inactive", _HIGH_BAL_SQL)
def q_high_balance_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — customers with above-average balance and no
    orders, grouped by nation. Three classic sub-shapes in one plan: a
    global scalar aggregate broadcast back (1-row cross join, never a
    driver action), a NOT EXISTS as LEFT ANTI join, and a broadcast dim
    join. The above-average test is integer cross-multiplication
    (bc*n > s) against exact cent sums — no division."""
    bal = _read(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bc"),
    )
    pos = F.when(F.col("bc") > 0, F.col("bc")).otherwise(F.lit(0))
    g = bal.agg(
        F.sum(pos).alias("s"),
        F.sum(F.when(F.col("bc") > 0, 1).otherwise(0)).alias("n"),
    )
    o = _read(spark, sf_dir, "orders").select("o_custkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = (
        bal.crossJoin(F.broadcast(g))
        .where(F.col("bc") * F.col("n") > F.col("s"))
        .join(o, bal.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        rich.join(F.broadcast(n), rich.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bc").cast("double") / 100.0).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest as-of join (completes the backward/forward family)
# ---------------------------------------------------------------------------

_NEAREST_OBS_SQL = f"""
WITH {_FEAT_CTE},
{_SPINE_CTE},
sp AS (SELECT DISTINCT entity_id, event_timestamp FROM spine),
cand AS (
  SELECT sp.entity_id, sp.event_timestamp, f.aqi, f.feature_timestamp,
         epoch_us(f.feature_timestamp) - epoch_us(sp.event_timestamp) AS gap_us,
         row_number() OVER (
           PARTITION BY sp.entity_id, sp.event_timestamp
           ORDER BY abs(epoch_us(f.feature_timestamp) - epoch_us(sp.event_timestamp)),
                    f.feature_timestamp, f.event_id) AS rn
  FROM sp JOIN feat f
    ON sp.entity_id = f.entity_id
   AND f.feature_timestamp >= sp.event_timestamp - INTERVAL '3 days'
   AND f.feature_timestamp <= sp.event_timestamp + INTERVAL '3 days')
SELECT sp.entity_id, sp.event_timestamp, c.aqi, c.feature_timestamp,
       c.gap_us
FROM sp LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON sp.entity_id = c.entity_id AND sp.event_timestamp = c.event_timestamp"""


@_q("nearest_observation_join", _NEAREST_OBS_SQL)
def q_nearest_observation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — either direction within a ±3-day horizon,
    minimizing |gap| (sensor alignment: attach the closest reading, past
    or future). Same range-join + min_by shape as the backward/forward
    variants; the ordering struct (abs gap, feature_ts, event_id) is
    pure int64 so ties are deterministic. Signed gap_us is kept in the
    output — the caller can tell look-ahead from look-back."""
    feat = pipeline.derive_features(_read(spark, sf_dir, "events"))
    spine = pipeline.build_spine(_read(spark, sf_dir, "events")).dropDuplicates(
        ["entity_id", "event_timestamp"]
    )
    horizon = F.expr("INTERVAL 3 DAYS")
    # Pipeline timestamps are TIMESTAMP_NTZ; unix_micros wants TIMESTAMP.
    # The session is pinned UTC, so the cast is value-identity.
    gap = F.unix_micros(
        F.col("feature_timestamp").cast("timestamp")
    ) - F.unix_micros(F.col("event_timestamp").cast("timestamp"))
    cand = spine.join(
        feat.select("entity_id", "feature_timestamp", "aqi", "event_id"),
        (spine.entity_id == feat.entity_id)
        & (F.col("feature_timestamp") >= F.col("event_timestamp") - horizon)
        & (F.col("feature_timestamp") <= F.col("event_timestamp") + horizon),
    ).select(
        spine.entity_id,
        "event_timestamp",
        "aqi",
        "feature_timestamp",
        gap.alias("gap_us"),
        "event_id",
    )
    best = cand.groupBy("entity_id", "event_timestamp").agg(
        F.min_by(
            F.struct("aqi", "feature_timestamp", "gap_us"),
            F.struct(
                F.abs(F.col("gap_us")).alias("a"),
                F.col("feature_timestamp"),
                F.col("event_id"),
            ),
        ).alias("f")
    )
    return spine.join(best, ["entity_id", "event_timestamp"], "left").select(
        "entity_id",
        "event_timestamp",
        F.col("f.aqi").alias("aqi"),
        F.col("f.feature_timestamp").alias("feature_timestamp"),
        F.col("f.gap_us").alias("gap_us"),
    )




# ---------------------------------------------------------------------------
# Round 8, wave 2: Bloom semi-join scan reduction (join pruning, the shuffle saver)
# ---------------------------------------------------------------------------

_BSJ_M, _BSJ_KH = 4096, 2
_BSJ_FAM = _ph.hash_family(_BSJ_KH, seed=0xB5E1)


def _bsj_hb(key: Column) -> Column:
    """Portable 31-bit Bloom key hash — shared by the bitmap build and
    the fact-scan probe (both engines set and probe identical bits)."""
    return _ph.md5_int32(
        F.concat(F.lit("bsj|"), key.cast("string"))
    ) % F.lit(_ph.MERSENNE31)


def _bsj_bit_cols() -> list[Column]:
    """The k affine bit positions derived from an ``hb`` column."""
    return [
        (_ph.affine(F.col("hb"), a, b) % F.lit(_BSJ_M)).alias(f"bit{j}")
        for j, (a, b) in enumerate(_BSJ_FAM)
    ]


def _bsj_bitmap(dim_keys: DataFrame, key: str) -> Column:
    """Fold a distinct key frame into the 4096-bit Bloom bitmap as 64
    int64 plan literals. Bounded driver collect: <= m distinct SET
    BITS (never |dim| rows) — the filter ships inside the task binary,
    so the probe is scan-local with no join and no shuffle."""
    dh = dim_keys.select(_bsj_hb(F.col(key)).alias("hb"))
    set_bits = sorted(
        r["bit"]
        for r in dh.select(F.explode(F.array(*_bsj_bit_cols())).alias("bit"))
        .distinct()
        .collect()
    )
    limbs = [0] * (_BSJ_M // 64)
    for bit in set_bits:
        limbs[bit >> 6] |= 1 << (bit & 63)
    limbs = [x - (1 << 64) if x >= (1 << 63) else x for x in limbs]
    return F.array(*[F.lit(x).cast("long") for x in limbs])


# scan-local membership predicate over bit0..bit{k-1} plus the `bm` limbs
_BSJ_HIT = " AND ".join(
    f"(shiftright(element_at(bm, CAST(bit{j} div 64 AS INT) + 1), "
    f"CAST(bit{j} % 64 AS INT)) & 1) = 1"
    for j in range(_BSJ_KH)
)

_BSJ_SQL = rf"""
WITH dim AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-03-01'
    AND o_orderdate <  TIMESTAMP '1995-06-01'),
dh AS (
  SELECT o_orderkey,
         ({_ph.duck_hex_int("md5('bsj|' || CAST(o_orderkey AS VARCHAR))", 1, 8)})
           % {_ph.MERSENNE31} AS hb
  FROM dim),
fam AS (
  SELECT * FROM (VALUES {", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(_BSJ_FAM))})
  AS t(j, a, b)),
bits AS (
  SELECT DISTINCT ((f.a * d.hb + f.b) % {_ph.MERSENNE31}) % {_BSJ_M} AS bit
  FROM dh d CROSS JOIN fam f),
fact AS (
  SELECT l_orderkey, l_returnflag,
         ({_ph.duck_hex_int("md5('bsj|' || CAST(l_orderkey AS VARCHAR))", 1, 8)})
           % {_ph.MERSENNE31} AS hb
  FROM lineitem),
probe AS (
  SELECT l_returnflag, l_orderkey,
         ((f0.a * hb + f0.b) % {_ph.MERSENNE31}) % {_BSJ_M} AS bit0,
         ((f1.a * hb + f1.b) % {_ph.MERSENNE31}) % {_BSJ_M} AS bit1
  FROM fact, (SELECT a, b FROM fam WHERE j = 0) f0,
       (SELECT a, b FROM fam WHERE j = 1) f1),
flags AS (
  SELECT p.l_returnflag,
         CASE WHEN b0.bit IS NOT NULL AND b1.bit IS NOT NULL
              THEN 1 ELSE 0 END AS maybe,
         CASE WHEN p.l_orderkey IN (SELECT o_orderkey FROM dim)
              THEN 1 ELSE 0 END AS matched
  FROM probe p
  LEFT JOIN bits b0 ON p.bit0 = b0.bit
  LEFT JOIN bits b1 ON p.bit1 = b1.bit),
agg AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_fact,
         CAST(SUM(maybe) AS BIGINT) AS n_pass_bloom,
         CAST(SUM(matched) AS BIGINT) AS n_true_match,
         CAST(SUM(CASE WHEN maybe = 1 AND matched = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos
  FROM flags GROUP BY l_returnflag)
SELECT l_returnflag, n_fact, n_pass_bloom, n_true_match, n_false_pos,
       CASE WHEN n_fact = n_true_match THEN NULL
            ELSE round(CAST(n_false_pos AS DOUBLE)
                       / CAST(n_fact - n_true_match AS DOUBLE), 6) END
         AS fp_rate,
       round(1.0 - CAST(n_pass_bloom AS DOUBLE) / CAST(n_fact AS DOUBLE), 6)
         AS scan_reduction
FROM agg"""


@_q("bloom_semijoin_reduce", _BSJ_SQL)
def q_bloom_semijoin_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom SEMI-JOIN scan reduction — the join-pruning use of the
    filter `bloom_dedup_gate` uses for ingest dedup: the keys of a
    selective dimension predicate (urgent orders in one quarter)
    collapse into a 4096-bit / 2-hash Bloom BITMAP that is embedded in
    the FACT SCAN as 64 int64 plan literals, so every lineitem row
    answers "can this key possibly join?" with two shifts and two ANDs
    — no join, no shuffle, before the real join runs only over
    survivors. Per return flag the query reports fact rows, Bloom
    passers, exact semi-join matches, false positives, the
    false-positive rate among true non-matches, and the scan-reduction
    share — the evidence a planner reads before enabling runtime filter
    pushdown (Spark's own AQE runtime bloom does exactly this; here the
    mechanics are explicit and measured).

    Determinism: the md5-affine family is the portable one
    (`bloom_dedup_gate` precedent), so both engines set and probe
    byte-identical bit positions; false positives are deterministic and
    the oracle reproduces them bit-for-bit. Counts are integers; the
    two rates are one division each.

    100 TB shape: the bitmap costs 512 BYTES — it ships inside the task
    binary to every scan task (the Spark side materializes it as a
    driver-collected <= m-row bit list folded into plan literals; the
    collect is BOUNDED BY m, never by the dim row count). The exact
    leg (broadcast key join) exists to MEASURE the filter; production
    keeps the bloom prefilter in front of the shuffle join and sizes m
    by |dim|: at this fixed m=4096 the filter saturates as |dim| grows
    past ~2k keys (fp_rate rises toward 1 at sf1 — visible in the
    measured column, which is the point of measuring)."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    dim = (
        orders.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.expr("o_orderdate >= TIMESTAMP '1995-03-01'")
            & F.expr("o_orderdate < TIMESTAMP '1995-06-01'")
        )
        .select("o_orderkey")
        .distinct()
    )
    bm = _bsj_bitmap(dim, "o_orderkey")
    fact = li.select(
        "l_orderkey", "l_returnflag", _bsj_hb(F.col("l_orderkey")).alias("hb")
    )
    probe = fact.select(
        "l_orderkey", "l_returnflag", *_bsj_bit_cols(), bm.alias("bm")
    )
    flagged = probe.withColumn(
        "maybe", F.expr(f"CAST(({_BSJ_HIT}) AS INT)")
    )
    keys = dim.select(F.col("o_orderkey").alias("_k"))
    flags = flagged.join(
        F.broadcast(keys), flagged["l_orderkey"] == keys["_k"], "left"
    ).select(
        "l_returnflag",
        "maybe",
        F.when(F.col("_k").isNotNull(), 1).otherwise(0).alias("matched"),
    )
    agg = flags.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_fact"),
        F.sum("maybe").cast("long").alias("n_pass_bloom"),
        F.sum("matched").cast("long").alias("n_true_match"),
        F.sum(
            F.when((F.col("maybe") == 1) & (F.col("matched") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
    )
    return agg.select(
        "l_returnflag",
        "n_fact",
        "n_pass_bloom",
        "n_true_match",
        "n_false_pos",
        F.when(
            F.col("n_fact") == F.col("n_true_match"),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("n_false_pos").cast("double")
                / (F.col("n_fact") - F.col("n_true_match")).cast("double"),
                6,
            )
        )
        .alias("fp_rate"),
        F.round(
            F.lit(1.0)
            - F.col("n_pass_bloom").cast("double")
            / F.col("n_fact").cast("double"),
            6,
        ).alias("scan_reduction"),
    )


_BSJ_REV_SQL = """
WITH dim AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-03-01'
    AND o_orderdate <  TIMESTAMP '1995-06-01'),
t AS (
  SELECT l_returnflag,
         CAST(round(l_quantity, 0) AS BIGINT)                AS qty_i,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)     AS price_i,
         CAST(round((1 - l_discount) * 10000, 0) AS BIGINT)  AS disc_i
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM dim)),
u AS (
  SELECT l_returnflag, qty_i,
         (price_i * disc_i) // 1000000 AS dp_hi,
         (price_i * disc_i) % 1000000  AS dp_lo
  FROM t)
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(qty_i) AS BIGINT) AS DOUBLE) AS sum_qty,
       (CAST(CAST(SUM(dp_hi) AS BIGINT) AS DOUBLE) * 1000000.0
          + CAST(CAST(SUM(dp_lo) AS BIGINT) AS DOUBLE)) / 1000000.0
         AS revenue
FROM u GROUP BY l_returnflag"""


@_q("bloom_prefiltered_revenue", _BSJ_REV_SQL)
def q_bloom_prefiltered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom prefilter of `bloom_semijoin_reduce` COMPOSED into a
    real revenue aggregate — and proven semantically transparent: the
    Spark plan runs fact scan -> 64-literal bitmap prefilter -> exact
    broadcast key join (which discards the bloom's false positives) ->
    revenue rollup, while the ORACLE computes the plain semi-join
    aggregate with NO bloom anywhere. Hash equality is the proof that
    the prefilter loses no rows (one-sidedness composing through a
    join) and adds none (the exact join behind it) — the invariant a
    planner must hold before switching runtime filter pushdown on.

    Money math is the q1_pricing_summary two-limb exact-int64
    discipline (price*disc products summed as hi/lo limbs, pinned-order
    double reconstruction — bit-identical at any sf and parallelism).

    100 TB shape: the bitmap prunes the fact stream BEFORE the join
    (here broadcast; at a 100 TB fact vs large dim it would prune
    before the SHUFFLE, which is the entire point — shuffle bytes drop
    by the scan-reduction share measured in `bloom_semijoin_reduce`),
    and the aggregate map-combines behind it."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    dim = (
        orders.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.expr("o_orderdate >= TIMESTAMP '1995-03-01'")
            & F.expr("o_orderdate < TIMESTAMP '1995-06-01'")
        )
        .select("o_orderkey")
        .distinct()
    )
    bm = _bsj_bitmap(dim, "o_orderkey")
    fact = li.select(
        "l_orderkey",
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        _bsj_hb(F.col("l_orderkey")).alias("hb"),
        bm.alias("bm"),
    ).select("*", *_bsj_bit_cols())
    pre = fact.where(F.expr(_BSJ_HIT))  # bloom prefilter: scan-local, no join
    keys = dim.select(F.col("o_orderkey").alias("_k"))
    joined = pre.join(
        F.broadcast(keys), pre["l_orderkey"] == keys["_k"], "inner"
    )
    qty_i = F.round(F.col("l_quantity"), 0).cast("long")
    price_i = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_i = F.round((F.lit(1) - F.col("l_discount")) * 10000, 0).cast("long")
    dp = price_i * disc_i
    dp_hi = ((dp - dp % 1_000_000) / 1_000_000).cast("long")
    dp_lo = dp % 1_000_000
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(qty_i).cast("double").alias("sum_qty"),
        (
            (
                F.sum(dp_hi).cast("double") * F.lit(1_000_000.0)
                + F.sum(dp_lo).cast("double")
            )
            / F.lit(1_000_000.0)
        ).alias("revenue"),
    )


_ZONE_SQL = """
WITH p AS (
  SELECT date_trunc('month', l_shipdate) AS month, l_shipdate, l_extendedprice
  FROM lineitem)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
       CAST(CASE WHEN max(l_shipdate) < TIMESTAMP '2000-01-01'
            THEN 1 ELSE 0 END AS INT) AS skip_time,
       CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01'
                THEN 1 ELSE 0 END) AS BIGINT) AS hits_time,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
       CAST(CASE WHEN max(l_extendedprice) < 100000.0
            THEN 1 ELSE 0 END AS INT) AS skip_price,
       CAST(SUM(CASE WHEN l_extendedprice >= 100000.0
                THEN 1 ELSE 0 END) AS BIGINT) AS hits_price
FROM p GROUP BY month"""


@_q("zone_map_skip_audit", _ZONE_SQL)
def q_zone_map_skip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (per-partition min/max) data-skipping audit — the
    STORAGE-LAYOUT pruning complement to `bloom_semijoin_reduce`'s
    key-membership pruning: for every shipdate-month partition (the
    offline store's Hive layout, sources/offline_store.py) the query
    computes the min/max zone stats a scan planner consults and
    evaluates two >=-predicates against them side by side:

    - a LAYOUT-CORRELATED predicate (l_shipdate >= 2000-01-01): most
      partitions' max falls below the cut, so ``skip_time=1`` — whole
      partitions drop with zero rows read;
    - an UNCORRELATED predicate of similar selectivity
      (l_extendedprice >= 100000, ~p95+): partitions span nearly the
      full price range, so ``skip_price`` stays ~0 even though ~95% of
      rows miss (at tiny sf a sparse month can max below the cut by
      luck; the contrast with skip_time stays decisive) — zone maps
      are worthless for columns the layout doesn't cluster.

    The contrast IS the measured argument for layout work
    (`zorder_keys` is the fix: interleave the pruning columns into the
    sort key so both predicates skip). Skipping's one-sidedness is in
    the hashed values themselves: every skip_*=1 row carries
    hits_*=0 — a skipped partition provably contained nothing.

    Determinism: counts are integers; min/max over doubles/timestamps
    are order-free exact values from the same parquet bits.

    100 TB shape: one map-combining aggregate over the scan —
    n_partitions x a handful of stats rows shuffle, nothing else; in
    production the stats table persists at write time (the parquet
    footer already holds these) and the audit reads footers, not
    rows."""
    li = _read(spark, sf_dir, "lineitem")
    tcut = F.expr("TIMESTAMP '2000-01-01'")
    return (
        li.select(
            F.date_trunc("month", "l_shipdate").alias("month"),
            "l_shipdate",
            "l_extendedprice",
        )
        .groupBy("month")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.when(F.max("l_shipdate") < tcut, 1)
            .otherwise(0)
            .cast("int")
            .alias("skip_time"),
            F.sum(F.when(F.col("l_shipdate") >= tcut, 1).otherwise(0))
            .cast("long")
            .alias("hits_time"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.when(F.max("l_extendedprice") < F.lit(100000.0), 1)
            .otherwise(0)
            .cast("int")
            .alias("skip_price"),
            F.sum(
                F.when(F.col("l_extendedprice") >= F.lit(100000.0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("hits_price"),
        )
    )


# ---------------------------------------------------------------------------
# Round 9: z-order layout audit — measuring the fix zone_map_skip_audit names
# ---------------------------------------------------------------------------

_ZO_EPOCH = "DATE '1992-01-01'"
_ZO_BITS = 12          # balance the two dims: days ~3.6k, price/26 ~4k
_ZO_PRICE_Q = 26       # price quantum chosen so both dims fill ~12 bits
_ZO_SHIFT = 18         # zone = z >> 18: <= 64 value-space tiles, any sf


def _zone_zorder_sql() -> str:
    from aqi_featurestore_spark.functions.layout import duck_zorder_key2

    z = duck_zorder_key2("x", "y", bits=_ZO_BITS)
    stats = """
  SELECT {key} AS zone, COUNT(*) AS n,
         CASE WHEN max(l_shipdate) < TIMESTAMP '2000-01-01'
              THEN 1 ELSE 0 END AS skip_t,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01'
                  THEN 1 ELSE 0 END) AS hits_t,
         CASE WHEN max(l_extendedprice) < 100000.0
              THEN 1 ELSE 0 END AS skip_p,
         SUM(CASE WHEN l_extendedprice >= 100000.0
                  THEN 1 ELSE 0 END) AS hits_p
  FROM {src} GROUP BY 1"""
    summ = """
  SELECT '{layout}' AS layout, '{pred}' AS predicate,
         CAST(COUNT(*) AS BIGINT) AS n_zones,
         CAST(SUM(skip_{s}) AS BIGINT) AS zones_skipped,
         CAST(SUM(n) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN skip_{s} = 1 THEN n ELSE 0 END) AS BIGINT)
           AS rows_skipped,
         CAST(SUM(CASE WHEN skip_{s} = 1 THEN hits_{s} ELSE 0 END) AS BIGINT)
           AS leaked_hits,
         round(CAST(SUM(CASE WHEN skip_{s} = 1 THEN n ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n) AS DOUBLE), 6) AS rows_skip_share
  FROM {src}"""
    return f"""
WITH t AS (
  SELECT date_trunc('month', l_shipdate) AS month, l_shipdate, l_extendedprice,
         date_diff('day', {_ZO_EPOCH}, CAST(l_shipdate AS DATE)) AS x,
         CAST(floor(l_extendedprice / {_ZO_PRICE_Q}) AS BIGINT) AS y
  FROM lineitem),
zt AS (SELECT *, ({z}) // {1 << _ZO_SHIFT} AS zzone FROM t),
mz AS ({stats.format(key="month", src="t")}),
zz AS ({stats.format(key="zzone", src="zt")}),
u AS (
{summ.format(layout="month", pred="time", s="t", src="mz")}
  UNION ALL
{summ.format(layout="month", pred="price", s="p", src="mz")}
  UNION ALL
{summ.format(layout="zorder", pred="time", s="t", src="zz")}
  UNION ALL
{summ.format(layout="zorder", pred="price", s="p", src="zz")})
SELECT * FROM u"""


@_q("zone_map_zorder_audit", _zone_zorder_sql())
def q_zone_map_zorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURE the fix `zone_map_skip_audit` argues for (round-8
    verdict ask #2): re-tile lineitem on the Morton key of
    (shipdate-days, price/26) — `functions.layout.zorder_key2`, both
    dims scaled to ~12 bits so neither dominates the interleave — and
    evaluate the SAME two zone-map predicates against the z-tiles
    side-by-side with the month layout. One row per (layout,
    predicate): zones, zones skipped, rows inside skipped zones (the
    scan bytes a planner saves), leaked hits (one-sidedness proof —
    always 0), and the row-weighted skip share. Measured at sf0.01:
    the price predicate goes from skipping 0% of rows under the month
    layout to ~89% under z-order, while time skipping stays high
    (~72% -> ~59%) — the multi-dimension trade quantified, which is the
    evidence that justifies paying the layout rewrite.

    Zones here are FIXED z-prefix tiles (z >> 18, <= 64 value-space
    cells): deterministic for the oracle and scale-invariant (the same
    tile grid at every sf — shares verified identical at sf0.001/0.01/
    0.1), unlike range-partition boundaries which Spark samples. The
    physical-write twin — `zorder_layout` range-partitioned parquet
    whose real per-FILE footer stats prune vs a date-sorted layout — is
    pinned in tests/test_layout_skipping.py.

    Determinism: the Morton key is pure integer bit arithmetic
    (bit-identical in both engines); counts are integers; the one
    double is a final rounded division.

    100 TB shape: two map-combining aggregates (per-month, per-tile)
    over one scan — at most ~148 stat rows shuffle; no window, no
    global sort, no join. The production rewrite this audit prices is
    one repartitionByRange on the same key (functions/layout.py)."""
    from aqi_featurestore_spark.functions.layout import zorder_key2

    li = _read(spark, sf_dir, "lineitem")
    tcut = F.expr("TIMESTAMP '2000-01-01'")
    t = li.select(
        F.date_trunc("month", "l_shipdate").alias("month"),
        "l_shipdate",
        "l_extendedprice",
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date")
        ).alias("x"),
        F.floor(F.col("l_extendedprice") / _ZO_PRICE_Q).cast("long").alias("y"),
    )
    zt = t.withColumn("zkey", zorder_key2("x", "y", bits=_ZO_BITS)).withColumn(
        "zzone", F.expr(f"zkey div {1 << _ZO_SHIFT}")
    )

    def stats(src: DataFrame, key: str) -> DataFrame:
        return src.groupBy(F.col(key).alias("zone")).agg(
            F.count("*").alias("n"),
            F.when(F.max("l_shipdate") < tcut, 1).otherwise(0).alias("skip_t"),
            F.sum(F.when(F.col("l_shipdate") >= tcut, 1).otherwise(0)).alias(
                "hits_t"
            ),
            F.when(F.max("l_extendedprice") < F.lit(100000.0), 1)
            .otherwise(0)
            .alias("skip_p"),
            F.sum(
                F.when(F.col("l_extendedprice") >= F.lit(100000.0), 1).otherwise(0)
            ).alias("hits_p"),
        )

    def summ(z: DataFrame, layout: str, pred: str, s: str) -> DataFrame:
        skip, hits = F.col(f"skip_{s}"), F.col(f"hits_{s}")
        return z.agg(
            F.lit(layout).alias("layout"),
            F.lit(pred).alias("predicate"),
            F.count("*").cast("long").alias("n_zones"),
            F.sum(skip).cast("long").alias("zones_skipped"),
            F.sum("n").cast("long").alias("rows_total"),
            F.sum(F.when(skip == 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_skipped"),
            F.sum(F.when(skip == 1, hits).otherwise(0))
            .cast("long")
            .alias("leaked_hits"),
            F.round(
                F.sum(F.when(skip == 1, F.col("n")).otherwise(0)).cast("double")
                / F.sum("n").cast("double"),
                6,
            ).alias("rows_skip_share"),
        )

    # localCheckpoint: each tiny stats table (<= ~148 rows) feeds two
    # summary legs — materialize once instead of re-scanning lineitem
    mz = stats(t, "month").localCheckpoint()
    zz = stats(zt, "zzone").localCheckpoint()
    return (
        summ(mz, "month", "time", "t")
        .unionByName(summ(mz, "month", "price", "p"))
        .unionByName(summ(zz, "zorder", "time", "t"))
        .unionByName(summ(zz, "zorder", "price", "p"))
    )
