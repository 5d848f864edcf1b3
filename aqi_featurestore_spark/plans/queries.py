"""Query registry: every operator from SURVEY.md §2 as (a) a Spark
DataFrame plan and (b) an equivalent ANSI-SQL string for the DuckDB oracle.

Contract (driver, __spark_entry__.py): each callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL runs on the
same parquet registered as views. Column names and types are aliased
identically on both sides; cross-engine float determinism is handled by
(1) identical IEEE operation order for scalar math, (2) exact DECIMAL
accumulation cast to DOUBLE for sums of products, (3) rank-before-round
for similarity scores.

Semantics pinned here (SURVEY.md §7 hard parts):
- dayOfWeek = Spark ``dayofweek`` (1=Sunday); DuckDB oracle compensates
  with ``dayofweek(ts)+1`` (DuckDB is 0=Sunday).
- session timezone UTC; DuckDB timestamps are naive-UTC natively.
- AQI default variant 8.5 (the offline Spark job's,
  reference spark/code/write_to_bigquery.py:105).
"""

from __future__ import annotations

from datetime import timedelta
from typing import Callable

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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


from aqi_featurestore_spark.sources.testdata import read_table as _read_table


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Shared SQL fragments (oracle side). The feature CTE mirrors
# pipeline.derive_features column-for-column; the spine CTE mirrors
# pipeline.build_spine.
# ---------------------------------------------------------------------------

_FEAT_CTE = f"""
feat AS (
  SELECT CAST(user_id AS VARCHAR)            AS entity_id,
         ts                                  AS feature_timestamp,
         CAST(floor(epoch(ts)) AS BIGINT)    AS dt,
         "value"                             AS "value",
         {aqi_case_sql('"value"', default=8.5)} AS aqi,
         CAST(hour(ts) AS INT)               AS hour,
         CAST(day(ts) AS INT)                AS day,
         CAST(dayofweek(ts) + 1 AS INT)      AS "dayOfWeek",
         event_id
  FROM events
)"""

_SPINE_CTE = """
spine AS (
  SELECT CAST(user_id AS VARCHAR) AS entity_id,
         ts + INTERVAL '30 minutes' AS event_timestamp
  FROM events
  WHERE event_id % 7 = 0
)"""

_PIT_CTES = f"""
WITH {_FEAT_CTE},
{_SPINE_CTE},
cand AS (
  SELECT s.entity_id, s.event_timestamp,
         f.aqi, f.hour, f.day, f."dayOfWeek", f.feature_timestamp,
         row_number() OVER (
           PARTITION BY s.entity_id, s.event_timestamp
           ORDER BY f.feature_timestamp DESC, f.event_id DESC) AS rn
  FROM (SELECT DISTINCT entity_id, event_timestamp FROM spine) s
  JOIN feat f
    ON s.entity_id = f.entity_id
   AND f.feature_timestamp <= s.event_timestamp
   AND f.feature_timestamp >= s.event_timestamp - INTERVAL '7 days'
),
pit AS (
  SELECT sp.entity_id, sp.event_timestamp,
         c.aqi, c.hour, c.day, c."dayOfWeek", c.feature_timestamp
  FROM spine sp
  LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
    ON sp.entity_id = c.entity_id AND sp.event_timestamp = c.event_timestamp
)"""


# ---------------------------------------------------------------------------
# Feature-store parity queries (SURVEY.md §2)
# ---------------------------------------------------------------------------


@_q(
    "feature_derivation",
    f"WITH {_FEAT_CTE} SELECT * FROM feat",
)
def q_feature_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F17/P1/U1: raw events -> typed feature rows, all native
    expressions (no UDF; reference uses a row-at-a-time Python UDF)."""
    return pipeline.derive_features(_read(spark, sf_dir, "events"))


@_q(
    "latest_per_key",
    f"""WITH {_FEAT_CTE}
SELECT entity_id, feature_timestamp, aqi, hour, day, "dayOfWeek" FROM (
  SELECT *, row_number() OVER (
      PARTITION BY entity_id
      ORDER BY feature_timestamp DESC, event_id DESC) AS rn
  FROM feat) t
WHERE rn = 1""",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W2/O3: online-store materialization — most recent feature row per
    entity (Redis keying semantics), deterministic tie-break."""
    feat = pipeline.derive_features(_read(spark, sf_dir, "events"))
    snap = latest_per_key(feat, ["entity_id"], ts="feature_timestamp", tie_break=["event_id"])
    return snap.select("entity_id", "feature_timestamp", "aqi", "hour", "day", "dayOfWeek")


_REPETITION_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS t
  FROM documents),
tc AS (
  SELECT doc_id, tkn, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS tkn FROM tok) GROUP BY 1, 2),
ts AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS top_tok
  FROM tc GROUP BY doc_id),
bc AS (
  SELECT doc_id, bg, count(*) AS c FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 2
                  THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                  ELSE CAST([] AS VARCHAR[]) END) AS bg
    FROM tok) GROUP BY 1, 2),
bs AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(max(c) AS BIGINT) AS top_big
  FROM bc GROUP BY doc_id)
SELECT ts.doc_id, ts.n_tokens,
       CAST(ts.n_distinct AS DOUBLE) / ts.n_tokens AS distinct_ratio,
       CAST(ts.top_tok AS DOUBLE) / ts.n_tokens AS top_token_ratio,
       CAST(bs.top_big AS DOUBLE) / bs.n_bigrams AS top_bigram_ratio
FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id"""


@_q("repetition_stats", _REPETITION_SQL)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: type-token ratio plus
    most-frequent token/bigram shares — the thresholds LLM curation
    pipelines use to drop boilerplate and degenerate repetition."""
    from aqi_featurestore_spark.operators.text_quality import repetition_stats

    return repetition_stats(_read(spark, sf_dir, "documents"))


_PII_SQL = """
WITH synth AS (
  SELECT event_id,
         'reach user' || CAST(user_id AS VARCHAR) || ' at u' || CAST(user_id AS VARCHAR)
           || '@mail.example.com or +1-555-' || CAST(event_id % 10000 AS VARCHAR) AS text
  FROM events)
SELECT event_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
         '\\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{3,6}}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{3,6}}')) AS INT) AS n_phones
FROM synth""".replace("{{", "{").replace("}}", "}")


@_q("pii_redaction", _PII_SQL)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: emails/phones -> placeholder tokens with match
    counts. The testdata corpus carries no PII, so the query synthesizes
    deterministic PII-bearing text from event fields first — the oracle
    re-synthesizes and re-redacts it, so Java-regex vs RE2 semantics are
    genuinely exercised. Map-only at scale."""
    from aqi_featurestore_spark.operators.text_quality import redact_pii

    events = _read(spark, sf_dir, "events")
    synth = events.select(
        "event_id",
        F.concat(
            F.lit("reach user"),
            F.col("user_id").cast("string"),
            F.lit(" at u"),
            F.col("user_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            (F.col("event_id") % 10000).cast("string"),
        ).alias("text"),
    )
    return redact_pii(synth).select("event_id", "redacted", "n_emails", "n_phones")


_CONTAMINATION_SQL = r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE CAST([] AS VARCHAR[]) END) AS s
  FROM tok),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
SELECT d.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN b.s IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
         AS contamination_ratio
FROM sh d LEFT JOIN bench b ON d.s = b.s
GROUP BY d.doc_id"""


@_q("contamination_check", _CONTAMINATION_SQL)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage gate: fraction of each doc's 3-shingles found in
    the 'benchmark' subset (every 97th doc stands in for an eval suite).
    The benchmark shingle set broadcasts; the corpus never shuffles its
    text — the leakage check an LLM pipeline runs before training."""
    from aqi_featurestore_spark.operators.text_quality import contamination_check

    docs = _read(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    return contamination_check(docs, benchmark)


_STRATA_RATES = {"en": 0.2, "zh": 0.5, "de": 0.8}
_STRATA_DEFAULT = 1.0

_STRATIFIED_SQL = f"""
WITH u AS (
  SELECT doc_id, lang, n_chars,
         {{hex4}} AS u16
  FROM (SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents))
SELECT doc_id, lang, n_chars FROM u
WHERE u16 < CASE {" ".join(f"WHEN lang = '{v}' THEN {int(r * 65536)}" for v, r in _STRATA_RATES.items())}
            ELSE {int(_STRATA_DEFAULT * 65536)} END"""


@_q("stratified_sample", _STRATIFIED_SQL.format(hex4=_ph.duck_hex_int("h", 1, 4)))
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (rebalancing a skewed
    language mix is a standard curation pass): md5-uniform per doc_id vs
    per-stratum thresholds — no RNG, no shuffle, rerun-stable, and the
    oracle reproduces the exact row set."""
    from aqi_featurestore_spark.operators.text_quality import stratified_sample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return stratified_sample(
        docs,
        strata_col="lang",
        key_col="doc_id",
        rates=_STRATA_RATES,
        default_rate=_STRATA_DEFAULT,
    )


_QUANTILES_SQL = """
SELECT lang, count(*) AS n_docs,
       quantile_cont(n_chars, 0.5) AS p50,
       quantile_cont(n_chars, 0.9) AS p90,
       quantile_cont(n_chars, 0.99) AS p99
FROM documents GROUP BY lang"""


@_q("corpus_quantiles", _QUANTILES_SQL)
def q_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length distribution (the profile a curation
    pass thresholds against). Exact percentiles — Spark's `percentile`
    and DuckDB's `quantile_cont` share the (n-1)*p linear-interpolation
    definition, so values agree bit-for-bit. At 100 TB swap in
    approx_percentile (t-digest sketch, mergeable, no per-group sort)
    and keep this exact form as its small-scale oracle."""
    d = _read(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.percentile("n_chars", F.lit(0.5)).alias("p50"),
        F.percentile("n_chars", F.lit(0.9)).alias("p90"),
        F.percentile("n_chars", F.lit(0.99)).alias("p99"),
    )


_TOKCOUNT_DUCK = (
    r"len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))"
)

_PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST({_TOKCOUNT_DUCK} AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS o
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         COALESCE(CAST(sum(n_tokens) OVER (
             ORDER BY o, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS start_tok
  FROM t WHERE n_tokens > 0)
SELECT doc_id, n_tokens, start_tok,
       start_tok // 2048 AS chunk_id,
       start_tok % 2048 AS chunk_offset,
       (start_tok + n_tokens - 1) // 2048 AS end_chunk,
       (start_tok + n_tokens - 1) // 2048 - start_tok // 2048 + 1 AS n_chunks
FROM s"""


@_q("sequence_packing", _PACKING_SQL)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk dataloader packing: md5-deterministic global
    document order, then each doc's placement in fixed 2048-token
    context windows. The global ordered prefix sum runs as a bucketed
    two-phase scan (parallel per-bucket windows + 256-row offset
    broadcast), never a single-partition window — the oracle's plain
    global window proves the distributed scan reproduces it exactly."""
    from aqi_featurestore_spark.operators.packing import sequence_pack

    return sequence_pack(_read(spark, sf_dir, "documents"), ctx_len=2048)


_MIXTURE_SQL = f"""
WITH d AS (
  SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({_TOKCOUNT_DUCK}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source)
SELECT domain, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)
         AS token_share,
       (1.0 / count(*) OVER ()) /
         (CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE))
         AS resample_weight
FROM d"""


@_q("domain_mixture", _MIXTURE_SQL)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares + the uniform-rebalancing resample
    weights a curation pass multiplies into per-doc sampling rates.
    One combinable aggregation; the share window runs on the #domains-
    row aggregate."""
    from aqi_featurestore_spark.operators.packing import domain_mixture

    return domain_mixture(_read(spark, sf_dir, "documents"))


_RUNNING_SQL = r"""
SELECT user_id, ts, event_id,
       CAST(count(*) OVER w AS BIGINT) AS run_n,
       max("value") OVER w AS run_max,
       CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS run_sum_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)"""


@_q("running_stats", _RUNNING_SQL)
def q_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-entity history stats (running count/max/sum) — the
    frame-bounded window family next to lag (W1). Partitioned by entity,
    so the sort is per-key and parallel; ties broken by event_id for a
    deterministic frame; integer centi-sums for order independence."""
    events = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "ts",
        "event_id",
        F.count("*").over(w).alias("run_n"),
        F.max("value").over(w).alias("run_max"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w).alias("run_sum_c"),
    )


_TRAILING_SQL = r"""
SELECT user_id, ts, event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS sum_1h_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)"""


@_q("trailing_hour_stats", _TRAILING_SQL)
def q_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (trailing 1 h per entity) — the third
    frame type next to rows-bounded (`running_stats`) and unbounded.
    Spark range frames need a numeric ordering, so the frame runs over
    epoch MICROseconds — full timestamp precision; second-truncated
    epochs would shift the hour boundary under each row's sub-second
    component and silently disagree with the oracle's INTERVAL frame.
    Rows tied on ts share a frame in both engines (RANGE semantics), so
    no id tie-break is needed."""
    events = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # unix_micros rejects TIMESTAMP_NTZ; cast via the UTC-pinned
        # session so the epoch equals the oracle's naive-UTC epoch_us
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "ts",
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w).alias("sum_1h_c"),
    )


_DECILES_SQL = r"""
SELECT event_id, event_type,
       CAST(ntile(10) OVER (PARTITION BY event_type
                            ORDER BY "value", event_id) AS INT) AS decile
FROM events"""


@_q("value_deciles", _DECILES_SQL)
def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type decile assignment (ntile) — the rank-family window op
    used for threshold-free outlier trimming (drop decile 1/10). Ties
    broken by event_id so both engines assign identical buckets."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events.select(
        "event_id", "event_type", F.ntile(10).over(w).cast("int").alias("decile")
    )


_EVENT_PIVOT_SQL = r"""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_q("event_pivot", _EVENT_PIVOT_SQL)
def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event-type counts as columns. The
    value list is explicit — without it Spark runs an eager extra job
    just to collect distinct pivot values before planning (a full scan
    at 100 TB); with it the pivot compiles to one shuffle-by-user hash
    aggregate. Missing combinations become 0, matching the CASE-sum
    oracle."""
    events = _read(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )
    return wide.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES]
    )


_JSON_EXTRACT_SQL = r"""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT)
         AS max_k
FROM events GROUP BY event_type"""


@_q("json_extract_stats", _JSON_EXTRACT_SQL)
def q_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the JSON props column parsed ONCE
    with a typed schema (`from_json` — JVM-side, codegen'd, Jackson
    under the hood; never a Python UDF) and aggregated per type.
    `get_json_object` would re-parse the string per extracted field —
    with a typed struct, N fields cost one parse. Malformed/missing
    keys become NULL and drop out of the aggregates in both engines."""
    events = _read(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


_EVENT_UNPIVOT_SQL = r"""
WITH wide AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
  FROM events GROUP BY user_id)
SELECT user_id, kind, n FROM (
  SELECT user_id, 'n_click' AS kind, n_click AS n FROM wide
  UNION ALL
  SELECT user_id, 'n_purchase' AS kind, n_purchase AS n FROM wide)"""


@_q("event_unpivot", _EVENT_UNPIVOT_SQL)
def q_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, the melt inverse of `event_pivot`): Spark's
    native `unpivot` compiles to a single Expand — one pass, row count
    × number of value columns, no self-union re-scan (the oracle's
    UNION ALL shape would scan the wide table once per column at
    scale)."""
    events = _read(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
        )
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_click", "n_purchase"],
        variableColumnName="kind",
        valueColumnName="n",
    )


_SCD2_SQL = r"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type AS state,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM o),
i AS (
  SELECT user_id, state, CAST(island AS BIGINT) AS island,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM g GROUP BY user_id, state, island)
SELECT user_id, state, island, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
         AS valid_to,
       n_events
FROM i"""


@_q("scd2_state_history", _SCD2_SQL)
def q_scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history built from an event
    log: collapse each user's consecutive runs of the same state into
    validity intervals [valid_from, valid_to) — the gaps-and-islands
    pattern (change flag via lag → running sum numbers the islands →
    per-island aggregate → lead stitches the end timestamps). NULL
    valid_to marks the open current row. Every window is partitioned
    by user (no global sort); island, not valid_from, orders the lead
    so tied timestamps across adjacent islands stay deterministic."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("state").over(w)
    o = events.select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    ).withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("state")), 1).otherwise(0),
    )
    g = o.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    i = g.groupBy("user_id", "state", F.col("island").cast("long").alias("island")).agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("island")
    return i.select(
        "user_id",
        "state",
        "island",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


_REVENUE_ROLLUP_SQL = r"""
WITH j AS (
  SELECT r_name, n_name,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round((1 - l_discount) * 10000, 0) AS BIGINT) AS rev_i
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01')
SELECT r_name, n_name,
       CAST(sum(rev_i) AS BIGINT) AS revenue_i,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(GROUPING(r_name, n_name) AS INT) AS gid
FROM j GROUP BY ROLLUP (r_name, n_name)"""


@_q("revenue_rollup", _REVENUE_ROLLUP_SQL)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region → nation → grand total) over the
    Q5-shaped join tree: date predicate pushed to the orders scan,
    dimensions broadcast, then ONE Expand feeding a single hash
    aggregate emits all three grouping levels — no per-level re-scan.
    Revenue accumulates exactly in integer (cents × basis-points);
    grouping_id disambiguates subtotal NULLs."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region")
    rev_i = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * F.round(
        (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name", rev_i.alias("rev_i"))
    )
    return j.rollup("r_name", "n_name").agg(
        F.sum("rev_i").alias("revenue_i"),
        F.count("*").alias("n_items"),
        F.grouping_id().cast("int").alias("gid"),
    )


_APPROX_DISTINCT_SQL = r"""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_ok, TRUE AS acd_ok, TRUE AS merge_ok
FROM events GROUP BY event_type"""


@_q("approx_distinct", _APPROX_DISTINCT_SQL)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counts — the scale path for
    COUNT(DISTINCT) (exact form shuffles every value; HLL ships
    KB-size mergeable registers). Emits the exact count plus
    deterministic within-bound booleans for the HLL and
    approx_count_distinct estimates, and `merge_ok` proving per-day
    sketches unioned per key estimate EXACTLY what the single-pass
    sketch does (register-max is associative — the continuous-rollup
    pattern). The oracle pins the exact counts and expects every
    boolean TRUE — approximate operators verified without the oracle
    reproducing the sketch."""
    from aqi_featurestore_spark.operators.approx import distinct_count_profile

    events = _read(spark, sf_dir, "events")
    return distinct_count_profile(
        events, ["event_type"], "user_id", day_col="ts", rel_bound=0.10
    )


_APPROX_QUANTILES_SQL = r"""
SELECT event_type,
       quantile_cont("value", 0.5)  AS q50,
       quantile_cont("value", 0.95) AS q95,
       TRUE AS q50_ok, TRUE AS q95_ok
FROM events GROUP BY event_type"""


@_q("approx_quantiles", _APPROX_QUANTILES_SQL)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (Spark `percentile` == DuckDB
    `quantile_cont` bit-for-bit) next to `approx_percentile`
    within-1% booleans — the mergeable-sketch quantile path graded
    against the exact sort-based answer."""
    from aqi_featurestore_spark.operators.approx import quantile_profile

    events = _read(spark, sf_dir, "events")
    return quantile_profile(events, ["event_type"], "value")


_RANGE_JOIN_SQL = r"""
SELECT w.o_orderkey,
       CAST(count(*) AS BIGINT) AS n_shipped,
       CAST(SUM(CAST(round(l.l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
         AS qty_c
FROM lineitem l
JOIN (SELECT o_orderkey, o_orderdate AS w_start,
             o_orderdate + INTERVAL 3 DAY AS w_end
      FROM orders WHERE o_orderpriority = '1-URGENT') w
  ON l.l_shipdate BETWEEN w.w_start AND w.w_end
GROUP BY w.o_orderkey"""


@_q("range_join_agg", _RANGE_JOIN_SQL)
def q_range_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment (range) join WITHOUT an equi-key: lineitems
    shipped inside each urgent order's 3-day window, aggregated per
    window. Naively this is a theta join (BroadcastNestedLoopJoin /
    cartesian — dead at 100 TB); ``operators.range_join`` rewrites it as
    bucketed expansion + equi-join + residual filter, so the physical
    plan is an ordinary shuffled join on fixed-width bucket keys with
    ≤2× replication of the interval side (width = span).

    Because COUNT/SUM are algebraic and the point column is day-grained,
    the aggregation is pushed BELOW the range join: lineitems collapse to
    per-shipdate partials first (~|distinct dates| rows, map-side
    combinable), the range join matches dates→windows, and the final agg
    merges partials. At sf0.1 this cuts the join's left side from ~600k
    rows × ~35 matching windows each (~20M intermediate rows) to ~2.5k
    date rows — same answer, and the ratio only improves with scale.
    Quantity sums accumulate in integer cents, cast once at the end."""
    from aqi_featurestore_spark.operators.range_join import range_join_time

    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    windows = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("w_end"),
    )
    daily = lineitem.groupBy("l_shipdate").agg(
        F.count("*").alias("__n"),
        F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("__qty_c"),
    )
    joined = range_join_time(
        daily,
        windows,
        point="l_shipdate",
        start="w_start",
        end="w_end",
        bucket_width_seconds=3 * 86_400,
    )
    return joined.groupBy("o_orderkey").agg(
        F.sum("__n").alias("n_shipped"),
        F.sum("__qty_c").alias("qty_c"),
    )


_ATTRIBUTION_SQL = r"""
WITH p AS (
  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM events WHERE event_type = 'click'),
cand AS (
  SELECT p.purchase_id, c.click_id, c.click_ts,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
  FROM p JOIN c
    ON p.user_id = c.user_id
   AND c.click_ts <= p.purchase_ts
   AND c.click_ts >= p.purchase_ts - INTERVAL '1 hour')
SELECT p.purchase_id, p.user_id, p.purchase_ts, x.click_id, x.click_ts
FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) x
  ON p.purchase_id = x.purchase_id"""


@_q("attribution_join", _ATTRIBUTION_SQL)
def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the most recent
    click by the same user within the preceding hour — the flagship
    as-of join (J1) applied to a second domain (same operator, same
    max_by aggregation plan, TTL = attribution window; filters push to
    the scan). Purchases with no qualifying click keep NULL clicks."""
    from aqi_featurestore_spark.operators.pit_join import point_in_time_join

    ev = _read(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return point_in_time_join(
        purchases,
        clicks,
        keys=["user_id"],
        event_ts="purchase_ts",
        feature_ts="click_ts",
        feature_cols=["click_id"],
        tie_break=["click_id"],
        ttl=timedelta(hours=1),
    )


_SLIDING_SQL = r"""
WITH e AS (
  SELECT user_id, ts, time_bucket(INTERVAL '15 minutes', ts) AS tb,
         CAST(round("value" * 100, 0) AS BIGINT) AS v
  FROM events)
SELECT tb - (k * INTERVAL '15 minutes') AS window_start,
       tb - (k * INTERVAL '15 minutes') + INTERVAL '1 hour' AS window_end,
       user_id, count(*) AS n_obs, CAST(SUM(v) AS BIGINT) AS sum_value_c
FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) ks
GROUP BY 1, 2, 3"""


@_q("sliding_windows", _SLIDING_SQL)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 1 h length, 15 min hop — the third
    windowing family next to tumbling (`hourly_rollup`) and session
    (`session_windows`). Each event lands in exactly window/hop = 4
    windows; the oracle replicates rows via unnest(range(4)) off the
    15-minute bucket. Works identically on a stream with a watermark."""
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "n_obs",
            "sum_value_c",
        )
    )


_CUBE_SQL = r"""
WITH e AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(round("value" * 100, 0) AS BIGINT) AS v
  FROM events)
SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(v) AS BIGINT) AS sum_value_c,
       CAST(GROUPING(event_type, day) AS INT) AS gid
FROM e GROUP BY CUBE (event_type, day)"""


@_q("daily_cube", _CUBE_SQL)
def q_daily_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup over (event_type, day): all four grouping sets in one
    pass (Spark's Expand feeds a single hash aggregate — no re-scan per
    set). grouping_id disambiguates subtotal rows from natural NULLs;
    integer centi-sums keep values order-independent."""
    events = _read(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    return e.cube("event_type", "day").agg(
        F.count("*").alias("n_obs"),
        F.sum("v").alias("sum_value_c"),
        F.grouping_id().cast("int").alias("gid"),
    )


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN "{c}" IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT "{c}") AS BIGINT) AS n_distinct FROM events"""
    for c in _PROFILE_COLS
)


@_q("table_profile", _PROFILE_SQL)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training data audit: per-column completeness + exact
    cardinality over events. One pruned single-column scan per branch —
    never the multi-count_distinct Expand; approx_count_distinct is the
    documented full-scale variant."""
    from aqi_featurestore_spark.operators.profile import column_profile

    return column_profile(_read(spark, sf_dir, "events"), _PROFILE_COLS)


_SKEW_JOIN_SQL = """
WITH fact AS (
  SELECT CASE WHEN user_id % 20 <> 0 THEN 'hot'
              ELSE CAST(user_id AS VARCHAR) END AS k,
         "value"
  FROM events CROSS JOIN (SELECT unnest(range(30)) AS rep)),
dim AS (
  SELECT k, CAST(length(k) AS INT) AS klen
  FROM (SELECT DISTINCT CASE WHEN user_id % 20 <> 0 THEN 'hot'
                             ELSE CAST(user_id AS VARCHAR) END AS k
        FROM events))
SELECT f.k, count(*) AS n_rows,
       CAST(SUM(CAST(round(f."value" * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_c,
       max(d.klen) AS klen
FROM fact f JOIN dim d ON f.k = d.k
GROUP BY f.k"""


def _skewed_fact_dim(spark: SparkSession, sf_dir: str):
    """~95% of fact rows share ONE key ('hot'), replicated x30 — the
    hot-key shape AQE's skew split does not catch at small partition
    sizes. The dim derives from the un-exploded events (cheap distinct)
    and carries a merge-join hint so the measured join is the shuffle
    join a 100 TB non-broadcastable dim would force."""
    events = _read(spark, sf_dir, "events")
    k = F.when(F.col("user_id") % 20 != 0, F.lit("hot")).otherwise(
        F.col("user_id").cast("string")
    )
    fact = (
        events.select(k.alias("k"), "value")
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(29))))
        .drop("rep")
    )
    dim = (
        events.select(k.alias("k"))
        .distinct()
        .select("k", F.length("k").alias("klen"))
    )
    return fact, dim.hint("merge")


def _skew_join_agg(joined: DataFrame) -> DataFrame:
    return joined.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_c"),
        F.max("klen").alias("klen"),
    )


@_q("skew_join_plain", _SKEW_JOIN_SQL)
def q_skew_join_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline for the skew pair: plain sort-merge join on the hot key —
    one reducer sorts ~90% of the fact side."""
    fact, dim = _skewed_fact_dim(spark, sf_dir)
    return _skew_join_agg(fact.join(dim, "k"))


@_q("skew_join_salted", _SKEW_JOIN_SQL)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted variant of the same join (operators/skew.py): fact salted
    deterministically, dim replicated per salt, join on (k, salt) —
    row-identical output (same oracle), hot key spread over 8 reducers.
    The bench pairs this with skew_join_plain so the skew claim carries
    a measured number."""
    from aqi_featurestore_spark.operators.skew import salted_equi_join

    fact, dim = _skewed_fact_dim(spark, sf_dir)
    return _skew_join_agg(salted_equi_join(fact, dim, ["k"], salt_buckets=8))


def _ema_sql(alpha: float = 0.3) -> str:
    # beta is computed in Python and embedded via repr so both engines
    # multiply by the SAME double (1.0 - 0.3 != literal 0.7 in IEEE).
    return f"""
WITH {_FEAT_CTE},
vals AS (
  SELECT entity_id,
         list(aqi ORDER BY feature_timestamp, event_id) AS vs,
         count(aqi) AS n_obs,
         max(feature_timestamp) AS last_ts
  FROM feat WHERE aqi IS NOT NULL
  GROUP BY entity_id)
SELECT entity_id,
       list_reduce(vs, (acc, v) -> {alpha!r} * v + {(1.0 - alpha)!r} * acc) AS ema,
       n_obs, last_ts
FROM vals"""


@_q("ema_features", _ema_sql())
def q_ema_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST-family in batch mode: per-entity exponential moving average of
    AQI in event-time order — the exact sequential fold the stateful
    streaming operator (streaming/stateful.py running_aqi_ema) maintains
    incrementally; DuckDB replays it with list_reduce over the per-key
    ordered value list. Seeds with the first value; ties break on
    event_id."""
    from aqi_featurestore_spark.streaming.stateful import batch_ema

    feat = pipeline.derive_features(_read(spark, sf_dir, "events"))
    return batch_ema(feat, alpha=0.3)


_LOCAL_TIME_SQL = """
SELECT event_id, ts,
       ts + INTERVAL 7 hours AS local_ts,
       CAST(hour(ts + INTERVAL 7 hours) AS INT) AS local_hour,
       CAST(day(ts + INTERVAL 7 hours) AS INT) AS local_day,
       CAST(dayofweek(ts + INTERVAL 7 hours) + 1 AS INT) AS "local_dayOfWeek"
FROM events"""


@_q("local_time_features", _LOCAL_TIME_SQL)
def q_local_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: UTC-stored timestamps -> Asia/Ho_Chi_Minh local components via
    from_utc_timestamp (SURVEY §7.3's 7-hour shift). The oracle hardcodes
    the +07:00 offset, which is exact for this zone (no DST since 1975) —
    so a wrong tz-database lookup on the Spark side would mismatch."""
    from aqi_featurestore_spark.functions.time_features import local_time_features

    events = _read(spark, sf_dir, "events")
    cols = local_time_features("ts")
    return events.select(
        "event_id",
        "ts",
        cols["local_ts"].alias("local_ts"),
        cols["local_hour"].alias("local_hour"),
        cols["local_day"].alias("local_day"),
        cols["local_dayOfWeek"].alias("local_dayOfWeek"),
    )


_VERSIONED_PIT_SQL = f"""
WITH {_FEAT_CTE},
{_SPINE_CTE},
v2src AS (
  SELECT entity_id, feature_timestamp, aqi * 2 AS aqi, day, event_id
  FROM feat WHERE event_id % 31 = 0),
c1 AS (
  SELECT * FROM (
    SELECT s.entity_id, s.event_timestamp, f.aqi, f.hour,
           row_number() OVER (
             PARTITION BY s.entity_id, s.event_timestamp
             ORDER BY f.feature_timestamp DESC, f.event_id DESC) AS rn
    FROM (SELECT DISTINCT entity_id, event_timestamp FROM spine) s
    JOIN feat f ON s.entity_id = f.entity_id
     AND f.feature_timestamp <= s.event_timestamp
     AND f.feature_timestamp >= s.event_timestamp - INTERVAL '7 days') t
  WHERE rn = 1),
c2 AS (
  SELECT * FROM (
    SELECT s.entity_id, s.event_timestamp, f.day,
           row_number() OVER (
             PARTITION BY s.entity_id, s.event_timestamp
             ORDER BY f.feature_timestamp DESC, f.event_id DESC) AS rn
    FROM (SELECT DISTINCT entity_id, event_timestamp FROM spine) s
    JOIN v2src f ON s.entity_id = f.entity_id
     AND f.feature_timestamp <= s.event_timestamp
     AND f.feature_timestamp >= s.event_timestamp - INTERVAL '1 day') t
  WHERE rn = 1)
SELECT sp.entity_id, sp.event_timestamp, c1.aqi, c1.hour, c2.day
FROM spine sp
LEFT JOIN c1 ON sp.entity_id = c1.entity_id AND sp.event_timestamp = c1.event_timestamp
LEFT JOIN c2 ON sp.entity_id = c2.entity_id AND sp.event_timestamp = c2.event_timestamp"""


@_q("versioned_pit_multiview", _VERSIONED_PIT_SQL)
def q_versioned_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 through the FeatureStore facade with TWO versioned views
    (reference feast/features/aqi_feature.py:17-45): v1 (aqi, hour,
    7-day TTL) and v2 (sparser history, doubled 'aqi', day, 1-day TTL)
    joined against one spine in a single get_historical_features call.
    Pins (a) per-view TTL masking — v2's short TTL NULLs rows v1 still
    fills — and (b) the first-view-wins collision rule: the requested
    v2:aqi must NOT override v1's values (oracle emits v1 aqi only)."""
    import tempfile

    from aqi_featurestore_spark.registry import FeatureView
    from aqi_featurestore_spark.store import FeatureStore

    events = _read(spark, sf_dir, "events")
    feat = pipeline.derive_features(events)
    store = FeatureStore(spark, tempfile.mkdtemp(prefix="aqi_fs_q_"))
    store.apply(
        FeatureView(
            name="aqi_v1",
            entities=("entity_id",),
            ttl=timedelta(days=7),
            features=(("aqi", "double"), ("hour", "int")),
            source="events",
        )
    )
    store.apply(
        FeatureView(
            name="aqi_v2",
            entities=("entity_id",),
            ttl=timedelta(days=1),
            features=(("aqi", "double"), ("day", "int")),
            source="events",
        )
    )
    store.write_offline("aqi_v1", feat)
    store.write_offline(
        "aqi_v2",
        feat.where(F.col("event_id") % 31 == 0).withColumn(
            "aqi", F.col("aqi") * 2
        ),
    )
    spine = pipeline.build_spine(events)
    return store.get_historical_features(
        spine,
        ["aqi_v1:aqi", "aqi_v1:hour", "aqi_v2:aqi", "aqi_v2:day"],
        tie_break=["event_id"],
    )


@_q("pit_join", f"{_PIT_CTES} SELECT * FROM pit")
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 flagship: point-in-time as-of join with 7d TTL; spine rows with
    no in-TTL history yield NULL features."""
    events = _read(spark, sf_dir, "events")
    feat = pipeline.derive_features(events)
    spine = pipeline.build_spine(events)
    return pipeline.historical_features(spine, feat, ttl=timedelta(days=7))


@_q(
    "training_set",
    f"""{_PIT_CTES},
valid AS (SELECT * FROM pit WHERE aqi IS NOT NULL),
lagged AS (
  SELECT entity_id, event_timestamp, aqi, hour, day, "dayOfWeek",
         lag(aqi, 1) OVER (
           PARTITION BY entity_id
           ORDER BY floor(epoch(event_timestamp)) + hour * 3600,
                    event_timestamp) AS last_hour_aqi
  FROM valid)
SELECT * FROM lagged WHERE last_hour_aqi IS NOT NULL""",
)
def q_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 full lifecycle: derive -> PIT join -> datetime reconstruction ->
    lag feature -> drop incomplete. The model-ready frame."""
    return pipeline.training_set(spark, sf_dir)


@_q(
    "lag_features",
    """SELECT event_id, user_id, ts, "value",
       lag("value", 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev_value
FROM events""",
)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 in isolation: per-entity lag over event time."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id", "user_id", "ts", "value", F.lag("value", 1).over(w).alias("prev_value")
    )


@_q(
    "dedup_gate",
    """SELECT event_id, user_id, event_type FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events s
  WHERE s.event_type = 'signup' AND s.user_id = e.user_id)""",
)
def q_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/J3: the lineage existence gate as a left-anti join — keep rows
    whose key is absent from the existing set (one shuffle, not one
    COUNT(*) probe per row like the reference)."""
    events = _read(spark, sf_dir, "events")
    existing = events.where(F.col("event_type") == "signup")
    return append_if_absent(events, existing, ["user_id"]).select(
        "event_id", "user_id", "event_type"
    )


@_q(
    "online_lookup",
    f"""WITH {_FEAT_CTE},
snap AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY entity_id
        ORDER BY feature_timestamp DESC, event_id DESC) AS rn
    FROM feat) t WHERE rn = 1),
keys AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS entity_id FROM events
  UNION ALL SELECT '__missing__'),
mx AS (SELECT max(feature_timestamp) AS as_of FROM feat)
SELECT k.entity_id,
       CASE WHEN s.feature_timestamp >= mx.as_of - INTERVAL '7 days'
            THEN s.aqi END AS aqi,
       CASE WHEN s.feature_timestamp >= mx.as_of - INTERVAL '7 days'
            THEN s.hour END AS hour,
       CASE WHEN s.feature_timestamp >= mx.as_of - INTERVAL '7 days'
            THEN s."dayOfWeek" END AS "dayOfWeek",
       CASE WHEN s.feature_timestamp >= mx.as_of - INTERVAL '7 days'
            THEN s.feature_timestamp END AS feature_timestamp
FROM keys k CROSS JOIN mx
LEFT JOIN snap s ON k.entity_id = s.entity_id""",
)
def q_online_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/S15: get_online_features — key lookup against the latest-per-key
    snapshot; unknown keys -> NULLs; TTL(7d) enforced at read relative to
    the newest feature timestamp (deterministic as_of)."""
    events = _read(spark, sf_dir, "events")
    feat = pipeline.derive_features(events)
    snap = latest_per_key(feat, ["entity_id"], ts="feature_timestamp", tie_break=["event_id"])
    snap = snap.select("entity_id", "feature_timestamp", "aqi", "hour", "dayOfWeek")
    keys = (
        events.select(entity_key("user_id").alias("entity_id"))
        .distinct()
        .unionByName(spark.createDataFrame([("__missing__",)], "entity_id string"))
    )
    as_of = feat.agg(F.max("feature_timestamp").alias("__as_of"))
    rows = keys.crossJoin(F.broadcast(as_of))
    out = online_lookup(
        rows, snap, ["entity_id"], ts="feature_timestamp",
        ttl=timedelta(days=7), as_of=F.col("__as_of"),
    )
    return out.select("entity_id", "aqi", "hour", "dayOfWeek", "feature_timestamp")


# ---------------------------------------------------------------------------
# General analytics (bench headliners; TPC-H-shaped)
# ---------------------------------------------------------------------------

_Q1_SQL = """
WITH t AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity, 0) AS BIGINT)                AS qty_i,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)     AS price_i,
         CAST(round((1 - l_discount) * 10000, 0) AS BIGINT)  AS disc_i,
         CAST(round((1 + l_tax) * 10000, 0) AS BIGINT)       AS tax_i,
         CAST(round(l_discount * 10000, 0) AS BIGINT)        AS d_i
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00')
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(qty_i AS DECIMAL(38,0))) AS DOUBLE)                          AS sum_qty,
  CAST(SUM(CAST(price_i AS DECIMAL(38,0))) AS DOUBLE) / 100.0                AS sum_base_price,
  CAST(SUM(CAST(price_i * disc_i AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0   AS sum_disc_price,
  CAST(SUM(CAST(price_i * disc_i * tax_i AS DECIMAL(38,0))) AS DOUBLE)
    / 10000000000.0                                                          AS sum_charge,
  CAST(SUM(CAST(qty_i AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)               AS avg_qty,
  CAST(SUM(CAST(price_i AS DECIMAL(38,0))) AS DOUBLE) / 100.0 / COUNT(*)     AS avg_price,
  CAST(SUM(CAST(d_i AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 / COUNT(*)       AS avg_disc,
  COUNT(*) AS count_order
FROM t GROUP BY l_returnflag, l_linestatus"""


@_q("q1_pricing_summary", _Q1_SQL)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg with map-side partial aggregation.

    Money columns are 2-4dp decimals stored as doubles; we accumulate in
    exact integer space (scaled longs summed as DECIMAL(38,0) — per-row
    products stay < 2^63, group sums don't) and convert to DOUBLE with the
    same IEEE op sequence in both engines, so results are bit-identical
    regardless of summation order/parallelism — no rounding-tie risk that
    plain DECIMAL(scale 10)->DOUBLE casts have (engines disagree by 1 ulp
    on wide-decimal narrowing)."""
    l = _read(spark, sf_dir, "lineitem")
    qty_i = F.round(F.col("l_quantity"), 0).cast("long")
    price_i = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_i = F.round((F.lit(1) - F.col("l_discount")) * 10000, 0).cast("long")
    tax_i = F.round((F.lit(1) + F.col("l_tax")) * 10000, 0).cast("long")
    d_i = F.round(F.col("l_discount") * 10000, 0).cast("long")
    # Single-column sums stay LONG (qty_i<=1e2, price_i<=2e7, d_i<=1e4:
    # no overflow below ~1e11 rows/group); only the scaled *products*
    # (up to ~2e15 per row) need DECIMAL(38,0) accumulators. BigDecimal
    # aggregation is ~2.5x the cost of long sums — pay it only where the
    # range demands it.
    big = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (
        l.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_i).cast("double").alias("sum_qty"),
            (F.sum(price_i).cast("double") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(big(price_i * disc_i)).cast("double") / F.lit(1000000.0)).alias(
                "sum_disc_price"
            ),
            (F.sum(big(price_i * disc_i * tax_i)).cast("double") / F.lit(10000000000.0)).alias(
                "sum_charge"
            ),
            (F.sum(qty_i).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price_i).cast("double") / F.lit(100.0) / F.count("*")).alias("avg_price"),
            (F.sum(d_i).cast("double") / F.lit(10000.0) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "top_k_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders) t
WHERE rk <= 3""",
)
def q_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per key via ranking window (the serving-layer 'top orders per
    customer' shape); deterministic tie-break on the unique key."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions (BASELINE.json north star)
# ---------------------------------------------------------------------------


@_q(
    "dedup_exact_docs",
    """SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM documents d
JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) s
  ON d.doc_id = s.doc_id""",
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup over documents: survivor = min doc_id per
    distinct text (hash aggregation; see dedup_exact_by_hash for the
    100 TB shuffle-by-hash variant)."""
    d = _read(spark, sf_dir, "documents")
    return dedup_exact(d, ["text"], id_col="doc_id").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@_q(
    "text_stats",
    """SELECT doc_id, lang,
  CAST(length(text) AS INT) AS n_chars_calc,
  CAST(CASE WHEN trim(text) = '' THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
  CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS INT) AS n_punct
FROM documents""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: char/token/punctuation counts as native expressions
    (whitespace tokenizer; regex semantics chosen to agree across engines)."""
    d = _read(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_calc"),
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .alias("n_tokens"),
        F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).alias("n_punct"),
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions II: fingerprints, near-dedup, similarity,
# language/quality analysis
# ---------------------------------------------------------------------------


@_q(
    "doc_fingerprint",
    r"""SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of case/whitespace-normalized text) — the
    scale-friendly exact-dedup key."""
    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


@_q(
    "token_count_bpe",
    r"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INT)
         AS n_tokens_bpe
FROM documents""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation with an ASCII-explicit BPE-ish pattern."""
    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens_bpe"))


_LANG_HITS_SQL = """
  CAST((length(p) - length(replace(p, ' the ', ''))) / 5
     + (length(p) - length(replace(p, ' and ', ''))) / 5
     + (length(p) - length(replace(p, ' of ', ''))) / 4 AS INT)  AS en,
  CAST((length(p) - length(replace(p, ' der ', ''))) / 5
     + (length(p) - length(replace(p, ' und ', ''))) / 5
     + (length(p) - length(replace(p, ' die ', ''))) / 5 AS INT) AS de,
  CAST((length(p) - length(replace(p, ' el ', ''))) / 4
     + (length(p) - length(replace(p, ' que ', ''))) / 5
     + (length(p) - length(replace(p, ' los ', ''))) / 5 AS INT) AS es,
  CAST((length(p) - length(replace(p, ' le ', ''))) / 4
     + (length(p) - length(replace(p, ' les ', ''))) / 5
     + (length(p) - length(replace(p, ' est ', ''))) / 5 AS INT) AS fr"""

_LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, text, ' ' || lower(text) || ' ' AS p FROM documents),
hits AS (
  SELECT doc_id, lang, text, {_LANG_HITS_SQL},
         length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS cjk
  FROM t)
SELECT doc_id, lang,
  CASE WHEN cjk > 0 THEN 'zh'
       WHEN greatest(en, de, es, fr) <= 0 THEN 'und'
       WHEN en = greatest(en, de, es, fr) THEN 'en'
       WHEN de = greatest(en, de, es, fr) THEN 'de'
       WHEN es = greatest(en, de, es, fr) THEN 'es'
       ELSE 'fr' END AS lang_guess
FROM hits"""


@_q("lang_id", _LANG_ID_SQL)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: CJK presence else argmax of function-word
    marker hits, fixed tie precedence."""
    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id("text").alias("lang_guess"))


@_q(
    "quality_score",
    r"""WITH q AS (
  SELECT doc_id, text,
         CAST(length(text) AS INT) AS n_chars,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_tokens,
         ' ' || lower(text) || ' ' AS p
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
  length(regexp_replace(text, '[^0-9]', '', 'g'))
    / (CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE) END) AS digit_ratio,
  length(regexp_replace(text, '[^A-Z]', '', 'g'))
    / (CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE) END) AS upper_ratio,
  length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
    / (CASE WHEN n_chars > 0 THEN CAST(n_chars AS DOUBLE) END) AS punct_ratio,
  CAST((length(p) - length(replace(p, ' the ', ''))) / 5
     + (length(p) - length(replace(p, ' and ', ''))) / 5
     + (length(p) - length(replace(p, ' of ', ''))) / 4 AS INT)
    / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) END) AS stopword_ratio,
  CAST(n_chars AS DOUBLE)
    / (CASE WHEN n_tokens > 0 THEN CAST(n_tokens AS DOUBLE) END) AS avg_token_len
FROM q""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: exact counts + single NULL-safe divisions
    (deterministic across engines). Stopword ratio uses the en function-word
    markers (whole-word occurrence counts / token count)."""
    d = _read(spark, sf_dir, "documents")
    qf = quality_features("text")
    return d.select(
        "doc_id",
        qf["n_chars"].alias("n_chars"),
        qf["n_tokens"].alias("n_tokens"),
        qf["digit_ratio"].alias("digit_ratio"),
        qf["upper_ratio"].alias("upper_ratio"),
        qf["punct_ratio"].alias("punct_ratio"),
        qf["stopword_ratio"].alias("stopword_ratio"),
        qf["avg_token_len"].alias("avg_token_len"),
    )


_NGRAM_JACCARD_SQL = r"""
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
       CAST(inter AS DOUBLE) / (n1.n + n2.n - inter) AS jaccard
FROM inter
JOIN sizes n1 ON d1 = n1.doc_id
JOIN sizes n2 ON d2 = n2.doc_id
WHERE CAST(inter AS DOUBLE) / (n1.n + n2.n - inter) >= 0.2"""


@_q("ngram_jaccard_pairs", _NGRAM_JACCARD_SQL)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.2): shingle
    explode -> hash-key self-join -> count ratio. The documents corpus at
    test SFs fits executor memory, so the broadcast hint is set (the 100 TB
    default is the shuffle join)."""
    d = _read(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, k=3, threshold=0.2, broadcast=True)


_SIM_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)

# Unit-normalize once per vector (mirrors operators.similarity._normalized:
# cast-to-double, fold of squares from 0.0, sqrt, element divide — same IEEE
# op order as the Spark side so cos_sim agrees bit-for-bit).
_SIM_NORM_CTE = """
norm AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) /
           sqrt(list_reduce(
                  list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
                  (a, b) -> a + b))) AS v
  FROM embeddings)"""

_SIM_NORM_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)

_SIM_TOPK_SQL = f"""
WITH {_SIM_NORM_CTE},
q AS (SELECT vec_id AS q_id, v AS q_vec FROM norm WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q.q_id, c.vec_id AS n_id,
         round({_SIM_NORM_DOT.format(a='q.q_vec', b='c.v')}, 6) AS cos_sim
  FROM q CROSS JOIN norm c
  WHERE q.q_id <> c.vec_id)
SELECT q_id, n_id, cos_sim, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
      PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS rk
  FROM pairs) t
WHERE rk <= 10"""


@_q("similarity_topk_cosine", _SIM_TOPK_SQL)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for every 50th vector as query set:
    broadcast queries, JVM-side fold dot products, rank-before-round for
    stable cross-engine boundaries."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0)
    return cosine_topk_bruteforce(q, e, k=10)


@_q("minhash_lsh_dedup", approx_oracles.minhash_lsh_sql())
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16x4) near-dup candidate pairs with estimated
    Jaccard >= 0.3. The md5-affine hash scheme is portable, so the DuckDB
    oracle recomputes the signatures, buckets, and estimates bit-for-bit;
    pytest additionally pins planted-near-dup recall and agreement with
    exact n-gram Jaccard."""
    d = _read(spark, sf_dir, "documents")
    return minhash_dedup_pairs(d, threshold=0.3)


@_q("simhash_dedup", approx_oracles.simhash_sql())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) near-dup pairs within Hamming distance 3 via 4-band
    pigeonhole candidates. md5 token hashes + integer votes, so the
    oracle rebuilds identical fingerprints."""
    d = _read(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, max_hamming=3)


@_q("similarity_topk_lsh", approx_oracles.similarity_topk_lsh_sql())
def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-10 (16 planes, 4 bands): the scale path that
    replaces the cross product with a bucket join. Integer-quantized
    sketches make every sign bit oracle-reproducible; recall vs brute
    force is additionally measured in tests."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0)
    return cosine_topk_lsh(q, e, k=10)


_ANN_RECALL_SQL = f"""
WITH exact_tk AS ({_SIM_TOPK_SQL}),
lsh_tk AS ({approx_oracles.similarity_topk_lsh_sql()}),
hits AS (
  SELECT e.q_id, COUNT(l.n_id) AS n_hits
  FROM exact_tk e
  LEFT JOIN lsh_tk l ON e.q_id = l.q_id AND e.n_id = l.n_id
  GROUP BY e.q_id)
SELECT q_id, CAST(n_hits AS BIGINT) AS n_hits,
       round(CAST(n_hits AS DOUBLE) / 10, 6) AS recall_at_10
FROM hits"""


@_q("ann_recall", _ANN_RECALL_SQL)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the hyperplane-LSH ANN against the brute-force
    ground truth, per query vector — the evaluation harness that turns
    "approximate" from an assumption into a measured number (ANN without
    recall measurement is how silent quality regressions ship). Both
    legs are the exact plans served by their own registry entries; the
    overlap join runs on (q_id, n_id) pairs only.

    Scale shape: ground truth on a SAMPLE of queries is how this runs at
    100 TB (exact top-k per sampled query is O(corpus) per query, the
    accepted audit cost); the recall aggregate itself is k-bounded."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0)
    exact_tk = cosine_topk_bruteforce(q, e, k=10).select("q_id", "n_id")
    lsh_tk = cosine_topk_lsh(q, e, k=10).select(
        F.col("q_id").alias("l_q"), F.col("n_id").alias("l_n")
    )
    hits = (
        exact_tk.join(
            lsh_tk,
            (F.col("q_id") == F.col("l_q")) & (F.col("n_id") == F.col("l_n")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("l_n").alias("n_hits"))
    )
    return hits.select(
        "q_id",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / 10, 6).alias("recall_at_10"),
    )


_EMB_COS_PAIRS_SQL = f"""
WITH {_SIM_NORM_CTE},
pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2,
         round({_SIM_NORM_DOT.format(a='a.v', b='b.v')}, 6) AS cos_sim
  FROM norm a JOIN norm b ON a.vec_id < b.vec_id)
SELECT d1, d2, cos_sim FROM pairs WHERE cos_sim >= 0.4"""


@_q("embedding_cosine_dedup", _EMB_COS_PAIRS_SQL)
def q_embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs, threshold 0.4);
    the LSH-prefiltered scale variant is embedding_cosine_dedup_lsh."""
    e = _read(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(e, threshold=0.4)


@_q("embedding_cosine_dedup_lsh", approx_oracles.embedding_cosine_lsh_sql())
def q_embedding_cosine_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dedup: hyperplane-sketch band join
    replaces the O(n^2) pair scan; exact cosine rescoring on candidates.
    32 planes / 4 bands = 8-bit bands (256 buckets each) — selective
    enough that candidates stay a small fraction of all pairs. The
    integer sketch is oracle-reproducible; recall vs the exact variant is
    pinned in tests/test_llm_ops.py."""
    e = _read(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(e, threshold=0.4, lsh=True, n_planes=32, bands=4)


def _media_view(d: DataFrame) -> DataFrame:
    """Documents dressed as a schemas.MEDIA-shaped table: payload =
    UTF-8 bytes of text, kind cycles image/audio/video by doc_id,
    duration_ms = 10 ms per char for 'video' rows."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 2, F.col("n_chars") * 10)
        .cast("long")
        .alias("duration_ms"),
    )


_MM_FEATURES_SQL = r"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         md5(text) AS hex, octet_length(encode(text)) AS n_bytes
  FROM documents)
SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
       CAST(i AS INT) AS feat_idx,
       (16 * (strpos('0123456789abcdef', substr(hex, 2*i+1, 1)) - 1)
           + (strpos('0123456789abcdef', substr(hex, 2*i+2, 1)) - 1)) / 256.0
         AS feat_value
FROM m CROSS JOIN range(0, 8) AS t(i)"""


@_q("multimodal_features", _MM_FEATURES_SQL)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/featurize plumbing over mapInPandas: opaque binary
    payloads -> deterministic stub features (md5-seeded; the oracle
    reproduces the digest math hex-digit by hex-digit). Exploded to scalar
    rows so the value hash is engine-neutral."""
    m = _media_view(_read(spark, sf_dir, "documents"))
    feats = extract_media_features(m, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("feat_idx", "feat_value"),
    )


_FRAME_SAMPLE_SQL = r"""
WITH v AS (
  SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2),
fr AS (
  SELECT media_id, unnest(range(0, duration_ms // 1000)) AS i FROM v)
SELECT media_id, CAST(i AS INT) AS frame_idx, CAST(i * 1000 AS INT) AS frame_ts_ms
FROM fr"""


@_q("frame_sample", _FRAME_SAMPLE_SQL)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp,
    derived from metadata only (explode-by-metadata keeps the stubbed
    decode row-parallel)."""
    m = _media_view(_read(spark, sf_dir, "documents"))
    return frame_sample_plan(m, every_ms=1000)


@_q("similarity_topk_ivf", approx_oracles.similarity_topk_ivf_sql())
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 (16 lists, 4 probes). Seeded deterministic
    centroids + integer-quantized distances make assignment and probing
    oracle-reproducible in SQL; the k-means centroid mode (production
    default, capped driver sample) keeps its recall-vs-brute-force pin
    in tests/test_llm_ops.py."""
    e = _read(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0)
    return cosine_topk_ivf(q, e, k=10, n_lists=16, n_probe=4, centroids="seeded")


_REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(SUM(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round((1 - l_discount) * 10000, 0) AS BIGINT)
                AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name"""


@_q("revenue_by_nation", _REVENUE_BY_NATION_SQL)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join aggregate: fact scan with a pushed date
    predicate, dimension joins broadcast (region/nation/customer are tiny
    next to lineitem), decimal-exact revenue accumulation. The shape that
    exercises AQE join planning at 100 TB."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev_i = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 10000, 0).cast("long")
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        (F.sum(rev_i.cast("decimal(38,0)")).cast("double") / 1000000.0).alias("revenue"),
        F.count("*").alias("n_items"),
    )


_SESSION_SQL = r"""
WITH o AS (
  SELECT user_id, ts, CAST(round("value" * 100, 0) AS BIGINT) AS v FROM events),
m AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       user_id, count(*) AS n_obs, CAST(SUM(v) AS BIGINT) AS sum_value_c
FROM s GROUP BY user_id, sid"""


@_q("session_windows", _SESSION_SQL)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap 30 min) over the event stream; the oracle is
    the classic gaps-and-islands formulation. New session iff
    ts - prev_ts >= gap, matching session_window's half-open [start, end)
    merge rule."""
    from aqi_featurestore_spark.streaming.jobs import sessionized_activity

    events = _read(spark, sf_dir, "events")
    return sessionized_activity(events, gap="30 minutes")


_SESSION_REL_SQL = r"""
WITH m AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT event_id, user_id, CAST(sid AS BIGINT) AS sid,
       CAST(row_number() OVER ws AS INT) AS pos_in_session,
       CAST(epoch_us(ts) - epoch_us(min(ts) OVER ws2) AS BIGINT)
         AS us_into_session
FROM s
WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id),
       ws2 AS (PARTITION BY user_id, sid)"""


@_q("session_relative_features", _SESSION_REL_SQL)
def q_session_relative_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session-relative features (the row-level complement of
    the per-session `session_windows` aggregate): session ordinal per
    user, position within the session, and integer-microsecond offset
    from session start. The standard gaps-and-islands composite — lag
    gap flag -> running-sum session id -> per-session windows.

    Scale shape: all four windows partition by user_id (the two
    session-scoped ones by (user_id, sid), a refinement) — Spark plans
    ONE exchange on user_id and sorts once per window ordering; no
    global windows, no joins. Time math is integer microseconds end to
    end."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_s = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
               >= 1_800_000_000),
            1,
        ).otherwise(0)
    )
    s = e.select("event_id", "user_id", "ts", new_s.alias("new_s")).withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy(F.asc("ts"), F.asc("event_id"))
    ws2 = Window.partitionBy("user_id", "sid")
    return s.select(
        "event_id",
        "user_id",
        F.col("sid").cast("long").alias("sid"),
        F.row_number().over(ws).cast("int").alias("pos_in_session"),
        (us - F.min(us).over(ws2)).cast("long").alias("us_into_session"),
    )


# -- Hyperfunction family (TimescaleDB-style continuous analytics) ----------

_TWAP_SQL = r"""
WITH o AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, ts,
         CAST(round("value" * 100, 0) AS BIGINT) AS vc
  FROM events),
seg AS (
  SELECT user_id, day, vc,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
  FROM o WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, vc)),
agg AS (
  SELECT user_id, day,
         COUNT(*) AS n_segments,
         CAST(SUM(vc * dur_us) AS BIGINT) AS sum_prod,
         CAST(SUM(dur_us) AS BIGINT) AS total_us
  FROM seg WHERE dur_us IS NOT NULL
  GROUP BY user_id, day
  HAVING SUM(dur_us) > 0)
SELECT user_id, day, n_segments,
       round(CAST(sum_prod AS DOUBLE) / total_us / 100, 6) AS twap
FROM agg"""


@_q("time_weighted_avg", _TWAP_SQL)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per (entity, day) — the TimescaleDB
    `time_weight('LOCF')` hyperfunction: each observation's value is
    held until the next one, so the average weights values by how LONG
    they were current, not how OFTEN they were sampled (a plain avg
    over-counts bursts). The integral accumulates exactly —
    centi-value x integer-microsecond products summed as BIGINT — with
    the single final division the only float op.

    Scale shape: one window (lead) per (entity, day) partition, then a
    hash aggregate on the same key — one exchange total."""
    e = _read(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100, 0).cast("long")
    o = e.select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"), "ts", vc.alias("vc")
    )
    w = Window.partitionBy("user_id", "day").orderBy(F.asc("ts"), F.asc("vc"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lead_us = F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
    seg = o.select("user_id", "day", "vc", (lead_us - us).alias("dur_us"))
    agg = (
        seg.where(F.col("dur_us").isNotNull())
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.col("vc") * F.col("dur_us")).alias("sum_prod"),
            F.sum("dur_us").alias("total_us"),
        )
        .where(F.col("total_us") > 0)
    )
    return agg.select(
        "user_id", "day", "n_segments",
        F.round(
            F.col("sum_prod").cast("double") / F.col("total_us") / 100, 6
        ).alias("twap"),
    )


_COUNTER_RATE_SQL = r"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CAST(round("value" * 100, 0) AS BIGINT) AS vc
  FROM events),
d AS (
  SELECT user_id, vc - lag(vc) OVER w AS delta
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
span AS (
  SELECT user_id, epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
  FROM o GROUP BY user_id HAVING epoch_us(max(ts)) - epoch_us(min(ts)) > 0)
SELECT d.user_id,
       CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
         AS increase_c,
       round(CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS DOUBLE)
             / s.span_us * 1000000, 6) AS rate_c_per_sec
FROM d JOIN span s ON d.user_id = s.user_id
WHERE delta IS NOT NULL
GROUP BY d.user_id, s.span_us"""


@_q("counter_rate", _COUNTER_RATE_SQL)
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-agg rate (the monitoring hyperfunction): treat the value
    as a cumulative counter per entity; negative deltas are RESETS
    (process restarts) counted separately, and the rate is the sum of
    positive deltas over the observation span — the semantics of
    PromQL's `rate()` / Timescale's `counter_agg`. Integer centi-deltas
    end to end; one division per entity.

    Scale shape: one lag window per entity partition + a hash aggregate
    on the same key; the span aggregate broadcasts back (entity-domain
    sized)."""
    e = _read(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100, 0).cast("long")
    o = e.select("user_id", "ts", "event_id", vc.alias("vc"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    d = o.select(
        "user_id", (F.col("vc") - F.lag("vc").over(w)).alias("delta")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = (
        o.groupBy("user_id")
        .agg((F.max(us) - F.min(us)).alias("span_us"))
        .where(F.col("span_us") > 0)
    )
    inc = F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0))
    return (
        d.where(F.col("delta").isNotNull())
        .join(F.broadcast(span), "user_id")
        .groupBy("user_id", "span_us")
        .agg(
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).alias("n_resets"),
            inc.alias("increase_c"),
            F.round(
                inc.cast("double") / F.col("span_us") * 1_000_000, 6
            ).alias("rate_c_per_sec"),
        )
        .drop("span_us")
        .select("user_id", "n_resets", "increase_c", "rate_c_per_sec")
    )


_LOCF_SQL = r"""
WITH o AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket, ts, event_id,
         CAST(round("value" * 100, 0) AS BIGINT) AS vc
  FROM events),
pb AS (
  SELECT bucket, vc AS last_vc FROM (
    SELECT *, row_number() OVER (
        PARTITION BY bucket ORDER BY ts DESC, event_id DESC) AS rn
    FROM o) t WHERE rn = 1),
bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM pb),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bucket
  FROM bounds)
SELECT s.bucket, pb.last_vc AS carried_vc,
       CAST(CASE WHEN pb2.bucket IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM spine s
ASOF LEFT JOIN pb ON s.bucket >= pb.bucket
LEFT JOIN pb pb2 ON s.bucket = pb2.bucket"""


@_q("locf_gap_fill", _LOCF_SQL)
def q_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF interpolation onto a dense 5-minute spine: every empty
    bucket carries the last observed bucket's final value forward
    (Timescale `locf()` / the standard sensor-panel gap fill), with
    ``is_gap`` marking fabricated rows. The oracle is DuckDB's native
    ASOF JOIN — the Spark side expresses the same as-of semantics with
    a last-non-null window over the spine.

    Scale shape: the per-bucket last-value reduction is the only
    fact-proportional work (one window per bucket partition). The spine
    and the carried-forward window are O(time-range) — a bounded domain
    (8.6k rows per month at 5-minute grain, 53k for 6 years of hours) —
    so the single-partition LOCF window over the spine is deliberate
    and safe, same as gap_filled_hourly's spine."""
    e = _read(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    step = 300_000_000  # 5 minutes in µs
    bucket = F.timestamp_micros(
        (F.floor(us / F.lit(step)) * F.lit(step)).cast("long")
    )
    vc = F.round(F.col("value") * 100, 0).cast("long")
    o = e.select(bucket.alias("bucket"), "ts", "event_id", vc.alias("vc"))
    wb = Window.partitionBy("bucket").orderBy(F.desc("ts"), F.desc("event_id"))
    pb = (
        o.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select("bucket", F.col("vc").alias("last_vc"))
    )
    bounds = pb.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))
        ).alias("bucket")
    )
    joined = spine.join(pb, "bucket", "left")
    w_locf = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.last("last_vc", ignorenulls=True).over(w_locf).alias("carried_vc"),
        F.when(F.col("last_vc").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
    )


_ROLLUP_CASCADE_SQL = r"""
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
         COUNT(*) AS n,
         CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         MAX(CAST(round("value" * 100, 0) AS BIGINT)) AS mx
  FROM events GROUP BY 1, 2),
daily AS (
  SELECT user_id, CAST(h AS DATE) AS d,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
         MAX(mx) AS mx
  FROM hourly GROUP BY 1, 2),
monthly AS (
  SELECT user_id, strftime(d, '%Y-%m') AS month,
         CAST(SUM(n) AS BIGINT) AS n_obs, CAST(SUM(s) AS BIGINT) AS sum_value_c,
         MAX(mx) AS max_value_c
  FROM daily GROUP BY 1, 2)
SELECT user_id, month, n_obs, sum_value_c, max_value_c FROM monthly"""


@_q("rollup_cascade", _ROLLUP_CASCADE_SQL)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup CASCADE: monthly aggregates derived from
    daily, derived from hourly, derived from raw — never re-reading the
    raw events for the coarser grains. Legal exactly because every
    aggregate here is MERGEABLE (counts/sums/max in exact integer
    centi-units); this is the continuous-aggregate / materialized-rollup
    maintenance pattern, where each grain is a stored table refreshed
    from the grain below at a fraction of the raw-scan cost.

    Scale shape: the only raw-data pass is the hourly aggregate (one
    map-combined shuffle on (user, hour)); each subsequent grain
    reduces the previous one's already-small output. The oracle
    recomputes the same cascade — and `hourly_rollup`'s independent
    direct-from-raw query pins the base grain."""
    e = _read(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100, 0).cast("long")
    hourly = (
        e.select("user_id", F.date_trunc("hour", "ts").alias("h"), vc.alias("vc"))
        .groupBy("user_id", "h")
        .agg(F.count("*").alias("n"), F.sum("vc").alias("s"), F.max("vc").alias("mx"))
    )
    daily = (
        hourly.withColumn("d", F.col("h").cast("date"))
        .groupBy("user_id", "d")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"), F.max("mx").alias("mx"))
    )
    return (
        daily.withColumn("month", F.date_format("d", "yyyy-MM"))
        .groupBy("user_id", "month")
        .agg(
            F.sum("n").alias("n_obs"),
            F.sum("s").alias("sum_value_c"),
            F.max("mx").alias("max_value_c"),
        )
        .select("user_id", "month", "n_obs", "sum_value_c", "max_value_c")
    )


def _rocchio_sql() -> str:
    """Oracle for nearest-centroid classification. Centroid means
    accumulate as exact integer micro-units; BOTH the unit-normalized
    vector and the unit-normalized centroid are then re-quantized to
    1e6 integer micro-units, so the scoring dot is an exact,
    order-free BIGINT sum (a float dot under a GROUP BY would depend on
    each engine's scan order). cos_sim := dot_q / 1e12 rounded to 6."""
    return """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         unnest(list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))) AS vc
  FROM embeddings),
cent AS (
  SELECT label, dim,
         CAST(SUM(vc) AS DOUBLE) / (COUNT(*) * 1000000.0) AS c
  FROM ex GROUP BY label, dim),
cnorm AS (
  SELECT label, sqrt(SUM(c * c)) AS nrm FROM cent GROUP BY label),
cu AS (
  SELECT c.label, c.dim,
         CAST(floor(c.c / n.nrm * 1000000) AS BIGINT) AS cq
  FROM cent c JOIN cnorm n ON c.label = n.label),
vn AS (
  SELECT vec_id, label AS true_label,
         generate_subscripts(embedding, 1) AS dim,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE) /
           sqrt(list_reduce(list_transform(embedding,
               y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), (p, q) -> p + q))))
           AS vv
  FROM embeddings),
vq AS (
  SELECT vec_id, true_label, dim,
         CAST(floor(vv * 1000000) AS BIGINT) AS vq
  FROM vn),
scored AS (
  SELECT v.vec_id, v.true_label, c.label AS cand,
         CAST(SUM(v.vq * c.cq) AS BIGINT) AS dot_q
  FROM vq v JOIN cu c ON v.dim = c.dim
  GROUP BY v.vec_id, v.true_label, c.label),
pick AS (
  SELECT vec_id, true_label, cand AS pred_label,
         round(CAST(dot_q AS DOUBLE) / 1000000000000, 6) AS cos_sim,
         row_number() OVER (
             PARTITION BY vec_id ORDER BY dot_q DESC, cand ASC) AS rn
  FROM scored)
SELECT vec_id, CAST(pred_label AS INT) AS pred_label, cos_sim,
       CAST(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END AS INT)
         AS correct
FROM pick WHERE rn = 1"""


@_q("rocchio_classify", _rocchio_sql())
def q_rocchio_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification: every vector assigned
    to the label whose mean-vector centroid it is most cosine-similar
    to — the third classical classifier next to kNN voting
    (`knn_label_vote`) and graph spreading (`label_spreading`).
    Centroid means accumulate as exact integer micro-units; the scoring
    dot re-quantizes BOTH unit vectors to 1e6 micro-units so it is an
    exact order-free BIGINT sum (a float dot under a hash aggregate
    would depend on partial-aggregation order); argmax on the integer
    dot, ties -> smallest label.

    Scale shape: the centroid build is `label_centroids`'s exploded
    hash aggregate (|labels| x dim rows); the classification is a map
    side cosine against the BROADCAST centroid matrix (|labels| x dim
    literals — dim-bounded, corpus-independent); one rank window per
    vector over |labels| rows. Vectors never shuffle."""
    from aqi_featurestore_spark.operators.embeddings import label_centroids

    e = _read(spark, sf_dir, "embeddings")
    cent = label_centroids(e)  # (label, dim, centroid double, n)
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("centroid") * F.col("centroid"))).alias("nrm")
    )
    cu = cent.join(cnorm, "label").select(
        F.col("label").alias("cand"),
        "dim",
        F.floor(F.col("centroid") / F.col("nrm") * 1_000_000).cast("long").alias("cq"),
    )
    from aqi_featurestore_spark.operators.similarity import _normalized_arrow

    vn = e.select(
        "vec_id",
        F.col("label").alias("true_label"),
        _normalized_arrow("embedding").alias("v"),
    )
    # explode each vector against the broadcast centroid rows on dim;
    # both sides quantized, so the dot is an exact integer sum
    vdim = vn.select(
        "vec_id", "true_label", F.posexplode("v").alias("dim0", "vv")
    ).select(
        "vec_id", "true_label", F.col("dim0").alias("dim"),
        F.floor(F.col("vv") * 1_000_000).cast("long").alias("vq"),
    )
    scored = (
        vdim.join(F.broadcast(cu), "dim")
        .groupBy("vec_id", "true_label", "cand")
        .agg(F.sum(F.col("vq") * F.col("cq")).alias("dot_q"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot_q"), F.asc("cand"))
    return (
        scored.select(
            "vec_id", "true_label",
            F.col("cand").alias("pred_label"),
            F.round(F.col("dot_q").cast("double") / 1_000_000_000_000, 6).alias("cos_sim"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("pred_label").cast("int").alias("pred_label"),
            "cos_sim",
            (F.col("pred_label") == F.col("true_label")).cast("int").alias("correct"),
        )
    )


_DOC_KEYWORDS_SQL = r"""
WITH tokv AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tokv GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         round(t.tf * ln(CAST(nd.n AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf t JOIN df d ON t.token = d.token CROSS JOIN nd)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rk
  FROM scored) t
WHERE rk <= 3"""


@_q("doc_keywords", _DOC_KEYWORDS_SQL)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tokens by tf-idf per doc
    (ties: token asc) — the row-level complement of the corpus-global
    `tfidf_top_terms`, and what a retrieval/tagging pipeline actually
    stores per document. Same float discipline: one ln() per (doc,
    token) with pinned operand order, rounded BEFORE the per-doc rank.

    Scale shape: tf is a (doc, token) hash aggregate; df joins back on
    the token key (AQE splits stopword skew); the rank window partitions
    by doc_id — millions of small partitions, never a global sort. The
    1-row doc count broadcasts."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "token", "tf", "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.select(
            "doc_id", "token", "tf", "df", "tfidf",
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


_STAR_EXPORT_SQL = """
SELECT l.l_orderkey, l.l_linenumber,
       CAST(round(l.l_quantity, 0) AS BIGINT) AS qty,
       CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS price_c,
       o.o_orderstatus, o.o_orderpriority,
       c.c_mktsegment,
       cn.n_name AS cust_nation,
       p.p_brand, p.p_type,
       s.s_name AS supp_name,
       sn.n_name AS supp_nation
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
JOIN part p      ON l.l_partkey = p.p_partkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'"""


@_q("star_denormalize", _STAR_EXPORT_SQL)
def q_star_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide-table EXPORT path: denormalize the full star schema
    around lineitem (orders + customer + both nation roles + part +
    supplier) into one training-ready frame — what a feature-store
    offline export materializes before model training. The one
    fact-to-fact join (lineitem x date-pruned orders) shuffles on
    orderkey; every true dim (customer, part, supplier, nation twice
    under different roles) BROADCASTS against the stream, so the fact
    shuffles exactly once and each scan reads only its projected
    columns (ReadSchema-pruned)."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_c"),
    )
    o = (
        _read(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    )
    c = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    s = _read(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_name")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "l_orderkey", "l_linenumber", "qty", "price_c",
            "o_orderstatus", "o_orderpriority", "c_mktsegment",
            "cust_nation", "p_brand", "p_type",
            F.col("s_name").alias("supp_name"), "supp_nation",
        )
    )


_LS_ITERS = 3


def _label_spread_sql() -> str:
    """Unrolled label-spreading oracle: seeds (vec_id % 10 = 0) hold
    their label; each round an unlabeled node adopts the majority label
    among its labeled neighbors (ties -> smallest label)."""
    its = []
    prev = "l0"
    for i in range(1, _LS_ITERS + 1):
        its.append(f"""v{i} AS (
  SELECT e.dst AS vec_id, l.lab, COUNT(*) AS c
  FROM edges e JOIN {prev} l ON e.src = l.vec_id AND l.lab IS NOT NULL
  GROUP BY e.dst, l.lab),
p{i} AS (
  SELECT vec_id, lab FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY c DESC, lab) AS rn
    FROM v{i}) t WHERE rn = 1),
l{i} AS (
  SELECT prev.vec_id, COALESCE(prev.lab, p.lab) AS lab
  FROM {prev} prev LEFT JOIN p{i} p ON prev.vec_id = p.vec_id)""")
        prev = f"l{i}"
    return f"""WITH pairs AS ({approx_oracles.embedding_cosine_lsh_sql(threshold=0.25)}),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL SELECT d2, d1 FROM pairs),
l0 AS (
  SELECT vec_id,
         CASE WHEN vec_id % 10 = 0 THEN CAST(label AS INT) END AS lab
  FROM embeddings),
{", ".join(its)}
SELECT l.vec_id, l.lab AS pred_label,
       CASE WHEN l.vec_id % 10 = 0 THEN 'seed' ELSE 'spread' END AS src,
       CAST(CASE WHEN l.lab = e.label THEN 1 ELSE 0 END AS INT) AS correct
FROM {prev} l JOIN embeddings e ON l.vec_id = e.vec_id
WHERE l.lab IS NOT NULL"""


@_q("label_spreading", _label_spread_sql())
def q_label_spreading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spreading over the embedding similarity
    graph: 10%% of vectors keep their true label as seeds; {_LS_ITERS}
    rounds of majority vote among labeled neighbors (deterministic ties:
    most votes, then smallest label) extend labels along LSH cosine
    edges. Votes are exact integer counts — no damping floats — so the
    final assignment is bit-reproducible and the unrolled recursive
    oracle hash-matches. ``correct`` scores spread labels against the
    held-out truth: the weak-supervision quality loop.

    Scale shape: like PageRank, the edge list localCheckpoints once
    (referenced every round); each round is one labeled-neighbor join +
    a (node, label) vote aggregate + a rank window — all keyed on
    vec_id-domain pairs, never vectors."""
    e = _read(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs(
        e, threshold=0.25, lsh=True, n_planes=32, bands=4
    ).select("d1", "d2")
    edges = (
        pairs.union(pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
        .select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .localCheckpoint()
    )
    from aqi_featurestore_spark.operators.graph import spread_labels

    seeds = e.select(
        "vec_id",
        F.when(F.col("vec_id") % 10 == 0, F.col("label").cast("int")).alias("lab"),
    )
    labels = spread_labels(edges, seeds, iters=_LS_ITERS)
    truth = e.select(F.col("vec_id").alias("t_id"), F.col("label").alias("true_label"))
    return (
        labels.where(F.col("lab").isNotNull())
        .join(truth, labels["vec_id"] == truth["t_id"])
        .select(
            "vec_id",
            F.col("lab").alias("pred_label"),
            F.when(F.col("vec_id") % 10 == 0, "seed").otherwise("spread").alias("src"),
            (F.col("lab") == F.col("true_label")).cast("int").alias("correct"),
        )
    )


_AB_TEST_SQL = r"""
WITH assign AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' AND "value" >= 150
                       THEN 1 ELSE 0 END) AS INT) AS converted
  FROM events GROUP BY user_id),
arms AS (
  SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM assign GROUP BY arm),
wide AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
         max(CASE WHEN arm = 0 THEN conv END) AS c0,
         max(CASE WHEN arm = 1 THEN n END) AS n1,
         max(CASE WHEN arm = 1 THEN conv END) AS c1
  FROM arms)
SELECT CAST(n0 AS BIGINT) AS n0, c0, CAST(n1 AS BIGINT) AS n1, c1,
       round(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
       round(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
       round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)), 6)
         AS z_score
FROM wide"""


@_q("ab_test_zscore", _AB_TEST_SQL)
def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: two-proportion z-test on per-user conversion
    (converted = any HIGH-VALUE purchase, value >= 150 — a non-trivial
    rate; a degenerate 0%/100% pooled rate makes z undefined in any
    engine) between arms assigned by a deterministic hash split
    (user_id % 2 — rerun/repartition-stable, the property real
    assignment systems need). Counts are exact integers; the
    pooled-variance z formula is evaluated in doubles with IDENTICAL
    operand order in both engines and rounded to 6 dp.

    Scale shape: per-user conversion is one map-combined aggregate, the
    arm rollup is 2 rows, and the final pivot/z computation is a 1-row
    frame — nothing after the first aggregate is data-sized."""
    e = _read(spark, sf_dir, "events")
    hit = (F.col("event_type") == "purchase") & (F.col("value") >= 150)
    assign = e.groupBy("user_id").agg(
        F.max(F.when(hit, 1).otherwise(0)).cast("int").alias("converted")
    ).select((F.col("user_id") % 2).cast("int").alias("arm"), "converted")
    arms = assign.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp)
        * (F.lit(1).cast("double") / F.col("n0") + F.lit(1).cast("double") / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("long").alias("n0"), "c0",
        F.col("n1").cast("long").alias("n1"), "c1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(z, 6).alias("z_score"),
    )


_MARKET_BASKET_SQL = r"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
pc AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, COUNT(*) AS pair_cnt
  FROM b a JOIN b c
    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
scored AS (
  SELECT p.p1, p.p2, p.pair_cnt,
         round(CAST(p.pair_cnt * n.n_orders AS DOUBLE) / (c1.c * c2.c), 6)
           AS lift
  FROM pairs p
  JOIN pc c1 ON p.p1 = c1.l_partkey
  JOIN pc c2 ON p.p2 = c2.l_partkey
  CROSS JOIN n)
SELECT p1, p2, pair_cnt, lift, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (ORDER BY lift DESC, p1, p2) AS rk
  FROM scored) t
WHERE rk <= 100"""


@_q("market_basket", _MARKET_BASKET_SQL)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining (market basket): top-100 part pairs by LIFT —
    P(p1,p2) / (P(p1)P(p2)) — over co-occurrence in the same order, with
    min support pair_cnt >= 3. Lift is one double division rounded
    BEFORE ranking (tie-break p1, p2) so a sub-ulp divergence can't
    reorder the board.

    Scale shape: the within-order self-join is bounded by order SIZE
    (baskets are small — the classic a-priori observation), never a
    corpus cross product; pair counts partial-aggregate map-side; the
    marginals join is on single part keys; global top-100 compiles to
    TakeOrderedAndProject."""
    b = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = b.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    pc = b.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("c.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 3)
    )
    scored = (
        pairs.join(
            pc.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1")), "p1"
        )
        .join(pc.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2")), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1", "p2", "pair_cnt",
            F.round(
                (F.col("pair_cnt") * F.col("n_orders")).cast("double")
                / (F.col("c1") * F.col("c2")),
                6,
            ).alias("lift"),
        )
    )
    top = scored.orderBy(F.desc("lift"), F.asc("p1"), F.asc("p2")).limit(100)
    w = Window.orderBy(F.desc("lift"), F.asc("p1"), F.asc("p2"))
    return top.select(
        "p1", "p2", "pair_cnt", "lift", F.row_number().over(w).cast("int").alias("rk")
    )


_WEIGHTED_MEDIAN_SQL = r"""
WITH o AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS vc,
         CAST(round(l_quantity, 0) AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem WHERE l_quantity > 0),
c AS (
  SELECT *, SUM(w) OVER (PARTITION BY grp ORDER BY vc, l_orderkey, l_linenumber
                         ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY grp) AS tw
  FROM o)
SELECT grp, CAST(min(vc) AS BIGINT) AS median_price_c,
       CAST(min(tw) AS BIGINT) AS total_w
FROM c WHERE 2 * cw >= tw GROUP BY grp"""


@_q("weighted_median", _WEIGHTED_MEDIAN_SQL)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group (price weighted by quantity): the
    first value whose cumulative weight reaches half the group total —
    all integer arithmetic (centi-prices, integer weights, the 2*cw >= tw
    test avoids any division), deterministic under the pinned
    (vc, orderkey, linenumber) total order.

    Scale shape: one sort per group partition (same documented
    small-group exact variant as group_median — approx_percentile is
    the billion-row path), one running-sum window sharing that sort,
    then a hash aggregate."""
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    o = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("vc"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("w"),
        "l_orderkey", "l_linenumber",
    )
    word = Window.partitionBy("grp").orderBy("vc", "l_orderkey", "l_linenumber")
    c = o.select(
        "grp", "vc",
        F.sum("w").over(word.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(Window.partitionBy("grp")).alias("tw"),
    )
    return (
        c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("grp")
        .agg(
            F.min("vc").alias("median_price_c"),
            F.min("tw").alias("total_w"),
        )
    )


_BENFORD_P = [__import__("math").log10(1 + 1 / d) for d in range(1, 10)]

_BENFORD_SQL = f"""
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice > 0),
d AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit FROM v),
cnt AS (SELECT digit, COUNT(*) AS obs FROM d GROUP BY digit),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cnt),
exp AS (
  SELECT * FROM (VALUES {", ".join(f"({i + 1}, CAST({p!r} AS DOUBLE))" for i, p in enumerate(_BENFORD_P))})
  AS t(digit, p))
SELECT e.digit, COALESCE(c.obs, 0) AS obs,
       round(e.p, 6) AS exp_p,
       round((COALESCE(c.obs, 0) - t.n * e.p) * (COALESCE(c.obs, 0) - t.n * e.p)
             / (t.n * e.p), 6) AS chi_term
FROM exp e LEFT JOIN cnt c ON e.digit = c.digit CROSS JOIN tot t
ORDER BY e.digit"""


@_q("benford_audit", _BENFORD_SQL)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over monetary amounts — the classic
    fabricated-data detector: observed first-digit counts vs the Benford
    expectation log10(1+1/d), with per-digit chi-square terms. The
    expected probabilities are PYTHON-computed literals embedded in BOTH
    plans (repr round-trips doubles exactly), so the only runtime float
    work is the identically-ordered chi term, rounded to 6 dp.

    Scale shape: first digit via integer-to-string prefix (exact in any
    engine — no log10 on data), one map-combined 9-group aggregate, a
    1-row total broadcast; output is always exactly 9 rows."""
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d = li.select(F.substring(c.cast("string"), 1, 1).cast("int").alias("digit"))
    cnt = d.groupBy("digit").agg(F.count("*").alias("obs"))
    tot = cnt.agg(F.sum("obs").cast("long").alias("n"))
    exp = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(_BENFORD_P)], "digit int, p double"
    )
    obs = F.coalesce("obs", F.lit(0))
    return (
        exp.join(F.broadcast(cnt), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            obs.alias("obs"),
            F.round("p", 6).alias("exp_p"),
            F.round(
                (obs - F.col("n") * F.col("p"))
                * (obs - F.col("n") * F.col("p"))
                / (F.col("n") * F.col("p")),
                6,
            ).alias("chi_term"),
        )
        .orderBy("digit")
    )


# Station coordinates derived from md5(user_id) in integer MICRO-degrees
# over the reference's northern-Vietnam AQI grid extent (SURVEY §1:
# lat 19.5-23.5, lon 102-108.5) — the testdata schema has no coords, so
# both engines derive identical ones.
_LAT_DUCK = (
    "(19500000 + ("
    + _ph.duck_hex_int("md5('lat|' || CAST(user_id AS VARCHAR))", 1, 8)
    + ") % 4000000)"
)
_LON_DUCK = (
    "(102000000 + ("
    + _ph.duck_hex_int("md5('lon|' || CAST(user_id AS VARCHAR))", 1, 8)
    + ") % 6500000)"
)
_CELL_UDEG = 500_000  # 0.5 degree blocking cells

_NEAREST_STATION_SQL = f"""
WITH s AS (
  SELECT DISTINCT user_id AS sid FROM events),
pt AS (
  SELECT sid, {_LAT_DUCK.replace("user_id", "sid")} AS lat_u,
         {_LON_DUCK.replace("user_id", "sid")} AS lon_u
  FROM s),
cells AS (
  SELECT p.*, (p.lat_u // {_CELL_UDEG}) + dy AS cy,
         (p.lon_u // {_CELL_UDEG}) + dx AS cx
  FROM pt p
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) a
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) b),
home AS (
  SELECT sid, lat_u, lon_u,
         lat_u // {_CELL_UDEG} AS cy, lon_u // {_CELL_UDEG} AS cx
  FROM pt),
cand AS (
  SELECT h.sid, c.sid AS nbr,
         (h.lat_u - c.lat_u) * (h.lat_u - c.lat_u)
         + (h.lon_u - c.lon_u) * (h.lon_u - c.lon_u) AS dist2
  FROM home h JOIN cells c ON h.cy = c.cy AND h.cx = c.cx AND h.sid <> c.sid),
ranked AS (
  SELECT sid, nbr, CAST(dist2 AS BIGINT) AS dist2_udeg2,
         row_number() OVER (
             PARTITION BY sid ORDER BY dist2, nbr) AS rk
  FROM (SELECT DISTINCT sid, nbr, dist2 FROM cand) t)
SELECT sid, nbr, dist2_udeg2, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3"""


@_q("nearest_station_join", _NEAREST_STATION_SQL)
def q_nearest_station_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial k-nearest-neighbor join (k=3) over the sensor-station
    grid via CELL BLOCKING: each station only compares against stations
    whose 0.5-degree cell is within its 3x3 neighborhood — the spatial
    analogue of LSH banding that replaces the O(n^2) distance scan with
    an equi-join on cell ids. Distances are exact integer squared
    micro-degrees (equirectangular — honest at this extent; no float
    trig). Recall bound, like every blocked method here: a true
    neighbor farther than one cell (0.5 deg) away is not surfaced.

    Scale shape: each station explodes to its 9 neighbor cells (the
    build side), the probe side keeps one row per station; the join key
    is a fixed-width (cy, cx) pair and AQE splits dense-city cells. At
    100 TB-of-stations this is the standard geospatial bin join."""
    s = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("sid")
    ).distinct()
    lat = 19_500_000 + _ph.md5_int32(F.concat(F.lit("lat|"), F.col("sid").cast("string"))) % 4_000_000
    lon = 102_000_000 + _ph.md5_int32(F.concat(F.lit("lon|"), F.col("sid").cast("string"))) % 6_500_000
    pt = s.select("sid", lat.alias("lat_u"), lon.alias("lon_u"))
    offs = F.array(*[F.lit(v) for v in (-1, 0, 1)])
    cells = pt.select(
        "sid", "lat_u", "lon_u",
        F.explode(offs).alias("dy"),
    ).select(
        "sid", "lat_u", "lon_u", "dy", F.explode(offs).alias("dx")
    ).select(
        F.col("sid").alias("c_sid"),
        F.col("lat_u").alias("c_lat"),
        F.col("lon_u").alias("c_lon"),
        (F.expr(f"lat_u div {_CELL_UDEG}") + F.col("dy")).alias("cy"),
        (F.expr(f"lon_u div {_CELL_UDEG}") + F.col("dx")).alias("cx"),
    )
    home = pt.select(
        "sid", "lat_u", "lon_u",
        F.expr(f"lat_u div {_CELL_UDEG}").alias("cy"),
        F.expr(f"lon_u div {_CELL_UDEG}").alias("cx"),
    )
    dist2 = (F.col("lat_u") - F.col("c_lat")) * (F.col("lat_u") - F.col("c_lat")) + (
        F.col("lon_u") - F.col("c_lon")
    ) * (F.col("lon_u") - F.col("c_lon"))
    cand = (
        home.join(cells, ["cy", "cx"])
        .where(F.col("sid") != F.col("c_sid"))
        .select("sid", F.col("c_sid").alias("nbr"), dist2.alias("dist2"))
        .dropDuplicates(["sid", "nbr"])
    )
    w = Window.partitionBy("sid").orderBy(F.asc("dist2"), F.asc("nbr"))
    return (
        cand.select(
            "sid", "nbr", F.col("dist2").cast("long").alias("dist2_udeg2"),
            F.row_number().over(w).cast("int").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


_LTTB_SQL = r"""
WITH mn AS (SELECT user_id, epoch_us(min(ts)) AS x0 FROM events GROUP BY user_id),
o AS (
  SELECT e.user_id, time_bucket(INTERVAL '1 hour', e.ts) AS bucket,
         e.ts, e.event_id,
         epoch_us(e.ts) - m.x0 AS x,
         CAST(round(e."value" * 100, 0) AS BIGINT) AS vc
  FROM events e JOIN mn m ON e.user_id = m.user_id),
bstats AS (
  SELECT user_id, bucket, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(vc) AS BIGINT) AS sy
  FROM o GROUP BY user_id, bucket),
bseq AS (
  SELECT *, lag(n) OVER w AS pn, lag(sx) OVER w AS psx, lag(sy) OVER w AS psy,
         lead(n) OVER w AS nn, lead(sx) OVER w AS nsx, lead(sy) OVER w AS nsy
  FROM bstats WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
cand AS (
  SELECT o.user_id, o.bucket, o.ts, o.event_id, o.vc, o.x,
         b.pn, b.psx, b.psy, b.nn, b.nsx, b.nsy
  FROM o JOIN bseq b ON o.user_id = b.user_id AND o.bucket = b.bucket),
picked AS (
  SELECT user_id, bucket, event_id, vc,
         CASE WHEN pn IS NULL THEN 'first'
              WHEN nn IS NULL THEN 'last'
              ELSE 'area' END AS kind,
         row_number() OVER (
           PARTITION BY user_id, bucket
           ORDER BY
             CASE WHEN pn IS NULL THEN x
                  WHEN nn IS NULL THEN -x
                  ELSE -abs((x * pn - psx) * (nsy * pn - psy * nn)
                            - (nsx * pn - psx * nn) * (vc * pn - psy)) END,
             ts, event_id) AS rn
  FROM cand)
SELECT user_id, bucket, event_id, vc, kind
FROM picked WHERE rn = 1"""


@_q("lttb_downsample", _LTTB_SQL)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (fixed-anchor
    variant) per entity: one representative point per hour bucket — the
    one spanning the largest triangle against the NEIGHBOR buckets'
    centroids (series first/last buckets keep their first/last point,
    as in Steinarsson's original). Exact LTTB anchors on the previously
    SELECTED point, a sequential dependency; anchoring on the previous
    bucket's centroid is the standard parallel relaxation — every
    bucket picks independently.

    The triangle area is computed in EXACT integers: x is microseconds
    from the entity's first observation (offset keeps products inside
    int64), y is centi-value; the centroid fractions are cleared by
    scaling the cross product with pn^2*nn (constant within a bucket,
    so the argmax is unchanged). Integer-range bound: the scaled area
    is O(span_us * vc_max * n_bucket^2), inside int64 up to ~250 points
    per bucket on a month span — denser buckets should pre-aggregate
    (finer buckets or a per-bucket pre-sample), which LTTB at a sane
    target resolution implies anyway. Shapes: one (user, bucket)
    aggregate, one bucket-sequence window, one (user, bucket) candidate
    join + one rank window on the same key — fact rows shuffle twice."""
    e = _read(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    mn = e.groupBy("user_id").agg(F.min(us).alias("x0"))
    step = 3_600_000_000
    bucket = F.timestamp_micros((F.floor(us / F.lit(step)) * F.lit(step)).cast("long"))
    o = (
        e.join(F.broadcast(mn), "user_id")
        .select(
            "user_id",
            bucket.alias("bucket"),
            "ts",
            "event_id",
            (us - F.col("x0")).alias("x"),
            F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        )
    )
    bstats = o.groupBy("user_id", "bucket").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("vc").alias("sy")
    )
    wseq = Window.partitionBy("user_id").orderBy("bucket")
    bseq = bstats.select(
        "user_id", "bucket",
        F.lag("n").over(wseq).alias("pn"),
        F.lag("sx").over(wseq).alias("psx"),
        F.lag("sy").over(wseq).alias("psy"),
        F.lead("n").over(wseq).alias("nn"),
        F.lead("sx").over(wseq).alias("nsx"),
        F.lead("sy").over(wseq).alias("nsy"),
    )
    cand = o.join(bseq, ["user_id", "bucket"])
    area = F.abs(
        (F.col("x") * F.col("pn") - F.col("psx"))
        * (F.col("nsy") * F.col("pn") - F.col("psy") * F.col("nn"))
        - (F.col("nsx") * F.col("pn") - F.col("psx") * F.col("nn"))
        * (F.col("vc") * F.col("pn") - F.col("psy"))
    )
    order_key = (
        F.when(F.col("pn").isNull(), F.col("x"))
        .when(F.col("nn").isNull(), -F.col("x"))
        .otherwise(-area)
    )
    wpick = Window.partitionBy("user_id", "bucket").orderBy(
        order_key.asc(), F.asc("ts"), F.asc("event_id")
    )
    kind = (
        F.when(F.col("pn").isNull(), "first")
        .when(F.col("nn").isNull(), "last")
        .otherwise("area")
    )
    return (
        cand.select(
            "user_id", "bucket", "event_id", "vc", kind.alias("kind"),
            F.row_number().over(wpick).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


_HOURLY_ROLLUP_SQL = r"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       user_id,
       count(*) AS n_obs,
       CAST(SUM(CAST(round("value" * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_c,
       max("value") AS max_value
FROM events GROUP BY 1, 2, 3"""


@_q("hourly_rollup", _HOURLY_ROLLUP_SQL)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window per-entity rollup (the hypertable-rollup shape;
    streaming analogue of the reference's hourly cadence, ST4). Integer
    centi-sums keep the aggregate summation-order independent."""
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_c"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "n_obs",
            "sum_value_c",
            "max_value",
        )
    )


_DEDUP_RESOLVE_SQL = f"""
WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a),
groups AS (
  SELECT a AS doc_id, least(a, min(b)) AS group_id FROM reach GROUP BY a)
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM groups)
   OR d.doc_id IN (SELECT doc_id FROM groups WHERE doc_id = group_id)"""


@_q("dedup_resolve_docs", _DEDUP_RESOLVE_SQL)
def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dedup lifecycle: n-gram Jaccard pairs -> connected
    components (label propagation) -> keep the min-id canonical doc per
    cluster + all unimplicated docs. The oracle computes the same
    components with a recursive CTE (transitive closure)."""
    from aqi_featurestore_spark.operators.dedup_groups import resolve_duplicates

    d = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.2, broadcast=True)
    return resolve_duplicates(d, pairs).select("doc_id", "lang", "n_chars")


@_q("minhash_verified_dedup", approx_oracles.minhash_verified_sql())
def q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production near-dedup shape: MinHash-LSH candidate generation +
    exact Jaccard verification per candidate — the output carries TRUE
    jaccard values. The oracle regenerates the md5-affine candidates and
    verifies with string-shingle sets; pytest additionally pins agreement
    with the exact n-gram oracle on every surfaced pair."""
    from aqi_featurestore_spark.operators.near_dedup import minhash_verified_pairs

    d = _read(spark, sf_dir, "documents")
    return minhash_verified_pairs(d, threshold=0.3)


@_q("incremental_dedup", approx_oracles.minhash_incremental_sql())
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion gate: every 10th-ish doc (doc_id % 10 = 7)
    plays the incoming batch, the rest the already-deduped corpus; output
    is the (new, corpus) near-dup pairs with TRUE verified Jaccard that
    an anti-join would use to admit only novel docs. Candidates come from
    cross-set MinHash banding only — corpus x corpus pairs are never
    generated, so per-batch cost scales with the batch."""
    from aqi_featurestore_spark.operators.near_dedup import minhash_incremental_pairs

    d = _read(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 7
    return minhash_incremental_pairs(
        d.where(is_new), d.where(~is_new), threshold=0.3
    )


_SPLIT_SQL = r"""
SELECT event_id, user_id,
       CASE WHEN (4096 * (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1)
                +  256 * (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1)
                +   16 * (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 3, 1)) - 1)
                +        (strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 4, 1)) - 1))
              < 52428 THEN 'train' ELSE 'test' END AS split
FROM events"""


@_q("train_test_split", _SPLIT_SQL)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 split labels from md5(event_id) — no RNG, no
    shuffle, engine-portable (oracle parses the same 4 hex digits)."""
    from aqi_featurestore_spark.operators.split import with_split_label

    events = _read(spark, sf_dir, "events")
    return with_split_label(
        events.select("event_id", "user_id"), "event_id", train_fraction=0.8
    )


_MODEL_METRICS_SQL = f"""{_PIT_CTES},
valid AS (SELECT * FROM pit WHERE aqi IS NOT NULL),
lagged AS (
  SELECT entity_id, aqi,
         lag(aqi, 1) OVER (
           PARTITION BY entity_id
           ORDER BY floor(epoch(event_timestamp)) + hour * 3600,
                    event_timestamp) AS yhat
  FROM valid),
p AS (SELECT aqi AS y, yhat FROM lagged WHERE yhat IS NOT NULL),
s1 AS (
  SELECT CAST(SUM(CAST(round(abs(y - yhat) * 1000000, 0) AS BIGINT)) AS BIGINT) AS s_abs,
         CAST(SUM(CAST(round((y - yhat) * (y - yhat) * 1000000, 0) AS BIGINT)) AS BIGINT) AS s_sq,
         CAST(SUM(CAST(round(y * 1000000, 0) AS BIGINT)) AS BIGINT) AS s_y,
         COUNT(*) AS n
  FROM p),
m AS (SELECT CAST(s_y AS DOUBLE) / 1000000 / n AS y_mean FROM s1),
s2 AS (
  SELECT CAST(SUM(CAST(round((y - y_mean) * (y - y_mean) * 1000000, 0) AS BIGINT)) AS BIGINT) AS s_tot
  FROM p CROSS JOIN m)
SELECT CAST(s_abs AS DOUBLE) / 1000000 / n AS mae,
       sqrt(CAST(s_sq AS DOUBLE) / 1000000 / n) AS rmse,
       1.0 - (CAST(s_sq AS DOUBLE) / 1000000) / (CAST(s_tot AS DOUBLE) / 1000000) AS r2,
       n
FROM s1 CROSS JOIN s2"""


@_q("model_metrics", _MODEL_METRICS_SQL)
def q_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: MAE/RMSE/R2 of the naive last-hour-persistence predictor over
    the PIT training frame — two distributed aggregations, 6-dp integer
    accumulation (summation-order independent; same value in any engine)."""
    from aqi_featurestore_spark.functions.metrics import regression_metrics

    frame = pipeline.training_set(spark, sf_dir)
    return regression_metrics(frame, y="aqi", yhat="last_hour_aqi")


_FUNNEL_SQL = r"""
WITH e AS (SELECT user_id, ts, event_type FROM events),
w1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
              OVER (PARTITION BY user_id) AS v1 FROM e),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > v1 THEN ts END)
              OVER (PARTITION BY user_id) AS c1 FROM w1),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c1 THEN ts END)
              OVER (PARTITION BY user_id) AS p1 FROM w2),
u AS (SELECT user_id, max(v1) AS v1, max(c1) AS c1, max(p1) AS p1
      FROM w3 GROUP BY user_id)
SELECT CAST(CASE WHEN p1 IS NOT NULL THEN 3
                 WHEN c1 IS NOT NULL THEN 2
                 WHEN v1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS stage,
       count(*) AS n_users
FROM u GROUP BY 1"""


@_q("funnel_analysis", _FUNNEL_SQL)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase, strictly
    increasing timestamps): per-user stage reached, counted per stage.

    The chained "first event of type X after the previous stage" mins
    are three Window aggregates over the SAME user_id partitioning —
    Catalyst plans one Exchange and stacks the Window operators on it,
    and the final per-user group reuses that partitioning too, so the
    funnel costs one shuffle of (user_id, ts, type) rows plus the
    trivial 4-row stage rollup (verified: 2 Exchanges, 3 Windows).
    At 100 TB the big shuffle carries three narrow columns, nothing
    else."""
    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = events.select("user_id", "ts", "event_type")
    d = e.withColumn(
        "v1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    d = d.withColumn(
        "c1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("v1")),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "p1",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c1")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = d.groupBy("user_id").agg(
        F.max("v1").alias("v1"), F.max("c1").alias("c1"), F.max("p1").alias("p1")
    )
    stage = (
        F.when(F.col("p1").isNotNull(), 3)
        .when(F.col("c1").isNotNull(), 2)
        .when(F.col("v1").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
    )
    return per_user.groupBy(stage.alias("stage")).agg(F.count("*").alias("n_users"))


_RETENTION_SQL = r"""
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT user_id, min(d) AS d0 FROM act GROUP BY user_id),
j AS (
  SELECT DISTINCT a.user_id, f.d0,
         CAST(floor(date_diff('day', f.d0, a.d) / 7) AS INT) AS week_offset
  FROM act a JOIN f ON a.user_id = f.user_id)
SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, week_offset,
       count(*) AS n_active
FROM j GROUP BY 1, 2"""


@_q("retention_cohorts", _RETENTION_SQL)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted
    once per week-offset in which they were active. The activity
    distinct, the first-seen aggregate, the join, and the per-(user,
    week) distinct all key on user_id, so one shuffle partitioning is
    reused end-to-end; only the final small (cohort, week) rollup
    re-keys. Cohort day is emitted as a string — DATE columns render
    differently across engines (memory rule), strings hash identically."""
    events = _read(spark, sf_dir, "events")
    act = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("d0"))
    j = (
        act.join(first, "user_id")
        .select(
            "user_id",
            "d0",
            F.floor(F.datediff("d", "d0") / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return j.groupBy(
        F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"), "week_offset"
    ).agg(F.count("*").alias("n_active"))


_DOC_CHUNKS_SQL = r"""
WITH d AS (
  SELECT doc_id, text, length(text) AS len FROM documents WHERE length(text) >= 1),
c AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(floor((len - 1) / 400) AS BIGINT) + 1)) AS i
  FROM d)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(i * 400 + 1 AS INT) AS chunk_start,
       CAST(length(substr(text, CAST(i * 400 + 1 AS INT), 500)) AS INT) AS chunk_len,
       md5(substr(text, CAST(i * 400 + 1 AS INT), 500)) AS chunk_md5
FROM c"""


@_q("doc_chunks", _DOC_CHUNKS_SQL)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking (size 500 chars, stride 400 —
    the context-window prep step that complements `sequence_packing`'s
    concat-and-chunk): each document explodes into ceil(len/stride)
    chunks entirely map-side — no shuffle, no window, the chunk count
    derives from the row itself. Chunk identity is pinned by md5 so the
    oracle verifies the exact substring boundaries, including the
    short final chunk."""
    docs = _read(spark, sf_dir, "documents")
    d = docs.where(F.length("text") >= 1)
    n_last = F.floor((F.length("text") - 1) / 400).cast("int")
    c = d.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), n_last)).alias("i")
    )
    start = (F.col("i") * 400 + 1).cast("int")
    chunk = F.substring("text", start, 500)
    return c.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_id"),
        start.alias("chunk_start"),
        F.length(chunk).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


_TOKENS = r"""tokv AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS token
  FROM documents)"""

_VOCAB_SQL = rf"""
WITH {_TOKENS},
cnt AS (
  SELECT token, count(*) AS cf, count(DISTINCT doc_id) AS df
  FROM tokv GROUP BY token)
SELECT token, cf, df, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (ORDER BY cf DESC, token ASC) AS rk FROM cnt) t
WHERE rk <= 1000"""


@_q("vocab_top_terms", _VOCAB_SQL)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary build: corpus frequency + document frequency
    per whitespace token, global top-1000 with deterministic (cf desc,
    token asc) tie-break.

    The global top-k is the scale trap here: a row_number window with no
    partition key collapses to one task over the whole vocabulary.
    Instead ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge — and only the 1000 surviving
    rows see the (tiny, deliberate) ranking window."""
    docs = _read(spark, sf_dir, "documents")
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tok = docs.select("doc_id", F.explode(tokens).alias("token"))
    cnt = tok.groupBy("token").agg(
        F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df")
    )
    top = cnt.orderBy(F.desc("cf"), F.asc("token")).limit(1000)
    w = Window.orderBy(F.desc("cf"), F.asc("token"))
    return top.select(
        "token", "cf", "df", F.row_number().over(w).cast("int").alias("rk")
    )


_TFIDF_SQL = rf"""
WITH {_TOKENS},
tf AS (SELECT doc_id, token, count(*) AS tf FROM tokv GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT f.doc_id, f.token, f.tf, d.df,
         round(f.tf * ln((n.n + 1.0) / (d.df + 1.0)), 6) AS score
  FROM tf f JOIN dfreq d USING (token) CROSS JOIN n)
SELECT doc_id, token, tf, df, score, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
  FROM s) t
WHERE rk <= 3"""


@_q("tfidf_top_terms", _TFIDF_SQL)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document. df comes from the tf frame
    (one groupBy(token) over per-doc counts — never a second corpus
    tokenization), the corpus size N is a 1-row aggregate broadcast into
    the score (no driver action), and ranking is a per-doc window —
    partitioned, unlike the vocabulary's global one. Scores are rounded
    to 6 dp BEFORE ranking so a sub-ulp ln() difference can't reorder
    ties across engines (token breaks exact ties)."""
    docs = _read(spark, sf_dir, "documents")
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tok = docs.select("doc_id", F.explode(tokens).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    s = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        s.select("*", F.row_number().over(w).cast("int").alias("rk"))
        .where(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rk")
    )


_SNAPSHOT_DIFF_SQL = r"""
WITH o AS (
  SELECT doc_id, md5(text) AS old_fp FROM documents WHERE doc_id % 13 <> 5),
n AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS new_fp
  FROM documents WHERE doc_id % 17 <> 3)
SELECT * FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.old_fp, n.new_fp,
         CASE WHEN o.old_fp IS NULL THEN 'added'
              WHEN n.new_fp IS NULL THEN 'removed'
              WHEN o.old_fp <> n.new_fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id) t
WHERE status <> 'unchanged'"""


@_q("snapshot_diff_docs", _SNAPSHOT_DIFF_SQL)
def q_snapshot_diff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC delta between two simulated corpus snapshots (additions =
    doc_id % 13 = 5 missing from old, deletions = % 17 = 3 missing from
    new, edits = % 7 = 0 text-mutated): `operators.cdc.snapshot_diff`
    full-outer-joins (key, md5 fingerprint) projections — bodies never
    shuffle — and emits only churn rows."""
    from aqi_featurestore_spark.operators.cdc import snapshot_diff

    docs = _read(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 13 != 5).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(
        old, new, key_cols=["doc_id"], fingerprint=F.md5(F.col("text"))
    )


from aqi_featurestore_spark.functions.layout import duck_zorder_key2 as _duck_z

_ZORDER_SQL = (
    "SELECT event_id, x, y, "
    + _duck_z("x", "y")
    + """ AS z
FROM (SELECT event_id, user_id % 65536 AS x,
             (epoch_us(ts) // 3600000000) % 65536 AS y
      FROM events) t"""
)


@_q("zorder_keys", _ZORDER_SQL)
def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, event-hour) — the
    write-side layout step behind multi-dimension file pruning
    (`functions.layout.zorder_layout` range-partitions on this key).
    Pure codegen'd bit interleaving; the oracle recomputes every bit.
    Hour derives via integer division of epoch microseconds (`div`) —
    float division could round the boundary differently per engine."""
    from aqi_featurestore_spark.functions.layout import zorder_key2

    events = _read(spark, sf_dir, "events")
    t = events.select(
        "event_id",
        (F.col("user_id") % 65536).alias("x"),
        (F.expr("unix_micros(cast(ts as timestamp)) div 3600000000") % 65536).alias("y"),
    )
    return t.select("event_id", "x", "y", zorder_key2("x", "y").alias("z"))


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
         CAST(CAST(SUM(x) AS HUGEINT) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y) AS HUGEINT) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x * y) AS HUGEINT) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(x * x) AS HUGEINT) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(y * y) AS HUGEINT) AS DOUBLE) AS syy
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
    Per-row products stay in int64 (seconds-since-1995 x cents), the
    five SUMS accumulate in DECIMAL(38,0)/HUGEINT (exact, order-free),
    and only the final closed-form arithmetic runs in doubles with
    engine-identical op order. The forecasting-feature op (is this
    sensor drifting?) at any scale."""
    e = _read(spark, sf_dir, "events")
    x = (F.expr("unix_micros(cast(ts as timestamp)) div 1000000") - F.lit(788918400)).alias("x")
    y = F.round(F.col("value") * 100, 0).cast("long").alias("y")
    xy = e.select("user_id", x, y)
    d38 = "decimal(38,0)"

    def s(col):
        return F.sum(col.cast(d38)).cast("double")

    agg = xy.groupBy("user_id").agg(
        F.count("*").alias("n"),
        s(F.col("x")).alias("sx"),
        s(F.col("y")).alias("sy"),
        s(F.col("x") * F.col("y")).alias("sxy"),
        s(F.col("x") * F.col("x")).alias("sxx"),
        s(F.col("y") * F.col("y")).alias("syy"),
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
# LLM-pipeline round 2: corpus curation, corpus-LM stats, embedding
# maintenance, inverted index, seasonal anomalies
# ---------------------------------------------------------------------------

_TOPP_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / n_chars AS score
  FROM documents WHERE n_chars > 0),
rk AS (
  SELECT doc_id, lang, score,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY score DESC, doc_id) AS BIGINT) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM scored)
SELECT doc_id, lang, score, rn FROM rk WHERE rn * 5 <= n_lang"""


@_q("corpus_select_topp", _TOPP_SQL)
def q_corpus_select_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gated corpus selection: keep the top 20% of documents per
    language by alphabetic-character ratio — the curation step that
    picks a training subset. The cut is integer (rn*5 <= n_lang, floor
    semantics) and the rank ordering is (score desc, doc_id) so ties
    are deterministic. Both window functions share one (lang) partition
    spec — a single sort. Scale: the sort is per-language (bounded
    partitions), not global; at 100 TB swap row_number for a two-pass
    quantile cut (corpus_quantiles) if a single language dominates."""
    docs = _read(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    score = (
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")).cast("double")
        / F.col("n_chars")
    ).alias("score")
    scored = docs.select("doc_id", "lang", score)
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    wc = Window.partitionBy("lang")
    rk = scored.select(
        "doc_id",
        "lang",
        "score",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wc).alias("n_lang"),
    )
    return rk.where(F.col("rn") * 5 <= F.col("n_lang")).select(
        "doc_id", "lang", "score", "rn"
    )


_COMMONNESS_SQL = rf"""
WITH {_TOKENS},
cf AS (SELECT token, COUNT(*) AS cf FROM tokv GROUP BY token)
SELECT t.doc_id, COUNT(*) AS n_tokens, CAST(SUM(c.cf) AS BIGINT) AS sum_cf,
       CAST(SUM(c.cf) AS DOUBLE) / COUNT(*) AS mean_cf
FROM tokv t JOIN cf c USING (token)
GROUP BY t.doc_id"""


@_q("token_commonness", _COMMONNESS_SQL)
def q_token_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM document scoring (unigram shape): build corpus term
    frequencies, join them back onto every token occurrence, and reduce
    per document — mean corpus frequency of a doc's tokens is the
    boilerplate/jargon signal (high = stopword soup, low = rare-token
    text). Two shuffles (token, then doc_id), both on fixed-width keys;
    the frequency table stays distributed (no driver vocab). The sum is
    exact int64, the mean a single final division — order-free, so it
    hash-matches the oracle. The log-prob variant is the same plan with
    a log lookup on cf; mean_cf is kept ulp-exact instead."""
    docs = _read(spark, sf_dir, "documents")
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tok = docs.select("doc_id", F.explode(tokens).alias("token"))
    cf = tok.groupBy("token").agg(F.count("*").alias("cf"))
    return (
        tok.join(cf, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("cf").alias("sum_cf"),
            (F.sum("cf").cast("double") / F.count("*")).alias("mean_cf"),
        )
    )


_CENTROIDS_SQL = """
SELECT label, CAST(ord - 1 AS INT) AS dim,
       CAST(s AS DOUBLE) / (n * 1000000.0) AS centroid, n
FROM (
  SELECT label, ord,
         SUM(CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM (SELECT label, generate_subscripts(embedding, 1) AS ord,
               unnest(embedding) AS v
        FROM embeddings) x
  GROUP BY label, ord) agg"""


@_q("cluster_centroids", _CENTROIDS_SQL)
def q_cluster_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (IVF/k-means centroid refresh as a pure
    DataFrame reduction — operators/embeddings.py label_centroids).
    Components accumulate as exact integer micro-units so the reduce is
    order-free; one posexplode + one hash aggregate; output is
    |labels| x dim rows, exploded precisely so a second engine can
    verify every component."""
    from aqi_featurestore_spark.operators.embeddings import label_centroids

    e = _read(spark, sf_dir, "embeddings")
    return label_centroids(e, vec_col="embedding", label_col="label")


_QUANTIZE_SQL = """
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
st AS (SELECT ord, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY ord)
SELECT x.vec_id, CAST(x.ord - 1 AS INT) AS dim,
       CAST(CASE WHEN st.mx = st.mn THEN 0
                 ELSE least(floor((x.v - st.mn) / (st.mx - st.mn) * 255.0), 255)
            END AS INT) AS code
FROM x JOIN st USING (ord)"""


@_q("embedding_quantize", _QUANTIZE_SQL)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8-style quantization against corpus per-dimension
    min/max (operators/embeddings.py quantize_embeddings) — the 4x
    index-compression pass before ANN serving. The stats aggregate
    reduces to exactly dim rows before a driver collect (bounded by
    dimensionality, NOT corpus size); the per-vector map is one JVM
    transform against broadcast literal arrays — vectors never shuffle.
    Output exploded to (vec_id, dim, code) for exact cross-engine
    verification."""
    from aqi_featurestore_spark.operators.embeddings import quantize_embeddings

    e = _read(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e, id_col="vec_id", vec_col="embedding")
    return q.select(
        "vec_id", F.posexplode(F.col("codes")).alias("dim", "code")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "code")


_INV_INDEX_SQL = rf"""
WITH {_TOKENS},
tokd AS (SELECT DISTINCT token, doc_id FROM tokv),
pst AS (
  SELECT token, COUNT(*) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM tokd GROUP BY token)
SELECT token, df, postings FROM pst WHERE df >= 5 AND df <= 1000"""


@_q("inverted_index", _INV_INDEX_SQL)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> sorted distinct posting list (as a
    CSV string so both engines hash the same bytes) + document
    frequency, banded to 5 <= df <= 1000 — stopword postings are useless
    and unbounded, hapaxes are noise. The distinct and the groupBy share
    the (token, doc_id) -> (token) shuffle chain; postings assemble via
    sort_array(collect_list) per token, bounded by the df cap. The
    retrieval side of the corpus (contamination_check is the lookup
    consumer)."""
    docs = _read(spark, sf_dir, "documents")
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tokd = docs.select(
        F.explode(tokens).alias("token"), "doc_id"
    ).distinct()
    pst = tokd.groupBy("token").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return pst.where((F.col("df") >= 5) & (F.col("df") <= 1000))


_SEASONAL_SQL = """
WITH c AS (
  SELECT event_id, event_type, CAST(hour(ts) AS INT) AS hr,
         CAST(round("value" * 100, 0) AS BIGINT) AS vc
  FROM events),
st AS (
  SELECT event_type, hr, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(vc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sd,
         CAST(CAST(SUM(CAST(vc AS DECIMAL(38,0)) * CAST(vc AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS DOUBLE) AS sqd
  FROM c GROUP BY event_type, hr),
z AS (
  SELECT c.event_id, c.event_type, c.hr, c.vc, st.n,
         (c.vc - sd / n)
           / sqrt((sqd - sd * (sd / n)) / (n - 1)) AS zscore
  FROM c JOIN st USING (event_type, hr) WHERE st.n > 1)
SELECT event_id, event_type, hr, CAST(vc AS DOUBLE) / 100.0 AS value,
       round(zscore, 6) AS zscore
FROM z WHERE abs(zscore) > 3.0"""


@_q("seasonal_anomalies", _SEASONAL_SQL)
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: per (event_type,
    hour-of-day) mean/stddev baseline, flag rows beyond 3 sigma. The
    baseline is a tiny aggregate (types x 24 rows) broadcast back onto
    the fact — the monitoring pattern for cyclic metrics. Moments
    accumulate exactly (cents in DECIMAL(38)) and convert to double once,
    with pinned operand order (m = sd/n; var = (sqd - sd*m)/(n-1)), so
    the 3-sigma cut lands identically in both engines; zscore rounds to
    6 dp only at output."""
    e = _read(spark, sf_dir, "events")
    c = e.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    d38 = "decimal(38,0)"
    st = c.groupBy("event_type", "hr").agg(
        F.count("*").alias("n"),
        F.sum(F.col("vc").cast(d38)).cast(d38).cast("double").alias("sd"),
        F.sum(F.col("vc").cast(d38) * F.col("vc").cast(d38))
        .cast(d38)
        .cast("double")
        .alias("sqd"),
    )
    m = F.col("sd") / F.col("n")
    var = (F.col("sqd") - F.col("sd") * m) / (F.col("n") - 1)
    z = (
        c.join(F.broadcast(st), ["event_type", "hr"])
        .where(F.col("n") > 1)
        .withColumn("zscore", (F.col("vc") - m) / F.sqrt(var))
    )
    return z.where(F.abs(F.col("zscore")) > 3.0).select(
        "event_id",
        "event_type",
        "hr",
        (F.col("vc").cast("double") / 100.0).alias("value"),
        F.round("zscore", 6).alias("zscore"),
    )


# ---------------------------------------------------------------------------
# Batch 3: integrity digests, sequence transitions, exact medians,
# graph triangles, weighted sampling, PMI collocations, dedup audit
# ---------------------------------------------------------------------------

_DIGEST_SQL = f"""
WITH h AS (
  SELECT source, lang,
         md5(CAST(doc_id AS VARCHAR) || '|' || text) AS m
  FROM documents),
v AS (SELECT source, lang, {_ph.duck_md5_int63('m')} AS hh FROM h)
SELECT source, lang, COUNT(*) AS n_rows,
       CAST(CAST(SUM(hh) AS DECIMAL(38,0)) AS VARCHAR) AS digest
FROM v GROUP BY source, lang"""


@_q("partition_digest", _DIGEST_SQL)
def q_partition_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content digest per (source, lang) partition — the anti-entropy /
    table-sync primitive: two replicas compare digests and ship only
    divergent partitions (the Merkle-tree leaf level). The digest is a
    SUM of per-row md5-derived 63-bit integers — commutative, so it is
    independent of row order and partitioning (a float or concat digest
    would not be), and accumulates in DECIMAL(38) so it never overflows.
    Emitted as a string: the value is an opaque fingerprint, and both
    engines print decimals identically."""
    docs = _read(spark, sf_dir, "documents")
    h = _ph.md5_int63(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))
    )
    return (
        docs.select("source", "lang", h.alias("hh"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("hh").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("digest"),
        )
    )


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events),
cnt AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type)
SELECT event_type, next_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type) AS prob
FROM cnt"""


@_q("event_transitions", _TRANSITIONS_SQL)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() within (user, time) order, count per (from, to),
    row-normalized to probabilities. The normalizing SUM is a window
    over the already-aggregated |types|^2 frame — negligible. Sequence
    order ties break on event_id, so the lead chain is deterministic.
    The session-path model behind next-event prediction features."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    cnt = seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("event_type")
    return cnt.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias("prob"),
    )


_GROUP_MEDIAN_SQL = """
WITH c AS (
  SELECT event_type, CAST(round("value" * 100, 0) AS BIGINT) AS vc
  FROM events)
SELECT event_type,
       quantile_cont(vc, 0.25) / 100.0 AS p25,
       quantile_cont(vc, 0.50) / 100.0 AS p50,
       quantile_cont(vc, 0.75) / 100.0 AS p75
FROM c GROUP BY event_type"""


@_q("group_median", _GROUP_MEDIAN_SQL)
def q_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quartiles with linear interpolation. Parity
    subtlety: Spark computes (1-g)*lo + g*hi, DuckDB lo + (hi-lo)*g —
    different FP expressions, but over integer cents with g in
    {0, .25, .5, .75} every term is exactly representable, so both
    reduce to the same rational and the doubles agree bit-for-bit
    (this would NOT survive raw-double inputs or arbitrary g). Exact
    percentile sorts each group — the scale path is approx_quantiles
    (KLL/GK sketch); this is the small-group exact variant."""
    e = _read(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("vc")
    )
    return c.groupBy("event_type").agg(
        (F.percentile("vc", 0.25) / 100.0).alias("p25"),
        (F.percentile("vc", 0.50) / 100.0).alias("p50"),
        (F.percentile("vc", 0.75) / 100.0).alias("p75"),
    )


_EMB_NORM_SUB = """(SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE) /
                 sqrt(list_reduce(
                   list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
                   (p, q) -> p + q))) AS v
        FROM embeddings)"""

_TRIANGLE_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM {_EMB_NORM_SUB} a
  JOIN {_EMB_NORM_SUB} b
    ON a.vec_id < b.vec_id
  WHERE round(list_reduce(list_transform(range(1, len(a.v) + 1),
                                         i -> a.v[i] * b.v[i]), (p, q) -> p + q), 6) >= 0.85)
SELECT (SELECT COUNT(*) FROM pairs) AS n_edges,
       (SELECT COUNT(*)
        FROM pairs p1 JOIN pairs p2 ON p2.d1 = p1.d2
        JOIN pairs p3 ON p3.d1 = p1.d1 AND p3.d2 = p2.d2) AS n_triangles"""


@_q("similarity_triangles", _TRIANGLE_SQL)
def q_similarity_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the cosine-similarity graph (>= 0.85) — the
    clustering-coefficient numerator; high triangle density means the
    near-dup clusters are tight (transitive), low means chains that
    connected-components would over-merge. Edges satisfy d1 < d2, so
    each triangle a<b<c is counted exactly once via the two-join
    pattern (ab, bc, ac). The edge list is computed once and reused
    across the three join legs (exchange reuse); joins are on bare int
    ids — the vectors never enter the triangle phase."""
    e = _read(spark, sf_dir, "embeddings")
    # The edge list feeds three join legs; without a cut Spark recomputes
    # the full O(n^2) cosine subtree once per leg (exchange reuse can't
    # fire across the differing join keys). localCheckpoint materializes
    # the (tiny) edge list once — same pattern as connected_components.
    pairs = (
        embedding_cosine_pairs(e, threshold=0.85, lsh=False)
        .select("d1", "d2")
        .localCheckpoint()
    )
    p1, p2, p3 = pairs.alias("p1"), pairs.alias("p2"), pairs.alias("p3")
    tri = (
        p1.join(p2, F.col("p2.d1") == F.col("p1.d2"))
        .join(
            p3,
            (F.col("p3.d1") == F.col("p1.d1")) & (F.col("p3.d2") == F.col("p2.d2")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    edges = pairs.agg(F.count("*").alias("n_edges"))
    return edges.crossJoin(tri)


_WEIGHTED_SAMPLE_SQL = f"""
WITH mx AS (SELECT MAX(n_chars) AS m FROM documents),
h AS (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS md
      FROM documents)
SELECT h.doc_id, h.n_chars
FROM h CROSS JOIN mx
WHERE {_ph.duck_hex_int('md', 1, 8)} * mx.m < h.n_chars * 4294967296"""


@_q("weighted_sample", _WEIGHTED_SAMPLE_SQL)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep each doc with
    probability n_chars / max(n_chars) — longer documents
    proportionally more likely, the standard size-biased curation
    sampler. The coin is md5(doc_id) as a 32-bit uniform, and the
    comparison is integer cross-multiplication (u * max < w * 2^32) —
    no doubles, so reproducible in any engine AND stable under re-runs
    / repartitioning (rand() would be neither). The global max is a
    1-row broadcast cross join, never a driver action."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mx = docs.agg(F.max("n_chars").alias("m"))
    u = _ph.md5_int32(F.col("doc_id").cast("string"))
    return (
        docs.crossJoin(F.broadcast(mx))
        .where(u * F.col("m") < F.col("n_chars") * F.lit(4294967296))
        .select("doc_id", "n_chars")
    )


_PMI_SQL = r"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS a
  FROM documents),
tokp AS (
  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS token
  FROM arr),
uni AS (SELECT token, COUNT(*) AS c FROM tokp GROUP BY token),
nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni),
big AS (
  SELECT t1.token AS t1, t2.token AS t2, COUNT(*) AS n
  FROM tokp t1 JOIN tokp t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  GROUP BY t1.token, t2.token),
nb AS (SELECT CAST(SUM(n) AS BIGINT) AS nb FROM big),
scored AS (
  SELECT b.t1, b.t2, b.n,
         round(ln((CAST(b.n AS DOUBLE) / nb.nb)
                  / ((CAST(u1.c AS DOUBLE) / nu.nu)
                     * (CAST(u2.c AS DOUBLE) / nu.nu))), 6) AS pmi
  FROM big b
  JOIN uni u1 ON u1.token = b.t1
  JOIN uni u2 ON u2.token = b.t2
  CROSS JOIN nu CROSS JOIN nb
  WHERE b.n >= 5)
SELECT t1, t2, n, pmi, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, t1 ASC, t2 ASC) AS rk
  FROM scored) t
WHERE rk <= 100"""


@_q("bigram_pmi", _PMI_SQL)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 collocations by pointwise mutual information over
    adjacent token bigrams (n >= 5): the phrase-mining pass that feeds
    tokenizer merges. Bigrams come from zip_with of the token array
    against its own tail (no positional self-join on the Spark side —
    that's the oracle's shape); unigram marginals join back on each
    side; PMI is computed in doubles with pinned operand order and
    rounded to 6 dp BEFORE ranking (tie-break t1, t2) so a sub-ulp
    ln() divergence can't reorder the board — same discipline as
    tfidf_top_terms. Global top-k via TakeOrderedAndProject, window
    only over the 100 survivors."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    arr = docs.select(F.col("doc_id"), toks.alias("a"))
    bigrams = F.zip_with(
        F.expr("slice(a, 1, size(a) - 1)"),
        F.expr("slice(a, 2, size(a) - 1)"),
        lambda x, y: F.struct(x.alias("t1"), y.alias("t2")),
    )
    tok = arr.select(F.explode("a").alias("token"))
    uni = tok.groupBy("token").agg(F.count("*").alias("c"))
    nu = uni.agg(F.sum("c").cast("bigint").alias("nu"))
    big = (
        arr.select(F.explode(bigrams).alias("bg"))
        .select(F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 5)
    )
    nb = (
        arr.select((F.size("a") - 1).alias("k"))
        .where(F.col("k") > 0)
        .agg(F.sum("k").cast("bigint").alias("nb"))
    )
    scored = (
        big.join(uni.withColumnRenamed("token", "t1").withColumnRenamed("c", "c1"), "t1")
        .join(uni.withColumnRenamed("token", "t2").withColumnRenamed("c", "c2"), "t2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "t1",
            "t2",
            "n",
            F.round(
                F.log(
                    (F.col("n").cast("double") / F.col("nb"))
                    / (
                        (F.col("c1").cast("double") / F.col("nu"))
                        * (F.col("c2").cast("double") / F.col("nu"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.desc("pmi"), F.asc("t1"), F.asc("t2")).limit(100)
    w = Window.orderBy(F.desc("pmi"), F.asc("t1"), F.asc("t2"))
    return top.select(
        "t1", "t2", "n", "pmi", F.row_number().over(w).cast("int").alias("rk")
    )


_CMS_W, _CMS_D = 512, 4
_CMS_FAM = _ph.hash_family(_CMS_D, seed=0xC31)

_CMS_SQL = rf"""
WITH tokv AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS token
  FROM documents),
t1 AS (SELECT token, md5(token) AS h, COUNT(*) AS true_cnt FROM tokv GROUP BY token),
hbase AS (
  SELECT token, true_cnt,
         ({_ph.duck_hex_int('h', 1, 8)}) % {_ph.MERSENNE31} AS hb
  FROM t1),
fam AS (
  SELECT * FROM (VALUES {", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(_CMS_FAM))})
  AS t(j, a, b)),
occ AS (SELECT h.hb FROM tokv v JOIN hbase h USING (token)),
cms AS (
  SELECT f.j, ((f.a * o.hb + f.b) % {_ph.MERSENNE31}) % {_CMS_W} AS col,
         COUNT(*) AS c
  FROM occ o CROSS JOIN fam f GROUP BY 1, 2),
probe AS (
  SELECT h.token, h.true_cnt, f.j,
         ((f.a * h.hb + f.b) % {_ph.MERSENNE31}) % {_CMS_W} AS col
  FROM hbase h CROSS JOIN fam f),
est AS (
  SELECT p.token, p.true_cnt, MIN(c.c) AS est
  FROM probe p JOIN cms c ON p.j = c.j AND p.col = c.col
  GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS n FROM tokv)
SELECT token, CAST(est AS BIGINT) AS est, CAST(true_cnt AS BIGINT) AS true_cnt
FROM est CROSS JOIN tot
WHERE est * 256 >= n
ORDER BY est DESC, token ASC"""


@_q("cms_heavy_hitters", _CMS_SQL)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters over corpus tokens: a {_CMS_D}x{_CMS_W}
    sketch (affine universal hashes over the 32-bit md5 base — the same
    portable family as MinHash, so the DuckDB oracle rebuilds every cell
    bit-for-bit), point-queried for every distinct token; tokens whose
    CMS estimate clears total/256 are reported with their exact count
    alongside (est >= true always — the CMS one-sided error).

    Scale shape: the SKETCH is the point. The cms table is at most
    d x w = 2048 cells regardless of corpus size — it broadcasts, so
    the estimate join is map-side; the only corpus-proportional shuffles
    are the token count aggregates (map-combined, fixed-width keys).
    The threshold compare is integer cross-multiplication (est*256 >=
    total) against a 1-row broadcast scalar — no floats anywhere in the
    operator."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tok = _read(spark, sf_dir, "documents").select(F.explode(toks).alias("token"))
    hb = (_ph.md5_int32("token") % F.lit(_ph.MERSENNE31)).alias("hb")

    def cols(hb_col):
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (_ph.affine(hb_col, a, b) % F.lit(_CMS_W)).alias("col"),
                )
                for j, (a, b) in enumerate(_CMS_FAM)
            ]
        )

    occ = tok.select(hb)
    cms = (
        occ.select(F.explode(cols(F.col("hb"))).alias("e"))
        .select("e.j", "e.col")
        .groupBy("j", "col")
        .agg(F.count("*").alias("c"))
    )
    per_tok = tok.groupBy("token").agg(F.count("*").alias("true_cnt"))
    probe = per_tok.select(
        "token", "true_cnt", F.explode(cols(_ph.md5_int32("token") % F.lit(_ph.MERSENNE31))).alias("e")
    ).select("token", "true_cnt", "e.j", "e.col")
    est = (
        probe.join(F.broadcast(cms), ["j", "col"])
        .groupBy("token", "true_cnt")
        .agg(F.min("c").alias("est"))
    )
    tot = tok.agg(F.count("*").alias("n"))
    return (
        est.crossJoin(F.broadcast(tot))
        .where(F.col("est") * 256 >= F.col("n"))
        .select("token", "est", "true_cnt")
        .orderBy(F.desc("est"), F.asc("token"))
    )


_PR_SCALE = 1_000_000_000_000  # rank mass in integer micro-units
_PR_ITERS = 5


def _pagerank_sql() -> str:
    """Unrolled integer PageRank oracle: 5 iterations of
    rank' = (3*SCALE) // (20*n) + (17 * sum(rank//deg over in-edges)) // 20
    (d = 0.85 = 17/20 kept rational; every op is integral division on
    positive integers, identical semantics in Spark's `div` and
    DuckDB's `//`)."""
    its = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        its.append(f"""it{i} AS (
  SELECT d.node, d.deg,
         CAST((3 * {_PR_SCALE}) // (20 * nn.n)
              + (17 * COALESCE(s.s, 0)) // 20 AS BIGINT) AS rank
  FROM deg d CROSS JOIN nn
  LEFT JOIN (SELECT e.dst AS node, SUM(r.rank // r.deg) AS s
             FROM edges e JOIN {prev} r ON e.src = r.node
             GROUP BY e.dst) s ON s.node = d.node)""")
        prev = f"it{i}"
    return f"""WITH pairs AS ({approx_oracles.embedding_cosine_lsh_sql()}),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL SELECT d2, d1 FROM pairs),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT node, deg, CAST({_PR_SCALE} // nn.n AS BIGINT) AS rank
       FROM deg CROSS JOIN nn),
{", ".join(its)}
SELECT CAST(node AS BIGINT) AS node, rank AS rank_u
FROM {prev} ORDER BY rank_u DESC, node ASC"""


@_q("similarity_pagerank", _pagerank_sql())
def q_similarity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph centrality over the embedding similarity graph: {_PR_ITERS}
    PageRank iterations (d = 17/20) on the symmetrized LSH cosine-pair
    edges, in EXACT integer arithmetic — ranks live in 1e12 micro-units
    and every damping/contribution step is integral division, so the
    rank vector is bit-identical across engines, partitionings, and
    reruns (a float PageRank could never hash-match an oracle).

    Scale shape: fixed-iteration rounds over (node, deg, rank) triples;
    the 1-row node count broadcasts; edges shuffle once per round on
    src/dst (bare id pairs). The edge list is localCheckpoint-ed once —
    the plan references it 6 times (5 contribution rounds + degrees),
    and without the lineage cut each reference would re-run the whole
    LSH pair pipeline (sketch UDF included)."""
    e = _read(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs(
        e, threshold=0.4, lsh=True, n_planes=32, bands=4
    ).select("d1", "d2")
    edges = (
        pairs.union(pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
        .select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .localCheckpoint()
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    nn = deg.agg(F.count("*").alias("n"))
    base = deg.crossJoin(F.broadcast(nn))
    ranks = base.select(
        "node", "deg", "n", F.expr(f"{_PR_SCALE} div n").alias("rank")
    )
    for _ in range(_PR_ITERS):
        msgs = edges.join(ranks, edges["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), F.expr("rank div deg").alias("c")
        )
        s = msgs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            base.join(s, "node", "left")
            .select(
                "node",
                "deg",
                "n",
                (
                    F.expr(f"(3 * {_PR_SCALE}) div (20 * n)")
                    + F.expr("(17 * coalesce(s, 0)) div 20")
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").alias("rank_u")).orderBy(
        F.desc("rank_u"), F.asc("node")
    )


# m deliberately undersized for the corpus (~0.6 fill) so the
# deterministic false-positive set is non-empty and visible in output.
_BLOOM_M, _BLOOM_K = 2048, 4
_BLOOM_FAM = _ph.hash_family(_BLOOM_K, seed=0xB100)

_BLOOM_SQL = rf"""
WITH d0 AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
d AS (SELECT doc_id, ({_ph.duck_hex_int('h', 1, 8)}) % {_ph.MERSENNE31} AS hb FROM d0),
fam AS (
  SELECT * FROM (VALUES {", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(_BLOOM_FAM))})
  AS t(j, a, b)),
corpus AS (SELECT * FROM d WHERE doc_id % 10 <> 7),
newb AS (SELECT * FROM d WHERE doc_id % 10 = 7),
bits AS (
  SELECT DISTINCT ((f.a * c.hb + f.b) % {_ph.MERSENNE31}) % {_BLOOM_M} AS bit
  FROM corpus c CROSS JOIN fam f),
probe AS (
  SELECT n.doc_id, n.hb,
         ((f.a * n.hb + f.b) % {_ph.MERSENNE31}) % {_BLOOM_M} AS bit
  FROM newb n CROSS JOIN fam f),
hit AS (
  SELECT p.doc_id,
         CAST(MIN(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS INT) AS maybe_dup
  FROM probe p LEFT JOIN bits b ON p.bit = b.bit
  GROUP BY p.doc_id)
SELECT h.doc_id, h.maybe_dup,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM corpus c JOIN newb n2 ON c.hb = n2.hb
         WHERE n2.doc_id = h.doc_id) THEN 1 ELSE 0 END AS INT) AS exact_dup
FROM hit h"""


@_q("bloom_dedup_gate", _BLOOM_SQL)
def q_bloom_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingestion gate: probe each new-batch document's
    content fingerprint against a {_BLOOM_K}-hash / {_BLOOM_M}-bit Bloom
    filter of the corpus. ``maybe_dup`` is the Bloom answer (one-sided:
    never 0 for a true duplicate; deterministic false positives the
    oracle reproduces bit-for-bit via the same affine family);
    ``exact_dup`` is the ground truth, so the query also EXHIBITS the
    false-positive set (maybe_dup=1, exact_dup=0).

    Scale shape: the filter is the point — the corpus collapses to at
    most m distinct set-bit rows (a map-combined distinct), which
    broadcast; probing is a map-side left join + per-doc min. The
    exact-dup leg is a fingerprint semi-join (fixed-width keys). At
    100 TB the bits table would be built once and reused per batch."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        (_ph.md5_int32(F.lower(F.trim(F.col("text")))) % F.lit(_ph.MERSENNE31)).alias("hb"),
    )
    corpus = d.where(F.col("doc_id") % 10 != 7)
    newb = d.where(F.col("doc_id") % 10 == 7)

    def bits_arr(hb_col):
        return F.array(
            *[
                (_ph.affine(hb_col, a, b) % F.lit(_BLOOM_M)).alias(f"b{j}")
                for j, (a, b) in enumerate(_BLOOM_FAM)
            ]
        )

    bits = (
        corpus.select(F.explode(bits_arr(F.col("hb"))).alias("bit"))
        .distinct()
        .withColumn("present", F.lit(1))
    )
    probe = newb.select("doc_id", "hb", F.explode(bits_arr(F.col("hb"))).alias("bit"))
    hit = (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id", "hb")
        .agg(F.min(F.coalesce("present", F.lit(0))).cast("int").alias("maybe_dup"))
    )
    exact = corpus.select(F.col("hb").alias("c_hb")).distinct()
    return (
        hit.join(F.broadcast(exact), hit["hb"] == exact["c_hb"], "left")
        .select(
            "doc_id",
            "maybe_dup",
            F.when(F.col("c_hb").isNotNull(), 1).otherwise(0).cast("int").alias("exact_dup"),
        )
    )


_BIGRAM_FAM_SQL = r"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS a
  FROM documents),
tokp AS (
  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS token
  FROM arr),
bg AS (
  SELECT t1.doc_id, t1.token AS t1, t2.token AS t2
  FROM tokp t1 JOIN tokp t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
df AS (
  SELECT t1, t2, COUNT(DISTINCT doc_id) AS df
  FROM bg GROUP BY t1, t2),
per AS (
  SELECT b.doc_id,
         COUNT(*) AS n_bigrams,
         CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
  FROM bg b JOIN df d ON b.t1 = d.t1 AND b.t2 = d.t2
  GROUP BY b.doc_id)
SELECT doc_id, n_bigrams, n_common,
       round(CAST(n_common AS DOUBLE) / n_bigrams, 6) AS familiarity
FROM per"""


@_q("bigram_familiarity", _BIGRAM_FAM_SQL)
def q_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score per document: the fraction of a doc's
    adjacent-token bigram occurrences that also appear in at least one
    OTHER document (document frequency >= 2). Garbled / machine-mangled
    text scores low; natural prose scores high — the exact-integer
    stand-in for an n-gram LM perplexity filter (counts and the df
    threshold are integers end-to-end; the single final division is the
    only float op, so the score is engine-reproducible bit-for-bit).

    Scale shape: bigrams explode once from the token-array zip (no
    positional self-join — that's the oracle's shape); df is a distinct
    + count keyed on the bigram; the join back to occurrences is an
    equi-join on the same key (AQE splits the boilerplate-bigram skew);
    per-doc reduction is a hash aggregate. Token arrays never shuffle."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    bigrams = F.zip_with(
        F.expr("slice(a, 1, size(a) - 1)"),
        F.expr("slice(a, 2, size(a) - 1)"),
        lambda x, y: F.struct(x.alias("t1"), y.alias("t2")),
    )
    bg = (
        docs.select(F.col("doc_id"), toks.alias("a"))
        .where(F.size("a") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", F.col("b.t1").alias("t1"), F.col("b.t2").alias("t2"))
    )
    df = (
        bg.dropDuplicates(["doc_id", "t1", "t2"])
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("df"))
    )
    per = (
        bg.join(df, ["t1", "t2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_common"),
        )
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        "n_common",
        F.round(F.col("n_common").cast("double") / F.col("n_bigrams"), 6).alias(
            "familiarity"
        ),
    )


_CLUSTER_SIZES_SQL = f"""
WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a),
groups AS (
  SELECT a AS doc_id, least(a, min(b)) AS group_id FROM reach GROUP BY a),
sizes AS (SELECT group_id, COUNT(*) AS cluster_size FROM groups GROUP BY group_id)
SELECT cluster_size, COUNT(*) AS n_clusters
FROM sizes GROUP BY cluster_size"""


@_q("dedup_cluster_sizes", _CLUSTER_SIZES_SQL)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit: histogram of duplicate-cluster sizes (clusters of
    >= 2 near-identical docs from the exact n-gram Jaccard graph).
    The report a curation run publishes — 'how much of the corpus is
    duplicated, and in how big clumps'. Components via label
    propagation; both follow-up aggregates reduce tiny frames. Oracle
    recomputes components with a recursive CTE."""
    from aqi_featurestore_spark.operators.dedup_groups import connected_components

    d = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.2, broadcast=True)
    comp = connected_components(pairs.select("d1", "d2"))
    sizes = comp.groupBy("group_id").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count("*").alias("n_clusters"))


# ---------------------------------------------------------------------------
# Deterministic per-group reservoir sample; rolling distinct-user window
# ---------------------------------------------------------------------------

_RESERVOIR_SQL = f"""
WITH h AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS md FROM documents),
rk AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY {_ph.duck_hex_int('md', 1, 8)}, doc_id) AS INT) AS rn
  FROM h)
SELECT doc_id, lang, rn FROM rk WHERE rn <= 20"""


@_q("hash_reservoir_sample", _RESERVOIR_SQL)
def q_hash_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group uniform k-sample without replacement, deterministically:
    keep each language's 20 docs with the smallest md5(doc_id) — under a
    random-oracle hash the k smallest hashes ARE a uniform k-subset, but
    unlike rand() the pick is stable across reruns, retries, and
    repartitioning (and two engines agree on it, which is the point of
    the oracle). This is the distributed form of reservoir sampling: no
    sequential state, one per-group top-k. At scale swap row_number for
    a groupBy min_by-k or window-free TakeOrdered per group if a single
    group dominates."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    u = _ph.md5_int32(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        docs.select(
            "doc_id", "lang", F.row_number().over(w).cast("int").alias("rn")
        )
        .where(F.col("rn") <= 20)
    )


_ROLLING_DAU_SQL = """
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
tgt AS (
  SELECT CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS day,
         user_id
  FROM daily)
SELECT strftime(day, '%Y-%m-%d') AS day, COUNT(DISTINCT user_id) AS dau_7d
FROM tgt
WHERE day <= (SELECT MAX(CAST(ts AS DATE)) FROM events)
GROUP BY day"""


@_q("rolling_dau", _ROLLING_DAU_SQL)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling-DAU
    board metric. COUNT(DISTINCT) can't ride a sliding window frame, so
    the scalable plan reduces FIRST (distinct (day, user) — collapses
    events to at most |days|x|users|), then fans each row out to the 7
    target days it supports (sequence+explode, a x7 multiplier on the
    already-reduced frame — never on raw events), then distinct-counts
    per target day. Two shuffles on (day-ish, user) keys. Days beyond
    the data's max date are trimmed against a 1-row broadcast max."""
    e = _read(spark, sf_dir, "events")
    daily = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    tgt = daily.select(
        F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("day"),
        "user_id",
    )
    mx = e.agg(F.max(F.to_date("ts")).alias("mx"))
    return (
        tgt.crossJoin(F.broadcast(mx))
        .where(F.col("day") <= F.col("mx"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau_7d"))
    )


# ---------------------------------------------------------------------------
# Sparse lexical similarity, quantile bucketizer, policy dedup, skew report
# ---------------------------------------------------------------------------

_SPARSE_TOPK_SQL = r"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS a
  FROM documents),
tokv AS (SELECT doc_id, unnest(a) AS token FROM arr),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tokv GROUP BY doc_id, token),
dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents),
w AS (
  SELECT f.doc_id, f.token,
         CAST(round(f.tf * ln((n.n + 1.0) / (d.df + 1.0)) * 1000000, 0) AS BIGINT) AS w
  FROM tf f JOIN dfq d USING (token) CROSS JOIN n
  WHERE d.df <= 100),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(SUM(a.w * b.w) AS BIGINT) AS score_raw,
         COUNT(*) AS n_shared
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT d1, d2, score_raw, n_shared, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
    ORDER BY score_raw DESC, d1 ASC, d2 ASC) AS rk FROM pairs) t
WHERE rk <= 50"""


@_q("sparse_lexical_topk", _SPARSE_TOPK_SQL)
def q_sparse_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most lexically similar doc pairs by TF-IDF-weighted token
    overlap — the sparse (BM25-family) counterpart to the dense
    embedding similarity ops. The posting-list self-join is banded to
    df <= 100: super-common tokens contribute ~nothing to the score but
    quadratic join volume (the same insight as the Jaccard prefix
    filter, applied to weighted retrieval). Weights quantize to integer
    micro-units so the pair score is an exact int64 sum — order-free
    across partitions and engines; ranking needs no rounding at all.
    Global top-k via TakeOrderedAndProject; window over 50 survivors."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
    )
    tokv = docs.select("doc_id", F.explode(toks).alias("token"))
    tf = tokv.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    w = (
        tf.join(dfq, "token")
        .where(F.col("df") <= 100)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) * 1e6,
                0,
            )
            .cast("long")
            .alias("w"),
        )
    )
    a, b = w.alias("a"), w.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("bigint").alias("score_raw"),
            F.count("*").alias("n_shared"),
        )
    )
    top = pairs.orderBy(F.desc("score_raw"), F.asc("d1"), F.asc("d2")).limit(50)
    wk = Window.orderBy(F.desc("score_raw"), F.asc("d1"), F.asc("d2"))
    return top.select(
        "d1", "d2", "score_raw", "n_shared",
        F.row_number().over(wk).cast("int").alias("rk"),
    )


_BUCKETIZE_SQL = """
WITH c AS (
  SELECT event_id, CAST(round("value" * 100, 0) AS BIGINT) AS vc FROM events),
bp AS (
  SELECT quantile_cont(vc, 0.25) AS p25,
         quantile_cont(vc, 0.50) AS p50,
         quantile_cont(vc, 0.75) AS p75
  FROM c),
assigned AS (
  SELECT c.event_id, c.vc,
         CASE WHEN c.vc <= bp.p25 THEN 1
              WHEN c.vc <= bp.p50 THEN 2
              WHEN c.vc <= bp.p75 THEN 3
              ELSE 4 END AS bucket
  FROM c CROSS JOIN bp)
SELECT bucket, COUNT(*) AS n,
       CAST(MIN(vc) AS DOUBLE) / 100.0 AS lo,
       CAST(MAX(vc) AS DOUBLE) / 100.0 AS hi
FROM assigned GROUP BY bucket"""


@_q("quartile_bucketize", _BUCKETIZE_SQL)
def q_quartile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase quantile bucketizer — the SCALE path for quantile
    binning, vs value_deciles' global-sort ntile: phase 1 reduces the
    corpus to three breakpoints (one aggregate), phase 2 assigns buckets
    with a broadcast CASE — no global sort, no window, fully parallel.
    Quartile fractions are dyadic, so exact-percentile interpolation
    over integer cents is bit-identical across engines (same argument
    as group_median); bucket edges use <= consistently. Output is the
    per-bucket audit (count + realized [lo, hi])."""
    e = _read(spark, sf_dir, "events")
    c = e.select(
        "event_id", F.round(F.col("value") * 100, 0).cast("long").alias("vc")
    )
    bp = c.agg(
        F.percentile("vc", 0.25).alias("p25"),
        F.percentile("vc", 0.50).alias("p50"),
        F.percentile("vc", 0.75).alias("p75"),
    )
    assigned = c.crossJoin(F.broadcast(bp)).select(
        "event_id",
        "vc",
        F.when(F.col("vc") <= F.col("p25"), 1)
        .when(F.col("vc") <= F.col("p50"), 2)
        .when(F.col("vc") <= F.col("p75"), 3)
        .otherwise(4)
        .alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("n"),
        (F.min("vc").cast("double") / 100.0).alias("lo"),
        (F.max("vc").cast("double") / 100.0).alias("hi"),
    )


_KEEP_BEST_SQL = f"""
WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a),
groups AS (
  SELECT a AS doc_id, least(a, min(b)) AS group_id FROM reach GROUP BY a),
ranked AS (
  SELECT g.doc_id, g.group_id,
         row_number() OVER (
           PARTITION BY g.group_id
           ORDER BY d.n_chars DESC, g.doc_id ASC) AS rn
  FROM groups g JOIN documents d USING (doc_id))
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM groups)
   OR d.doc_id IN (SELECT doc_id FROM ranked WHERE rn = 1)"""


@_q("dedup_keep_best", _KEEP_BEST_SQL)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based dedup resolution: within each near-dup cluster keep
    the HIGHEST-QUALITY doc (longest, tie -> lowest id) instead of
    dedup_resolve_docs' min-id canonical — the rule real curation
    pipelines want ('keep the best copy, drop the rest'). Winner per
    cluster via max_by on (n_chars, -doc_id) — a hash aggregate over
    cluster members, no window sort; survivors = winners + all docs in
    no cluster (broadcast anti join on the tiny member set)."""
    from aqi_featurestore_spark.operators.dedup_groups import connected_components

    d = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.2, broadcast=True)
    comp = connected_components(pairs.select("d1", "d2"))
    members = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    winners = members.groupBy("group_id").agg(
        F.max_by(
            F.col("doc_id"), F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))
        ).alias("doc_id")
    )
    keep_clustered = d.join(
        F.broadcast(winners.select("doc_id")), "doc_id", "left_semi"
    )
    unclustered = d.join(
        F.broadcast(comp.select("doc_id")), "doc_id", "left_anti"
    )
    return unclustered.unionByName(keep_clustered).select(
        "doc_id", "lang", "n_chars"
    )


_SKEW_REPORT_SQL = """
WITH e AS (
  SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY user_id),
l AS (
  SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_partkey),
o AS (
  SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY o_custkey)
SELECT 'events.user_id' AS key_name,
       CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS top1_cnt,
       CAST(MAX(c) AS DOUBLE) / SUM(c) AS top1_share FROM e
UNION ALL
SELECT 'lineitem.l_partkey', CAST(SUM(c) AS BIGINT), COUNT(*),
       CAST(MAX(c) AS BIGINT), CAST(MAX(c) AS DOUBLE) / SUM(c) FROM l
UNION ALL
SELECT 'orders.o_custkey', CAST(SUM(c) AS BIGINT), COUNT(*),
       CAST(MAX(c) AS BIGINT), CAST(MAX(c) AS DOUBLE) / SUM(c) FROM o"""


@_q("skew_report", _SKEW_REPORT_SQL)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the report that tells you BEFORE a
    shuffle join whether to salt (operators/skew.py) or let AQE split:
    per candidate key, total rows, distinct keys, and the hottest key's
    share. Each table reduces via one map-combined groupBy to |keys|
    rows, then to a single stats row — the report costs one scan per
    table regardless of scale."""

    def stats(df: DataFrame, key: str, label: str) -> DataFrame:
        c = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("c"))
        return c.agg(
            F.lit(label).alias("key_name"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.max("c").cast("bigint").alias("top1_cnt"),
            (F.max("c").cast("double") / F.sum("c")).alias("top1_share"),
        )

    e = stats(_read(spark, sf_dir, "events"), "user_id", "events.user_id")
    l = stats(_read(spark, sf_dir, "lineitem"), "l_partkey", "lineitem.l_partkey")
    o = stats(_read(spark, sf_dir, "orders"), "o_custkey", "orders.o_custkey")
    return e.unionByName(l).unionByName(o)


# ---------------------------------------------------------------------------
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
