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


#: Session-shared connected-components labels over the exact n-gram
#: Jaccard near-dup graph (k=3, threshold 0.2) — round-12: three registry
#: queries (dedup_resolve_docs, dedup_cluster_sizes, dedup_keep_best)
#: each re-ran the identical detector + label-propagation loop
#: (~15-18 Spark jobs) on every construction; the labels are
#: deterministic and every consumer's oracle re-derives them with a
#: recursive CTE from the raw corpus, so sharing changes nothing but the
#: job count (the `_serving_fits` session-cache discipline applied to
#: the dedup-resolution family).
_NGRAM_CC: dict[tuple[str, str, str], DataFrame] = {}


def ngram_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, group_id) for every document in the k=3/0.2 n-gram
    Jaccard near-dup graph — localCheckpoint-backed, built once per
    (app, corpus path, content fingerprint)."""
    import os

    from aqi_featurestore_spark.operators.dedup_groups import (
        connected_components,
    )

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        corpus_fingerprint(spark, sf_dir),
    )
    if key not in _NGRAM_CC:
        d = _read(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(d, k=3, threshold=0.2, broadcast=True)
        _NGRAM_CC[key] = connected_components(pairs.select("d1", "d2"))
    return _NGRAM_CC[key]


def corpus_fingerprint(spark: SparkSession, sf_dir: str) -> str:
    """Cheap content snapshot of a corpus directory: md5 over the
    sorted (path, size, mtime) data-file listing — driver-side metadata
    RPCs only, never row data. Every session fit cache folds this into
    its key (round-7 ADVICE/verdict ask: keys were (applicationId,
    path) only, so data rewritten at the same path within one session —
    exactly what the engine's own streaming ingest jobs do — would
    silently serve a stale fit). A changed file set, size, or mtime is
    a cache MISS; an unchanged immutable test corpus still hits."""
    import hashlib

    from aqi_featurestore_spark.sources import fs

    h = hashlib.md5()
    for p, sz, mt in sorted(fs.list_file_stats(spark, sf_dir)):
        h.update(f"{p}|{sz}|{mt}\n".encode())
    return h.hexdigest()[:16]


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


_TOKENS = r"""tokv AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                            x -> x <> '')) AS token
  FROM documents)"""
