"""Training-data curation operators: repetition signals, PII redaction,
benchmark-contamination checks, stratified sampling.

Extensions beyond the reference's surface (BASELINE.json north star),
covering the curation passes an LLM-scale pipeline runs between raw
crawl and tokenizer:

- **Repetition stats** (Gopher-style quality rules): type-token ratio,
  most-frequent-token share, most-frequent-bigram share. All exact
  counts + one final division — cross-engine deterministic.
- **PII redaction**: email/phone regexp_replace with match counts.
  Patterns are ASCII-explicit so Java regex (Spark) and RE2 (DuckDB)
  agree.
- **Contamination check**: fraction of a document's k-shingles that
  appear in a benchmark/eval set — the leakage gate run before
  training. The benchmark side is tiny by construction, so the
  membership join broadcasts; the corpus never shuffles.
- **Stratified sampling**: per-stratum keep-rates decided by an
  md5-derived uniform over the row key — no RNG, no shuffle,
  reproducible row-for-row in any engine (same mechanism as
  operators/split.py train/test splitting).

Every operator here is a `queries()` entry with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aqi_featurestore_spark.functions import portable_hash as ph

# ASCII-explicit PII patterns, identical semantics under Java regex and
# RE2. Deliberately conservative (no lookarounds, no non-greedy).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}"


def _tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def repetition_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals: ``(doc_id, n_tokens,
    distinct_ratio, top_token_ratio, top_bigram_ratio)``.

    High top-*-ratio / low distinct_ratio = boilerplate or degenerate
    repetition (the Gopher rules threshold these). Two explode->count
    aggregations over fixed-width (id, token-hash-sized) rows; document
    bodies never shuffle. Documents with < 2 tokens get a NULL
    top_bigram_ratio."""
    from aqi_featurestore_spark.operators.near_dedup import _spread

    toks = _spread(docs).select(F.col(id_col), _tokens(text_col).alias("t"))
    tok_counts = (
        toks.select(id_col, F.explode("t").alias("tkn"))
        .groupBy(id_col, "tkn")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_tok"),
        )
    )
    n = F.size("t")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("t", i + 1), F.element_at("t", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big_counts = (
        toks.select(id_col, F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_big"))
    )
    return (
        tok_counts.join(big_counts, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_ratio"
            ),
            (F.col("top_tok").cast("double") / F.col("n_tokens")).alias(
                "top_token_ratio"
            ),
            (F.col("top_big").cast("double") / F.col("n_bigrams")).alias(
                "top_bigram_ratio"
            ),
        )
    )


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """Adds ``redacted`` plus ``n_emails`` / ``n_phones`` match counts.
    Pure regexp expressions — row-local, no shuffle, whole-stage
    codegen; at 100 TB this is a map-only pass."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "redacted": F.regexp_replace(
                F.regexp_replace(c, EMAIL_PATTERN, email_token),
                PHONE_PATTERN,
                phone_token,
            ),
            "n_emails": F.regexp_count(c, F.lit(EMAIL_PATTERN)),
            "n_phones": F.regexp_count(c, F.lit(PHONE_PATTERN)),
        }
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of the doc's
    distinct k-word shingles that appear anywhere in the benchmark set
    -> ``(doc_id, n_shingles, n_contaminated, contamination_ratio)``.

    The benchmark shingle set (eval suites — tiny next to the corpus)
    is broadcast; the corpus side stays map-local per shingle, then one
    count aggregation per doc. Docs with no shingles (< k tokens) are
    absent from the output, mirroring the shingle-set semantics of the
    dedup family."""
    from aqi_featurestore_spark.operators.near_dedup import _doc_shingles, _spread

    # A small single-file scan arrives as a handful of partitions; the
    # per-row shingle explode is the expensive step, so spread it across
    # the cluster first (the shuffle moves only the source rows).
    doc_sh = _doc_shingles(_spread(docs), id_col=id_col, text_col=text_col, k=k)
    bench_sh = F.broadcast(
        _doc_shingles(benchmark, id_col=id_col, text_col=text_col, k=k)
        .select(F.col("shingle").alias("bshingle"))
        .distinct()
    )
    hit = doc_sh.join(
        bench_sh, doc_sh["shingle"] == bench_sh["bshingle"], "left"
    )
    agg = hit.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("bshingle").alias("n_contaminated"),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        (F.col("n_contaminated").cast("double") / F.col("n_shingles")).alias(
            "contamination_ratio"
        ),
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the 16-bit
    integer parsed from md5(key)'s first 4 hex chars is below
    ``floor(rate * 65536)`` for its stratum. No RNG state, no shuffle,
    stable under reruns and repartitioning — and exactly reproducible in
    SQL, which is how the oracle verifies it row-for-row. Same mechanism
    as the train/test splitter (operators/split.py)."""
    u16 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    thresh: Column = F.lit(int(default_rate * 65536))
    for value, rate in rates.items():
        thresh = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * 65536)))
            .otherwise(thresh)
        )
    return df.where(u16 < thresh)


def exact_substring_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
) -> DataFrame:
    """Maximal cross-document duplicate token spans (the ExactSubstr
    pattern, Lee et al. 2022, method only): every ``min_tokens``-token
    window whose text occurs in at least one OTHER document marks its
    positions; per doc, overlapping hits (gap <= min_tokens) merge into
    maximal spans via gaps-and-islands. Returns
    ``(id_col, span_id, tok_start, tok_end, span_tokens)``.

    Scale shape: shingling is map-side; only md5 shingle hashes shuffle
    (one aggregate for multi-doc hashes + one equi-join); the island
    windows partition BY DOC. See plans/web_curation.py for the
    registry query + oracle."""
    from pyspark.sql import Window

    L = min_tokens
    tok = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(text_col)), r"\s+"), lambda x: x != ""
        ).alias("t"),
    ).where(F.size("t") >= L)
    shing = tok.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.size("t") - L)).alias("pos"),
        "t",
    ).select(
        id_col,
        F.col("pos").cast("int").alias("pos"),
        F.md5(F.array_join(F.slice("t", F.col("pos") + 1, L), " ")).alias("h"),
    )
    dup = (
        shing.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .where(F.col("nd") > 1)
        .select("h")
    )
    hits = shing.join(dup, ["h"]).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.select(
        id_col, "pos", F.lag("pos").over(w).alias("prev")
    ).select(
        id_col,
        "pos",
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("pos") - F.col("prev") > L), 1)
            .otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("span_id"),
    )
    return isl.groupBy(id_col, "span_id").agg(
        F.min("pos").cast("int").alias("tok_start"),
        (F.max("pos") + L - 1).cast("int").alias("tok_end"),
        (F.max("pos") - F.min("pos") + L).cast("int").alias("span_tokens"),
    ).select(
        id_col, F.col("span_id").cast("int").alias("span_id"),
        "tok_start", "tok_end", "span_tokens",
    )


GOPHER_STOPWORDS = ("the", "and", "of", "to", "is", "in", "that", "for")


def _gopher_metrics(text_col: str) -> dict[str, Column]:
    """The raw integer counters behind the Gopher rules, as row-local
    column expressions over ``text_col``."""
    words = F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"), lambda x: x != ""
    )
    lines = F.split(text_col, "\n")
    n_hash = F.length(text_col) - F.length(F.regexp_replace(text_col, "#", ""))
    n_ell = (
        (F.length(text_col) - F.length(F.regexp_replace(text_col, r"\.\.\.", "")))
        / 3
    ).cast("long")
    return {
        "n_words": F.size(words).cast("long"),
        "total_wchars": F.length(F.concat_ws("", words)).cast("long"),
        "n_alpha": F.size(F.filter(words, lambda x: x.rlike("[a-z]"))).cast("long"),
        "n_stop": F.size(
            F.filter(words, lambda x: x.isin(*GOPHER_STOPWORDS))
        ).cast("long"),
        "n_lines": F.size(lines).cast("long"),
        "bullet_lines": F.size(
            F.filter(
                lines,
                lambda x: F.trim(x).startswith("-") | F.trim(x).startswith("*"),
            )
        ).cast("long"),
        "ellipsis_lines": F.size(
            F.filter(lines, lambda x: F.trim(x).endswith("..."))
        ).cast("long"),
        "n_sym": (n_hash + n_ell).cast("long"),
    }


def _gopher_rules(m: dict[str, Column]) -> list[tuple[Column, str]]:
    return [
        ((m["n_words"] < 50) | (m["n_words"] > 100000), "word_count"),
        (
            (m["total_wchars"] < 3 * m["n_words"])
            | (m["total_wchars"] > 10 * m["n_words"]),
            "mean_word_len",
        ),
        (m["n_sym"] * 10 > m["n_words"], "symbol_ratio"),
        (m["bullet_lines"] * 10 > m["n_lines"], "bullet_lines"),
        (m["ellipsis_lines"] * 10 > 3 * m["n_lines"], "ellipsis_lines"),
        (m["n_alpha"] * 10 < 8 * m["n_words"], "alpha_words"),
        (m["n_stop"] < 2, "stopword_floor"),
    ]


def gopher_keep(text_col: str = "text") -> Column:
    """``1`` iff every Gopher rule passes — a single row-local column
    expression, directly usable as a streaming filter."""
    keep = F.lit(1)
    for cond, _name in reversed(_gopher_rules(_gopher_metrics(text_col))):
        keep = F.when(cond, F.lit(0)).otherwise(keep)
    return keep.cast("int")


def gopher_quality(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-rule quality filter (Rae et al. 2021, appendix A — method
    only): word-count bounds, mean word length, symbol ratio, bullet /
    ellipsis line shares, alphabetic-word share, stopword floor. Every
    ratio rule is an EXACT cross-multiplied integer comparison; output
    carries the counters, the first failing rule, and ``keep``.

    Row-local JVM expressions only (zero-shuffle projection) — which is
    also why the same rules run unchanged inside a streaming ingest
    (``gopher_keep``). See plans/web_curation.py for the registry query
    and its oracle.
    """
    mx = _gopher_metrics(text_col)
    m = docs.select(
        id_col, *[c.alias(n) for n, c in mx.items()]
    )
    fails = _gopher_rules({n: F.col(n) for n in mx})
    reason = F.lit("ok")
    keep = F.lit(1)
    for cond, name in reversed(fails):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
        keep = F.when(cond, F.lit(0)).otherwise(keep)
    return m.select(
        id_col, "n_words", "total_wchars", "n_alpha", "n_stop", "n_sym",
        "n_lines", "bullet_lines", "ellipsis_lines",
        reason.alias("fail_reason"), keep.cast("int").alias("keep"),
    )
