"""Web-curation operators (plans/web_curation.py): planted-case tests
for URL canonicalization, the Gopher rules, and exact-substring spans.
The registry queries are hash-verified against DuckDB oracles by
test_oracle_parity; these pin the SEMANTICS on hand-built inputs where
the expected output is known by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.text_quality import exact_substring_spans
from aqi_featurestore_spark.plans.web_curation import _canonicalized


@pytest.mark.parametrize(
    "url,domain,canonical",
    [
        # www. + mixed case collapse; utm/ref stripped entirely
        (
            "https://WWW.Site7.com/p/1?utm_source=feed&ref=rss",
            "site7.com",
            "https://site7.com/p/1",
        ),
        # meaningful param survives, tracking param dropped
        (
            "https://www.site7.com/p/1?id=7&utm_campaign=x",
            "site7.com",
            "https://site7.com/p/1?id=7",
        ),
        # no query at all
        ("https://site7.com/p/1", "site7.com", "https://site7.com/p/1"),
        # params keep their relative order
        (
            "https://site9.org/a/b?z=1&utm_medium=m&y=2",
            "site9.org",
            "https://site9.org/a/b?z=1&y=2",
        ),
    ],
)
def test_url_canonicalization_cases(spark, url, domain, canonical):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    row = _canonicalized(df).collect()[0]
    assert row["domain"] == domain
    assert row["canonical_url"] == canonical


def test_exact_substring_spans_planted(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three four five six {shared} seven"),
            (3, "completely unrelated text with no overlap whatsoever "
                "nothing shared here at all truly unique content only"),
        ],
        "doc_id long, text string",
    )
    out = exact_substring_spans(docs, min_tokens=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # docs 1 and 2 each get exactly one merged span covering the shared
    # sentence; doc 3 gets nothing
    assert set(by_doc) == {1, 2}
    for d in (1, 2):
        assert len(by_doc[d]) == 1
    s1, s2 = by_doc[1][0], by_doc[2][0]
    n_shared = len(shared.split())
    assert s1["span_tokens"] == n_shared
    assert s2["span_tokens"] == n_shared
    assert s1["tok_start"] == 2  # after "alpha beta"
    assert s2["tok_start"] == 6  # after "one ... six"


def test_exact_substring_spans_split_and_merge(spark):
    # two shared 8-grams separated by a UNIQUE token stay two spans (the
    # unique token must not be swallowed into a span)...
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame(
        [(1, f"{a} gap {b}"), (2, f"{a} other {b}")],
        "doc_id long, text string",
    )
    out = exact_substring_spans(docs, min_tokens=8).collect()
    for doc_id in (1, 2):
        spans = sorted(
            (r for r in out if r["doc_id"] == doc_id), key=lambda r: r["tok_start"]
        )
        assert [(s["tok_start"], s["tok_end"]) for s in spans] == [(0, 7), (9, 16)]

    # ...while OVERLAPPING hits (a shared 9-token run = two overlapping
    # 8-gram hits at pos 0 and 1) merge into one maximal span
    c = "y1 y2 y3 y4 y5 y6 y7 y8 y9"
    docs2 = spark.createDataFrame(
        [(1, f"{c} tail1 end1"), (2, f"{c} tail2 end2")],
        "doc_id long, text string",
    )
    out2 = exact_substring_spans(docs2, min_tokens=8).collect()
    for doc_id in (1, 2):
        spans = [r for r in out2 if r["doc_id"] == doc_id]
        assert len(spans) == 1
        assert (spans[0]["tok_start"], spans[0]["tok_end"]) == (0, 8)
        assert spans[0]["span_tokens"] == 9


def test_gopher_filter_reasons(spark, tmp_path, monkeypatch):
    from aqi_featurestore_spark.plans.web_curation import q_gopher_quality_filter
    import aqi_featurestore_spark.plans.web_curation as wc

    ok_doc = (
        "the cat and the dog walked to the park and that was fine for "
        "everyone because the day was long and the sun was out and the "
        "grass was green and the air was cool and the walk was easy and "
        "people smiled at the dogs that passed them on the path today"
    )
    rows = [
        (1, ok_doc),                            # passes every rule
        (2, "too short"),                       # word_count
        (3, " ".join(["ab"] * 60)),             # mean_word_len (2 < 3)
        (4, " ".join(["#" + str(i) for i in range(30)]) + " " + ok_doc),  # symbol_ratio
        (5, " ".join(["12345"] * 60)),          # alpha_words (digits only)... or mean len
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(
        wc, "_read", lambda spark_, sf_dir, name: df
    )
    out = {r["doc_id"]: r for r in q_gopher_quality_filter(spark, "ignored").collect()}
    assert out[1]["keep"] == 1 and out[1]["fail_reason"] == "ok"
    assert out[2]["fail_reason"] == "word_count"
    assert out[3]["fail_reason"] == "mean_word_len"
    assert out[4]["fail_reason"] == "symbol_ratio"
    assert out[5]["keep"] == 0  # fails (digit words: mean_word_len ok=5, alpha fails)
    assert out[5]["fail_reason"] == "alpha_words"


def test_curation_ingest_stream(spark, tmp_path):
    """Streaming curation ingest: Gopher gate + watermarked
    canonical-url dedup, run over two microbatches — the quality gate
    drops junk rows, the dedup drops a same-canonical-url re-crawl, and
    survivors land in the parquet sink."""
    from aqi_featurestore_spark.streaming.jobs import run_curation_ingest_stream

    ok_doc = (
        "the cat and the dog walked to the park and that was fine for "
        "everyone because the day was long and the sun was out and the "
        "grass was green and the air was cool and the walk was easy and "
        "people smiled at the dogs that passed them on the path today"
    )
    src = tmp_path / "cur_src"
    src.mkdir()
    rows1 = [
        (1, ok_doc, "2024-01-01 00:00:00"),
        (2, "too short", "2024-01-01 00:00:10"),  # gopher drop
        (3, ok_doc + " extra tail words here", "2024-01-01 00:00:20"),
    ]
    df1 = spark.createDataFrame(
        rows1, "doc_id long, text string, ingest_ts string"
    ).withColumn("ingest_ts", F.to_timestamp("ingest_ts"))
    df1.coalesce(1).write.mode("append").parquet(str(src))
    q = run_curation_ingest_stream(
        spark, str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out1 = spark.read.parquet(str(tmp_path / "sink"))
    kept1 = {r["doc_id"] for r in out1.collect()}
    assert 2 not in kept1  # quality-dropped
    assert 1 in kept1 and 3 in kept1

    # batch 2: a re-crawl of doc 1's canonical url within the watermark
    # window (doc 10001 shares doc 1's canonical url iff the md5-derived
    # urls collide — instead, plant the dup by reusing doc_id 1, whose
    # derived url is identical by construction)
    rows2 = [
        (1, ok_doc, "2024-01-01 00:30:00"),  # same doc re-sent -> same url
        (4, ok_doc + " different tail entirely for this one", "2024-01-01 00:30:10"),
    ]
    df2 = spark.createDataFrame(
        rows2, "doc_id long, text string, ingest_ts string"
    ).withColumn("ingest_ts", F.to_timestamp("ingest_ts"))
    df2.coalesce(1).write.mode("append").parquet(str(src))
    q2 = run_curation_ingest_stream(
        spark, str(src), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)

    out2 = spark.read.parquet(str(tmp_path / "sink")).collect()
    n_doc1 = sum(1 for r in out2 if r["doc_id"] == 1)
    assert n_doc1 == 1  # the re-crawl deduped within the watermark
    assert any(r["doc_id"] == 4 for r in out2)
    for r in out2:
        assert r["canonical_url"].startswith("https://site")


def test_canonicalization_idempotent(spark):
    """canonicalize(canonicalize(url)) == canonicalize(url): a canonical
    URL has no www., no uppercase host, no tracking params — so a second
    pass must be the identity. Checked over the full derived-URL space
    (all 500 sf0.001 docs cover every derivation branch combination)."""
    from aqi_featurestore_spark.plans.web_curation import (
        _canonicalized,
        _derived_url,
    )
    from aqi_featurestore_spark.sources.testdata import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    once = _canonicalized(d.withColumn("url", _derived_url())).select(
        "doc_id", F.col("canonical_url").alias("c1")
    )
    twice = _canonicalized(
        once.select("doc_id", "c1", F.col("c1").alias("url"))
    ).select("doc_id", "c1", F.col("canonical_url").alias("c2"))
    bad = twice.where(F.col("c1") != F.col("c2")).count()
    assert bad == 0


def test_c4_line_clean_rules(spark, monkeypatch):
    import aqi_featurestore_spark.plans.web_curation as wc
    from aqi_featurestore_spark.plans.web_curation import q_c4_line_clean
    import hashlib

    good1 = "This sentence has plenty of words and ends properly."
    good2 = "Another adequately long line that also terminates here!"
    rows = [
        (1, "\n".join([
            good1,
            "short one",                       # < 3 words... (2 words) drop
            "no terminal punctuation here at all",  # no ./!/?/" drop
            "Contains lorem ipsum filler text right here.",  # boilerplate drop
            "function() { return 1; }",        # curly braces drop
            "Enable javascript to view this page.",  # javascript drop
            good2,
        ])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(wc, "_read", lambda s_, d_, n_: df)
    out = q_c4_line_clean(spark, "ignored").collect()[0]
    assert out["n_lines"] == 7
    assert out["kept_lines"] == 2
    expected = hashlib.md5((good1 + "\n" + good2).encode()).hexdigest()
    assert out["cleaned_md5"] == expected


def test_dsir_prefers_target_like_docs(spark, monkeypatch):
    """Planted semantics for DSIR selection: documents whose tokens are
    drawn from the target-domain vocabulary must outscore (logw) the
    off-domain ones, and the Gumbel field must be a pure function of
    doc_id (rerun-stable)."""
    from aqi_featurestore_spark.plans import web_curation as wc
    from aqi_featurestore_spark.plans.web_curation import q_dsir_select

    target_text = "alpha beta gamma delta alpha beta gamma delta"
    other_text = "omega sigma tau upsilon omega sigma tau upsilon"
    rows = (
        # target domain (src0) speaks alpha..delta
        [(i, target_text, "en", "src0", len(target_text)) for i in range(8)]
        # background (srcX) speaks omega..upsilon
        + [(100 + i, other_text, "en", "srcX", len(other_text)) for i in range(8)]
        # two candidates: one target-like, one background-like
        + [
            (200, target_text, "en", "srcY", len(target_text)),
            (201, other_text, "en", "srcY", len(other_text)),
        ]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(wc, "_read", lambda s_, d_, n_: df)
    out = {r["doc_id"]: r for r in q_dsir_select(spark, "ignored").collect()}
    assert out[200]["logw_micro"] > out[201]["logw_micro"]
    rerun = {r["doc_id"]: r for r in q_dsir_select(spark, "ignored").collect()}
    assert rerun[200]["g_micro"] == out[200]["g_micro"]
    assert rerun[201]["score_micro"] == out[201]["score_micro"]


def test_mixture_token_budget_caps_scarce_domains(spark, monkeypatch):
    """A scarce domain gets epoch-capped at 3.0; an abundant one takes
    its full uniform slice; realized shares sum to 1."""
    from aqi_featurestore_spark.plans import web_curation as wc
    from aqi_featurestore_spark.plans.web_curation import q_mixture_token_budget

    big = " ".join(["w"] * 100)   # 100 tokens
    small = "a b"                 # 2 tokens
    rows = [(1, big, "en", "abundant", len(big)),
            (2, small, "en", "scarce", len(small))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(wc, "_read", lambda s_, d_, n_: df)
    out = {r["source"]: r for r in q_mixture_token_budget(spark, "x").collect()}
    # budget = 102 // 2 = 51; per-domain desired = 51 // 2 = 25 (two-stage
    # integer floor division — this fixture has fraction .5 at the second
    # stage, the exact case where a round-to-nearest oracle would say 26)
    assert out["abundant"]["desired_tokens"] == 25
    assert out["abundant"]["realized_tokens"] == 25   # 0.25 epochs of 100
    assert out["scarce"]["realized_tokens"] == 6      # capped: 3.0 * 2
    assert out["scarce"]["epochs"] == 3.0
    assert abs(out["abundant"]["realized_share"] + out["scarce"]["realized_share"] - 1.0) < 1e-9

    # oracle parity on the same planted fixture: the DuckDB SQL must use
    # identical floor semantics (regression pin for the round-5 advisor
    # finding — a float-division oracle diverges on any fraction >= .5)
    import duckdb
    import pandas as pd

    from tests.oracle_utils import canonical_rows

    con = duckdb.connect()
    fixture = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    con.register("documents", fixture)
    oracle = con.sql(wc._MIX_BUDGET_SQL).fetchdf()
    mine = q_mixture_token_budget(spark, "x").toPandas()
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert canonical_rows(mine) == canonical_rows(oracle)


def test_temperature_mixture_rebalances(spark):
    """alpha=0.5 tempering: shares sum to ~1, the largest domain's share
    shrinks (boost < 1), the smallest grows (boost > 1), and tempered
    shares preserve the size ordering."""
    from aqi_featurestore_spark.plans import QUERIES

    rows = QUERIES["temperature_mixture"](spark, "/root/testdata/sf0.001").collect()
    assert abs(sum(r["p_temp"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["p_raw"] for r in rows) - 1.0) < 1e-4
    by_n = sorted(rows, key=lambda r: r["n_tokens"])
    assert by_n[0]["boost"] > 1.0 > by_n[-1]["boost"]
    temps = [r["p_temp"] for r in by_n]
    assert temps == sorted(temps)


def test_curation_funnel_v2_consistency(spark):
    """Funnel-v2 counts agree with the standalone component queries at
    sf0.001 and shrink monotonically through the stages."""
    from aqi_featurestore_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["stage"]: r["n_docs"] for r in QUERIES["curation_funnel_v2"](spark, sf).collect()}
    assert got["raw"] >= got["gopher"] >= got["gopher+ppl"] >= got["gopher+ppl+clf"]
    g = {r["doc_id"]: r["keep"] for r in QUERIES["gopher_quality_filter"](spark, sf).collect()}
    lm = {
        r["doc_id"]: int(r["nll_micro"] * 10 <= r["n_trans"] * 34_000_000)
        for r in QUERIES["lm_perplexity_score"](spark, sf).collect()
    }
    clf = {r["vec_id"] for r in QUERIES["quality_classifier_select"](spark, sf).collect()}
    assert got["raw"] == len(g)
    assert got["gopher"] == sum(g.values())
    assert got["gopher+ppl"] == sum(
        1 for d, k in g.items() if k and lm.get(d, 0)
    )
    assert got["gopher+ppl+clf"] == sum(
        1 for d, k in g.items() if k and lm.get(d, 0) and d in clf
    )
    assert got["gopher+ppl+clf"] > 0  # the planted corpus survives the ladder
