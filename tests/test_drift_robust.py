"""Drift monitoring + robust stats + new near-dedup variants:
hand-computed fixtures, equivalence vs the naive formulation, and
planted-case recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aqi_featurestore_spark.operators.drift import psi_drift, value_histogram
from aqi_featurestore_spark.operators.near_dedup import (
    edit_distance_pairs,
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)
from aqi_featurestore_spark.operators.robust_stats import (
    mad_outliers,
    winsorized_stats,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def test_value_histogram_hand_computed(spark):
    df = _vals(
        spark,
        [(1, "a", 0.5), (2, "a", 9.99), (3, "a", 10.0), (4, "a", 25.1), (5, "a", -0.1)],
    )
    got = {r["bin"]: (r["n"], r["sum_c"]) for r in
           value_histogram(df, "v", width=10.0).collect()}
    # floor(-0.1/10) = -1 — negatives get their own bin, not bin 0
    assert got[-1] == (1, -10)
    assert got[0] == (2, 50 + 999)
    assert got[1] == (1, 1000)
    assert got[2] == (1, 2510)


def test_psi_zero_for_identical_populations(spark):
    # one even id and one odd id per value -> sides see the same multiset
    rows = [(2 * i, "a", float(i % 7)) for i in range(200)]
    rows += [(2 * i + 1, "a", float(i % 7)) for i in range(200)]
    out = psi_drift(_vals(spark, rows), "v", F.col("id") % 2 == 0, width=1.0).collect()
    assert len(out) == 7
    assert all(r["psi_term"] == 0.0 for r in out)


def test_psi_detects_planted_shift(spark):
    ref = [(i, "a", 10.0 + (i % 5)) for i in range(0, 1000, 2)]
    cur = [(i, "a", 40.0 + (i % 5)) for i in range(1, 1000, 2)]
    df = _vals(spark, ref + cur)
    out = psi_drift(df, "v", F.col("id") % 2 == 0, width=5.0).collect()
    total = sum(r["psi_term"] for r in out)
    assert total > 0.25  # disjoint supports -> far past the 0.25 alarm


def test_winsorized_bounds_and_clip_counts(spark):
    # 1..999 plus one wild outlier at 1e6 in group a
    rows = [(i, "a", float(i)) for i in range(1, 1000)] + [(1000, "a", 1e6)]
    out = winsorized_stats(_vals(spark, rows), "v", ["grp"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 1000
    # p01 of 1000 points interpolates to ~10.99 -> values 1..10 clip low;
    # p99 lands inside the bulk (~990.01) -> 991..999 + the outlier clip high
    assert r["n_clip_lo"] == 10 and r["n_clip_hi"] == 10
    # clipped mean is pulled back near the bulk mean, not 1000+
    assert 490.0 < r["mean_wins"] < 520.0
    assert 10.0 <= r["lo_bound"] <= 12.0 and 985.0 <= r["hi_bound"] <= 995.0


def test_mad_flags_only_planted_outliers(spark):
    rows = [(i, "a", 50.0 + (i % 11) - 5) for i in range(100)]  # 45..55
    rows += [(200, "a", 500.0), (201, "a", -400.0)]
    out = mad_outliers(_vals(spark, rows), "v", ["grp"]).collect()[0]
    assert out["n"] == 102
    assert out["n_outliers"] == 2
    assert abs(out["med"] - 50.0) <= 1.0
    assert out["mad"] <= 5.0


def test_edit_distance_planted_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " today"),          # trailing edit, same prefix
            (3, base.replace("lazy", "sleepy")),  # mid edit within 80 chars
            (4, "zzz completely different start " + base),  # prefix differs
            (5, base),                      # exact dup
        ],
        "doc_id long, text string",
    )
    got = {(r["d1"], r["d2"]): r["dist"] for r in edit_distance_pairs(docs).collect()}
    assert got[(1, 5)] == 0
    assert 0 < got[(1, 2)] <= 8 or (1, 2) not in got  # 'today' lands past 80 chars
    assert (1, 3) in got and got[(1, 3)] <= 8
    assert all(4 not in p for p in got)  # different block, never compared


def test_prefix_filter_equals_naive_exact_jaccard(spark):
    """Lossless claim: prefix-filtered pairs == naive self-join pairs on
    real data (the sf0.001 documents corpus), bit-for-bit jaccard."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    naive = {
        (r["d1"], r["d2"]): (r["inter"], r["n1"], r["n2"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.2, broadcast=True).collect()
    }
    fast = {
        (r["d1"], r["d2"]): (r["inter"], r["n1"], r["n2"], r["jaccard"])
        for r in jaccard_prefix_pairs(docs, k=3, threshold=0.2).collect()
    }
    assert naive == fast and len(fast) > 0


def test_embedding_drift_hand_case(spark, tmp_path):
    """Planted two-snapshot corpus: even ids (reference) at +0.5 on dim0,
    odd ids (current) at -0.25 -> shift is exactly -0.75; dim1 constant
    across snapshots -> shift 0."""
    from aqi_featurestore_spark.plans.monitoring import q_embedding_drift

    rows = [(i, [0.5 if i % 2 == 0 else -0.25, 0.125], i % 3) for i in range(8)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {r["dim_id"]: r for r in q_embedding_drift(spark, str(tmp_path)).collect()}
    assert got[0]["mean_ref"] == 0.5
    assert got[0]["mean_cur"] == -0.25
    assert got[0]["shift"] == -0.75
    assert got[1]["shift"] == 0.0 and got[1]["mean_ref"] == 0.125


def test_k_anonymity_hand_case(spark, tmp_path):
    """Planted QI groups: 3 identical rows (one group of 3), 1 singleton
    -> histogram {3: 1 group, 1: 1 group}, singleton flagged under_k."""
    from aqi_featurestore_spark.plans.monitoring import q_k_anonymity_audit

    rows = [
        (1, "a", 1, 1500.0, "AUTO"),
        (2, "b", 1, 1600.0, "AUTO"),  # same (1, AUTO, bucket 1)
        (3, "c", 1, 1700.0, "AUTO"),
        (4, "d", 2, 9100.0, "HOUSE"),  # singleton
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = {r["group_size"]: r for r in q_k_anonymity_audit(spark, str(tmp_path)).collect()}
    assert got[3]["n_groups"] == 1 and got[3]["n_rows"] == 3
    assert got[1]["n_groups"] == 1 and got[1]["under_k"] == 1
    assert got[3]["under_k"] == 1  # 3 < 5
    assert got[1]["row_share"] == 0.25 and got[3]["row_share"] == 0.75
