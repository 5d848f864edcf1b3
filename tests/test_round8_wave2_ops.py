"""Round-8 wave-2 additions: KMV bottom-k set-cardinality sketch,
Bloom semi-join scan reduction (+ its composition into a revenue
aggregate), MaxSim late-interaction retrieval (+ its shortlist-recall
audit), and hybrid reciprocal-rank fusion.

Cross-engine value parity for all three is covered by
test_oracle_parity.py (full registry); these tests pin the semantic
guarantees that the hash compare alone doesn't name: the KMV
estimator's accuracy envelope, the Bloom filter's one-sidedness, and
MaxSim's agreement with an independent numpy evaluation."""

from __future__ import annotations

import numpy as np
import pytest

from aqi_featurestore_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_kmv_estimates_within_envelope(spark):
    """K=256 bottom-k on ~1.2-3k-cardinality unions: the union estimate
    must land within the sketch's statistical envelope (~1/sqrt(K) ≈
    0.0625 std; we allow 4 sigma) for EVERY pair, and the intersection
    estimate must stay consistent (n_common <= l_union, est_intersection
    <= est_union)."""
    rows = QUERIES["kmv_set_cardinality"](spark, SF_DIR).collect()
    assert len(rows) == 190  # C(20 sources, 2)
    for r in rows:
        assert r["l_union"] <= r["k"]
        assert r["n_common"] <= r["l_union"]
        assert abs(r["rel_err_union"]) < 0.25, (r["source_a"], r["source_b"])
        assert r["est_intersection"] <= r["est_union"] + 1e-9
        # exact legs are internally consistent
        assert r["exact_intersection"] <= r["exact_union"]


def test_kmv_exact_when_under_k(spark):
    """Sub-K degenerate branch: pairs whose merged sketch is not full
    (l_union < K) must report the sketch size itself as the estimate —
    the exact-count contract both engines share."""
    rows = QUERIES["kmv_set_cardinality"](spark, SF_DIR).collect()
    for r in rows:
        if r["l_union"] < r["k"]:
            assert r["est_union"] == float(r["l_union"])


def test_bloom_semijoin_one_sided(spark):
    """No false negatives, ever: every true match passes the Bloom, so
    n_pass_bloom == n_true_match + n_false_pos exactly, per group."""
    rows = QUERIES["bloom_semijoin_reduce"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_pass_bloom"] == r["n_true_match"] + r["n_false_pos"]
        assert r["n_pass_bloom"] <= r["n_fact"]


def test_bloom_semijoin_reduces_scan(spark):
    """At sf0.001 the quarter-of-urgent-orders dim is ~10 keys against a
    6k-row fact: the filter must prune the overwhelming majority of the
    scan (that is its reason to exist)."""
    rows = QUERIES["bloom_semijoin_reduce"](spark, SF_DIR).collect()
    total = sum(r["n_fact"] for r in rows)
    passed = sum(r["n_pass_bloom"] for r in rows)
    assert passed < 0.2 * total


def test_maxsim_matches_numpy(spark):
    """score_micro for every returned (query, doc) pair equals an
    independent numpy evaluation of the MaxSim rule (same cumsum
    left-fold normalize/dot discipline as operators/similarity.py)."""
    import duckdb

    out = {
        (r["q_id"], r["n_id"]): r["score_micro"]
        for r in QUERIES["maxsim_topk"](spark, SF_DIR).collect()
    }
    assert out
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    vecs = {}
    for vid, e in emb:
        x = np.asarray(e, dtype=np.float64)
        vecs[vid] = x / np.sqrt(np.cumsum(x * x)[-1])
    by_doc: dict[int, list[np.ndarray]] = {}
    for vid, v in vecs.items():
        by_doc.setdefault(vid // 8, []).append((vid, v))
    for (q_id, n_id), micro in out.items():
        expected = 0
        for _vid, qv in sorted(by_doc[q_id]):
            best = max(
                float(np.cumsum(qv * cv)[-1]) for _c, cv in by_doc[n_id]
            )
            # Spark round() is HALF_UP (away from zero), not banker's
            x = best * 1e9
            expected += int(np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5))
        assert expected == micro, (q_id, n_id)


def test_maxsim_topk_shape(spark):
    """<= 5 ranked rows per query, ranks contiguous from 1, scores
    non-increasing within a query."""
    rows = QUERIES["maxsim_topk"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        micros = [r["score_micro"] for r in rs]
        assert micros == sorted(micros, reverse=True)


def test_bloom_prefiltered_revenue_consistent_with_audit(spark):
    """Cross-query pin: the prefiltered revenue aggregate must cover
    exactly the rows the audit query counts as true matches — the
    transparency guarantee stated operationally."""
    audit = {
        r["l_returnflag"]: r["n_true_match"]
        for r in QUERIES["bloom_semijoin_reduce"](spark, SF_DIR).collect()
    }
    rev = QUERIES["bloom_prefiltered_revenue"](spark, SF_DIR).collect()
    for r in rev:
        assert r["n_items"] == audit[r["l_returnflag"]]
        assert r["revenue"] > 0


def test_maxsim_shortlist_exact_leg_matches_topk(spark):
    """Cross-query pin: the shortlist audit's exact leg is the same
    ranking maxsim_topk publishes — n_exact per query equals the topk
    row count, and a perfect-recall query's hits equal it too."""
    topk_counts: dict[int, int] = {}
    for r in QUERIES["maxsim_topk"](spark, SF_DIR).collect():
        topk_counts[r["q_id"]] = topk_counts.get(r["q_id"], 0) + 1
    rows = QUERIES["maxsim_shortlist_recall"](spark, SF_DIR).collect()
    assert {r["q_id"] for r in rows} == set(topk_counts)
    for r in rows:
        assert r["n_exact"] == topk_counts[r["q_id"]]
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert r["n_candidates"] <= 4 * 8 * 10 // 4  # <= tokens x M per query
        if r["recall_at_5"] == 1.0:
            assert r["n_hit"] == r["n_exact"]


def test_hybrid_rrf_mass_recomputes(spark):
    """The fused integer RRF mass equals 1e12 div (60 + rank) summed
    over the legs that ranked the doc, recomputed row by row."""
    rows = QUERIES["hybrid_rrf_fusion"](spark, SF_DIR).collect()
    assert rows
    seen_q = set()
    for r in rows:
        seen_q.add(r["q_id"])
        expected = 0
        if r["rk_cos"] is not None:
            expected += 1_000_000_000_000 // (60 + r["rk_cos"])
        if r["rk_dot"] is not None:
            expected += 1_000_000_000_000 // (60 + r["rk_dot"])
        assert expected == r["rrf_mass"]
        assert 1 <= r["rk"] <= 5
    assert len(seen_q) >= 5  # every 50th of 500 vectors -> 10 queries


def test_zone_map_skip_is_one_sided_and_layout_sensitive(spark):
    """Every skipped partition provably contained nothing (skip=1 =>
    hits=0), the layout-correlated predicate skips most partitions,
    and the uncorrelated one skips none — the measured layout lesson."""
    rows = QUERIES["zone_map_skip_audit"](spark, SF_DIR).collect()
    assert len(rows) > 50  # ~83 month partitions
    for r in rows:
        if r["skip_time"] == 1:
            assert r["hits_time"] == 0
        if r["skip_price"] == 1:
            assert r["hits_price"] == 0
        assert r["min_ship"] <= r["max_ship"]
    n_skip_time = sum(r["skip_time"] for r in rows)
    n_skip_price = sum(r["skip_price"] for r in rows)
    assert n_skip_time > len(rows) // 2  # pre-2000 months all skip
    # the unclustered column skips at most a few SPARSE months (at
    # sf0.001 a ~70-row month can max below the cut by luck); the
    # layout-correlated predicate must dominate it decisively
    assert n_skip_price < n_skip_time // 3
