#!/usr/bin/env python
"""Plan-quality audit: for each flagship query, extract the physical-plan
properties that matter at 100 TB — join strategies, scan pruning
(ReadSchema), pushed filters, exchange count, Python boundaries.

Usage: python scripts/explain_audit.py [sf_dir] [--md > docs/PLANS.md]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from aqi_featurestore_spark.plans import QUERIES  # noqa: E402
from aqi_featurestore_spark.session import get_spark  # noqa: E402

AUDIT = [
    "feature_derivation",
    "latest_per_key",
    "pit_join",
    "training_set",
    "online_lookup",
    "q1_pricing_summary",
    "revenue_by_nation",
    "hourly_rollup",
    "session_windows",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "embedding_cosine_dedup_lsh",
    "similarity_topk_cosine",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "multimodal_features",
    "repetition_stats",
    "pii_redaction",
    "contamination_check",
    "stratified_sample",
    "sequence_packing",
    "domain_mixture",
    "ema_features",
    "versioned_pit_multiview",
    "value_histogram",
    "drift_psi",
    "winsorized_stats",
    "mad_outliers",
    "edit_distance_pairs",
    "jaccard_prefix_filter",
    "shipping_priority",
    "order_priority_check",
    "brand_supplier_distinct",
    "suppliers_kept_waiting",
    "shipmode_priority",
    "excess_stock_suppliers",
    "bigram_familiarity",
    "cms_heavy_hitters",
    "bloom_dedup_gate",
    "similarity_pagerank",
    "session_relative_features",
    "time_weighted_avg",
    "counter_rate",
    "locf_gap_fill",
    "lttb_downsample",
    "benford_audit",
    "nearest_station_join",
    "ann_recall",
    "market_basket",
    "weighted_median",
    "ab_test_zscore",
    "label_spreading",
    "doc_keywords",
    "star_denormalize",
    "rocchio_classify",
    "rollup_cascade",
    "fk_violations",
    "incremental_agg_merge",
    "trend_features",
    "next_observation_join",
    "customer_order_distribution",
    "small_quantity_revenue",
    "high_balance_inactive",
    "nearest_observation_join",
    "corpus_select_topp",
    "token_commonness",
    "cluster_centroids",
    "embedding_quantize",
    "inverted_index",
    "seasonal_anomalies",
    "partition_digest",
    "event_transitions",
    "group_median",
    "similarity_triangles",
    "weighted_sample",
    "bigram_pmi",
    "dedup_cluster_sizes",
    "hash_reservoir_sample",
    "rolling_dau",
    "sparse_lexical_topk",
    "quartile_bucketize",
    "dedup_keep_best",
    "skew_report",
    "kfold_assign",
    "negative_sampling",
    "zscore_normalize",
    "revenue_share",
    "media_shard_plan",
    "forecast_revenue",
    "volume_shipping",
    "market_share",
    "returned_top_customers",
    "promo_revenue",
    "top_supplier",
    "large_orders",
    "disjunctive_revenue",
    "merge_upsert",
    # round 4
    "kmeans_assign",
    "semantic_dedup",
    "cluster_mixture_plan",
    "cluster_exemplars",
    "kmeans_quality",
    "url_canonical_dedup",
    "domain_cap_sample",
    "chunk_dedup_docs",
    "exact_substring_spans",
    "gopher_quality_filter",
    "min_cost_supplier",
    "product_profit",
    "important_stock",
    "kmeans_assign_fp",
    "freshness_audit",
    "store_consistency_audit",
    "ks_drift",
    "data_contract_audit",
    # round 5
    "image_phash_dedup",
    "similarity_topk_pq",
    "dsir_select",
    "token_entropy",
    "containment_dedup_pairs",
    "bpe_merge_learn",
    "bpe_tokenize_stats",
    # round 6
    "similarity_topk_ivfpq",
    "ann_index_serve",
    "dsir_select_threshold",
    "ann_filtered_topk",
    "ann_index_stats",
    "ann_probe_sweep",
    "quality_classifier_train",
    "quality_classifier_select",
    "classifier_auc",
    "feature_mi",
    "epoch_shuffle_plan",
    "classifier_calibration",
    "domain_minhash_overlap",
    "lm_perplexity_score",
    "embedding_drift",
    "hard_negative_mining",
    "winnowing_fingerprints",
    "span_corruption_plan",
    "temperature_mixture",
    "tokenizer_fertility",
    "k_anonymity_audit",
    "pq_reconstruction_error",
    "curation_funnel_v2",
    "label_noise_audit",
    # round 7
    "model_registry_serve",
    "model_version_diff",
    "classifier_pr_curve",
    "quality_select_at_precision",
    "serving_index_stats",
    "hll_distinct_audit",
    "model_warm_start_train",
    # round 8
    "model_registry_list",
    "model_weight_drift",
    "hll_merge_rollup",
    "padding_efficiency_audit",
    "kmeans_warm_update",
    # round 8, wave 2
    "kmv_set_cardinality",
    "bloom_semijoin_reduce",
    "maxsim_topk",
    "bloom_prefiltered_revenue",
    "maxsim_shortlist_recall",
    "hybrid_rrf_fusion",
    "zone_map_skip_audit",
    "zone_map_zorder_audit",
    "hybrid_rrf_fusion_ann",
    "hybrid_fusion_recall",
    "hybrid_rerank_serve",
    # round 10
    "sparse_topk_serve",
    "hybrid_fusion_sweep",
    # round 11
    "hybrid_codebook_sweep",
    "lm_bigram_quality",
]


def audit(spark, name: str, sf_dir: str) -> dict:
    df = QUERIES[name](spark, sf_dir)
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return {
        "query": name,
        "joins": sorted(
            set(
                re.findall(
                    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)",
                    plan,
                )
            )
        ),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "python": sorted(
            set(re.findall(r"(ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", plan))
        ),
        "pushed": sorted(
            {p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p}
        ),
        "read_schemas": sorted(
            {s.strip()[:90] for s in re.findall(r"ReadSchema: ([^\n]+)", plan)}
        ),
    }


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_md = "--md" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark(
        "explain-audit", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    rows = [audit(spark, n, sf_dir) for n in AUDIT if n in QUERIES]
    if as_md:
        print("# Physical-plan audit (generated by scripts/explain_audit.py)\n")
        print(f"Scale dir: `{sf_dir}`. Regenerate: "
              "`python scripts/explain_audit.py --md > docs/PLANS.md`\n")
        print("| query | joins | exchanges | python boundaries | pushed filters |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['query']} | {', '.join(r['joins']) or '—'} | "
                f"{r['exchanges']} | {', '.join(r['python']) or 'none (pure JVM)'} | "
                f"{'; '.join(r['pushed'])[:80] or '—'} |"
            )
        print("\nColumn-pruned scan schemas (every scan reads only referenced columns):\n")
        for r in rows:
            for s in r["read_schemas"]:
                print(f"- `{r['query']}`: `{s}`")
    else:
        for r in rows:
            print(r)


if __name__ == "__main__":
    main()
