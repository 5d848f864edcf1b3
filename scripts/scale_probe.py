#!/usr/bin/env python
"""Scale probe (round-4 verdict ask #8): run the heaviest registry
queries at a scale big enough for AQE's runtime re-planning to actually
fire — skew-join splitting, partition coalescing, broadcast fallbacks —
and record (a) oracle MATCH, (b) wall time, (c) the FINAL adaptive plan
markers, so "this survives scale-up" is observed, not argued.

Usage:
  python scripts/make_scaled_testdata.py            # build ./testdata_sf1
  python scripts/scale_probe.py [sf_dir] | tee docs/CORRECTNESS_sf1_probe.log
  python scripts/scale_probe.py --skew-demo [sf_dir]   # observe skew-split

``--skew-demo``: AQE's skew-join split keys off
``spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`` (default
256 MB) — at sf1 the skewed shuffle partition is ~10 MB, so the main
probe records ``skew_reads=0`` honestly. This mode lowers the threshold
to 1 MB (what a 100 TB run would hit naturally at the default) and
re-runs ``skew_join_plain`` so the OptimizeSkewedJoin split is
*observed* (``skew_reads > 0``), not argued.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from aqi_featurestore_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from aqi_featurestore_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare_with_oracle  # noqa: E402

# The 15 heaviest bench queries (round-4 bench_details.json order) whose
# oracles stay tractable at sf1, plus the skew-demo pair (the queries that
# exist to show AQE skew handling). Excluded: the deliberate brute-force
# baselines (embedding_cosine_dedup, similarity_topk_cosine and their
# composites) whose O(n^2) ORACLE is the bottleneck at 20k vectors.
PROBE_QUERIES = [
    "semantic_dedup",
    "kmeans_assign_fp",
    "cluster_mixture_plan",
    "kmeans_assign",
    "cluster_exemplars",
    "kmeans_quality",
    "dedup_cluster_sizes",
    "dedup_resolve_docs",
    "embedding_dedup_resolve",
    "dedup_keep_best",
    "jaccard_prefix_filter",
    "label_spreading",
    "curation_funnel",
    "similarity_pagerank",
    "minhash_lsh_dedup",
    # AQE skew-split showcases (oracle-checked like everything else)
    "skew_join_plain",
    "skew_join_salted",
]


def plan_markers(df) -> str:
    """AQE evidence from the FINAL adaptive plan. Must run AFTER an
    action on THIS DataFrame's own QueryExecution (toPandas/collect —
    not df.write, which plans a separate command QE and leaves this one
    un-finalized)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin)",
                plan,
            )
        )
    )
    n_skew = len(re.findall(r"skewed", plan))
    n_coal = len(re.findall(r"coalesced", plan))
    final = "isFinalPlan=true" in plan
    return (
        f"joins={'/'.join(joins) or '-'} skew_reads={n_skew} "
        f"coalesced_reads={n_coal} final={final}"
    )


def skew_demo(sf_dir: str) -> int:
    """Lower the AQE skew threshold so OptimizeSkewedJoin fires at sf1
    and the split is visible as ``skew_reads > 0`` in the final plan."""
    spark = get_spark("scale-probe-skew")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    ok = True
    for name in ("skew_join_plain", "skew_join_salted"):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.toPandas()
        t_exec = time.time() - t0
        markers = plan_markers(df)
        try:
            compare_with_oracle(df, ORACLE_SQL[name], sf_dir)
            status = "MATCH"
        except Exception as e:  # noqa: BLE001
            status, ok = f"FAIL: {str(e)[:200]}", False
        print(
            f"{name:26s} spark {t_exec:7.2f}s  {status}  [{markers}]"
            "  (skew threshold lowered to 1m)"
        )
    # Why skew_join_plain shows skew_reads=0 even at a 1m threshold —
    # two independent blockers, both observed via the rule's debug log:
    #   (a) its dim is built with distinct() whose final HashAggregate
    #       already satisfies hashpartitioning(k), so it FUSES between
    #       the shuffle read and the Sort on the dim side; Spark's
    #       OptimizeSkewedJoin pattern requires Sort-directly-over-
    #       shuffle-stage on BOTH sides and silently never matches —
    #       even though the skew is on the fact side.
    #   (b) its aggregate is ON the join key, so the SMJ's output
    #       partitioning is reused downstream and a split would add a
    #       shuffle (declined; forceOptimizeSkewedJoin gets reverted by
    #       plan validation for this fused-agg shape).
    # The variants below remove the blockers one at a time so the split
    # is OBSERVED: dim distinct over (k, klen) forces a fresh
    # ENSURE_REQUIREMENTS exchange on k under the dim Sort (fixes a),
    # and aggregating off the join key avoids partitioning reuse
    # (fixes b). Salting needs neither — it fixes the skew itself.
    from pyspark.sql import functions as F

    from aqi_featurestore_spark.plans.feature_store import _skewed_fact_dim
    from aqi_featurestore_spark.sources.testdata import read_table

    def offkey_agg(fact, dim):
        return (
            fact.join(dim, "k")
            .groupBy("klen")
            .agg(F.count("*").alias("n_rows"), F.sum("value").alias("sum_value"))
        )

    fact, dim_fused = _skewed_fact_dim(spark, sf_dir)
    events = read_table(spark, sf_dir, "events")
    key = F.when(F.col("user_id") % 20 != 0, F.lit("hot")).otherwise(
        F.col("user_id").cast("string")
    )
    dim_splittable = (
        events.select(key.alias("k"), F.length(key).alias("klen"))
        .distinct()
        .hint("merge")
    )
    for label, joined in (
        ("hot_join_fused_dim", offkey_agg(fact, dim_fused)),
        ("hot_join_splittable_dim", offkey_agg(fact, dim_splittable)),
    ):
        t0 = time.time()
        n = len(joined.toPandas())
        print(
            f"{label:26s} spark {time.time() - t0:7.2f}s  "
            f"ROWS-ONLY ({n} rows)  [{plan_markers(joined)}]"
            "  (skew threshold lowered to 1m)"
        )
    return 0 if ok else 1


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--skew-demo"]
    sf_dir = args[0] if args else "testdata_sf1"
    if "--skew-demo" in sys.argv:
        return skew_demo(sf_dir)
    only = args[1:]  # optional name filters, check_correctness.py-style
    queries = (
        [n for n in PROBE_QUERIES if any(s in n for s in only)]
        + [n for n in sorted(QUERIES) if n not in PROBE_QUERIES
           and any(s in n for s in only)]
        if only
        else PROBE_QUERIES
    )
    spark = get_spark("scale-probe")
    failures = []
    for name in queries:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            # execute via the DataFrame's OWN QueryExecution so the
            # adaptive plan finalizes on it and the markers are real
            df.toPandas()
            t_exec = time.time() - t0
            markers = plan_markers(df)
            t1 = time.time()
            if name in ORACLE_SQL:
                compare_with_oracle(df, ORACLE_SQL[name], sf_dir)
                status = "MATCH"
            else:
                status = f"ROWS-ONLY ({df.count()} rows)"
            t_oracle = time.time() - t1
            print(
                f"{name:26s} spark {t_exec:7.2f}s  oracle+cmp {t_oracle:7.2f}s"
                f"  {status}  [{markers}]"
            )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:26s} FAIL: {str(e)[:300]}")
        sys.stdout.flush()
    print(f"\n{len(queries) - len(failures)}/{len(queries)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
