#!/usr/bin/env python
"""End-to-end training-data curation demo — the full document pipeline a
100 TB corpus runs between raw crawl and dataloader, composed from the
engine's operators against the driver testdata:

  1. quality gate: language ID + repetition/quality thresholds
  2. exact dedup, then near-dedup (MinHash-LSH candidates -> exact
     Jaccard verify -> connected components -> canonical doc per cluster)
  3. contamination gate vs a held-out "benchmark" set
  4. PII redaction
  5. domain-mixture report + stratified rebalance by language
  6. deterministic train/test split
  7. sequence packing into fixed context windows

Every stage prints surviving row counts so the funnel is auditable.

Usage: python scripts/run_curation.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aqi_featurestore_spark.functions.text import lang_id, quality_features  # noqa: E402
from aqi_featurestore_spark.operators.dedup import dedup_exact  # noqa: E402
from aqi_featurestore_spark.operators.dedup_groups import resolve_duplicates  # noqa: E402
from aqi_featurestore_spark.operators.near_dedup import minhash_verified_pairs  # noqa: E402
from aqi_featurestore_spark.operators.packing import domain_mixture, sequence_pack  # noqa: E402
from aqi_featurestore_spark.operators.split import with_split_label  # noqa: E402
from aqi_featurestore_spark.operators.text_quality import (  # noqa: E402
    contamination_check,
    redact_pii,
    repetition_stats,
    stratified_sample,
)
from aqi_featurestore_spark.session import get_spark  # noqa: E402
from aqi_featurestore_spark.sources.testdata import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-demo", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"[0 raw] docs={n0}")

    # 1. quality gate — native expressions only, one map-only pass plus
    # the repetition aggregate.
    q = quality_features("text")
    rep = repetition_stats(docs).select("doc_id", "top_token_ratio")
    gated = (
        docs.withColumn("lid", lang_id("text"))
        .withColumn("n_tokens_ws", q["n_tokens"])
        .join(rep, "doc_id", "left")
        .where(
            (F.col("n_tokens_ws") >= 5)
            & (F.coalesce(F.col("top_token_ratio"), F.lit(0.0)) <= 0.5)
        )
        .drop("top_token_ratio")
    )
    n1 = gated.count()
    print(f"[1 quality] kept={n1} dropped={n0 - n1}")

    # 2. exact + near dedup -> one canonical doc per duplicate cluster
    exact = dedup_exact(gated, ["text"], id_col="doc_id")
    pairs = minhash_verified_pairs(exact, threshold=0.5).select("d1", "d2")
    deduped = resolve_duplicates(exact, pairs, id_col="doc_id")
    n2 = deduped.count()
    print(f"[2 dedup] kept={n2} dropped={n1 - n2}")

    # 3. contamination gate: every 97th doc stands in for an eval suite
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    contam = contamination_check(deduped, benchmark).where(
        F.col("contamination_ratio") > 0.5
    ).select("doc_id")
    clean = deduped.join(contam, "doc_id", "left_anti")
    n3 = clean.count()
    print(f"[3 contamination] kept={n3} dropped={n2 - n3}")

    # 4. PII scrub (map-only)
    scrubbed = redact_pii(clean).drop("text").withColumnRenamed("redacted", "text")

    # 5. mixture report + rebalance toward uniform languages
    mix = {r["domain"]: r for r in domain_mixture(scrubbed, domain_col="lang").collect()}
    print("[5 mixture]", {k: round(v["token_share"], 3) for k, v in mix.items()})
    rates = {
        lang: min(1.0, r["resample_weight"]) for lang, r in mix.items()
    }
    balanced = stratified_sample(
        scrubbed, strata_col="lang", key_col="doc_id", rates=rates
    )
    n5 = balanced.count()
    print(f"[5 rebalance] kept={n5} rates={ {k: round(v, 3) for k, v in rates.items()} }")

    # 6. split + 7. pack
    split = with_split_label(balanced, "doc_id", train_fraction=0.9)
    packed = sequence_pack(split.where(F.col("split") == "train"), ctx_len=2048)
    n_train = packed.count()
    n_chunks = packed.agg(F.max("end_chunk")).first()[0]
    print(f"[6/7 pack] train_docs={n_train} context_windows={(n_chunks or 0) + 1}")


if __name__ == "__main__":
    main()
