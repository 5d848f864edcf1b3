#!/usr/bin/env python
"""End-to-end lifecycle demo — the reference's three pipelines (SURVEY.md
§3.1-3.3) on this engine, against the driver testdata:

  1. batch ETL: raw events -> derived features -> partitioned offline
     store (dedup-gated append, watermark advanced after commit)
  2. incremental re-run: the second append is a no-op (idempotent)
  3. training query: PIT join + lag -> model-ready frame
  4. online path: materialize latest-per-key snapshot -> keyed lookup

Usage: python scripts/run_pipeline.py [sf_dir] [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from datetime import timedelta

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aqi_featurestore_spark import pipeline  # noqa: E402
from aqi_featurestore_spark.registry import FeatureView  # noqa: E402
from aqi_featurestore_spark.session import get_spark  # noqa: E402
from aqi_featurestore_spark.sources.offline_store import Watermark  # noqa: E402
from aqi_featurestore_spark.sources.testdata import read_events  # noqa: E402
from aqi_featurestore_spark.store import FeatureStore  # noqa: E402

VIEW = FeatureView(
    name="aqi_info_v1",
    entities=("entity_id",),
    ttl=timedelta(days=7),
    features=(("aqi", "double"), ("hour", "int"), ("day", "int"), ("dayOfWeek", "int")),
    source="offline/aqi_info_v1",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="fs_demo_")
    spark = get_spark("pipeline-demo", extra_conf={"spark.ui.showConsoleProgress": "false"})
    store = FeatureStore(spark, workdir)
    store.apply(VIEW)
    wm = Watermark(f"{workdir}/watermark.json", default="1970-01-01")

    # 1. ETL: derive + append (partitioned, dedup-gated)
    events = read_events(spark, sf_dir)
    feats = pipeline.derive_features(events)
    store.write_offline("aqi_info_v1", feats)
    n1 = store.read_offline("aqi_info_v1").count()
    hi = feats.agg(F.max(F.to_date("feature_timestamp"))).first()[0]
    wm.advance(str(hi))
    print(f"[etl] appended -> offline rows={n1}, watermark={wm.read()}")

    # 2. idempotent re-run (the reference double-appends here; we don't)
    store.write_offline("aqi_info_v1", feats)
    n2 = store.read_offline("aqi_info_v1").count()
    print(f"[etl] re-run -> offline rows={n2} (unchanged: {n1 == n2})")

    # 3. training query (PIT join + lag)
    frame = pipeline.training_set(spark, sf_dir)
    print(f"[train] model-ready frame rows={frame.count()} cols={frame.columns}")

    # 4. online path
    store.materialize("aqi_info_v1")
    keys = store.read_offline("aqi_info_v1").select("entity_id").distinct().limit(5)
    served = store.get_online_features(
        "aqi_info_v1", keys,
        as_of=F.to_timestamp(F.lit(f"{hi} 23:59:59")),
    )
    print("[serve] online lookup:")
    for r in served.collect():
        print(f"  {r['entity_id']}: aqi={r['aqi']} hour={r['hour']}")


if __name__ == "__main__":
    main()
