"""Streaming sketch maintenance (streaming/jobs.py
run_sketch_refresh_stream + operators/sketches.py): per-batch HLL
register partials appended to a store must merge to exactly the
registers of one direct pass, replays must be absorbed (MAX
idempotence), estimates must equal the oracle-verified audit query's,
and compaction must be lossless."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aqi_featurestore_spark.functions.text import word_shingles
from aqi_featurestore_spark.operators.sketches import (
    compact_sketch_store,
    hll_estimate,
    hll_registers,
    read_merged_registers,
    write_sketch_partial,
)
from aqi_featurestore_spark.plans import QUERIES
from aqi_featurestore_spark.sources.testdata import read_table
from aqi_featurestore_spark.streaming.jobs import run_sketch_refresh_stream

SF_DIR = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_DIR, "documents").cache()


def _direct_registers(docs):
    toks = docs.select(
        "source", F.explode(word_shingles("text", 3)).alias("token")
    )
    return hll_registers(toks, ["source"], "token")


def _reg_set(df):
    return {(r["source"], r["idx"], r["m"]) for r in df.collect()}


def test_stream_registers_equal_direct_build(spark, docs, tmp_path):
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)  # maxFilesPerTrigger=1 -> 4 batches
    store = str(tmp_path / "hll_store")
    run_sketch_refresh_stream(
        spark, src, DOC_SCHEMA, store, str(tmp_path / "ckpt")
    )
    merged = read_merged_registers(spark, store, ["source"])
    assert _reg_set(merged) == _reg_set(_direct_registers(docs))


def test_replay_with_fresh_checkpoint_is_absorbed(spark, docs, tmp_path):
    """MAX-merge idempotence, operationally: a SECOND full run over the
    same source with a FRESH checkpoint appends duplicate partials but
    leaves the merged registers bit-identical — no version bookkeeping
    needed, unlike the ANN index refresh."""
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)
    store = str(tmp_path / "hll_store")
    run_sketch_refresh_stream(spark, src, DOC_SCHEMA, store, str(tmp_path / "c1"))
    before = _reg_set(read_merged_registers(spark, store, ["source"]))
    run_sketch_refresh_stream(spark, src, DOC_SCHEMA, store, str(tmp_path / "c2"))
    after = _reg_set(read_merged_registers(spark, store, ["source"]))
    assert before == after


def test_incremental_arrival_equals_union_build(spark, docs, tmp_path):
    """New files picked up by the SAME checkpoint fold in without
    touching old registers; the merged store equals a direct build over
    the union."""
    first = docs.where(F.col("doc_id") % 2 == 0)
    late = docs.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "docs_stream")
    first.coalesce(1).write.parquet(src)
    store = str(tmp_path / "hll_store")
    ckpt = str(tmp_path / "ckpt")
    run_sketch_refresh_stream(spark, src, DOC_SCHEMA, store, ckpt)
    late.coalesce(1).write.mode("append").parquet(src)
    run_sketch_refresh_stream(spark, src, DOC_SCHEMA, store, ckpt)
    merged = read_merged_registers(spark, store, ["source"])
    assert _reg_set(merged) == _reg_set(_direct_registers(docs))


def test_estimates_match_the_oracle_verified_audit(spark, docs, tmp_path):
    """The store's estimator is bit-identical to hll_distinct_audit's
    oracle-verified hll_estimate column (same hash domain, same limb
    math) — the lock-step pin between operators/sketches.py and the
    plans constants."""
    src = str(tmp_path / "docs_stream")
    docs.repartition(2).write.parquet(src)
    store = str(tmp_path / "hll_store")
    run_sketch_refresh_stream(spark, src, DOC_SCHEMA, store, str(tmp_path / "ckpt"))
    got = {
        r["source"]: (r["n_empty_regs"], r["hll_estimate"])
        for r in hll_estimate(
            read_merged_registers(spark, store, ["source"]), ["source"]
        ).collect()
    }
    want = {
        r["source"]: (r["n_empty_regs"], r["hll_estimate"])
        for r in QUERIES["hll_distinct_audit"](spark, SF_DIR).collect()
    }
    assert got == want


def test_compaction_is_lossless_and_merges_files(spark, docs, tmp_path):
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)
    store = str(tmp_path / "hll_store")
    run_sketch_refresh_stream(spark, src, DOC_SCHEMA, store, str(tmp_path / "ckpt"))
    before_regs = _reg_set(read_merged_registers(spark, store, ["source"]))
    before_est = sorted(
        tuple(r)
        for r in hll_estimate(
            read_merged_registers(spark, store, ["source"]), ["source"]
        ).collect()
    )
    stats = compact_sketch_store(spark, store, ["source"])
    assert stats["files_after"] < stats["files_before"]
    assert _reg_set(read_merged_registers(spark, store, ["source"])) == before_regs
    after_est = sorted(
        tuple(r)
        for r in hll_estimate(
            read_merged_registers(spark, store, ["source"]), ["source"]
        ).collect()
    )
    assert after_est == before_est
