"""Sequence packing and domain-mixture rebalancing — dataloader-prep
operators for LLM training pipelines.

Extensions beyond the reference's surface (BASELINE.json north star):
after curation, a training pipeline (a) concatenates documents in a
deterministic order and slices the token stream into fixed-length
context windows ("concat-and-chunk" packing), and (b) rebalances the
domain/source mix by reweighting.

The hard part of packing at 100 TB is the global ordered prefix sum:
a naive ``sum() OVER (ORDER BY ...)`` with no partition key collapses
to a single task in Spark. ``ordered_prefix_sum`` does it scalably in
two phases:

1. bucket rows by a fixed-width prefix of the order key (md5 hex, so
   bucket ranges ARE contiguous key ranges) and take a window cumsum
   *within* each bucket — parallel across buckets;
2. cumsum the ~256 bucket totals (tiny) and broadcast-join each
   bucket's starting offset back.

This is the standard distributed scan (Blelloch) expressed in
DataFrame ops: one shuffle by bucket + one broadcast join; nothing
single-threaded touches more than one bucket or the 256-row totals
frame. The DuckDB oracle uses the plain global window — same numbers,
different physical plan.

Every operator here is deterministic (md5-ordered, no RNG) so reruns
and the SQL oracle reproduce it row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aqi_featurestore_spark.functions.text import whitespace_token_count

#: number of order-key-prefix buckets for the two-phase prefix sum.
#: 256 (two hex chars) keeps the totals frame trivially broadcastable
#: while giving plenty of parallelism; at 100 TB raise to 4096 (three
#: hex chars) so each bucket's window stays executor-sized.
PREFIX_BUCKETS = 256


def ordered_prefix_sum(
    df: DataFrame,
    *,
    weight_col: str,
    order_hex_col: str,
    tie_col: str,
    out_col: str = "start",
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` over the global order
    ``(order_hex_col, tie_col)``, without a single-partition window.

    ``order_hex_col`` must be a fixed-width lowercase hex string (e.g.
    ``F.md5(...)``): ordering by its first two chars then the full
    string equals ordering by the full string, which is what lets the
    bucketed two-phase scan reproduce the global window exactly.
    """
    bucket = F.conv(F.substring(F.col(order_hex_col), 1, 2), 16, 10).cast("int")
    w = df.withColumn("__bucket", bucket)

    in_bucket = Window.partitionBy("__bucket").orderBy(
        order_hex_col, tie_col
    ).rowsBetween(Window.unboundedPreceding, -1)
    local = w.withColumn(
        "__local", F.coalesce(F.sum(weight_col).over(in_bucket), F.lit(0))
    )

    # Phase 2: per-bucket totals are <= PREFIX_BUCKETS rows — the window
    # over them is a deliberate tiny single-partition scan, then the
    # offsets broadcast back to the big side.
    totals = w.groupBy("__bucket").agg(F.sum(weight_col).alias("__tot"))
    off_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket", F.coalesce(F.sum("__tot").over(off_w), F.lit(0)).alias("__off")
    )

    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__bucket", "__local", "__off")
    )


def sequence_pack(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 2048,
) -> DataFrame:
    """Concat-and-chunk packing plan: deterministically order documents
    (md5 of the id — a reproducible global shuffle, which training
    pipelines want anyway), concatenate their whitespace-token streams,
    and slice into fixed ``ctx_len`` windows.

    Returns ``(id, n_tokens, start_tok, chunk_id, chunk_offset,
    end_chunk, n_chunks)`` — where each document's tokens land in the
    packed stream: ``chunk_id`` is the context window containing its
    first token, ``chunk_offset`` the position within it, ``end_chunk``
    the window containing its last token. Zero-token documents are
    dropped (they occupy no stream positions).

    The only non-map work is the two-phase prefix sum above; document
    text never shuffles — only ``(id, n_tokens, md5)`` rows do.
    """
    t = docs.select(
        F.col(id_col),
        whitespace_token_count(text_col).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__o"),
    ).where(F.col("n_tokens") > 0)
    s = ordered_prefix_sum(
        t, weight_col="n_tokens", order_hex_col="__o", tie_col=id_col,
        out_col="start_tok",
    )
    start, n = F.col("start_tok"), F.col("n_tokens")
    end_chunk = F.floor((start + n - 1) / ctx_len).cast("long")
    chunk_id = F.floor(start / ctx_len).cast("long")
    return s.select(
        id_col,
        "n_tokens",
        "start_tok",
        chunk_id.alias("chunk_id"),
        (start % ctx_len).cast("long").alias("chunk_offset"),
        end_chunk.alias("end_chunk"),
        (end_chunk - chunk_id + 1).alias("n_chunks"),
    )


def domain_mixture(
    docs: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus profile + rebalancing weights: ``(domain,
    n_docs, n_tokens, token_share, resample_weight)`` where
    ``resample_weight`` is the factor that moves the mix to uniform
    (target share / actual share) — multiply per-doc sampling rates by
    it to rebalance, exactly how curation pipelines re-mix sources.

    One map-side-combinable aggregation over the corpus; the share
    window runs on the already-aggregated frame (#domains rows), which
    is tiny at any corpus scale.
    """
    agg = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(whitespace_token_count(text_col).cast("long")).alias("n_tokens"),
    )
    everything = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(everything)
    target = F.lit(1.0) / F.count("*").over(everything)
    return agg.select(
        "domain",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        (target / share).alias("resample_weight"),
    )
