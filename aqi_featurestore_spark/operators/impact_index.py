"""Persisted sparse-lexical impact index: the TF-IDF posting/weight
tables behind query-ranked sparse retrieval, maintained as a versioned
store instead of rebuilt per query (round-9 verdict ask #1 — the
`ann_index_serve` E166 discipline applied to the sparse leg, which
until now re-tokenized the corpus on every hybrid serve call).

Store layout::

    {path}/postings/epoch=E/      (doc_id, token, tf)   doc-local rows
    {path}/meta/epoch=E/          (n_docs)              1 row per epoch
    {path}/weights/fold_epoch=W/  (doc_id, token, w)    published snapshot

Which merge contract? The round-9 store taxonomy answers per table:

- **postings** are doc-local and deterministic — a REPLAYED epoch
  re-appends byte-identical rows, absorbed by per-epoch dedup. But a
  token's document frequency is the COUNT of posting rows across
  epochs, and the corpus total N is the SUM of per-epoch counts —
  SUM-merged quantities, NOT idempotent. So the store runs the CMS
  epoch-versioned contract (E219), not the bookkeeping-free HLL/zone
  one: every partial carries its epoch, a re-delivered epoch collapses
  in the reader's epoch-keyed distinct, and the published weights
  snapshot records the ``fold_epoch`` watermark it was computed
  through. Exactly as the round-9 verdict predicted: "df merges by
  SUM, so a streaming-refresh path needs the CMS epoch-versioned
  discipline, not the idempotent one."
- Requires the SAME streaming checkpoint across runs (a fresh
  checkpoint restarts epoch numbering — not absorbed) and doc_ids
  unique across epochs (the dedup-ingest gate's admission-once
  guarantee provides this for the curated corpus).

Refresh semantics: ``refresh_impact_weights`` PUBLISHES a new weights
snapshot folded through the highest pending epoch — a full weight
recompute, because idf is global (one new document shifts every
weight). What stays incremental is the expensive half: the fold reads
POSTINGS (fixed-width, already-tokenized rows), never corpus text —
tokenize/tf runs once per document at append time, like the ANN
encode. Serving reads the snapshot only (new epochs are invisible
until the next refresh — the frozen-snapshot serving contract every
versioned store here runs); ``pending_epochs`` is the staleness audit.

Crash safety: the snapshot write is append-then-delete on
``fold_epoch`` (readers take the HIGHEST fold — two snapshots read
correctly, an interrupted delete leaves a stale lower fold that the
max filter ignores), and the fold input is the snapshotted epoch set
(the ``compact_cms_store`` discipline), so an epoch appended
mid-refresh is neither folded below its own number nor lost.

100 TB shape: postings append is one map-side-combining aggregate per
batch (rows ~ batch tokens, never corpus); the fold is one postings
scan + a token-keyed join against the df table; weights partition-
prune nothing today but serve through token-keyed posting joins whose
fanout the df cap bounds (`plans/llm_text._sparse_query_topk`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: posting-list band: tokens with df above the cap carry ~no idf signal
#: and dominate join fanout — the E86 insight, shared with the plans'
#: oracle CTEs (lock-step pinned by the sparse_topk_serve oracle).
DF_CAP = 100

#: weights are integer micro-units (round(tf * idf * 1e6)) summed as
#: int64 at serve time — cross-engine exact, no float accumulation.
W_MICRO = 1e6


def impact_postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document term frequencies ``(doc_id, token, tf)`` —
    whitespace tokens of the lower/trimmed text, the exact tokenizer of
    `sparse_lexical_topk` (E86). Doc-local: a document's rows never
    depend on the rest of the corpus, which is what makes the append
    path incremental and replays byte-identical."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def write_impact_partial(
    docs: DataFrame,
    path: str,
    epoch: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """APPEND one batch's postings + its doc-count partial under
    ``epoch`` — the replay token: a re-delivered epoch re-appends
    byte-identical rows (postings are a groupBy result, unique per
    (doc_id, token) within an epoch; the meta row is one deterministic
    count), so the reader's epoch-keyed distinct absorbs it."""
    p = impact_postings(docs, id_col=id_col, text_col=text_col)
    (
        p.withColumn("epoch", F.lit(int(epoch)))
        .write.mode("append")
        .partitionBy("epoch")
        .parquet(f"{path.rstrip('/')}/postings")
    )
    (
        docs.agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn("epoch", F.lit(int(epoch)))
        .write.mode("append")
        .partitionBy("epoch")
        .parquet(f"{path.rstrip('/')}/meta")
    )


_WEIGHTS_SCHEMA = "doc_id long, token string, w long"


def _weights_fold(spark: SparkSession, path: str):
    """(published fold_epoch, weights frame) or (None, None). The fold
    watermark lives in an atomically-written marker, not in the data
    files, because a legitimate snapshot can be EMPTY (a corpus whose
    every token exceeds the df cap publishes zero weight rows — sparse
    retrieval correctly returns nothing there) and empty parquet dirs
    carry no schema to infer. Publish order is data-then-marker, so a
    crash mid-refresh leaves the old marker serving the old fold and
    the orphaned higher-fold files invisible until their marker lands."""
    import json

    from aqi_featurestore_spark.sources import fs

    marker = f"{path.rstrip('/')}/weights.fold.json"
    if not fs.exists(spark, marker):
        return None, None
    wm = int(json.loads(fs.read_text(spark, marker))["fold_epoch"])
    fold_dir = f"{path.rstrip('/')}/weights/fold_epoch={wm}"
    if fs.list_data_files(spark, fold_dir):
        return wm, spark.read.parquet(fold_dir)
    return wm, spark.createDataFrame([], _WEIGHTS_SCHEMA)


def pending_epochs(spark: SparkSession, path: str) -> list[int]:
    """Epochs appended since the published snapshot — the staleness
    audit an operator reads to decide when to refresh."""
    from aqi_featurestore_spark.sources import fs

    ppath = f"{path.rstrip('/')}/postings"
    if not fs.list_data_files(spark, ppath):
        return []
    wm, _w = _weights_fold(spark, path)
    parts = spark.read.parquet(ppath).select("epoch").distinct()
    if wm is not None:
        parts = parts.where(F.col("epoch") > wm)
    return sorted(int(r["epoch"]) for r in parts.collect())


def refresh_impact_weights(
    spark: SparkSession, path: str, *, df_cap: int = DF_CAP
) -> dict:
    """Publish the weights snapshot folded through the highest pending
    epoch (no-op if nothing pending). See the module docstring for why
    this is a full weight recompute over an incremental postings log.
    Returns {'fold_epoch', 'n_docs', 'n_weights'}."""
    from aqi_featurestore_spark.sources import fs

    ppath = f"{path.rstrip('/')}/postings"
    mpath = f"{path.rstrip('/')}/meta"
    cur_wm, _w = _weights_fold(spark, path)
    if not fs.list_data_files(spark, ppath):
        raise ValueError(f"refresh_impact_weights: no postings at {path}")
    # snapshot the COMPLETE epoch set: an epoch is foldable only when
    # BOTH its postings and its meta partial landed — a crash between
    # write_impact_partial's two appends leaves a torn epoch whose
    # postings would otherwise fold while its doc count is missing from
    # N (idf silently wrong, and fold_epoch would advance past it so it
    # never refolds). Torn epochs stay pending; the streaming retry
    # re-delivers the epoch (dedup absorbs the re-appended half) and
    # the next refresh folds it whole. Weights need EVERY complete
    # epoch's postings (unlike the CMS fold into a running base).
    p_epochs = {
        int(r["epoch"])
        for r in spark.read.parquet(ppath).select("epoch").distinct().collect()
    }
    m_epochs = (
        {
            int(r["epoch"])
            for r in spark.read.parquet(mpath).select("epoch").distinct().collect()
        }
        if fs.list_data_files(spark, mpath)
        else set()
    )
    all_epochs = sorted(p_epochs & m_epochs)
    if not all_epochs:
        raise ValueError(
            f"refresh_impact_weights: no complete epoch at {path} (torn "
            f"partial write — await the streaming retry)"
        )
    new_wm = all_epochs[-1]
    if cur_wm is not None and new_wm <= cur_wm:
        _wm, w_cur = _weights_fold(spark, path)
        return {
            "fold_epoch": cur_wm,
            "n_docs": None,
            "n_weights": w_cur.count(),
        }
    post = (
        spark.read.parquet(ppath)
        .where(F.col("epoch").isin(all_epochs))  # snapshotted epoch set
        .distinct()  # epoch-keyed dedup: replayed epochs collapse
        .drop("epoch")
    )
    meta = (
        spark.read.parquet(f"{path.rstrip('/')}/meta")
        .where(F.col("epoch").isin(all_epochs))
        .distinct()
    )
    n = meta.agg(F.sum("n_docs").cast("long").alias("n"))
    dft = post.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    w = (
        post.join(dft, "token")
        .where(F.col("df") <= df_cap)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
                * W_MICRO,
                0,
            )
            .cast("long")
            .alias("w"),
        )
    )
    wdir = f"{path.rstrip('/')}/weights"
    (
        w.withColumn("fold_epoch", F.lit(new_wm))
        .write.mode("append")
        .partitionBy("fold_epoch")
        .parquet(wdir)
    )
    # data first, marker second (see _weights_fold), old fold last
    import json

    fs.write_text_atomic(
        spark,
        f"{path.rstrip('/')}/weights.fold.json",
        json.dumps({"fold_epoch": new_wm}),
    )
    # drop every non-current fold, not just cur_wm: a crash between a
    # past marker write and its delete leaves an orphan fold dir that a
    # cur_wm-only delete would never reclaim
    for name in fs.child_names(spark, wdir):
        if name.startswith("fold_epoch=") and name != f"fold_epoch={new_wm}":
            fs.delete(spark, f"{wdir}/{name}")
    n_docs = int(n.collect()[0]["n"])
    fold_dir = f"{wdir}/fold_epoch={new_wm}"
    n_weights = (
        spark.read.parquet(fold_dir).count()
        if fs.list_data_files(spark, fold_dir)
        else 0
    )
    return {"fold_epoch": new_wm, "n_docs": n_docs, "n_weights": n_weights}


def read_impact_weights(
    spark: SparkSession, path: str
) -> tuple[DataFrame, int]:
    """The serving read: (weights ``(doc_id, token, w)``, fold_epoch) of
    the highest published snapshot. Raises if none is published —
    serving from raw postings would silently skip the df cap and the
    idf scalar's corpus total."""
    wm, w = _weights_fold(spark, path)
    if wm is None:
        raise ValueError(
            f"read_impact_weights: no published snapshot at {path} — run "
            f"refresh_impact_weights after the first write_impact_partial"
        )
    return w, wm


def sparse_topk(
    weights: DataFrame, qweights: DataFrame, *, k: int = 10
) -> DataFrame:
    """Query-ranked sparse lexical top-k from a weight table:
    ``(q_id, n_id, rk_lex)`` with scores exact int64 and rank ties on
    doc id. ``qweights`` is ``(q_id, token, wq)`` — typically a
    broadcast-sized selection from the same index.

    100 TB shape: a token-keyed posting join — per query only posting
    rows sharing a query token move, and the df cap bounds each token's
    fanout; query weights broadcast (|queries| x tokens-per-doc); the
    rank window partitions by query. No corpus x corpus leg, no
    tokenization — the weight table IS the index."""
    pairs = (
        F.broadcast(qweights)
        .join(weights, "token")
        .where(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", F.col("doc_id").alias("n_id"))
        .agg(F.sum(F.col("wq") * F.col("w")).cast("long").alias("score"))
    )
    w_rk = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("n_id").asc()
    )
    return (
        pairs.withColumn("rk_lex", F.row_number().over(w_rk).cast("int"))
        .where(F.col("rk_lex") <= k)
        .select("q_id", "n_id", "rk_lex")
    )
