"""Embedding-corpus maintenance operators: per-label centroids and
global scalar quantization.

Both are corpus-wide array reductions that must never ship full vectors
through a shuffle keyed on anything wider than (key, dim):

- ``label_centroids`` explodes vectors to (label, dim, component) rows
  once, reduces with a hash aggregate (map-side partial combine), and
  emits one row per (label, dim). The component values are accumulated
  as integer micro-units (``round(v * 1e6)`` as BIGINT) so the sum is
  exact and order-free — a float sum would depend on partition order and
  could never hash-match a second engine.
- ``quantize_embeddings`` computes per-dimension min/max the same way
  (a hash aggregate down to exactly ``dim`` rows), collects those — the
  collect is bounded by the embedding DIMENSIONALITY, never the corpus
  size, so it is safe at 100 TB — and then maps every vector through a
  JVM ``transform`` against the broadcast literal arrays. The vectors
  themselves never shuffle and never leave the JVM.

Reference parity: the reference stores embeddings as plain float arrays
and has no vector-maintenance operators; these extend the engine for the
LLM-pipeline brief (ANN index maintenance: IVF centroid refresh,
int8 compression for a 4x smaller similarity index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_centroids", "quantize_embeddings", "dim_minmax"]


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    micro: int = 1_000_000,
) -> DataFrame:
    """Mean vector per label, exploded to ``(label, dim, centroid, n)``.

    One ``posexplode`` + one hash aggregate; components accumulate as
    exact BIGINT micro-units so the result is order-free (bit-identical
    across partitionings and engines). ``centroid`` is
    ``sum_micro / (n * micro)`` evaluated in doubles with pinned operand
    order. Output cardinality = |labels| x dim — assemble the array form
    with ``collect_list`` over ``dim`` when a caller needs it.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select(
        "label",
        "dim",
        F.round(F.col("v").cast("double") * micro, 0).cast("long").alias("vc"),
    )
    agg = exploded.groupBy("label", "dim").agg(
        F.sum("vc").alias("s"), F.count("*").alias("n")
    )
    return agg.select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        (F.col("s").cast("double") / (F.col("n") * F.lit(float(micro)))).alias(
            "centroid"
        ),
        "n",
    )


def dim_minmax(
    df: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) over the corpus, as driver-side floats.

    The aggregate reduces the corpus to exactly ``dim`` rows before the
    collect — bounded by dimensionality, not data size, so this is NOT
    the anti-pattern of collecting a corpus (cf. the IVF k-means sample
    cap in similarity.py).
    """
    stats = (
        df.select(F.posexplode(F.col(vec_col)).alias("dim", "v"))
        .select("dim", F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("dim")
        .collect()
    )
    return [(r["mn"], r["mx"]) for r in stats]


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    minmax: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """Scalar (int8-style) quantization: each component mapped to a
    0..255 code against the corpus per-dimension min/max.

    ``code = floor((v - mn) / (mx - mn) * 255)`` clamped to [0, 255] (the
    max element itself lands exactly on 255; a caller-supplied ``minmax``
    that does not bound the data clamps instead of going out of range);
    degenerate dimensions (mn == mx) code to 0. All arithmetic is double
    with pinned operand
    order, so codes are engine-reproducible. The per-vector map is a
    single JVM ``transform`` against broadcast literal min/max arrays —
    no join, no shuffle, vectors never leave their input partitions.

    Returns ``(id_col, codes array<int>)``.
    """
    if minmax is None:
        minmax = dim_minmax(df, vec_col)
    mins = F.array(*[F.lit(float(mn)) for mn, _ in minmax])
    maxs = F.array(*[F.lit(float(mx)) for _, mx in minmax])

    def code(v, i):
        mn = F.element_at(mins, i + 1)
        mx = F.element_at(maxs, i + 1)
        raw = F.floor((v.cast("double") - mn) / (mx - mn) * F.lit(255.0))
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(F.greatest(F.least(raw, F.lit(255)), F.lit(0)))
            .cast("int")
        )

    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), code).alias("codes"),
    )
