"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Extension operators over the ``embeddings`` table (vec_id, embedding
array<float>, label). Two paths:

- **Brute force** (the exactness baseline): broadcast the query set,
  JVM-side dot products via zip_with/aggregate (no Python in the loop),
  rank per query. Cost O(|Q| x |N|) — right answer for small query sets,
  and the oracle for recall measurement.
- **LSH (random hyperplane) ANN**: sign-bit sketch of each vector against
  ``n_planes`` deterministic pseudo-random hyperplanes; candidates =
  vectors sharing a bucket in any band of the sketch; exact cosine only on
  candidates. At 100 TB the bucket join replaces the full cross product,
  and the plane matrix is a broadcast literal.

Determinism: hyperplane components derive from xxhash64(plane, dim) —
no RNG state, same planes on every executor and every run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_scores: int = 6,
) -> DataFrame:
    """For each query vector, the k nearest corpus vectors by cosine
    (excluding self-matches by id). Scores are rounded *before* ranking so
    rank boundaries are stable across engines/summation orders; ties break
    on corpus id. Output: (q_id, n_id, cos_sim, rk)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), _as_double(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("n_id"), _as_double(vec_col).alias("n_vec"))
    pairs = q.crossJoin(c).where(F.col("q_id") != F.col("n_id"))
    cos = _dot(F.col("q_vec"), F.col("n_vec")) / (
        _norm(F.col("q_vec")) * _norm(F.col("n_vec"))
    )
    scored = pairs.select(
        "q_id", "n_id", F.round(cos, round_scores).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return scored.select(
        "q_id", "n_id", "cos_sim", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= k)


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random +/-1 hyperplane component."""
    return F.when(
        F.xxhash64(F.lit(plane), F.lit(dim)).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def hyperplane_sketch(
    vec: Column | str, *, n_planes: int = 16, dim: int = 64
) -> Column:
    """Sign-bit sketch: bit p set iff dot(vec, plane_p) > 0."""
    v = _as_double(vec)
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        # plane components are literals -> whole expression constant-folds
        # per (p, i); the loop builds one long codegen'd expression.
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[_plane_component(p, i) for i in range(dim)]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        out = out + F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    round_scores: int = 6,
) -> DataFrame:
    """ANN top-k: candidates share at least one of ``bands`` sketch bands
    (equi-join on (band, bits) — no cross product), then exact cosine +
    rank on candidates only. Recall < 1 by design; measure against
    cosine_topk_bruteforce."""
    width = n_planes // bands
    mask = (1 << width) - 1

    def with_bands(df: DataFrame, role: str) -> DataFrame:
        sk = hyperplane_sketch(vec_col, n_planes=n_planes, dim=dim)
        banded = df.select(
            F.col(id_col).alias(f"{role}_id"),
            _as_double(vec_col).alias(f"{role}_vec"),
            sk.alias("sketch"),
        )
        bands_arr = F.array(
            *[
                F.shiftrightunsigned("sketch", b * width).bitwiseAND(F.lit(mask))
                for b in range(bands)
            ]
        )
        return banded.select(
            f"{role}_id", f"{role}_vec", F.posexplode(bands_arr).alias("band", "bits")
        )

    qb = with_bands(queries, "q")
    cb = with_bands(corpus, "n")
    cand = (
        qb.join(cb, ["band", "bits"])
        .where(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    cos = _dot(F.col("q_vec"), F.col("n_vec")) / (
        _norm(F.col("q_vec")) * _norm(F.col("n_vec"))
    )
    scored = cand.select("q_id", "n_id", F.round(cos, round_scores).alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return scored.select("q_id", "n_id", "cos_sim", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= k
    )
