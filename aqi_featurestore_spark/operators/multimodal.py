"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Extension operators (BASELINE.json): image/audio/video ride along as
``binary`` columns with typed metadata (schemas.MEDIA). The Spark-side
contract — schema, partitioning, UDF signature, batch shape — is real
and tested. Two decode paths:

- ``fake=True`` (default, the oracle-verified path): a deterministic
  md5-seeded feature vector from the payload bytes — stable across
  runs/executors, reproducible in SQL.
- ``fake=False``: REAL decoding via ``functions.codecs`` — stdlib PNG
  (zlib chunk walk + filter reconstruction) and WAV PCM decoders, PIL
  preferred when importable. Unsupported formats (e.g. video, which
  needs a demuxer no stdlib module provides) raise
  ``UnsupportedMediaError`` per ROW-BATCH, not per import.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
round-trip through Python row objects; ``maxRecordsPerBatch`` bounds
executor memory on large payloads; repartition by a key before the map
when downstream wants co-location.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

MEDIA_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, features array<double>"
)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded values in
    [0, 1). Stable everywhere; replace with a real codec when available."""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 256.0 for i in range(dim)]


def _real_features(kind: str, payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Decode the payload with the real (stdlib/PIL) codecs and summarize
    it into a fixed-width feature vector. Image: geometry + intensity
    stats. Audio: duration/rate + energy stats. Raises
    UnsupportedMediaError for formats the available decoders can't
    handle (notably video)."""
    import numpy as np

    from aqi_featurestore_spark.functions import codecs

    if kind == "image":
        px = codecs.decode_image(payload).astype(np.float64) / 255.0
        h, w, c = px.shape
        return [
            float(h), float(w), float(c),
            float(px.mean()), float(px.std()),
            float(px[:, :, 0].mean()),
            float(px[:, :, min(1, c - 1)].mean()),
            float(px[:, :, min(2, c - 1)].mean()),
        ][:dim]
    if kind == "audio":
        x, rate = codecs.decode_wav(payload)
        n, ch = x.shape
        mono = x.mean(axis=1)
        zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
        return [
            float(n), float(rate), float(ch),
            float(np.sqrt(np.mean(mono**2))), zc,
            float(np.abs(mono).mean()), float(np.abs(mono).max(initial=0.0)),
            float(n) / float(rate),
        ][:dim]
    from aqi_featurestore_spark.functions.codecs import UnsupportedMediaError

    raise UnsupportedMediaError(
        f"no real decoder for kind={kind!r} (video needs a container "
        "demuxer; use fake=True for the plumbing-only path)"
    )


def extract_media_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    Input: schemas.MEDIA-shaped DataFrame (payload as string/binary).
    Output: (media_id, kind, n_bytes, features array<double>).

    ``fake=True`` emits the deterministic md5 stand-in (oracle-verified);
    ``fake=False`` runs the real stdlib/PIL decoders — PNG images and
    PCM WAV audio produce real statistics, unsupported payloads raise.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else str(p).encode()
                for p in pdf["payload"]
            ]
            if fake:
                feats = [_fake_features(p) for p in payloads]
            else:
                feats = [
                    _real_features(k, p) for k, p in zip(pdf["kind"], payloads)
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "features": feats,
                }
            )

    return df.mapInPandas(featurize, schema=MEDIA_FEATURES_SCHEMA)


# -- Image perceptual hashes (dHash / aHash) --------------------------------
#
# The standard image-dedup stage of a multimodal training pipeline: decode,
# shrink to a tiny grayscale grid, hash the gradient (dHash) and the
# mean-threshold (aHash) structure. Perceptually-similar images agree on
# most bits, so near-dups are pairs within a small Hamming distance —
# found at scale with the same pigeonhole band join as SimHash
# (near_dedup.hamming_hash_pairs): only the 8-byte hashes ever shuffle,
# pixels stay inside the decode stage.
#
# 63 bits (bit 63 kept zero) so the hash stays in two's-complement BIGINT
# range on every engine, same convention as near_dedup.simhash.

PHASH_GRID_ROWS = 8
PHASH_GRID_COLS = 9  # dHash compares horizontal neighbors: 9 cols -> 8 diffs
PHASH_BITS = 63

IMAGE_HASH_SCHEMA = "media_id long, dhash long, ahash long"


def _fake_gray_grid(payload: bytes) -> list[list[int]]:
    """Deterministic stand-in for decode+shrink: an 8 x 9 grid of hex-digit
    'pixel' values (0-15), row r = the first 9 hex digits of
    md5(payload || '|dh' || r). Pure digest math — the DuckDB oracle
    reproduces every pixel, hence every hash bit."""
    grid = []
    for r in range(PHASH_GRID_ROWS):
        hx = hashlib.md5(payload + b"|dh%d" % r).hexdigest()
        grid.append([int(ch, 16) for ch in hx[: PHASH_GRID_COLS]])
    return grid


def _real_gray_grid(payload: bytes) -> list[list[int]]:
    """Real decode path: codecs.decode_image -> channel-mean grayscale ->
    8 x 9 block-mean shrink (integer micro-rounded so the grid is
    deterministic across BLAS builds)."""
    import numpy as np

    from aqi_featurestore_spark.functions import codecs

    px = codecs.decode_image(payload).astype(np.float64)
    gray = px.mean(axis=2)
    rows = np.array_split(gray, PHASH_GRID_ROWS, axis=0)
    grid = []
    for rblock in rows:
        cols = np.array_split(rblock, PHASH_GRID_COLS, axis=1)
        grid.append([int(round(c.mean() * 1000)) for c in cols])
    return grid


def _grid_hashes(grid: list[list[int]]) -> tuple[int, int]:
    """(dhash, ahash) from an 8 x 9 grid: dHash bit (r*8+c) set iff
    px[r][c+1] > px[r][c]; aHash over the left 8 x 8 block, bit set iff
    64*px > sum(px) (strict, integer — no float mean). Bit 63 dropped."""
    dhash = 0
    for r in range(PHASH_GRID_ROWS):
        for c in range(PHASH_GRID_COLS - 1):
            b = r * 8 + c
            if b < PHASH_BITS and grid[r][c + 1] > grid[r][c]:
                dhash |= 1 << b
    vals = [grid[r][c] for r in range(8) for c in range(8)]
    total = sum(vals)
    ahash = 0
    for b, v in enumerate(vals):
        if b < PHASH_BITS and v * 64 > total:
            ahash |= 1 << b
    return dhash, ahash


def image_perceptual_hashes(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """dHash + aHash per image row via Arrow-batched mapInPandas.

    Input: schemas.MEDIA-shaped rows (caller filters kind == 'image').
    Output: (media_id, dhash, ahash) — the payload NEVER leaves this
    stage; downstream dedup joins move 8-byte hashes only.

    ``fake=True`` hashes the md5-derived pixel grid (oracle-verified);
    ``fake=False`` decodes real pixels via functions.codecs first."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dh, ah = [], []
            for p in pdf["payload"]:
                # NULL payload -> NULL hashes (corrupt rows must surface
                # as NULLs the caller can filter, never hash as b'None');
                # any other non-bytes type is a schema bug — refuse loudly
                if p is None:
                    dh.append(None)
                    ah.append(None)
                    continue
                if not isinstance(p, (bytes, bytearray)):
                    raise TypeError(
                        f"image payload must be bytes, got {type(p).__name__}"
                    )
                grid = _fake_gray_grid(p) if fake else _real_gray_grid(p)
                d, a = _grid_hashes(grid)
                dh.append(d)
                ah.append(a)
            # object dtype: a None among 63-bit hash ints must NOT coerce
            # the column to float64 (which silently rounds > 2^53)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].reset_index(drop=True),
                    "dhash": pd.Series(dh, dtype="object"),
                    "ahash": pd.Series(ah, dtype="object"),
                }
            )

    return df.mapInPandas(hash_batches, schema=IMAGE_HASH_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata only (duration_ms) — the decode of
    each frame is the stubbed step. Demonstrates the explode-by-metadata
    shape that keeps the expensive work row-parallel."""
    from pyspark.sql import functions as F

    n = (F.col("duration_ms") / every_ms).cast("int")
    # guard n >= 1: sequence(0, -1) would produce a *descending* [0, -1]
    return (
        df.where((F.col("kind") == "video") & (n >= 1))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
