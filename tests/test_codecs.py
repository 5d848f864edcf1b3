"""Real media decode: stdlib PNG/WAV codecs + the fake=False path of
extract_media_features.

The PNG decoder is exercised against all five scanline filters (the
encoder emits filter 0; the other filters are constructed by applying
the spec's forward filter to known pixels and asserting the decoder
inverts them)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aqi_featurestore_spark.functions import codecs


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Encode (H, W, C) uint8 pixels applying the given per-row filter
    ids (forward filtering per the PNG spec)."""
    h, w, nch = pixels.shape
    stride = w * nch
    flat = pixels.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        raw.append(f)
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = flat[y][x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append(int(flat[y][x] - pred) & 0xFF)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


def test_png_roundtrip_grey_and_rgba():
    rng = np.random.RandomState(11)
    grey = rng.randint(0, 256, size=(3, 7, 1), dtype=np.uint8)
    rgba = rng.randint(0, 256, size=(4, 2, 4), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(grey)), grey)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(rgba)), rgba)


def test_png_all_filters_invert():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(codecs.decode_png(payload), px)


def test_png_unsupported_profiles_refused():
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(b"not a png at all")
    # 16-bit depth is refused, not mis-decoded
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = codecs.encode_png(px)
    ihdr_off = good.index(b"IHDR")
    bad = bytearray(good)
    bad[ihdr_off + 12] = 16  # bit depth byte of IHDR
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(bytes(bad))


def test_wav_roundtrip():
    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = codecs.encode_wav(x, rate=8000)
    decoded, rate = codecs.decode_wav(payload)
    assert rate == 8000 and decoded.shape == (800, 1)
    assert float(np.abs(decoded[:, 0] - x).max()) < 1.0 / 32767


def test_real_media_features_via_spark(spark):
    """fake=False end-to-end through mapInPandas: a real PNG and a real
    WAV payload produce decoded statistics (not md5 noise)."""
    from aqi_featurestore_spark.operators.multimodal import extract_media_features

    px = np.full((4, 6, 3), 128, dtype=np.uint8)
    png = codecs.encode_png(px)
    wav = codecs.encode_wav(np.zeros(400), rate=8000)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), 6, 4, 0), (2, "audio", bytearray(wav), 0, 0, 50)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms long",
    )
    rows = {r["media_id"]: r for r in extract_media_features(media, fake=False).collect()}
    img = rows[1]["features"]
    assert img[0] == 4.0 and img[1] == 6.0 and img[2] == 3.0
    assert abs(img[3] - 128.0 / 255.0) < 1e-12 and img[4] == 0.0
    aud = rows[2]["features"]
    assert aud[0] == 400.0 and aud[1] == 8000.0 and aud[3] == 0.0
    assert rows[1]["n_bytes"] == len(png)


def test_real_media_features_video_refused(spark):
    from aqi_featurestore_spark.functions.codecs import UnsupportedMediaError
    from aqi_featurestore_spark.operators.multimodal import extract_media_features

    media = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x01"), 0, 0, 1000)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms long",
    )
    with pytest.raises(Exception) as ei:
        extract_media_features(media, fake=False).collect()
    assert "UnsupportedMediaError" in str(ei.value) or isinstance(
        ei.value, UnsupportedMediaError
    )


def test_image_perceptual_hash_real_decode(spark):
    """dHash/aHash over REAL decoded pixels (fake=False): identical
    images hash identically, a lightly perturbed image lands within a
    small Hamming distance, a structurally different image lands far —
    the property that makes Hamming-banded image dedup meaningful."""
    from aqi_featurestore_spark.operators.multimodal import image_perceptual_hashes

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(32, 36, 3)).astype(np.uint8)
    near = base.copy()
    near[:2, :2, :] = 255  # small local edit: most 8x9 block means survive
    far = base[::-1, ::-1, :].copy()  # structural flip
    rows = [
        (1, "image", bytearray(codecs.encode_png(base)), 36, 32, 0),
        (2, "image", bytearray(codecs.encode_png(base)), 36, 32, 0),
        (3, "image", bytearray(codecs.encode_png(near)), 36, 32, 0),
        (4, "image", bytearray(codecs.encode_png(far)), 36, 32, 0),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int,"
        " duration_ms long",
    )
    h = {
        r["media_id"]: (r["dhash"], r["ahash"])
        for r in image_perceptual_hashes(media, fake=False).collect()
    }
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert h[1] == h[2]  # identical bytes -> identical hashes
    assert 0 <= ham(h[1][0], h[3][0]) <= 12  # local edit: close in dHash
    assert ham(h[1][0], h[4][0]) > ham(h[1][0], h[3][0])  # flip: farther
    assert all(0 <= v < (1 << 63) for pair in h.values() for v in pair)


def test_image_phash_fake_grid_matches_sql_math(spark):
    """The fake pixel grid is pure md5 math — pin one hand-computed
    value so the oracle SQL and the pandas path can't drift apart."""
    import hashlib

    from aqi_featurestore_spark.operators.multimodal import (
        _fake_gray_grid,
        _grid_hashes,
    )

    payload = b"hello world"
    grid = _fake_gray_grid(payload)
    expect_row0 = [
        int(c, 16)
        for c in hashlib.md5(b"hello world|dh0").hexdigest()[:9]
    ]
    assert grid[0] == expect_row0
    d, a = _grid_hashes(grid)
    # recompute dhash independently, bit by bit
    want = 0
    for r in range(8):
        for c in range(8):
            b = r * 8 + c
            if b < 63 and grid[r][c + 1] > grid[r][c]:
                want |= 1 << b
    assert d == want and 0 <= a < (1 << 63)


def test_image_perceptual_hash_null_payload(spark):
    """NULL payloads hash to NULL (never str-coerced to b'None'), valid
    rows in the same batch keep exact 63-bit hashes (no float64 coercion
    from the mixed None column) — round-5 advisor finding."""
    from aqi_featurestore_spark.operators.multimodal import image_perceptual_hashes

    rows = [
        (1, "image", bytearray(b"hello world"), 0, 0, 0),
        (2, "image", None, 0, 0, 0),
        (3, "image", bytearray(b"hello world"), 0, 0, 0),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int,"
        " duration_ms long",
    )
    h = {
        r["media_id"]: (r["dhash"], r["ahash"])
        for r in image_perceptual_hashes(media, fake=True).collect()
    }
    assert h[2] == (None, None)
    assert h[1] == h[3] and h[1][0] is not None
    # and the NULL row is filterable before any band join
    n = image_perceptual_hashes(media, fake=True).where("dhash IS NOT NULL").count()
    assert n == 2
