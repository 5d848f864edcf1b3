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
