"""Best-effort real media decoding from the standard library.

The container has no image/audio packages, but a useful subset of real
decoding IS possible with what ships in CPython: PNG is zlib-compressed
scanlines behind a fixed chunk layout, and WAV PCM parses with the
stdlib ``wave`` module. These decoders are honest implementations of the
formats (CRC-checked chunk walk, full filter reconstruction per the PNG
spec), not stubs — they produce pixel/sample arrays identical to what
PIL/soundfile would return for the supported profiles:

- PNG: 8-bit, non-interlaced, greyscale / RGB / RGBA (color types
  0, 2, 6), all five scanline filters. Other profiles (16-bit, palette,
  interlaced) raise ``UnsupportedMediaError`` — explicitly, not wrongly.
- WAV: 8/16-bit integer PCM, any channel count / sample rate.
- If PIL is importable (it is not in this container), it is preferred
  for images — it covers every PNG profile plus JPEG etc. The import is
  guarded so the stdlib path is the default everywhere.

Video needs a container demuxer (no stdlib equivalent) and stays
``NotImplementedError`` — see ``operators/multimodal.py`` for the
deterministic fake used by the oracle-verified plumbing path.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

__all__ = [
    "UnsupportedMediaError",
    "decode_image",
    "decode_png",
    "decode_wav",
    "encode_png",
    "encode_wav",
]


class UnsupportedMediaError(NotImplementedError):
    """Payload is a format/profile the available decoders cannot handle."""


try:  # pragma: no cover - PIL absent in this container
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (palette/alpha-grey unsupported below)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into a (H, W, C) uint8 array (C=1 grey, 3 RGB,
    4 RGBA). Supports 8-bit non-interlaced color types 0/2/4/6 — the
    profiles every common encoder emits for synthetic/screenshot data."""
    if not payload.startswith(_PNG_SIG):
        raise UnsupportedMediaError("not a PNG signature")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise UnsupportedMediaError("truncated PNG chunk")
        crc_bytes = payload[pos + 8 + length:pos + 12 + length]
        if len(crc_bytes) != 4 or struct.unpack(">I", crc_bytes)[0] != (
            zlib.crc32(ctype + body) & 0xFFFFFFFF
        ):
            raise UnsupportedMediaError(
                f"PNG chunk {ctype!r} CRC mismatch (corrupted payload)"
            )
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise UnsupportedMediaError(
            f"unsupported PNG profile (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise UnsupportedMediaError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = line
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                if f == 1:
                    cur[x] = (int(line[x]) + a) & 0xFF
                elif f == 3:
                    cur[x] = (int(line[x]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[x - nch]) if x >= nch else 0
                    p, pa, pb, pc = a + b - c, 0, 0, 0
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, nch)


def decode_image(payload: bytes) -> np.ndarray:
    """(H, W, C) uint8 pixels with the image's NATIVE channel count
    (1 grey, 2 grey+alpha, 3 RGB, 4 RGBA) — both paths agree, so the
    same PNG produces the same feature vector with or without PIL.
    PIL when importable (covers every format), else the stdlib PNG
    decoder; palette/other exotic modes normalize to RGB."""
    if _PIL_Image is not None:  # pragma: no cover - PIL absent here
        img = _PIL_Image.open(io.BytesIO(payload))
        if img.mode not in ("L", "LA", "RGB", "RGBA"):
            img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    return decode_png(payload)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV PCM to ((n_samples, n_channels) float64 in [-1, 1],
    sample_rate). 8-bit unsigned and 16-bit signed PCM."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch, sw, rate, nframes = (
                wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
            )
            frames = wf.readframes(nframes)
    except wave.Error as e:
        raise UnsupportedMediaError(f"not a PCM WAV: {e}") from e
    if sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise UnsupportedMediaError(f"unsupported WAV sample width {sw}")
    return x.reshape(-1, nch), rate


# -- encoders (test fixtures / round-trip checks) ---------------------------


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal valid PNG encoder (filter 0 scanlines) for (H, W, C)
    uint8 arrays with C in {1, 3, 4} — produces files any decoder
    (including PIL) reads back pixel-identically."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[nch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """16-bit PCM WAV from (n, ch) float64 in [-1, 1]."""
    import wave

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(x.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
