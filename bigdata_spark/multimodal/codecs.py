"""Pure-python/numpy media codecs for the multimodal surface.

This container ships no PIL/torchaudio/ffmpeg, so the formats the
engine can *really* decode are the trivially-parseable containers:
binary PPM (P6) images and PCM16 RIFF/WAVE audio. That is enough to
make the decode → feature-extract → resize path genuinely execute on
real pixels/samples; compressed formats (png/jpeg/mp4) still fall back
to the documented stub in media.py.

All functions are driver/executor-agnostic plain numpy — they run
inside Arrow-batched mapInPandas workers.
"""

from __future__ import annotations

import struct

import numpy as np


# --- PPM (P6, 8-bit RGB) ----------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) payload."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) payload → (h, w, 3) uint8 pixels."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace/comments, width, height, maxval, single ws
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("decode_ppm handles 8-bit (maxval 255) only")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a P6 payload — a real pixel transform,
    not a pass-through."""
    pix = decode_ppm(payload)
    h, w, _ = pix.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_ppm(pix[ys][:, xs])


# --- WAV (RIFF/WAVE, PCM16) -------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 samples → mono PCM16 RIFF/WAVE payload."""
    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Mono PCM16 RIFF/WAVE payload → (float64 samples in [-1, 1],
    sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("decode_wav handles mono PCM16 only")
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    return samples, int(sample_rate)


# --- feature extraction -----------------------------------------------------

def image_features(payload: bytes) -> np.ndarray:
    """8 real pixel statistics from a P6 payload: per-channel means,
    gray std/min/max, aspect ratio, normalized size."""
    pix = decode_ppm(payload).astype(np.float64) / 255.0
    h, w, _ = pix.shape
    gray = pix.mean(axis=2)
    return np.array(
        [
            pix[:, :, 0].mean(),
            pix[:, :, 1].mean(),
            pix[:, :, 2].mean(),
            gray.std(),
            gray.min(),
            gray.max(),
            w / h,
            min(1.0, (w * h) / 4096.0),
        ]
    )


def audio_features(payload: bytes) -> np.ndarray:
    """8 real sample statistics from a PCM16 WAV payload: mean, std,
    min, max, RMS, zero-crossing rate, duration (s, capped), normalized
    sample rate."""
    samples, rate = decode_wav(payload)
    if len(samples) == 0:
        return np.zeros(8)
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    return np.array(
        [
            samples.mean(),
            samples.std(),
            samples.min(),
            samples.max(),
            float(np.sqrt(np.mean(samples**2))),
            zc,
            min(1.0, len(samples) / rate / 60.0),
            rate / 48000.0,
        ]
    )
