"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed struct metadata (driver brief, SURVEY §2.9).

The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested. Decode is REAL for every
format here: binary PPM, zlib PNG (codecs.py), baseline JFIF JPEG
(jpeg.py — pure-numpy Huffman + IDCT), PCM16 WAV, and MP4 video
(mp4.py — real ISO-BMFF box/sample-table parse; Motion-JPEG samples
decode to real pixels with the in-repo JPEG decoder). H.264 bitstream
decode is out of scope (no entropy decoder here, no ffmpeg in the
container): an H.264 mp4 still parses — metadata, duration, frame
offsets/timestamps — but its samples are not pixel-decodable, and
``_decode_payload`` reports that as a zero-feature row rather than
faking statistics.

Scale notes:
- payloads stay in executors end-to-end (no collect; feature columns
  are small projections of big binaries, so always select features out
  and drop the payload before any shuffle),
- mapInPandas streams Arrow record batches → constant memory per task
  regardless of file count,
- `spark.sql.files.maxPartitionBytes` (session.py) sizes binary scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal row: opaque payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType(), True),  # image|audio|video
                    StructField("format", StringType(), True),  # png|wav|mp4|...
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Formats decodable with the in-repo pure-numpy codecs
# (codecs.py, jpeg.py, mp4.py).
REAL_FORMATS = {"ppm", "wav", "png", "jpeg", "mp4"}


def _fit_length(v: np.ndarray, n_features: int) -> np.ndarray:
    """Pad with zeros / truncate so every row of the feature column has
    exactly n_features elements regardless of which codec produced it."""
    if len(v) == n_features:
        return v
    if len(v) > n_features:
        return v[:n_features]
    return np.concatenate([v, np.zeros(n_features - len(v))])


def _decode_payload(payload: bytes, fmt: str | None, n_features: int = 8) -> np.ndarray:
    """Real statistics for every supported format (codecs.py, jpeg.py,
    mp4.py). Unknown formats and undecodable sample codecs (e.g. an
    H.264 mp4 — container parses, bitstream doesn't) yield a zero
    vector: an honest 'no features', never fabricated statistics. All
    paths emit exactly n_features values so the column is never
    ragged."""
    from .codecs import audio_features, image_features, png_features
    from .jpeg import jpeg_features
    from .mp4 import mp4_features

    if payload is None:
        return np.zeros(n_features)
    try:
        if fmt == "ppm":
            return _fit_length(image_features(bytes(payload)), n_features)
        if fmt == "png":
            return _fit_length(png_features(bytes(payload)), n_features)
        if fmt == "jpeg":
            return _fit_length(jpeg_features(bytes(payload)), n_features)
        if fmt == "wav":
            return _fit_length(audio_features(bytes(payload)), n_features)
        if fmt == "mp4":
            return _fit_length(mp4_features(bytes(payload)), n_features)
    except ValueError:
        pass
    return np.zeros(n_features)


def media_metadata(df: DataFrame) -> DataFrame:
    """Cheap metadata projection — never touches the payload bytes
    (column pruning drops the binary at the scan)."""
    return df.select(
        "media_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.format").alias("format"),
        F.length("payload").alias("payload_bytes"),
        (F.col("meta.width") * F.col("meta.height")).alias("pixels"),
    )


def decode_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """payload → feature vector via mapInPandas (Arrow-batched).

    Output: (media_id, features array<double>) — the payload is dropped
    before anything downstream can shuffle it.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, f, n_features).tolist() if p is not None else None
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return (
        df.select("media_id", "payload", F.col("meta.format").alias("format"))
        .mapInPandas(decode_batches, out_schema)
    )


def perceptual_hash(df: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image payload via mapInPandas.

    Decode (our deterministic ppm/png/jpeg codecs) → grayscale → 8×8
    box-mean downsample → threshold at the block-mean average → 64
    bits packed MSB-first into a signed BIGINT. Constant memory per
    batch; the payload never leaves the Arrow batch, only the 8-byte
    hash is shuffled downstream — which is the entire point of
    perceptual-hash dedup at 100 TB: pairwise comparison happens on
    hashes, not pixels. Non-image / undecodable rows yield NULL."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("phash", LongType(), True),
        ]
    )

    def _ahash(pix: np.ndarray) -> int:
        g = pix.astype(np.float64).mean(axis=2)
        h, w = g.shape
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
        bits = (blocks > blocks.mean()).flatten()
        v = 0
        for b in bits:
            v = (v << 1) | int(b)
        return v - (1 << 64) if v >= (1 << 63) else v

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_png, decode_ppm
        from .jpeg import decode_jpeg

        decoders = {"ppm": decode_ppm, "png": decode_png, "jpeg": decode_jpeg}
        for pdf in batches:
            out = []
            for p, f in zip(pdf["payload"], pdf["format"]):
                dec = decoders.get(f)
                if p is None or dec is None:
                    out.append(None)
                    continue
                out.append(_ahash(np.asarray(dec(bytes(p)))))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": pd.array(out, dtype="Int64")}
            )

    return df.select(
        "media_id", "payload", F.col("meta.format").alias("format")
    ).mapInPandas(hash_batches, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: REAL nearest-neighbor pixel resample for PPM, PNG, JPEG
    and MJPEG-MP4 payloads (full decode → resample → re-encode; for
    mp4, every frame through the sample table). Unknown formats pass
    through unchanged. The meta struct is rewritten with the new
    dimensions either way."""
    from .codecs import decode_png, encode_png, resize_ppm
    from .jpeg import resize_jpeg

    def _transform(payload: bytes, fmt: str | None) -> bytes:
        if fmt == "ppm":
            return resize_ppm(bytes(payload), width, height)
        if fmt == "png":
            pix = decode_png(bytes(payload))
            h, w, _ = pix.shape
            ys = (np.arange(height) * h // height).clip(0, h - 1)
            xs = (np.arange(width) * w // width).clip(0, w - 1)
            return encode_png(pix[ys][:, xs])
        if fmt == "jpeg":
            return resize_jpeg(bytes(payload), width, height)
        if fmt == "mp4":
            from .jpeg import decode_jpeg
            from .mp4 import encode_mp4, parse_mp4

            info = parse_mp4(bytes(payload))
            if info["codec"] != "jpeg" or not info["samples"]:
                return payload  # container fine, samples not decodable
            frames = []
            for off, size, _ts in info["samples"]:
                pix = decode_jpeg(bytes(payload[off : off + size]))
                h, w, _ = pix.shape
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                frames.append(pix[ys][:, xs])
            fps = max(
                1, info["n_samples"] * 1000 // max(1, info["duration_ms"])
            )
            return encode_mp4(frames, fps=fps)
        return payload

    out_schema = MEDIA_SCHEMA

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            fmts = [None if m is None else m.get("format") for m in pdf["meta"]]
            pdf["payload"] = [
                None if p is None else _transform(p, f)
                for p, f in zip(pdf["payload"], fmts)
            ]
            pdf["meta"] = [
                None
                if m is None
                else {**m, "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pdf

    return df.mapInPandas(resize_batches, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled timestamp, from
    metadata only — the payload is never read (column pruning drops
    it). Explodes a sequence natively; pair with
    ``decode_sampled_frames`` when the sampled frames' pixels are
    actually needed."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("meta.kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_ix"),
        )
        .withColumn("frame_ts_ms", F.col("frame_ix") * every_ms)
    )


_MEDIA_ROWS_CACHE: dict[int, list] = {}


def decode_sampled_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video frame sampling: parse each mp4's sample table
    (mp4.py), pick the on-screen frame at every ``every_ms`` tick, and
    decode its pixels (MJPEG → real JPEG decode). Output one row per
    sampled frame: (media_id, frame_ts_ms, sample_ix, mean_r, mean_g,
    mean_b, gray_std) — only small scalars leave the Arrow batch, the
    payload never shuffles. An mp4 whose codec we can't pixel-decode
    (e.g. H.264) still yields rows with NULL pixel stats — the sample
    TABLE is codec-agnostic."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("sample_ix", IntegerType(), False),
            StructField("mean_r", DoubleType(), True),
            StructField("mean_g", DoubleType(), True),
            StructField("mean_b", DoubleType(), True),
            StructField("gray_std", DoubleType(), True),
        ]
    )

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg
        from .mp4 import parse_mp4

        for pdf in batches:
            rows = []
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                if payload is None or fmt != "mp4":
                    continue
                try:
                    info = parse_mp4(bytes(payload))
                except ValueError:
                    continue
                samples = info["samples"]
                if not samples:
                    continue
                decodable = info["codec"] == "jpeg"
                si = 0
                for ts in range(0, max(info["duration_ms"], 1), every_ms):
                    while si + 1 < len(samples) and samples[si + 1][2] <= ts:
                        si += 1
                    off, size, _ = samples[si]
                    if decodable:
                        pix = decode_jpeg(bytes(payload[off : off + size]))
                        p = pix.astype(np.float64) / 255.0
                        g = p.mean(axis=2)
                        stats = (
                            float(p[:, :, 0].mean()),
                            float(p[:, :, 1].mean()),
                            float(p[:, :, 2].mean()),
                            float(g.std()),
                        )
                    else:
                        stats = (None, None, None, None)
                    rows.append((int(mid), ts, si) + stats)
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_ts_ms", "sample_ix",
                    "mean_r", "mean_g", "mean_b", "gray_std",
                ],
            )
            # empty batches must still carry Arrow-convertible dtypes
            yield out.astype(
                {
                    "media_id": "int64",
                    "frame_ts_ms": "int64",
                    "sample_ix": "int32",
                    "mean_r": "float64",
                    "mean_g": "float64",
                    "mean_b": "float64",
                    "gray_std": "float64",
                }
            )

    return (
        df.filter(F.col("meta.kind") == "video")
        .select("media_id", "payload", F.col("meta.format").alias("format"))
        .mapInPandas(frame_batches, out_schema)
    )


def decode_frame_lumas(df: DataFrame) -> DataFrame:
    """EVERY frame's mean luminance, one row per (media_id, frame_ix):
    parse the mp4 sample table, MJPEG-decode each sample, reduce the
    pixels to one float64 mean-gray inside the Arrow batch. This is the
    decode kernel under scene-cut detection — only (id, ix, ts, one
    scalar) ever leaves the Python worker, so a 100 TB video corpus
    shuffles frame COUNTS of data, not pixels. Non-decodable codecs
    yield no rows (a cut detector has nothing to say without pixels)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ix", IntegerType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("mean_gray", DoubleType(), False),
        ]
    )

    def luma_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg
        from .mp4 import parse_mp4

        for pdf in batches:
            rows = []
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                if payload is None or fmt != "mp4":
                    continue
                try:
                    info = parse_mp4(bytes(payload))
                except ValueError:
                    continue
                if info["codec"] != "jpeg":
                    continue
                for ix, (off, size, ts) in enumerate(info["samples"]):
                    pix = decode_jpeg(bytes(payload[off : off + size]))
                    g = (pix.astype(np.float64) / 255.0).mean()
                    rows.append((int(mid), ix, int(ts), float(g)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_ix", "frame_ts_ms", "mean_gray"]
            ).astype(
                {
                    "media_id": "int64",
                    "frame_ix": "int32",
                    "frame_ts_ms": "int64",
                    "mean_gray": "float64",
                }
            )

    return (
        df.filter(F.col("meta.kind") == "video")
        .select("media_id", "payload", F.col("meta.format").alias("format"))
        .mapInPandas(luma_batches, out_schema)
    )


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/queries (no binary
    fixtures ship with the testdata). Image rows cycle REAL binary
    PPMs, REAL zlib-compressed PNGs (all five scanline filters), and
    REAL baseline JPEGs (4:4:4 and 4:2:0, with and without restart
    markers — every decoder branch runs); audio rows are REAL PCM16
    WAVs; video rows are REAL Motion-JPEG MP4s (mp4.py — full
    ISO-BMFF container, every frame decodable). Payload construction
    is memoized per ``n`` (pure-python encode cost; rows are
    deterministic so the cache is safe)."""
    from .codecs import encode_png, encode_ppm, encode_wav
    from .jpeg import encode_jpeg
    from .mp4 import encode_mp4

    if n in _MEDIA_ROWS_CACHE:
        return spark.createDataFrame(_MEDIA_ROWS_CACHE[n], MEDIA_SCHEMA)

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 64 + (i % 4) * 32, 64 + (i % 3) * 32
            yy, xx = np.mgrid[0:h, 0:w]
            pix = np.stack(
                [
                    (xx * 255 // max(1, w - 1)).astype(np.uint8),
                    (yy * 255 // max(1, h - 1)).astype(np.uint8),
                    np.full((h, w), i % 256, dtype=np.uint8),
                ],
                axis=2,
            )
            j = i // 3
            if j % 3 == 0:
                payload, fmt = encode_ppm(pix), "ppm"
            elif j % 3 == 1:
                payload, fmt = encode_png(pix, filter_type=j % 5), "png"
            else:
                payload, fmt = (
                    encode_jpeg(
                        pix,
                        quality=90,
                        subsample=j % 2 == 0,
                        restart_interval=2 if j % 4 == 0 else 0,
                    ),
                    "jpeg",
                )
            duration, rate = None, None
        elif kind == "audio":
            rate, duration = 16000, 1000 * (1 + i % 5)
            t = np.arange(rate * duration // 1000, dtype=np.float64)
            freq = 110.0 * (1 + i % 8)
            samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
            payload, fmt = encode_wav(samples, rate), "wav"
            w = h = None
        else:
            # REAL MJPEG mp4: fps=4 and 4·(1+i%5) frames keeps the
            # duration formula 1000·(1+i%5) ms that the frame-sample
            # oracle derives from first principles.
            n_frames = 4 * (1 + i % 5)
            w, h = 48, 32
            frames = []
            for k in range(n_frames):
                yy, xx = np.mgrid[0:h, 0:w]
                frames.append(
                    np.stack(
                        [
                            ((xx * 5 + k * 20 + i) % 256).astype(np.uint8),
                            ((yy * 7 + k * 11) % 256).astype(np.uint8),
                            np.full((h, w), (i * 3 + k * 40) % 256, dtype=np.uint8),
                        ],
                        axis=2,
                    )
                )
            payload, fmt = encode_mp4(frames, fps=4), "mp4"
            rate = None
            duration = 1000 * (1 + i % 5)
        rows.append(
            (
                i,
                bytearray(payload),
                {
                    "kind": kind,
                    "format": fmt,
                    "width": w,
                    "height": h,
                    "duration_ms": duration,
                    "sample_rate": rate,
                },
            )
        )
    _MEDIA_ROWS_CACHE[n] = rows
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_gated_audio_df(spark, n: int = 48) -> DataFrame:
    """Deterministic burst-gated audio table for the silence-detection
    operator: 2-second PCM16 WAVs built from eight 250 ms blocks, block
    b of clip i silent iff (b + i) % (2 + i % 3) == 0, else a pure sine
    at 110·(1 + i mod 8) Hz. Real encoded WAV payloads (codecs.py), so
    the query exercises the full decode path; the gate pattern gives
    every clip a distinct silence layout. Kept separate from
    synthetic_media_df so the pinned oracles of the constant-amplitude
    clips never move."""
    from .codecs import encode_wav

    key = ("gated", n)
    if key in _MEDIA_ROWS_CACHE:
        return spark.createDataFrame(_MEDIA_ROWS_CACHE[key], MEDIA_SCHEMA)

    rate, duration = 16000, 2000
    block = rate // 4  # 250 ms
    rows = []
    for i in range(n):
        t = np.arange(rate * duration // 1000, dtype=np.float64)
        freq = 110.0 * (1 + i % 8)
        samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
        period = 2 + i % 3
        for b in range(len(samples) // block):
            if (b + i) % period == 0:
                samples[b * block : (b + 1) * block] = 0
        rows.append(
            (
                i,
                bytearray(encode_wav(samples, rate)),
                {
                    "kind": "audio",
                    "format": "wav",
                    "width": None,
                    "height": None,
                    "duration_ms": duration,
                    "sample_rate": rate,
                },
            )
        )
    _MEDIA_ROWS_CACHE[key] = rows
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_audio_rms_windows(df: DataFrame, win_ms: int = 125) -> DataFrame:
    """WAV payload → short-time RMS, one row per (media_id, win_ix)
    window, via mapInPandas (Arrow-batched). Only (id, window index,
    one float) leaves the Python worker — the waveform never shuffles —
    so silence/activity segmentation downstream is plain relational
    work on a table ~duration/win_ms the size of the corpus row count.
    Non-audio / undecodable rows yield no windows."""
    from .codecs import decode_wav

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("win_ix", IntegerType(), False),
            StructField("rms", DoubleType(), False),
        ]
    )

    def rms_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                if payload is None or fmt != "wav":
                    continue
                try:
                    samples, rate = decode_wav(bytes(payload))
                except ValueError:
                    continue
                win = max(1, rate * win_ms // 1000)
                n_win = len(samples) // win
                for ix in range(n_win):
                    seg = samples[ix * win : (ix + 1) * win]
                    rows.append(
                        (int(mid), ix, float(np.sqrt(np.mean(seg * seg))))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "win_ix", "rms"]
            ).astype({"media_id": "int64", "win_ix": "int32", "rms": "float64"})

    return (
        df.filter(F.col("meta.kind") == "audio")
        .select("media_id", "payload", F.col("meta.format").alias("format"))
        .mapInPandas(rms_batches, out_schema)
    )


def decode_audio_spectral(df: DataFrame, frame: int = 4096) -> DataFrame:
    """WAV payload → spectral features via mapInPandas (Arrow-batched):
    dominant frequency (argmax rFFT bin over the first ``frame``
    samples, DC excluded), spectral centroid, and RMS amplitude. Pure
    numpy — a real frequency-domain decode, not a stub; the payload is
    dropped at this operator so nothing downstream shuffles bytes.
    Non-audio / undecodable rows yield NULL features."""
    from .codecs import decode_wav

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("dominant_hz", DoubleType(), True),
            StructField("centroid_hz", DoubleType(), True),
            StructField("rms", DoubleType(), True),
        ]
    )

    def spectral_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dom, cen, rms = [], [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                if payload is None or fmt != "wav":
                    dom.append(None), cen.append(None), rms.append(None)
                    continue
                samples, rate = decode_wav(bytes(payload))
                if len(samples) == 0:
                    dom.append(None), cen.append(None), rms.append(None)
                    continue
                x = samples  # decode_wav already yields float64 in [-1, 1]
                seg = np.zeros(frame)
                seg[: min(frame, len(x))] = x[:frame]
                mag = np.abs(np.fft.rfft(seg))
                mag[0] = 0.0  # drop DC
                hz = np.arange(len(mag)) * (rate / frame)
                k = int(np.argmax(mag))
                tot = float(mag.sum())
                dom.append(float(hz[k]))
                cen.append(float((hz * mag).sum() / tot) if tot > 0 else None)
                rms.append(float(np.sqrt(np.mean(x * x))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dominant_hz": pd.Series(dom, dtype="float64"),
                    "centroid_hz": pd.Series(cen, dtype="float64"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )

    return (
        df.filter(F.col("meta.kind") == "audio")
        .select("media_id", "payload", F.col("meta.format").alias("format"))
        .mapInPandas(spectral_batches, out_schema)
    )
