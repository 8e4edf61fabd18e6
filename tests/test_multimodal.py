"""Multimodal column tests: binary payloads + typed metadata; decode is
REAL for ppm/png/jpeg/wav (pure-numpy + stdlib-zlib codecs), stubbed
for mp4 only."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_spark.multimodal.codecs import (
    audio_features,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    image_features,
    resize_ppm,
)
from bigdata_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_plan,
    media_metadata,
    resize_images,
    synthetic_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media_df(spark, n=30)


def test_schema_contract(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.count() == 30


def test_metadata_projection_prunes_payload(media):
    out = media_metadata(media)
    rows = out.collect()
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    assert all(r["payload_bytes"] > 0 for r in rows)
    # binary column is not in the output schema
    assert "payload" not in out.columns


def test_decode_features_batch_shape(media):
    out = decode_image_features(media, n_features=8)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(np.isfinite(v) for r in rows for v in r["features"])
    # deterministic: same payload → same features across runs
    again = decode_image_features(media, n_features=8).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in rows} == {
        r["media_id"]: tuple(r["features"]) for r in again
    }


def test_ppm_codec_roundtrip_and_stats():
    # solid-color 4×6 image: channel means are exactly the color
    pix = np.zeros((4, 6, 3), dtype=np.uint8)
    pix[:, :, 0], pix[:, :, 1], pix[:, :, 2] = 255, 128, 0
    payload = encode_ppm(pix)
    assert (decode_ppm(payload) == pix).all()
    f = image_features(payload)
    assert f[0] == pytest.approx(1.0)
    assert f[1] == pytest.approx(128 / 255)
    assert f[2] == pytest.approx(0.0)
    assert f[3] == pytest.approx(0.0)  # solid → zero gray std
    assert f[6] == pytest.approx(6 / 4)  # aspect w/h
    # comment-bearing header also parses
    with_comment = b"P6\n# crafted\n6 4\n255\n" + pix.tobytes()
    assert (decode_ppm(with_comment) == pix).all()


def test_wav_codec_roundtrip_and_stats():
    rate = 8000
    t = np.arange(rate, dtype=np.float64)  # 1 s
    samples = (np.sin(2 * np.pi * 100 * t / rate) * 16384).astype(np.int16)
    payload = encode_wav(samples, rate)
    back, got_rate = decode_wav(payload)
    assert got_rate == rate and len(back) == rate
    assert np.allclose(back, samples / 32768.0)
    f = audio_features(payload)
    assert f[0] == pytest.approx(0.0, abs=1e-3)  # sine mean ~0
    assert f[4] == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)  # RMS of 0.5-amp sine
    assert f[7] == pytest.approx(rate / 48000.0)


def test_resize_rewrites_meta_and_pixels(media):
    out = resize_images(media, 32, 32)
    assert out.schema == MEDIA_SCHEMA
    imgs = out.filter(F.col("meta.kind") == "image").collect()
    assert all(r["meta"]["width"] == 32 and r["meta"]["height"] == 32 for r in imgs)
    # image payloads are REALLY resampled in all three codecs: decode
    # proves 32×32 pixels (PNG/JPEG go decode → resample → re-encode)
    from bigdata_spark.multimodal.jpeg import decode_jpeg

    formats = {r["media_id"]: r["meta"]["format"] for r in imgs}
    assert set(formats.values()) == {"ppm", "png", "jpeg"}
    decoders = {"ppm": decode_ppm, "png": decode_png, "jpeg": decode_jpeg}
    for r in imgs:
        dec = decoders[r["meta"]["format"]]
        assert dec(bytes(r["payload"])).shape == (32, 32, 3)


def test_resize_ppm_nearest_neighbor():
    pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = decode_ppm(resize_ppm(encode_ppm(pix), 2, 2))
    # nearest-neighbor with floor mapping keeps rows/cols 0 and 2
    assert (small == pix[[0, 2]][:, [0, 2]]).all()


def test_frame_sampling(media):
    out = frame_sample_plan(media, every_ms=1000)
    per = out.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("meta.kind") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
        .collect()
    }
    for r in per:
        assert r["count"] == max(durations[r["media_id"]] // 1000, 1)
    # frame timestamps step by the interval
    one = out.filter(F.col("media_id") == sorted(durations)[0]).orderBy("frame_ix").collect()
    assert [r["frame_ts_ms"] for r in one] == [i * 1000 for i in range(len(one))]


def test_audio_spectral_recovers_sine_frequency(spark):
    """The synthetic audio clips are pure sines at 110*(1 + id mod 8)
    Hz; the rFFT dominant bin must land within one bin (rate/frame =
    3.90625 Hz) and RMS at amplitude 12000/32768 / sqrt(2)."""
    import math

    from bigdata_spark.multimodal.media import decode_audio_spectral, synthetic_media_df

    rows = decode_audio_spectral(synthetic_media_df(spark, n=24)).collect()
    assert rows, "audio rows expected"
    for r in rows:
        want_hz = 110.0 * (1 + r["media_id"] % 8)
        assert abs(r["dominant_hz"] - want_hz) <= 16000 / 4096
        assert abs(r["rms"] - 12000 / 32768 / math.sqrt(2)) < 1e-3
        assert r["centroid_hz"] > 0


def test_phash_banding_recall_guarantee(spark):
    """Brute-force all-pairs Hamming vs the banded pipeline: at the
    <=3 threshold the 4x16-bit band join must find EVERY pair
    (pigeonhole), so n_dup_pairs == the exhaustive count."""
    from bigdata_spark.multimodal.media import perceptual_hash, synthetic_media_df
    from bigdata_spark.plans.multimodalq import _PHASH_MAX_HAM, mm_phash_dedup

    media = synthetic_media_df(spark, n=64).filter("meta.kind = 'image'")
    hashes = [
        r["phash"]
        for r in perceptual_hash(media).collect()
        if r["phash"] is not None
    ]
    exhaustive = sum(
        1
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1") <= _PHASH_MAX_HAM
    )
    exact = sum(
        1
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if hashes[i] == hashes[j]
    )
    got = mm_phash_dedup(spark, "/root/testdata/sf0.001").collect()[0]
    assert got["n_images"] == len(hashes)
    assert got["n_dup_pairs"] == exhaustive
    assert got["n_exact_dup_pairs"] == exact
    assert got["n_candidate_pairs"] >= got["n_dup_pairs"]


def test_mp4_roundtrip_and_sample_table():
    """Real ISO-BMFF: encode MJPEG frames, re-extract every frame via
    the sample table, decode pixels, and check timing metadata."""
    import numpy as np

    from bigdata_spark.multimodal.jpeg import decode_jpeg
    from bigdata_spark.multimodal.mp4 import (
        encode_mp4,
        extract_sample,
        parse_mp4,
        sample_at_ms,
    )

    frames = []
    for k in range(6):
        yy, xx = np.mgrid[0:32, 0:48]
        frames.append(
            np.stack(
                [(xx * 3 + k * 17) % 256, (yy * 5) % 256, np.full((32, 48), k * 30)],
                axis=2,
            ).astype(np.uint8)
        )
    payload = encode_mp4(frames, fps=4)
    assert encode_mp4(frames, fps=4) == payload  # deterministic bytes
    info = parse_mp4(payload)
    assert info["codec"] == "jpeg" and info["n_samples"] == 6
    assert (info["width"], info["height"]) == (48, 32)
    assert info["duration_ms"] == 1500  # 6 frames @ 4 fps
    assert [s[2] for s in info["samples"]] == [0, 250, 500, 750, 1000, 1250]
    for i in range(6):
        assert decode_jpeg(extract_sample(payload, i)).shape == (32, 48, 3)
    # frame on screen at 620 ms is sample 2 (ts 500)
    assert sample_at_ms(payload, 620) == extract_sample(payload, 2)


def test_mp4_rejects_non_bmff():
    import pytest as _pytest

    from bigdata_spark.multimodal.mp4 import parse_mp4

    with _pytest.raises(ValueError):
        parse_mp4(b"\x00\x01\x02 definitely not a movie " * 4)


def test_resize_mp4_resamples_every_frame(spark):
    from pyspark.sql import functions as F

    from bigdata_spark.multimodal.media import resize_images, synthetic_media_df
    from bigdata_spark.multimodal.mp4 import parse_mp4

    media = synthetic_media_df(spark, n=12)
    out = resize_images(media, 16, 8).filter(F.col("meta.kind") == "video")
    rows = out.select("payload", "meta").collect()
    assert rows
    for r in rows:
        info = parse_mp4(bytes(r["payload"]))
        assert (info["width"], info["height"]) == (16, 8)
        assert info["n_samples"] >= 4
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 8


def test_decode_sampled_frames_real_pixels(spark):
    from bigdata_spark.multimodal.media import (
        decode_sampled_frames,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=12)
    rows = decode_sampled_frames(media, every_ms=500).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
        assert 0.0 <= r["mean_r"] <= 1.0 and r["gray_std"] is not None
    # video ids are ≡ 2 (mod 3) with duration 1000·(1 + id mod 5) ms:
    # 500 ms sampling → 2·(1+id%5) frames
    for mid, rs in by_media.items():
        assert len(rs) == 2 * (1 + mid % 5)


def test_scene_cut_matches_numpy_reference(spark):
    # first-principles check: recompute one video's per-frame mean
    # luma straight from the synthetic frame formulas and reproduce
    # the cut census the query reports for that media_id
    import numpy as np

    from bigdata_spark.plans.multimodalq import _SCENE_CUT_THRESHOLD, mm_scene_cut

    out = {r["media_id"]: r for r in mm_scene_cut(spark, "unused").collect()}
    i = 14  # video row: kind index 2 mod 3, n_frames = 4*(1 + i%5) = 20
    h, w = 32, 48
    lumas = []
    for k in range(4 * (1 + i % 5)):
        yy, xx = np.mgrid[0:h, 0:w]
        frame = np.stack(
            [
                ((xx * 5 + k * 20 + i) % 256).astype(np.uint8),
                ((yy * 7 + k * 11) % 256).astype(np.uint8),
                np.full((h, w), (i * 3 + k * 40) % 256, dtype=np.uint8),
            ],
            axis=2,
        )
        lumas.append((frame.astype(np.float64) / 255.0).mean())
    # JPEG encode/decode at q85 shifts each frame's luma slightly; the
    # query decodes real JPEG bytes, so compare the CUT STRUCTURE (a
    # 0.10 threshold dwarfs per-frame codec error) rather than raw sums
    deltas = np.abs(np.diff(lumas))
    expected_cuts = int((deltas > _SCENE_CUT_THRESHOLD).sum())
    r = out[i]
    assert r["n_frames"] == len(lumas)
    assert r["n_cuts"] == expected_cuts
    assert r["first_cut_ix"] == int(np.argmax(deltas > _SCENE_CUT_THRESHOLD)) + 1


def test_scene_cut_covers_all_videos(spark):
    from bigdata_spark.plans.multimodalq import mm_scene_cut

    rows = mm_scene_cut(spark, "unused").collect()
    assert len(rows) == 21  # 64 media rows -> ids ≡ 2 (mod 3)
    for r in rows:
        assert r["n_frames"] == 4 * (1 + r["media_id"] % 5)
        assert 0 <= r["n_cuts"] < r["n_frames"]
        assert (r["first_cut_ix"] == -1) == (r["n_cuts"] == 0)
