"""Baseline-JFIF codec tests (multimodal/jpeg.py): pure numpy, no
Spark — the distributed plumbing is covered by test_multimodal.py."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_spark.multimodal.jpeg import (
    _dct2,
    _idct2,
    decode_jpeg,
    encode_jpeg,
    jpeg_features,
    resize_jpeg,
)


def _gradient(h: int, w: int, blue: int = 77) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(1, w - 1)).astype(np.uint8),
            (yy * 255 // max(1, h - 1)).astype(np.uint8),
            np.full((h, w), blue, dtype=np.uint8),
        ],
        axis=2,
    )


def test_dct_orthonormal_roundtrip():
    rng = np.random.RandomState(7)
    block = rng.rand(8, 8) * 255 - 128
    assert np.allclose(_idct2(_dct2(block)), block, atol=1e-9)


def test_flat_color_decodes_exactly():
    flat = np.full((24, 40, 3), (100, 150, 200), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert out.shape == (24, 40, 3)
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 1


@pytest.mark.parametrize("quality,min_psnr", [(95, 40.0), (85, 33.0), (60, 28.0)])
def test_gradient_psnr(quality, min_psnr):
    pix = _gradient(48, 80)
    out = decode_jpeg(encode_jpeg(pix, quality=quality))
    mse = np.mean((out.astype(float) - pix.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr >= min_psnr


def test_subsampled_420_odd_dimensions():
    pix = _gradient(45, 67)
    out = decode_jpeg(encode_jpeg(pix, quality=80, subsample=True))
    assert out.shape == (45, 67, 3)
    mse = np.mean((out.astype(float) - pix.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) >= 25.0


def test_restart_markers_bit_identical():
    pix = _gradient(48, 80)
    with_rst = decode_jpeg(encode_jpeg(pix, quality=85, restart_interval=3))
    without = decode_jpeg(encode_jpeg(pix, quality=85))
    assert np.array_equal(with_rst, without)


def test_restart_plus_subsample():
    pix = _gradient(33, 49)
    out = decode_jpeg(
        encode_jpeg(pix, quality=75, subsample=True, restart_interval=2)
    )
    assert out.shape == (33, 49, 3)


def test_resize_jpeg_real_pixels():
    pix = _gradient(64, 96)
    small = decode_jpeg(resize_jpeg(encode_jpeg(pix, quality=90), 32, 24))
    assert small.shape == (24, 32, 3)
    # a gradient stays a gradient: left half darker red than right half
    assert small[:, :8, 0].mean() < small[:, -8:, 0].mean()


def test_features_are_real_statistics():
    pix = _gradient(64, 64)
    f = jpeg_features(encode_jpeg(pix, quality=90))
    assert len(f) == 8
    assert abs(f[0] - 0.5) < 0.01  # red mean of an x-gradient
    assert abs(f[1] - 0.5) < 0.01  # green mean of a y-gradient
    assert abs(f[6] - 1.0) < 1e-9  # aspect ratio


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot-a-jpeg")
    # splice a progressive SOF2 marker into an otherwise valid stream
    payload = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    sof0 = payload.find(b"\xff\xc0")
    payload[sof0 + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_deterministic_bytes():
    pix = _gradient(40, 56)
    assert encode_jpeg(pix, quality=85) == encode_jpeg(pix, quality=85)
