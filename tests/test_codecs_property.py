"""Property-based checks for the pure-python media codecs, the PNG
raster backend, and FastDTW (hypothesis-generated inputs, no Spark
session needed — these all run inside executors at scale, so their
invariants must hold on arbitrary data)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from bigdata_spark.ml.dtw import dtw_distance, fast_dtw
from bigdata_spark.ml.png import read_png, write_png
from bigdata_spark.multimodal.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    resize_ppm,
)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_roundtrip_any_shape(w, h, seed):
    rng = np.random.RandomState(seed)
    pix = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(pix)) == pix).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 30),
    w2=st.integers(1, 30),
    h2=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_resize_shape_and_value_domain(w, h, w2, h2, seed):
    rng = np.random.RandomState(seed)
    pix = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_ppm(resize_ppm(encode_ppm(pix), w2, h2))
    assert out.shape == (h2, w2, 3)
    # nearest-neighbor only ever copies source pixels
    src_colors = {tuple(c) for c in pix.reshape(-1, 3)}
    assert {tuple(c) for c in out.reshape(-1, 3)} <= src_colors


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_samples(n, rate, seed):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n, dtype=np.int64).astype(np.int16)
    back, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(back, samples.astype(np.float64) / 32768.0)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_image(w, h, seed):
    import os
    import tempfile

    rng = np.random.RandomState(seed)
    pixels = [
        [tuple(int(v) for v in rng.randint(0, 256, 3)) for _ in range(w)]
        for _ in range(h)
    ]
    fd, path = tempfile.mkstemp(suffix=".png")
    os.close(fd)
    try:
        write_png(path, pixels)
        assert read_png(path) == pixels
    finally:
        os.unlink(path)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(2, 80),
    m=st.integers(2, 80),
    radius=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_fast_dtw_always_upper_bounds_exact(n, m, radius, seed):
    rng = np.random.RandomState(seed)
    a, b = np.cumsum(rng.randn(n)), np.cumsum(rng.randn(m))
    exact = dtw_distance(a, b)
    approx = fast_dtw(a, b, radius=radius)
    assert approx >= exact - 1e-9
    assert np.isfinite(approx)


@settings(max_examples=10, deadline=None)
@given(n=st.integers(1, 100), seed=st.integers(0, 2**31 - 1))
def test_fast_dtw_identity_is_zero(n, seed):
    rng = np.random.RandomState(seed)
    a = np.cumsum(rng.randn(n))
    assert fast_dtw(a, a.copy(), radius=1) == 0.0
