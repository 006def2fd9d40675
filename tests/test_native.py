"""Native C kernels: availability and parity with the Python paths."""

import numpy as np
import pytest

from whisper_flamingo_tpu import native


def test_native_builds():
    assert native.AVAILABLE, "cc present in this image; native lib must build"


def test_edit_distance_parity():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 5, rng.integers(0, 30)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 30)).tolist()
        expected = _py_levenshtein(a, b)
        got = native.edit_distance(np.asarray(a, np.int64), np.asarray(b, np.int64))
        assert got == expected, (a, b)


def test_mix_noise_parity():
    from whisper_flamingo_tpu.data import noise as noise_mod

    rng = np.random.default_rng(1)
    clean = (rng.standard_normal(16000) * 2000).astype(np.float32)
    noise = (rng.standard_normal(9000) * 800).astype(np.float32)

    native_out = native.mix_noise(clean, noise, 5.0)
    assert native_out is not None

    # pure-python path (reference semantics)
    saved = native.AVAILABLE
    try:
        native.AVAILABLE = False
        py_out = noise_mod.add_noise(clean, [noise], noise_snr=5.0,
                                     rng=np.random.default_rng(0))
    finally:
        native.AVAILABLE = saved
    np.testing.assert_allclose(
        native_out.astype(np.int16), py_out, atol=1
    )


def test_resample_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4321).astype(np.float32)
    got = native.resample_linear(x, 22050, 16000)
    duration = x.shape[0] / 22050
    n_out = int(round(duration * 16000))
    t_out = np.arange(n_out) / 16000
    t_in = np.arange(x.shape[0]) / 22050
    expected = np.interp(t_out, t_in, x).astype(np.float32)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5)


def _py_levenshtein(a, b):
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, y in enumerate(b, 1):
            cur[j] = min(prev[j - 1] + (x != y), prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[-1]
