"""Word-timestamp subsystem: median filter, DTW wavefront, end-to-end
alignment on the tiny parity model."""

import numpy as np
import pytest

from whisper_flamingo_tpu.ops.dtw import dtw, dtw_costs_jax, dtw_np
from whisper_flamingo_tpu.ops.median import median_filter


def test_median_filter_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 40)).astype(np.float32)
    out = np.asarray(median_filter(x, 7))
    padded = np.pad(x, [(0, 0), (0, 0), (3, 3)], mode="reflect")
    expected = np.stack(
        [
            np.median(padded[..., i : i + 7], axis=-1)
            for i in range(x.shape[-1])
        ],
        axis=-1,
    )
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_median_filter_short_input_passthrough():
    x = np.ones((4, 2), np.float32)
    out = np.asarray(median_filter(x, 7))
    np.testing.assert_allclose(out, x)


def test_dtw_wavefront_matches_np_dp():
    rng = np.random.default_rng(1)
    for shape in [(8, 12), (20, 90), (70, 130)]:
        x = rng.standard_normal(shape).astype(np.float32)
        expected = dtw_np(x)
        _, trace = dtw_costs_jax(x)
        from whisper_flamingo_tpu.ops.dtw import backtrace_np

        got = backtrace_np(trace)
        np.testing.assert_array_equal(got, expected)


def test_dtw_matches_reference_numba_free():
    """Cross-check against the reference dtw_cpu run with the numba stub."""
    import importlib.util
    from conftest import import_reference_whisper

    whisper = import_reference_whisper()
    import torch

    rng = np.random.default_rng(2)
    x = rng.standard_normal((15, 40)).astype(np.float32)
    expected = whisper.timing.dtw_cpu(x.astype(np.float64))
    got = dtw(x)
    np.testing.assert_array_equal(got, expected)


def test_dtw_pallas_kernel_interpret():
    """The Pallas wavefront kernel (interpret mode on CPU) matches the DP."""
    from whisper_flamingo_tpu.ops.dtw import backtrace_np
    from whisper_flamingo_tpu.ops.dtw_pallas import dtw_trace_pallas

    rng = np.random.default_rng(5)
    for shape in [(12, 30), (45, 90), (70, 140)]:
        x = rng.standard_normal(shape).astype(np.float32)
        got = backtrace_np(dtw_trace_pallas(x, interpret=True))
        np.testing.assert_array_equal(got, dtw_np(x))


def test_dtw_path_properties():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((30, 100)).astype(np.float32)
    ti, fi = dtw(x)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == 29 and fi[-1] == 99
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ((np.diff(ti) + np.diff(fi)) >= 1).all()


def test_find_alignment_end_to_end():
    import jax

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.timing import find_alignment
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    dims = MODEL_DIMS["debug"]
    model = Whisper(dims=dims, params=init_params(jax.random.PRNGKey(0), dims))
    tok = get_tokenizer(True, language="en", task="transcribe")
    text_tokens = tok.encode(" hello world this is a test")
    mel = np.random.default_rng(0).standard_normal((80, 3000)).astype(np.float32)

    alignment = find_alignment(model, tok, text_tokens, mel, num_frames=1500)
    assert len(alignment) > 1
    for w in alignment:
        assert w.end >= w.start >= 0
        assert 0 <= w.probability <= 1
    words = "".join(w.word for w in alignment)
    assert "hello" in words and "test" in words


def test_add_word_timestamps_segments():
    import jax

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.timing import add_word_timestamps
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    dims = MODEL_DIMS["debug"]
    model = Whisper(dims=dims, params=init_params(jax.random.PRNGKey(0), dims))
    tok = get_tokenizer(True, language="en", task="transcribe")
    tokens = tok.encode(" hello world again")
    segments = [
        {"seek": 0, "start": 0.0, "end": 2.0, "tokens": tokens, "text": " hello world again"}
    ]
    mel = np.random.default_rng(0).standard_normal((80, 3000)).astype(np.float32)
    add_word_timestamps(
        segments=segments, model=model, tokenizer=tok, mel=mel,
        num_frames=1500, last_speech_timestamp=0.0,
    )
    assert "words" in segments[0]
    assert len(segments[0]["words"]) >= 1
    assert all("start" in w and "end" in w for w in segments[0]["words"])
