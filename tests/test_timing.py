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


import pytest


@pytest.mark.parametrize("num_frames", [2500, 2998, 3000, 4])
def test_alignment_program_matches_eager_reference_order(num_frames):
    """The fused alignment program (masked softmax over real frames,
    reflect-into-pad before medfilt, masked z-norm over real token rows,
    token-bucket padding) must reproduce the reference's eager order
    (slice -> softmax -> z-norm -> medfilt; timing.py:185-210) exactly,
    including at a partial final segment (2500), a segment whose real
    width ends inside the filter half-width of the array edge (2998),
    the full segment (3000), and the degenerate small-input passthrough
    regime (4 frames -> nfh=2 <= pad_width)."""
    import jax
    import jax.numpy as jnp

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import (
        Whisper, decoder_apply, encoder_apply, init_params,
    )
    from whisper_flamingo_tpu.ops.median import median_filter
    from whisper_flamingo_tpu.timing import _alignment_program, _token_bucket
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    dims = MODEL_DIMS["debug"]
    model = Whisper(dims=dims, params=init_params(jax.random.PRNGKey(0), dims))
    tok = get_tokenizer(True, language="en", task="transcribe")
    text_tokens = tok.encode(" the quick brown fox")
    tokens = np.array(
        [*tok.sot_sequence, tok.no_timestamps, *text_tokens, tok.eot], np.int32
    )
    mel = np.random.default_rng(1).standard_normal((1, 80, 3000)).astype(np.float32)
    nfh = num_frames // 2
    n_sot = len(tok.sot_sequence)

    # --- eager, reference order, unpadded ---
    feats = encoder_apply(model.params, dims, jnp.asarray(mel), dtype=model.dtype)
    logits, qks = decoder_apply(
        model.params, dims, jnp.asarray(tokens[None]), feats,
        dtype=model.dtype, return_cross_qk=True,
    )
    sampled = np.asarray(logits[0, n_sot:, : tok.eot], np.float32)
    e = np.exp(sampled - sampled.max(-1, keepdims=True))
    probs_ref = (e / e.sum(-1, keepdims=True))[
        np.arange(len(text_tokens)), np.asarray(text_tokens)
    ]
    heads = np.argwhere(model.get_alignment_heads())
    w = jnp.stack([qks[l, 0, h] for l, h in heads])[:, :, :nfh]
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
    mean = jnp.mean(w, axis=-2, keepdims=True)
    std = jnp.std(w, axis=-2, keepdims=True)
    w = median_filter((w - mean) / std, 7)  # passthrough when nfh <= 3
    matrix_ref = np.asarray(jnp.mean(w, axis=0))[n_sot : len(tokens) - 1]

    # --- fused program, bucket-padded ---
    tp = _token_bucket(len(tokens))
    tokens_p = np.pad(tokens, (0, tp - len(tokens)), constant_values=tok.eot)
    prog = _alignment_program(dims, model.dtype, tp, n_sot, int(tok.eot), 7, len(heads))
    text_probs, matrix = jax.device_get(prog(
        model.params, jnp.asarray(mel), jnp.asarray(tokens_p[None]),
        np.int32(len(tokens)), np.int32(nfh), np.float32(1.0),
        jnp.asarray(heads[:, 0]), jnp.asarray(heads[:, 1]),
    ))
    got_probs = np.asarray(text_probs)[: len(text_tokens)]
    got_matrix = np.asarray(matrix)[n_sot : len(tokens) - 1, :nfh]

    np.testing.assert_allclose(got_probs, probs_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got_matrix, matrix_ref, rtol=2e-4, atol=2e-5)


def test_dtw_tie_breaking_matches_np_on_degenerate_costs():
    """Cost matrices full of exact ties (small-integer values) must
    produce identical traces on all three paths: the reference cascade
    propagates c2 on the c0 == c1 < c2 tie — min() does not (regression:
    the device wavefronts once used min)."""
    from whisper_flamingo_tpu.ops.dtw import backtrace_np
    from whisper_flamingo_tpu.ops.dtw_pallas import dtw_trace_pallas

    rng = np.random.default_rng(7)
    for shape in [(9, 17), (33, 70), (64, 128)]:
        x = rng.integers(0, 2, shape).astype(np.float32)  # tie-rich
        expected = dtw_np(x)
        _, trace = dtw_costs_jax(x)
        np.testing.assert_array_equal(backtrace_np(trace), expected)
        got_p = backtrace_np(dtw_trace_pallas(x, interpret=True))
        np.testing.assert_array_equal(got_p, expected)
