"""Int8 decode serving mode (DecodingOptions(quantize="int8")).

The reference has no quantized inference path; this pins the TPU-native
serving optimization: symmetric per-channel int8 for every operand the
incremental decode loop re-reads per token (ops/quant.py,
models.whisper.quantize_decode_params / init_cache(quantize=True)).
Exactness is asserted where the math is exact (grid-aligned weights,
zero channels); the full decode loop is pinned to a bounded error vs the
unquantized program and to structural invariants (int8 storage, both
greedy and beam/grouped paths compile and run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.decoding import DecodingOptions, decode
from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.whisper import (
    ModelExtras,
    Whisper,
    decoder_apply,
    fuse_decode_qkv,
    init_cache,
    init_params,
    quantize_decode_params,
)
from whisper_flamingo_tpu.ops.quant import (
    quantize_int8,
    quantize_linear_params,
    quantized_matmul,
)

DIMS = MODEL_DIMS["debug"]


def test_quantize_int8_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)
    q, s = quantize_int8(x, axis=-2)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # symmetric round-to-nearest: error within half a quantization step
    assert np.all(err <= np.asarray(s) / 2 + 1e-7)


def test_zero_channel_exact():
    # e.g. the fused QKV's zero K-bias block or a zero-init gate stream
    x = jnp.zeros((8, 4))
    q, s = quantize_int8(x, axis=0)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) == 0)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    assert np.all(deq == 0) and not np.any(np.isnan(deq))


def test_quantized_matmul_exact_on_grid():
    # weights already on the int8 grid (each column spans +/-127) survive
    # quantize -> matmul bit-exactly up to float rounding
    rng = np.random.default_rng(1)
    qw = rng.integers(-126, 127, (16, 24)).astype(np.float32)
    qw[0, :] = 127.0  # pin every column's amax to the grid edge
    scale = 0.013
    w = jnp.asarray(qw * scale, jnp.float32)
    p = quantize_linear_params({"w": w, "b": jnp.zeros((24,))})
    assert set(p) == {"w_q", "w_s", "b"}
    np.testing.assert_array_equal(np.asarray(p["w_q"], np.float32), qw)
    x = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
    got = quantized_matmul(x, p["w_q"], p["w_s"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x @ w), rtol=1e-5, atol=1e-5
    )


@pytest.fixture(scope="module")
def gated_params():
    extras = ModelExtras(add_gated_x_attn=1, num_langs=2)
    params = init_params(jax.random.PRNGKey(0), DIMS, extras)
    # open the (zero-init) gates so the quantized conditioning slabs
    # actually contribute to the output
    g = params["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.full_like(g["langs"]["attn_gate"], 0.5)
    g["ff_gate"] = jnp.full_like(g["ff_gate"], 0.5)
    return params


def test_quantized_decode_loop_error_bounded(gated_params):
    """Prefill + one incremental step: int8 logits track fp32 logits."""
    rng = np.random.default_rng(2)
    B, D = 2, DIMS.n_text_state
    xa = jnp.asarray(
        rng.standard_normal((B, DIMS.n_audio_ctx, D)), jnp.float32
    )
    xt = jnp.asarray(rng.standard_normal((2, B, 6, D)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 4)), jnp.int32)
    nxt = jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 1)), jnp.int32)

    fused = fuse_decode_qkv(gated_params)
    cache = init_cache(fused, DIMS, xa, xt=xt, max_len=16)
    ref, cache = decoder_apply(fused, DIMS, tokens, cache=cache, offset=0)
    ref2, _ = decoder_apply(fused, DIMS, nxt, cache=cache, offset=4)

    qp = quantize_decode_params(fused)
    qcache = init_cache(qp, DIMS, xa, xt=xt, max_len=16, quantize=True)
    assert qcache["xa_k"].dtype == jnp.int8
    assert qcache["xt_v"].dtype == jnp.int8
    assert qp["decoder"]["blocks"]["attn"]["qkv_w_q"].dtype == jnp.int8
    assert qp["decoder"]["lm_head_q"].dtype == jnp.int8
    got, qcache = decoder_apply(qp, DIMS, tokens, cache=qcache, offset=0)
    got2, _ = decoder_apply(qp, DIMS, nxt, cache=qcache, offset=4)

    for r, g in ((ref, got), (ref2, got2)):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.std(r)
        assert np.max(np.abs(g - r)) / denom < 0.25
        # the distributions over the vocab stay essentially identical
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.999


@pytest.mark.parametrize("beam_size", [None, 2])
def test_decode_int8_end_to_end(beam_size):
    params = init_params(jax.random.PRNGKey(1), DIMS)
    model = Whisper(dims=DIMS, params=params)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, DIMS.n_mels, 3000)).astype(np.float32) * 0.5
    kw = dict(
        language="en", sample_len=8, without_timestamps=True, fp16=False,
        beam_size=beam_size,
    )
    base = decode(model, mel, DecodingOptions(**kw))[0]
    q = decode(model, mel, DecodingOptions(quantize="int8", **kw))[0]
    assert isinstance(q.tokens, list) and len(q.tokens) > 0
    assert np.isfinite(q.avg_logprob)
    assert q.language == base.language


def test_transcribe_accepts_quantize():
    # quantize rides transcribe()'s **decode_options passthrough (and the
    # CLI's --quantize flag) into every windowed decode
    from whisper_flamingo_tpu.transcribe import transcribe

    params = init_params(jax.random.PRNGKey(1), DIMS)
    model = Whisper(dims=DIMS, params=params)
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    out = transcribe(
        model, audio, language="en", fp16=False, quantize="int8",
        temperature=0, sample_len=4, verbose=None,
        logprob_threshold=None, no_speech_threshold=None,
        compression_ratio_threshold=None,
    )
    assert "text" in out and "segments" in out


def test_int8_decode_under_dp_tp_mesh():
    """quantize="int8" composes with sharded decode: quantization runs
    inside the compiled program, so GSPMD must propagate the TP shardings
    through quantize_int8's amax reductions (row-parallel weights reduce
    over a sharded axis -> collective max) without changing results."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.parallel.mesh import make_mesh, shard_params

    params = init_params(jax.random.PRNGKey(0), DIMS)
    model = Whisper(dims=DIMS, params=params)
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((4, DIMS.n_mels, 3000)).astype(np.float32) * 0.3
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True,
        quantize="int8",
    )
    base = DecodingTask(model, opts).run(mel)

    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = Whisper(dims=DIMS, params=shard_params(params, mesh))
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
        got = DecodingTask(sharded, opts).run(mel_s)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens


def test_quantize_option_validated():
    params = init_params(jax.random.PRNGKey(1), DIMS)
    model = Whisper(dims=DIMS, params=params)
    mel = np.zeros((1, DIMS.n_mels, 3000), np.float32)
    with pytest.raises(ValueError, match="quantize"):
        decode(model, mel, DecodingOptions(language="en", quantize="int4"))


# -- "int8kv": the int8 *self* cache (beam serving mode) ---------------------


def test_quantize_tokenwise_kv_roundtrip_bound():
    from whisper_flamingo_tpu.ops.quant import quantize_tokenwise_kv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 10, 16)), jnp.float32)
    q, s = quantize_tokenwise_kv(x, n_head=2)
    assert q.dtype == jnp.int8 and q.shape == x.shape
    assert s.shape == (3, 10, 2)  # one scale per (row, token, head)
    deq = np.asarray(q, np.float32).reshape(3, 10, 2, 8) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x).reshape(3, 10, 2, 8))
    assert np.all(err <= np.asarray(s)[..., None] / 2 + 1e-7)


def test_int8kv_decode_loop_error_bounded(gated_params):
    """Prefill + one incremental step with the int8 SELF cache: logits
    track the fp32 chain (per-token scales keep the error bounded)."""
    rng = np.random.default_rng(6)
    B, D = 2, DIMS.n_text_state
    xa = jnp.asarray(rng.standard_normal((B, DIMS.n_audio_ctx, D)), jnp.float32)
    xt = jnp.asarray(rng.standard_normal((2, B, 6, D)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 4)), jnp.int32)
    nxt = jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 1)), jnp.int32)

    fused = fuse_decode_qkv(gated_params)
    cache = init_cache(fused, DIMS, xa, xt=xt, max_len=16)
    ref, cache = decoder_apply(fused, DIMS, tokens, cache=cache, offset=0)
    ref2, _ = decoder_apply(fused, DIMS, nxt, cache=cache, offset=4)

    qp = quantize_decode_params(fused)
    qcache = init_cache(
        qp, DIMS, xa, xt=xt, max_len=16, quantize=True, quantize_self=True
    )
    assert qcache["k"].dtype == jnp.int8 and qcache["v"].dtype == jnp.int8
    assert qcache["k_s"].shape == (
        DIMS.n_text_layer, B, 16, DIMS.n_text_head
    )
    got, qcache = decoder_apply(qp, DIMS, tokens, cache=qcache, offset=0)
    assert qcache["k"].dtype == jnp.int8  # stays int8 through the step
    got2, _ = decoder_apply(qp, DIMS, nxt, cache=qcache, offset=4)

    for r, g in ((ref, got), (ref2, got2)):
        r, g = np.asarray(r), np.asarray(g)
        assert np.max(np.abs(g - r)) / np.std(r) < 0.3
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.999


def test_int8kv_beam_reorder_matmul_exact():
    """The one-hot-matmul reorder on int8 slabs + f32 scale slabs is
    bit-identical to the row gather (int32 MXU accumulation)."""
    from whisper_flamingo_tpu import decoding as dec_mod

    rng = np.random.default_rng(8)
    L, R, T, D, H = 2, 6, 8, 16, 2
    cache = {
        "k": jnp.asarray(rng.integers(-127, 128, (L, R, T, D)), jnp.int8),
        "v": jnp.asarray(rng.integers(-127, 128, (L, R, T, D)), jnp.int8),
        "k_s": jnp.asarray(rng.random((L, R, T, H)), jnp.float32),
        "v_s": jnp.asarray(rng.random((L, R, T, H)), jnp.float32),
        "xa_k": jnp.zeros((L, R, H, D // H, 4)),  # beam-shared: untouched
    }
    src = jnp.asarray(rng.integers(0, R, (R,)), jnp.int32)
    out = dec_mod._reorder_beam_cache(cache, src)
    for key in ("k", "v", "k_s", "v_s"):
        assert out[key].dtype == cache[key].dtype
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(cache[key][:, src])
        )
    np.testing.assert_array_equal(np.asarray(out["xa_k"]), np.asarray(cache["xa_k"]))


@pytest.mark.parametrize("beam_size", [None, 2])
def test_decode_int8kv_end_to_end(beam_size):
    params = init_params(jax.random.PRNGKey(1), DIMS)
    model = Whisper(dims=DIMS, params=params)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, DIMS.n_mels, 3000)).astype(np.float32) * 0.5
    kw = dict(
        language="en", sample_len=8, without_timestamps=True, fp16=False,
        beam_size=beam_size,
    )
    base = decode(model, mel, DecodingOptions(**kw))[0]
    q = decode(model, mel, DecodingOptions(quantize="int8kv", **kw))[0]
    assert isinstance(q.tokens, list) and len(q.tokens) > 0
    assert np.isfinite(q.avg_logprob)
    assert q.language == base.language


def test_int8kv_greedy_warns():
    """int8kv without beam_size is a measured greedy regression
    (docs/performance.md) — DecodingTask warns so the CLI and every other
    entry point surface it (ADVICE r3)."""
    import warnings

    from whisper_flamingo_tpu.decoding import DecodingTask

    model = Whisper(dims=DIMS, params=init_params(jax.random.PRNGKey(1), DIMS))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DecodingTask(
            model,
            DecodingOptions(language="en", without_timestamps=True,
                            quantize="int8kv"),
        )
    assert any("int8kv" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DecodingTask(
            model,
            DecodingOptions(language="en", without_timestamps=True,
                            quantize="int8kv", beam_size=2),
        )
    assert not any("int8kv" in str(x.message) for x in w)


def test_decode_int8kv_with_conditioning_beam(gated_params):
    """int8kv composes with gated x-attn conditioning under beam search:
    int8 xt slabs + int8 self cache + the beam reorder in one program."""
    model = Whisper(
        dims=DIMS, params=gated_params,
        extras=ModelExtras(add_gated_x_attn=1, num_langs=2),
    )
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((1, DIMS.n_mels, 3000)).astype(np.float32) * 0.5
    xt = rng.standard_normal((2, 1, 6, DIMS.n_text_state)).astype(np.float32)
    kw = dict(
        language="en", sample_len=6, without_timestamps=True, fp16=False,
        beam_size=2,
    )
    base = decode(model, mel, DecodingOptions(**kw), xt=xt)[0]
    q = decode(model, mel, DecodingOptions(quantize="int8kv", **kw), xt=xt)[0]
    assert isinstance(q.tokens, list) and len(q.tokens) > 0
    assert np.isfinite(q.avg_logprob)
    assert q.language == base.language
