"""Fused streaming-MLP decode kernel (ops/decode_mlp.py): parity with the
unfused ``mlp_block`` in plain and int8-quantized forms, and end-to-end
token parity when dispatched inside the decode loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.models.whisper import mlp_block
from whisper_flamingo_tpu.ops import decode_mlp
from whisper_flamingo_tpu.ops.quant import quantize_linear_params


def _mlp_params(rng, d, f, dtype):
    return {
        "fc1": {
            "w": jnp.asarray(rng.standard_normal((d, f)) * 0.05, dtype),
            "b": jnp.asarray(rng.standard_normal(f) * 0.05, dtype),
        },
        "fc2": {
            "w": jnp.asarray(rng.standard_normal((f, d)) * 0.05, dtype),
            "b": jnp.asarray(rng.standard_normal(d) * 0.05, dtype),
        },
    }


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 6e-2)])
def test_fused_mlp_parity(dtype, tol):
    rng = np.random.default_rng(0)
    d, f = 256, 1024  # 2 grid steps
    p = _mlp_params(rng, d, f, dtype)
    x = jnp.asarray(rng.standard_normal((3, 5, d)), dtype)
    ref = np.asarray(mlp_block(p, x), np.float32)
    got = np.asarray(decode_mlp.fused_mlp(p, x), np.float32)
    scale = np.std(ref) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < tol


def test_fused_mlp_int8_matches_unfused_int8():
    """The kernel's in-tile dequant must equal quantized_matmul's
    (linear() on w_q/w_s params) composition exactly up to f32 rounding."""
    rng = np.random.default_rng(1)
    d, f = 256, 1024
    p = _mlp_params(rng, d, f, jnp.float32)
    qp = {k: quantize_linear_params(v) for k, v in p.items()}
    x = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    ref = np.asarray(mlp_block(qp, x), np.float32)  # linear() int8 path
    got = np.asarray(decode_mlp.fused_mlp(qp, x[:, None, :]), np.float32)[:, 0]
    scale = np.std(ref) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 2e-4


def test_decode_loop_with_fused_mlp_token_parity(monkeypatch):
    """ENABLED=True routes the decode loop's MLP through the kernel; at
    f32 the produced tokens match the unfused program."""
    from whisper_flamingo_tpu.decoding import DecodingOptions, decode
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params

    dims = MODEL_DIMS["debug"]
    params = init_params(jax.random.PRNGKey(0), dims)
    model = Whisper(dims=dims, params=params)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32) * 0.3
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True
    )
    base = decode(model, mel, opts)

    monkeypatch.setattr(decode_mlp, "ENABLED", True)
    # the decode-program builder caches on statics only; clear so the
    # flag flip reaches a fresh trace
    from whisper_flamingo_tpu import decoding

    decoding._make_decode_program.cache_clear()
    got = decode(model, mel, opts)
    decoding._make_decode_program.cache_clear()
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
