"""Fused self-attention decode-step kernel (ops/decode_attn.py): parity
with the unfused cache-write + ``cached_qkv_attention`` chain, per-row
offsets, and end-to-end token parity when dispatched in the decode loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.ops import decode_attn
from whisper_flamingo_tpu.ops.attention import (
    cached_causal_mask,
    cached_qkv_attention,
    update_cache,
)


def _chain(q, k_raw, v_raw, k_cache, v_cache, offset, n_head):
    """The XLA chain the kernel replaces (models/whisper.decoder_apply)."""
    d = q.shape[-1]
    scale = (d // n_head) ** -0.25
    k_l = update_cache(k_cache, k_raw * scale, offset)
    v_l = update_cache(v_cache, v_raw, offset)
    mask = cached_causal_mask(1, k_cache.shape[-2], offset)
    return cached_qkv_attention(q, k_l, v_l, n_head, mask=mask), k_l, v_l


@pytest.mark.parametrize(
    "dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 4e-2)]
)
@pytest.mark.parametrize("n_head,d", [(4, 256), (2, 64)])
def test_fused_step_parity(dtype, tol, n_head, d):
    rng = np.random.default_rng(0)
    b, t_max = 3, 40
    q, k_raw, v_raw = (
        jnp.asarray(rng.standard_normal((b, 1, d)), dtype) for _ in range(3)
    )
    k_cache = jnp.asarray(rng.standard_normal((b, t_max, d)), dtype) * 0.5
    v_cache = jnp.asarray(rng.standard_normal((b, t_max, d)), dtype) * 0.5
    for offset in (0, 7, t_max - 1):
        ref, rk, rv = _chain(q, k_raw, v_raw, k_cache, v_cache, offset, n_head)
        got, gk, gv = decode_attn.fused_step(
            q, k_raw, v_raw, k_cache, v_cache, offset, n_head
        )
        np.testing.assert_allclose(
            np.asarray(gk, np.float32), np.asarray(rk, np.float32), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gv, np.float32), np.asarray(rv, np.float32), atol=1e-6
        )
        scale = np.std(np.asarray(ref, np.float32)) + 1e-9
        err = np.max(
            np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
        )
        assert err / scale < tol, (offset, err)


def test_fused_step_per_row_offsets():
    """(B,) offsets (continuous batching slots) match the vmapped chain."""
    rng = np.random.default_rng(1)
    b, t_max, d, n_head = 4, 24, 128, 2
    q, k_raw, v_raw = (
        jnp.asarray(rng.standard_normal((b, 1, d)), jnp.float32)
        for _ in range(3)
    )
    k_cache = jnp.asarray(rng.standard_normal((b, t_max, d)), jnp.float32)
    v_cache = jnp.asarray(rng.standard_normal((b, t_max, d)), jnp.float32)
    offsets = jnp.asarray([0, 5, 23, 11], jnp.int32)
    ref, rk, rv = _chain(q, k_raw, v_raw, k_cache, v_cache, offsets, n_head)
    got, gk, gv = decode_attn.fused_step(
        q, k_raw, v_raw, k_cache, v_cache, offsets, n_head
    )
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_step_multi_row_lockstep(monkeypatch):
    """rows > MAX_ROWS with a scalar offset route through the m-rows-per-
    grid-step lockstep kernel and match the XLA chain bit-for-bit.
    (The lockstep path is default-off — measured slower than the XLA
    chain at beam-15 x b8; this pins the kernel's correctness.)"""
    monkeypatch.setattr(decode_attn, "MULTI_ENABLED", True)
    rng = np.random.default_rng(3)
    for b in (8, 40):  # single grid step / b > MAX_ROWS
        _check_lockstep(rng, b)


def _check_lockstep(rng, b):
    t_max, d, n_head = 24, 128, 2
    assert decode_attn._pick_multi(b, t_max, d, 4) == 8
    q, k_raw, v_raw = (
        jnp.asarray(rng.standard_normal((b, 1, d)), jnp.float32)
        for _ in range(3)
    )
    k_cache = jnp.asarray(rng.standard_normal((b, t_max, d)), jnp.float32)
    v_cache = jnp.asarray(rng.standard_normal((b, t_max, d)), jnp.float32)
    for offset in (0, 7, t_max - 1):
        ref, rk, rv = _chain(q, k_raw, v_raw, k_cache, v_cache, offset, n_head)
        got, gk, gv = decode_attn.fused_step(
            q, k_raw, v_raw, k_cache, v_cache, jnp.int32(offset), n_head
        )
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
        # per-row kernel agreement (bit-identical math, different grid)
        per_row, _, _ = decode_attn._call(
            q, k_raw, v_raw, k_cache, v_cache,
            jnp.full((b,), offset, jnp.int32), n_head,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(per_row))


def test_multi_row_vmem_gate(monkeypatch):
    """_pick_multi degrades m (and eventually refuses) as the per-step
    block footprint grows; dispatch follows it."""
    monkeypatch.setattr(decode_attn, "MULTI_ENABLED", True)
    # small cache: full 16-row packing
    assert decode_attn._pick_multi(128, 48, 768, 2) == 16
    # small-model beam-15 x b8 at the bench cache length: 8-row packing
    assert decode_attn._pick_multi(120, 72, 768, 2) == 8
    # large-v2-shaped beam-15 x b8 (d=1280): blocks shrink to 4 rows
    assert decode_attn._pick_multi(120, 72, 1280, 2) == 4
    # very long cache at large d: no m fits
    assert decode_attn._pick_multi(120, 8192, 1280, 2) == 0
    assert not decode_attn.dispatch(
        1, 8192, 120, lockstep=True, d=1280, itemsize=2
    )
    # odd row counts cannot pack
    assert decode_attn._pick_multi(45, 72, 768, 2) == 0


def test_forced_m_override_respects_vmem_budget(monkeypatch):
    """Regression (ADVICE r3): a WF_DECODE_ATTN_M override that exceeds
    the per-grid-step VMEM budget must be refused host-side (with a
    warning), not surface as a Mosaic compile error on-chip."""
    import warnings

    monkeypatch.setenv("WF_DECODE_ATTN_M", "16")
    # fits: behaves like before
    assert decode_attn._pick_multi(128, 48, 768, 2) == 16
    # over budget at a long cache/large d: refused, with a warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert decode_attn._pick_multi(128, 8192, 1280, 2) == 0
    assert any("VMEM" in str(x.message) for x in w)
    # non-divisible row count still refuses quietly
    monkeypatch.setenv("WF_DECODE_ATTN_M", "7")
    assert decode_attn._pick_multi(120, 48, 768, 2) == 0


def test_decode_loop_with_fused_attn_token_parity(monkeypatch):
    """Flag on vs off: the decode loop produces identical tokens at f32."""
    from whisper_flamingo_tpu import decoding
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
    monkeypatch.setattr(decode_attn, "ENABLED", False)
    decoding._make_decode_program.cache_clear()
    base = decode(model, mel, opts)

    monkeypatch.setattr(decode_attn, "ENABLED", True)
    monkeypatch.setattr(decode_attn, "FORCE_CPU", True)
    decoding._make_decode_program.cache_clear()
    got = decode(model, mel, opts)
    decoding._make_decode_program.cache_clear()
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
