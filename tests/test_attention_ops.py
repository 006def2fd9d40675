"""Unit tests for the cached-attention primitives in ops/attention.py.

The decode-path layouts (pre-scaled K, transposed (B, H, Dh, T) slabs,
fused QKV projections) must be exactly equivalent to plain scaled
dot-product attention (reference model.py:93-108 semantics) — the
decode parity suites cover this end-to-end; these tests pin each
primitive in isolation so a layout regression localizes immediately.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from whisper_flamingo_tpu.ops.attention import (  # noqa: E402
    cached_causal_mask,
    cached_qkv_attention,
    cached_selector_attention,
    qkv_attention,
    transpose_kv,
    update_cache,
    xa_qkv_attention,
)

B, TQ, TK, H, D = 2, 3, 7, 4, 32
SCALE = (D // H) ** -0.25


@pytest.fixture(scope="module")
def rng_arrays():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, TQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, TK, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, TK, D)), jnp.float32)
    return q, k, v


def test_cached_matches_plain(rng_arrays):
    """Self-cache path (unsplit slab, K pre-scaled at write)."""
    q, k, v = rng_arrays
    ref = qkv_attention(q, k, v, H)
    out = cached_qkv_attention(q, k * SCALE, v, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_cached_with_mask_matches_plain(rng_arrays):
    q, k, v = rng_arrays
    mask = cached_causal_mask(TQ, TK, 2)
    ref = qkv_attention(q, k, v, H, mask=mask)
    out = cached_qkv_attention(q, k * SCALE, v, H, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_selector_matches_chain(rng_arrays):
    """Selector-form incremental self-attention (no head-split
    transposes) == the split-head chain, with scalar and per-row masks."""
    rng = np.random.default_rng(1)
    q1 = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    _, k, v = rng_arrays
    for offset in (0, 3, TK - 1):
        mask = cached_causal_mask(1, TK, offset)
        ref = cached_qkv_attention(q1, k * SCALE, v, H, mask=mask)
        out = cached_selector_attention(q1, k * SCALE, v, H, mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    offsets = jnp.asarray([1, TK - 1], jnp.int32)
    mask = cached_causal_mask(1, TK, offsets)
    ref = cached_qkv_attention(q1, k * SCALE, v, H, mask=mask)
    out = cached_selector_attention(q1, k * SCALE, v, H, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_beam_reorder_matmul_matches_gather():
    """One-hot-matmul beam cache reorder is bit-exact vs the row gather."""
    from whisper_flamingo_tpu import decoding

    rng = np.random.default_rng(2)
    cache = {
        "k": jnp.asarray(
            rng.standard_normal((3, 6, 5, 16)), jnp.bfloat16
        ),
        "v": jnp.asarray(
            rng.standard_normal((3, 6, 5, 16)), jnp.bfloat16
        ),
        "other": jnp.zeros((2,)),
    }
    src = jnp.asarray([0, 0, 4, 2, 5, 1], jnp.int32)
    old = decoding.REORDER
    try:
        decoding.REORDER = "gather"
        ref = decoding._reorder_beam_cache(cache, src)
        decoding.REORDER = "matmul"
        out = decoding._reorder_beam_cache(cache, src)
    finally:
        decoding.REORDER = old
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(out[key], np.float32), np.asarray(ref[key], np.float32)
        )
    assert out["other"] is cache["other"]


def test_xa_transposed_matches_plain(rng_arrays):
    """Cross-attn path ((B, H, Dh, T) slabs, K pre-scaled at write)."""
    q, k, v = rng_arrays
    ref = qkv_attention(q, k, v, H)
    out = xa_qkv_attention(
        q, transpose_kv(k, H) * SCALE, transpose_kv(v, H), H
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_update_cache_writes_time_axis():
    """update_cache writes at the second-to-last axis for any rank."""
    cache3 = jnp.zeros((B, TK, D))
    new3 = jnp.ones((B, 2, D))
    out3 = update_cache(cache3, new3, 3)
    assert float(out3[:, 3:5].min()) == 1.0
    assert float(out3.sum()) == B * 2 * D

    cache4 = jnp.zeros((B, H, TK, D // H))
    new4 = jnp.ones((B, H, 1, D // H))
    out4 = update_cache(cache4, new4, 6)
    assert float(out4[:, :, 6].min()) == 1.0
    assert float(out4.sum()) == B * H * (D // H)


def test_fuse_decode_qkv_exact():
    """Fused (L, D, 3D) projection == separate q/k/v projections, and the
    training-path params tree is left untouched."""
    from whisper_flamingo_tpu.models.dims import ModelDimensions
    from whisper_flamingo_tpu.models.whisper import (
        fuse_decode_qkv,
        init_params,
        linear,
    )

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=32, n_audio_state=D, n_audio_head=H,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_head=H,
        n_text_state=D, n_text_layer=2,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    fused = fuse_decode_qkv(params)
    assert "qkv_w" not in params["decoder"]["blocks"]["attn"]

    attn = params["decoder"]["blocks"]["attn"]
    fattn = fused["decoder"]["blocks"]["attn"]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, 5, D)), jnp.float32)
    for layer in range(2):
        lp = jax.tree.map(lambda a: a[layer], attn)
        fw = fattn["qkv_w"][layer]
        fb = fattn["qkv_b"][layer]
        sep = jnp.concatenate(
            [linear(lp["q"], x), linear(lp["k"], x), linear(lp["v"], x)],
            axis=-1,
        )
        np.testing.assert_allclose(
            np.asarray(x @ fw + fb), np.asarray(sep), atol=1e-6
        )


import pytest


@pytest.mark.parametrize("fwd_sum", ["vpu", "mxu"])
def test_flash64_interpret_parity(fwd_sum, monkeypatch):
    """The in-tree fused d_head=64 attention kernel (ops/flash64) matches
    XLA attention exactly — forward and all three gradients — including
    ragged KV lengths that exercise the pad-column masking. Covers both
    softmax-denominator strategies (FWD_SUM: VPU row sum vs the
    ones-augmented-V MXU column)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_flamingo_tpu.ops import flash64
    from whisper_flamingo_tpu.ops.flash64 import flash64_attention

    monkeypatch.setattr(flash64, "FWD_SUM", fwd_sum)

    def ref_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    rng = np.random.default_rng(7)
    for t in (640, 300):
        q, k, v = (
            jnp.asarray(rng.standard_normal((1, 2, t, 64)).astype(np.float32) * 0.3)
            for _ in range(3)
        )
        out = flash64_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_attn(q, k, v)), atol=2e-6
        )

        def loss(f):
            return lambda *a: jnp.sum(jnp.sin(f(*a)))

        g_new = jax.grad(loss(lambda *a: flash64_attention(*a, interpret=True)),
                         argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(ref_attn), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_new, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
