"""Whisper encoder/decoder with Flamingo-style gated cross-attention, in pure
functional JAX.

Rebuild of the reference's active model (`/root/reference/whisper/model.py`):

- ``AudioEncoder`` (`model.py:217-258`): conv(k3,s1) + conv(k3,s2) + GELU,
  sinusoidal positions cropped at 1500, pre-LN transformer, final LN.
- ``TextDecoder`` (`model.py:260-340`): learned positions, causal pre-LN
  transformer with audio cross-attention, tied-embedding logits in fp32.
- ``GatedXAttnSubBlock`` (`model.py:110-134`): LN -> cross-attn -> ``*
  tanh(gate)`` with the gate initialized to zero, one sub-block per
  conditioning language, plus a shared tanh-gated FFN
  (`model.py:158-199`), executed *before* self-attention
  (`model.py:209-215`).
- fp32 LayerNorm islands and fp32 softmax/logits match the fp16-safe
  wrappers at `model.py:30-50, 105, 336-338`.

TPU-first design (not a port):

- Parameters are a pytree of arrays with all transformer layers *stacked*
  along a leading axis; the layer loop is a single ``lax.scan``. One XLA
  while-op per stack compiles in seconds even for the 32-layer large-v2
  and gives the sharding layer one leaf per weight kind to annotate.
- The decoder runs in three modes from one code path: teacher-forced
  (no cache), prefill (writes a preallocated KV cache), and single-token
  incremental decode (``lax.dynamic_update_slice`` into the cache). This
  restores the incremental decoding the reference fork disabled
  (`decoding.py:155-164`).
- Multi-language conditioning streams (``xt_list``) are a stacked array
  ``(n_langs, B, S, D)`` so the per-language gated sub-blocks vectorize.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import decode_attn, decode_mlp
from ..ops.attention import (
    cached_causal_mask,
    cached_qkv_attention,
    cached_selector_attention,
    causal_mask,
    qkv_attention,
    transpose_kv,
    update_cache,
    xa_qkv_attention,
)
from .dims import ModelDimensions

Params = Dict[str, Any]

# Incremental self-attention form for many-row (beam x batch) decode
# steps: "selector" (cached_selector_attention, no head-split
# transposes) vs the split-head chain. Default set by on-chip A/B
# (tools/beam_reorder_ab.py, docs/performance.md).
SELECTOR_SELF = True

# Decode-loop layer-iteration harness: "fori" updates the carried
# self-cache stacks IN PLACE (dynamic_update_slice on a fori_loop
# carry), "scan" stacks fresh ys buffers. The r4 device trace showed
# lax.scan's ys stacking forces XLA to copy the ENTIRE (L, rows, T, D)
# k and v stacks back into the enclosing while-loop's carry buffers
# every decode step (two full-stack copies, 0.97 ms/step at small
# beam-15 x b8 — pure waste; the attention math itself traced at
# 0.05 ms/step). fori + in-place DUS keeps one buffer alive across the
# token loop. Default set by on-chip A/B (tools/beam_reorder_ab.py).
CACHE_LOOP = "fori"


# ---------------------------------------------------------------------------
# Primitive layers (pure functions over param sub-trees)
# ---------------------------------------------------------------------------

def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """fp32 LayerNorm island (parity: reference model.py:30-32)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def linear(p: Params, x: jax.Array) -> jax.Array:
    """Dense layer; weights stored (in, out), cast to the activation dtype
    (parity: reference model.py:35-41).

    A layer quantized by :func:`quantize_decode_params` carries
    ``w_q``/``w_s`` instead of ``w`` (int8 weights + per-output-channel
    scales, the bytes-bound decode loop's opt-in serving mode)."""
    if "w_q" in p:
        from ..ops.quant import quantized_matmul

        y = quantized_matmul(x, p["w_q"], p["w_s"])
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv1d(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """1-D conv over time, channels-last; weights stored (k, in, out)."""
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["b"].astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Sinusoidal position embeddings (parity: reference model.py:53-59)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


def attention_block(
    p: Params,
    x: jax.Array,
    n_head: int,
    kv_src: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    k_override: Optional[jax.Array] = None,
    v_override: Optional[jax.Array] = None,
    backend: str = "xla",
    return_qk: bool = False,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
):
    """Projected MHA. ``kv_src`` selects cross-attention; ``k/v_override``
    inject precomputed (cached) keys/values — 4-D (B, H, Dh, T)
    transposed slabs for cross/conditioning attention
    (:func:`~whisper_flamingo_tpu.ops.attention.xa_qkv_attention`), 3-D
    (B, T, D) for the self cache; K pre-scaled at write time either way.

    Beam grouping: when the override K/V batch is smaller than the query
    batch (beam search shares one audio stream across ``G`` beams), the
    beam axis folds into the query-length axis — cross-attention has no
    mask, so queries are independent and the shared K/V is read once per
    audio instead of once per beam.
    """
    q = linear(p["q"], x)
    if k_override is not None:
        if k_override.ndim == 4:  # transposed xa/xt slab
            if k_override.shape[0] != q.shape[0] and mask is None:
                bg, t, d = q.shape
                b = k_override.shape[0]
                g = bg // b
                out = xa_qkv_attention(
                    q.reshape(b, g * t, d), k_override, v_override, n_head,
                    k_scale=k_scale, v_scale=v_scale,
                ).reshape(bg, t, d)
            else:
                out = xa_qkv_attention(
                    q, k_override, v_override, n_head,
                    k_scale=k_scale, v_scale=v_scale,
                )
        else:
            out = cached_qkv_attention(
                q, k_override, v_override, n_head, mask=mask
            )
        return linear(p["out"], out)
    else:
        src = x if kv_src is None else kv_src
        k = linear(p["k"], src)
        v = linear(p["v"], src)
    if return_qk:
        out, qk = qkv_attention(
            q, k, v, n_head, mask=mask, backend=backend, return_qk=True
        )
        return linear(p["out"], out), qk
    out = qkv_attention(q, k, v, n_head, mask=mask, backend=backend)
    return linear(p["out"], out)


def mlp_block(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def gated_x_attn(
    p: Params, x: jax.Array, xt: jax.Array, n_head: int, sequential: bool = False
) -> jax.Array:
    """Flamingo-style gated conditioning, parity: reference model.py:121-134,
    171-199. ``xt`` is stacked (n_langs, B, S, D); returns the updated x.

    Parallel (default): each language sub-block attends from LN(x_origin)
    into its stream and contributes ``attn_out * tanh(gate_i)``; all deltas
    sum into x. Sequential (legacy ``sequential_gated_x_attn``, reference
    model_all.py:166-170): each stream's delta is applied before the next
    stream attends. Both end with the shared tanh-gated FFN.
    """
    n_langs = xt.shape[0]
    if sequential:
        for i in range(n_langs):
            sub = jax.tree.map(lambda a: a[i], p["langs"])
            x_ln = layer_norm(sub["attn_ln"], x)
            attn_out = attention_block(sub["attn"], x_ln, n_head, kv_src=xt[i])
            x = x + attn_out * jnp.tanh(sub["attn_gate"].astype(x.dtype))
    else:
        x_origin = x
        total_delta = jnp.zeros_like(x)
        for i in range(n_langs):
            sub = jax.tree.map(lambda a: a[i], p["langs"])
            x_ln = layer_norm(sub["attn_ln"], x_origin)
            attn_out = attention_block(sub["attn"], x_ln, n_head, kv_src=xt[i])
            total_delta = total_delta + attn_out * jnp.tanh(
                sub["attn_gate"].astype(x.dtype)
            )
        x = x_origin + total_delta
    x = x + mlp_block(p["ff"], layer_norm(p["ff_ln"], x)) * jnp.tanh(
        p["ff_gate"].astype(x.dtype)
    )
    return x


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _remat_wrap(fn, remat):
    """Apply the rematerialization spec to a scan block function.

    ``remat`` is False/"none" (save all activations), True/"full" (full
    per-block recompute), or the name of a ``jax.checkpoint_policies``
    entry ("dots" = dots_with_no_batch_dims_saveable: keep matmul outputs,
    recompute cheap elementwise ops — the measured sweet spot on v5e, see
    docs/performance.md)."""
    if not remat or remat == "none":
        return fn
    if remat is True or remat == "full":
        return jax.checkpoint(fn)
    name = {"dots": "dots_with_no_batch_dims_saveable"}.get(remat, remat)
    policy = getattr(jax.checkpoint_policies, str(name), None)
    if policy is None:
        # fail at config time with the accepted values, not with an
        # opaque AttributeError deep inside tracing (e.g. yaml
        # `remat=false` reaches here as the *string* "false")
        raise ValueError(
            f"unknown remat spec {remat!r}: expected False/'none', "
            "True/'full', 'dots', or a jax.checkpoint_policies name"
        )
    return jax.checkpoint(fn, policy=policy)


def encoder_apply(
    params: Params,
    dims: ModelDimensions,
    mel: jax.Array,
    *,
    dtype=jnp.float32,
    backend: str = "flash",  # Pallas flash attention over the 1500-frame
    remat=False,             # axis on TPU; transparent XLA fallback elsewhere
) -> jax.Array:
    """mel (B, n_mels, T) -> audio features (B, min(T//2, 1500), D).

    Parity: reference model.py:234-258 (conv stack, PE crop at 1500,
    post-LN).
    """
    enc = params["encoder"]
    x = mel.astype(dtype).transpose(0, 2, 1)  # (B, T, n_mels), channels-last
    x = gelu(conv1d(enc["conv1"], x, stride=1))
    x = gelu(conv1d(enc["conv2"], x, stride=2))

    if x.shape[1] > dims.n_audio_ctx:
        x = x[:, : dims.n_audio_ctx, :]
    pe = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    x = (x + pe[: x.shape[1]]).astype(dtype)

    n_head = dims.n_audio_head

    def block_fn(x, bp):
        x = x + attention_block(
            bp["attn"], layer_norm(bp["attn_ln"], x), n_head, backend=backend
        )
        x = x + mlp_block(bp["mlp"], layer_norm(bp["mlp_ln"], x))
        return x, None

    block_fn = _remat_wrap(block_fn, remat)
    x, _ = jax.lax.scan(block_fn, x, enc["blocks"])
    return layer_norm(enc["ln_post"], x)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _prepare_xt(params: Params, dims: ModelDimensions, xt: jax.Array, dtype) -> jax.Array:
    """Project conditioning streams into model dim and add positions.

    Parity: reference model.py:313-326 — per-stream optional projection
    (BERT dim != n_state) followed by the decoder's learned positional
    embedding over the stream length.
    """
    dec = params["decoder"]
    if xt.shape[2] > dims.n_text_ctx:
        raise ValueError(
            f"conditioning stream length {xt.shape[2]} exceeds n_text_ctx="
            f"{dims.n_text_ctx}: xt takes the decoder positional embedding "
            "(reference model.py:322), which caps the stream length. Trim "
            "or pool the stream (e.g. video to <= 448 frames = 17.9 s @ 25 fps)."
        )
    if xt.shape[-1] != dims.n_text_state:
        proj = dec["xt_projection"]
        xt = xt.astype(dtype) @ proj["w"].astype(dtype) + proj["b"].astype(dtype)
    pe = dec["pos_embedding"][: xt.shape[2]].astype(dtype)
    return xt.astype(dtype) + pe


def embed_tokens_as_xt(params: Params, dims: ModelDimensions, tokens: jax.Array,
                       dtype=jnp.float32) -> jax.Array:
    """Build a conditioning stream from the decoder's own token embedding.

    Covers the legacy decoder modes "keyword"/"mix" (reference
    model_all.py:435-548), which condition gated x-attn on embedded
    keyword tokens instead of BERT hidden states: embed (B, S) ids ->
    (1, B, S, n_state), ready to pass as ``xt`` (positional embedding is
    added by the xt preparation, matching the reference's PE-on-xt).
    """
    emb = params["decoder"]["token_embedding"][tokens].astype(dtype)
    return emb[None]


def fuse_decode_qkv(params: Params) -> Params:
    """Concatenate each decoder layer's self-attention q/k/v projection
    weights into one (L, D, 3D) GEMM operand for the incremental decode
    loop (3 row-thin matmuls per layer -> 1).

    Numerically identical to the separate projections: concatenating
    output columns leaves each column's contraction untouched, and the
    bias-free K projection (reference model.py:67, Linear(bias=False))
    gets an exact-zero bias block. The decode step at small batch is
    per-op-overhead-bound, not FLOPs-bound (tools/decode_probe.py), so
    fewer, fatter GEMMs win. Returns a new params tree; the original is
    untouched (training/teacher-forced paths never see the fused entry).
    """
    dec = params["decoder"]
    attn = dec["blocks"]["attn"]
    qkv_w = jnp.concatenate(
        [attn["q"]["w"], attn["k"]["w"], attn["v"]["w"]], axis=-1
    )
    qkv_b = jnp.concatenate(
        [attn["q"]["b"], jnp.zeros_like(attn["q"]["b"]), attn["v"]["b"]],
        axis=-1,
    )
    blocks = dict(dec["blocks"], attn=dict(attn, qkv_w=qkv_w, qkv_b=qkv_b))
    return dict(params, decoder=dict(dec, blocks=blocks))


def quantize_decode_params(params: Params) -> Params:
    """Quantize to int8 every decoder weight the incremental decode loop
    re-reads per token (opt-in: ``DecodingOptions(quantize="int8")``).

    The loop is HBM-bytes-bound (tools/int8_probe.py): per-output-channel
    int8 weights halve the ~198 MB (small) / ~1.2 GB (large-v2) of
    projection+MLP reads per step and the 80 MB lm-head read, with the
    int8->bf16 convert fused into each dot. Quantized here:

    - the fused self-attn QKV projection (run after
      :func:`fuse_decode_qkv`), self out, cross-attn q/out, MLP fc1/fc2;
    - gated-x-attn per-language q/out and the shared gated FFN;
    - the lm head: an int8 copy of ``token_embedding`` with per-vocab-row
      scales (``lm_head_q``/``lm_head_s``), used ONLY for the logits
      einsum — the embedding *gather* (a few rows per step) keeps the
      original array.

    Kept unquantized: everything read once at prefill (cross-attn k/v,
    gated k/v, xt_projection, positional embeddings) and all LayerNorms.
    """
    from ..ops.quant import quantize_int8, quantize_linear_params

    dec = params["decoder"]
    blocks = dec["blocks"]
    attn = dict(blocks["attn"])
    if "qkv_w" in attn:
        qkv_q, qkv_s = quantize_int8(attn.pop("qkv_w"), axis=-2)
        attn["qkv_w_q"], attn["qkv_w_s"] = qkv_q, qkv_s
    else:
        attn["q"] = quantize_linear_params(attn["q"])
        attn["k"] = quantize_linear_params(attn["k"])
        attn["v"] = quantize_linear_params(attn["v"])
    attn["out"] = quantize_linear_params(attn["out"])
    cross = dict(
        blocks["cross_attn"],
        q=quantize_linear_params(blocks["cross_attn"]["q"]),
        out=quantize_linear_params(blocks["cross_attn"]["out"]),
    )
    mlp = {k: quantize_linear_params(v) for k, v in blocks["mlp"].items()}
    new_blocks = dict(blocks, attn=attn, cross_attn=cross, mlp=mlp)
    if "gated" in blocks:
        g = blocks["gated"]
        langs = dict(
            g["langs"],
            attn=dict(
                g["langs"]["attn"],
                q=quantize_linear_params(g["langs"]["attn"]["q"]),
                out=quantize_linear_params(g["langs"]["attn"]["out"]),
            ),
        )
        ff = {k: quantize_linear_params(v) for k, v in g["ff"].items()}
        new_blocks["gated"] = dict(g, langs=langs, ff=ff)
    lm_q, lm_s = quantize_int8(dec["token_embedding"], axis=-1)
    new_dec = dict(
        dec, blocks=new_blocks, lm_head_q=lm_q,
        lm_head_s=jnp.squeeze(lm_s, axis=-1),
    )
    return dict(params, decoder=new_dec)


def prepare_decode_params(params: Params, dtype, quantize: bool) -> Params:
    """The decode loop's one-time parameter transform, shared by the plain
    and speculative program builders: cast fp32 masters to the compute
    dtype (outside the loop — the loop body's casts are not hoisted),
    fuse the self-attn q/k/v projections, and optionally quantize to int8
    (serving mode). Keeping this in ONE place is what keeps speculative
    decoding token-identical to plain greedy."""
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            params,
        )
    params = fuse_decode_qkv(params)
    if quantize:
        params = quantize_decode_params(params)
    return params


def init_cache(
    params: Params,
    dims: ModelDimensions,
    audio_features: jax.Array,
    *,
    xt: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
    dtype=jnp.float32,
    quantize: bool = False,
    quantize_self: bool = False,
) -> Dict[str, jax.Array]:
    """Preallocate the decode cache and precompute all static K/V.

    Audio cross-attention K/V (and, when conditioning streams are given,
    gated-x-attn K/V) depend only on the encoder output, so they are
    computed once here instead of at every decode step (the reference
    recomputed the full prefix every step after disabling its cache,
    `decoding.py:155-164`).

    Layouts are chosen per measured HBM behavior (tools/xa_probe.py):
    the large static slabs the loop re-reads every token (audio and
    conditioning K/V) are stored transposed, (L, B, H, Dh, T), so the
    d_head=64 axis stays off the 128-lane minor dimension (a pre-split
    (…, T, 64) slab pads to 128 lanes and doubles its bytes); the self
    cache stays unsplit (L, B, T, D) — short time axis, zero padding,
    cheap beam-reorder gathers. K is pre-scaled by ``(d/h)^-0.25`` at
    write time in both (same multiplication the reference applies at
    use, model.py:93-108).

    With ``quantize`` the static slabs (audio and conditioning K/V) are
    stored int8 with per-head scales (``xa_k_s``/... entries) — the
    decode loop re-reads them every token and is bytes-bound, so halving
    their bytes measured ~1.8x faster slab attention
    (tools/int8_probe.py). The self cache stays in ``dtype`` (written
    per step; short time axis) unless ``quantize_self`` is ALSO set
    (``DecodingOptions(quantize="int8kv")``): then the self K/V slabs
    are int8 with per-(token, head) scales (``k_s``/``v_s``,
    (L, B, T, H)) written alongside each token. This targets the
    many-row beam step, whose cost is dominated by the self-cache
    reads + the physical beam reorder — both bytes-bound, so int8
    halves them (the greedy path loses the fused decode_attn kernel
    under int8, so "int8" without the self cache stays the greedy
    serving mode).
    """
    dec = params["decoder"]
    L = dims.n_text_layer
    B = audio_features.shape[0]
    D = dims.n_text_state
    H = dims.n_text_head
    # pad the self-cache time axis to a sublane multiple: the fused
    # decode-attention kernel's 8-row write window needs it
    # (ops/decode_attn.dispatch); the extra rows sit beyond every
    # causal mask, so they are never attended
    T = -(-(max_len or dims.n_text_ctx) // 8) * 8
    scale = (D // H) ** -0.25
    xa = audio_features.astype(dtype)

    def xa_kv(_, bp):
        k = transpose_kv(linear(bp["cross_attn"]["k"], xa), H) * scale
        v = transpose_kv(linear(bp["cross_attn"]["v"], xa), H)
        return None, (k, v)

    _, (xa_k, xa_v) = jax.lax.scan(xa_kv, None, dec["blocks"])
    cache = {
        "k": jnp.zeros((L, B, T, D), jnp.int8 if quantize_self else dtype),
        "v": jnp.zeros((L, B, T, D), jnp.int8 if quantize_self else dtype),
        "xa_k": xa_k,  # (L, B, H, Dh, Ta), K pre-scaled
        "xa_v": xa_v,
    }
    if quantize_self:
        # per-(token, head) dequant scales; zero = unwritten (masked)
        cache["k_s"] = jnp.zeros((L, B, T, H), jnp.float32)
        cache["v_s"] = jnp.zeros((L, B, T, H), jnp.float32)
    if quantize:
        from ..ops.quant import quantize_int8

        cache["xa_k"], cache["xa_k_s"] = quantize_int8(xa_k, axis=(-2, -1))
        cache["xa_v"], cache["xa_v_s"] = quantize_int8(xa_v, axis=(-2, -1))
    if xt is not None and "gated" in dec["blocks"]:
        xt_p = _prepare_xt(params, dims, xt, dtype)  # (n_langs, B, S, D)

        def xt_kv(_, gp_langs):
            k = jnp.stack(
                [transpose_kv(
                    linear(jax.tree.map(lambda a: a[i], gp_langs)["attn"]["k"], xt_p[i]),
                    H,
                ) * scale
                 for i in range(xt_p.shape[0])]
            )
            v = jnp.stack(
                [transpose_kv(
                    linear(jax.tree.map(lambda a: a[i], gp_langs)["attn"]["v"], xt_p[i]),
                    H,
                )
                 for i in range(xt_p.shape[0])]
            )
            return None, (k, v)

        _, (xt_k, xt_v) = jax.lax.scan(xt_kv, None, dec["blocks"]["gated"]["langs"])
        cache["xt_k"] = xt_k  # (L, n_langs, B, H, Dh, S), K pre-scaled
        cache["xt_v"] = xt_v
        cache["xt"] = xt_p
        if quantize:
            cache["xt_k"], cache["xt_k_s"] = quantize_int8(xt_k, axis=(-2, -1))
            cache["xt_v"], cache["xt_v_s"] = quantize_int8(xt_v, axis=(-2, -1))
    return cache


def decoder_apply(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,
    audio_features: Optional[jax.Array] = None,
    *,
    xt: Optional[jax.Array] = None,
    cache: Optional[Dict[str, jax.Array]] = None,
    offset=0,
    dtype=jnp.float32,
    backend: str = "xla",
    remat=False,
    return_cross_qk: bool = False,
    sequential_xt: bool = False,
    row_perm: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """tokens (B, T) [+ audio features (B, Ta, D)] -> logits (B, T, V).

    Without ``cache``: teacher-forced training path (full causal mask,
    cross-attention projected from ``audio_features`` per layer).
    With ``cache``: decode path; the current chunk's self K/V are written
    at ``offset`` and attention runs over the preallocated cache, using
    the precomputed audio / conditioning K/V.

    With ``return_cross_qk`` (no-cache path only) the second element of
    the return tuple is the stacked fp32 audio cross-attention scores
    (L, B, H, T, Ta) instead of a cache — the TPU-native equivalent of
    the reference's forward hooks for DTW word timing
    (reference timing.py:185-210).

    ``row_perm`` (cache path): a (rows,) source-row index applied to the
    SELF cache slabs per layer inside the scan — the beam search's
    ``rearrange_kv_cache`` (reference decoding.py:173-180) fused into
    the layer loop. The scan already reads each layer slice and restacks
    the updated cache every step; permuting the slice in-scan (the same
    bit-exact one-hot contraction as ``decoding._reorder_beam_cache``)
    makes the restack write the *reordered* slab, deleting the separate
    full-cache read+write reorder pass (~0.97 ms/step at beam-15 x b8,
    docs/performance.md). The audio/conditioning K/V are beam-shared and
    never permuted.

    Parity: reference model.py:292-340.
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    T = tokens.shape[-1]

    tok_emb = dec["token_embedding"][tokens]
    if getattr(offset, "ndim", 0) == 1:
        # per-row offsets (speculative decoding): gather each row's
        # positional window, (B, T, D)
        idx = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
        pos = dec["pos_embedding"][idx]
    elif not isinstance(offset, int) or offset != 0:
        pos = jax.lax.dynamic_slice_in_dim(dec["pos_embedding"], offset, T, axis=0)
    else:
        pos = dec["pos_embedding"][:T]
    x = (tok_emb + pos).astype(dtype)

    # A gated model run without conditioning streams behaves like the
    # reference with xt_list=[] (model.py:171-199): zero attention delta,
    # but the shared tanh-gated FFN sub-layer still applies.
    use_gated = "gated" in dec["blocks"]
    if use_gated and cache is None:
        xt_p = _prepare_xt(params, dims, xt, dtype) if xt is not None else None
    elif use_gated and cache is not None:
        xt_p = cache.get("xt")

    if cache is None:
        mask = causal_mask(T)
        xa = audio_features.astype(dtype)

        def block_fn(x, bp):
            if use_gated and xt_p is not None:
                x = gated_x_attn(bp["gated"], x, xt_p, n_head, sequential=sequential_xt)
            elif use_gated:
                x = _gated_ff_only(bp["gated"], x)
            x = x + attention_block(
                bp["attn"], layer_norm(bp["attn_ln"], x), n_head, mask=mask,
                backend=backend,
            )
            cross = attention_block(
                bp["cross_attn"], layer_norm(bp["cross_attn_ln"], x), n_head,
                kv_src=xa, backend=backend, return_qk=return_cross_qk,
            )
            if return_cross_qk:
                cross_out, qk = cross
            else:
                cross_out, qk = cross, None
            x = x + cross_out
            x = x + mlp_block(bp["mlp"], layer_norm(bp["mlp_ln"], x))
            return x, qk

        block_fn = _remat_wrap(block_fn, remat)
        x, qks = jax.lax.scan(block_fn, x, dec["blocks"])
        new_cache = qks if return_cross_qk else None
    else:
        cache_len = cache["k"].shape[-2]
        mask = cached_causal_mask(T, cache_len, offset)
        scale = (dims.n_text_state // n_head) ** -0.25

        have_xt_kv = use_gated and "xt_k" in cache
        # int8 serving mode (see quantize_decode_params / init_cache):
        # slabs carry per-head dequant scales scanned alongside them
        quantized = "xa_k_s" in cache
        # "int8kv": the self cache is int8 too, with per-(token, head)
        # scales written each step (init_cache(quantize_self=True))
        quantized_self = "k_s" in cache

        if row_perm is not None:
            rows = cache["k"].shape[1]
            # one one-hot per slab dtype, built OUTSIDE the scan; the
            # per-layer contraction is bit-exact (each output row sums
            # one value plus zeros) — see decoding._reorder_beam_cache
            perm_dtypes = {cache["k"].dtype}
            if quantized_self:
                perm_dtypes.add(cache["k_s"].dtype)
            perm_onehots = {
                dt: jax.nn.one_hot(row_perm, rows, dtype=dt, axis=-1)
                for dt in perm_dtypes
            }

            def _permute_rows(slab):
                acc = jnp.int32 if slab.dtype == jnp.int8 else slab.dtype
                return jnp.einsum(
                    "gs,s...->g...", perm_onehots[slab.dtype], slab,
                    preferred_element_type=acc,
                ).astype(slab.dtype)

        def block_fn(x, layer_in):
            bp, self_kv_l, xa_kv_l, xt_kv_l = layer_in
            if quantized_self:
                k_l, v_l, k_s_l, v_s_l = self_kv_l
            else:
                (k_l, v_l), k_s_l, v_s_l = self_kv_l, None, None
            if row_perm is not None:
                k_l, v_l = _permute_rows(k_l), _permute_rows(v_l)
                if quantized_self:
                    k_s_l, v_s_l = _permute_rows(k_s_l), _permute_rows(v_s_l)
            if quantized:
                xa_k_l, xa_v_l, xa_ks_l, xa_vs_l = xa_kv_l
            else:
                (xa_k_l, xa_v_l), xa_ks_l, xa_vs_l = xa_kv_l, None, None
            if have_xt_kv:
                if quantized:
                    xt_k_l, xt_v_l, xt_ks_l, xt_vs_l = xt_kv_l
                else:
                    (xt_k_l, xt_v_l), xt_ks_l, xt_vs_l = xt_kv_l, None, None
                x = _gated_x_attn_cached(
                    bp["gated"], x, xt_k_l, xt_v_l, n_head,
                    sequential=sequential_xt, k_scale=xt_ks_l, v_scale=xt_vs_l,
                )
            elif use_gated:
                x = _gated_ff_only(bp["gated"], x)
            ap = bp["attn"]
            x_ln = layer_norm(bp["attn_ln"], x)
            if "qkv_w_q" in ap:  # fused + int8 (see quantize_decode_params)
                from ..ops.quant import quantized_matmul

                qkv = quantized_matmul(
                    x_ln, ap["qkv_w_q"], ap["qkv_w_s"]
                ) + ap["qkv_b"].astype(x_ln.dtype)
                q, k_raw, v_raw = jnp.split(qkv, 3, axis=-1)
            elif "qkv_w" in ap:  # fused projection (see fuse_decode_qkv)
                qkv = x_ln @ ap["qkv_w"].astype(x_ln.dtype) + ap[
                    "qkv_b"
                ].astype(x_ln.dtype)
                q, k_raw, v_raw = jnp.split(qkv, 3, axis=-1)
            else:
                q = linear(ap["q"], x_ln)
                k_raw = linear(ap["k"], x_ln)
                v_raw = linear(ap["v"], x_ln)
            if not quantized_self and decode_attn.dispatch(
                T, cache_len, tokens.shape[0],
                lockstep=getattr(offset, "ndim", 0) == 0,
                d=dims.n_text_state, itemsize=k_l.dtype.itemsize,
            ):
                # fused cache-write + attend Pallas kernel
                # (ops/decode_attn.py): one program replaces the ~8-op
                # per-layer chain whose cost is dispatch latency, not bytes
                attn, k_l, v_l = decode_attn.fused_step(
                    q, k_raw, v_raw, k_l, v_l, offset, n_head
                )
                x = x + linear(ap["out"], attn)
            else:
                # write the new token's K/V unsplit (B, T, D), K pre-scaled
                # — the slab layout cached_qkv_attention consumes
                if quantized_self:
                    from ..ops.quant import quantize_tokenwise_kv

                    k_q, k_s_new = quantize_tokenwise_kv(k_raw * scale, n_head)
                    v_q, v_s_new = quantize_tokenwise_kv(v_raw, n_head)
                    k_l = update_cache(k_l, k_q, offset)
                    v_l = update_cache(v_l, v_q, offset)
                    k_s_l = update_cache(k_s_l, k_s_new, offset)
                    v_s_l = update_cache(v_s_l, v_s_new, offset)
                else:
                    k_l = update_cache(k_l, k_raw * scale, offset)
                    v_l = update_cache(v_l, v_raw, offset)
                if SELECTOR_SELF and T == 1 and (
                    tokens.shape[0] > decode_attn.MAX_ROWS
                ):
                    # many-row incremental steps (beam x batch): the
                    # selector form avoids the per-step head-split
                    # transposes + layout copies the profiler traced to
                    # ~1 ms/step at beam-15 (ops/attention.py)
                    attn = cached_selector_attention(
                        q, k_l, v_l, n_head, mask=mask,
                        k_scale=k_s_l, v_scale=v_s_l,
                    )
                else:
                    attn = cached_qkv_attention(
                        q, k_l, v_l, n_head, mask=mask,
                        k_scale=k_s_l, v_scale=v_s_l,
                    )
                x = x + linear(ap["out"], attn)
            x = x + attention_block(
                bp["cross_attn"], layer_norm(bp["cross_attn_ln"], x), n_head,
                k_override=xa_k_l, v_override=xa_v_l,
                k_scale=xa_ks_l, v_scale=xa_vs_l,
            )
            if decode_mlp.ENABLED:
                # fused streaming-MLP Pallas kernel (ops/decode_mlp.py):
                # one weight-byte pass, tile DMA overlapped with compute
                x = x + decode_mlp.fused_mlp(
                    bp["mlp"], layer_norm(bp["mlp_ln"], x)
                )
            else:
                x = x + mlp_block(bp["mlp"], layer_norm(bp["mlp_ln"], x))
            if quantized_self:
                return x, (k_l, v_l, k_s_l, v_s_l)
            return x, (k_l, v_l)

        self_kv = (
            (cache["k"], cache["v"], cache["k_s"], cache["v_s"])
            if quantized_self else (cache["k"], cache["v"])
        )
        xa_kv = (
            (cache["xa_k"], cache["xa_v"], cache["xa_k_s"], cache["xa_v_s"])
            if quantized else (cache["xa_k"], cache["xa_v"])
        )
        if have_xt_kv:
            xt_kv = (
                (cache["xt_k"], cache["xt_v"], cache["xt_k_s"], cache["xt_v_s"])
                if quantized else (cache["xt_k"], cache["xt_v"])
            )
        else:
            xt_kv = (
                jnp.zeros((dims.n_text_layer,)), jnp.zeros((dims.n_text_layer,))
            )
        if CACHE_LOOP == "fori":
            # in-place layer loop: read layer l's slices, run the block,
            # write the updated self slabs back into the SAME carried
            # stacks via dynamic_update_slice — unlike lax.scan's ys
            # stacking this aliases in place across the enclosing decode
            # while_loop, deleting two full-stack copies per step (see
            # CACHE_LOOP above). Read-only operands (weights, xa/xt
            # slabs) are closure-captured and sliced per layer, exactly
            # the dynamic-slice reads scan's xs machinery would emit.
            n_layers = dims.n_text_layer

            def _idx(l):
                return lambda a: jax.lax.dynamic_index_in_dim(
                    a, l, 0, keepdims=False
                )

            def layer_body(l, carry):
                x_c, kv_c = carry
                layer_in = jax.tree.map(
                    _idx(l), (dec["blocks"], kv_c, xa_kv, xt_kv)
                )
                x_c, new_l = block_fn(x_c, layer_in)
                kv_c = tuple(
                    jax.lax.dynamic_update_index_in_dim(s, n, l, 0)
                    for s, n in zip(kv_c, new_l)
                )
                return x_c, kv_c

            x, new_self = jax.lax.fori_loop(
                0, n_layers, layer_body, (x, self_kv)
            )
        else:
            x, new_self = jax.lax.scan(
                block_fn,
                x,
                (dec["blocks"], self_kv, xa_kv, xt_kv),
            )
        if quantized_self:
            new_cache = dict(
                cache, k=new_self[0], v=new_self[1],
                k_s=new_self[2], v_s=new_self[3],
            )
        else:
            new_cache = dict(cache, k=new_self[0], v=new_self[1])

    x = layer_norm(dec["ln"], x)
    # tied-embedding logits: matmul in the compute dtype with an fp32 MXU
    # accumulator/output — reference semantics (`x @ E.to(x.dtype).T`
    # then .float(), model.py:336-338) and avoids materializing an fp32
    # copy of the vocab embedding inside the decode loop
    if "lm_head_q" in dec:  # int8 serving mode (quantize_decode_params):
        # per-vocab-row scales fold into the fp32 logits output
        logits = jnp.einsum(
            "btd,vd->btv", x, dec["lm_head_q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * dec["lm_head_s"].astype(jnp.float32)
    else:
        logits = jnp.einsum(
            "btd,vd->btv",
            x,
            dec["token_embedding"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    return logits.astype(jnp.float32), new_cache


def _gated_ff_only(p: Params, x: jax.Array) -> jax.Array:
    """Gated block with no conditioning streams: only the shared FFN."""
    return x + mlp_block(p["ff"], layer_norm(p["ff_ln"], x)) * jnp.tanh(
        p["ff_gate"].astype(x.dtype)
    )


def _gated_x_attn_cached(
    p: Params, x: jax.Array, xt_k: jax.Array, xt_v: jax.Array, n_head: int,
    sequential: bool = False,
    k_scale: Optional[jax.Array] = None, v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Gated x-attn using precomputed per-language K/V (decode path).
    ``k_scale``/``v_scale`` are per-language (n_langs, B, H, 1, 1) dequant
    scales when the conditioning slabs are int8 (serving mode)."""
    n_langs = xt_k.shape[0]

    def _sc(s, i):
        return None if s is None else s[i]

    if sequential:
        for i in range(n_langs):
            sub = jax.tree.map(lambda a: a[i], p["langs"])
            x_ln = layer_norm(sub["attn_ln"], x)
            attn_out = attention_block(
                sub["attn"], x_ln, n_head, k_override=xt_k[i], v_override=xt_v[i],
                k_scale=_sc(k_scale, i), v_scale=_sc(v_scale, i),
            )
            x = x + attn_out * jnp.tanh(sub["attn_gate"].astype(x.dtype))
        x = x + mlp_block(p["ff"], layer_norm(p["ff_ln"], x)) * jnp.tanh(
            p["ff_gate"].astype(x.dtype)
        )
        return x
    x_origin = x
    total_delta = jnp.zeros_like(x)
    for i in range(n_langs):
        sub = jax.tree.map(lambda a: a[i], p["langs"])
        x_ln = layer_norm(sub["attn_ln"], x_origin)
        attn_out = attention_block(
            sub["attn"], x_ln, n_head, k_override=xt_k[i], v_override=xt_v[i],
            k_scale=_sc(k_scale, i), v_scale=_sc(v_scale, i),
        )
        total_delta = total_delta + attn_out * jnp.tanh(
            sub["attn_gate"].astype(x.dtype)
        )
    x = x_origin + total_delta
    x = x + mlp_block(p["ff"], layer_norm(p["ff_ln"], x)) * jnp.tanh(
        p["ff_gate"].astype(x.dtype)
    )
    return x


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, bias=True, stack=()):
    kw, _ = jax.random.split(key)
    w = jax.random.normal(kw, (*stack, d_in, d_out), jnp.float32) / math.sqrt(d_in)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((*stack, d_out), jnp.float32)
    return p


def _init_ln(d, stack=()):
    return {"scale": jnp.ones((*stack, d), jnp.float32),
            "bias": jnp.zeros((*stack, d), jnp.float32)}


def _init_attn(key, d, stack=()):
    ks = jax.random.split(key, 4)
    return {
        "q": _init_linear(ks[0], d, d, stack=stack),
        "k": _init_linear(ks[1], d, d, bias=False, stack=stack),
        "v": _init_linear(ks[2], d, d, stack=stack),
        "out": _init_linear(ks[3], d, d, stack=stack),
    }


def _init_mlp(key, d, stack=()):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _init_linear(k1, d, 4 * d, stack=stack),
        "fc2": _init_linear(k2, 4 * d, d, stack=stack),
    }


@dataclass(frozen=True)
class ModelExtras:
    """Fork model-surgery flags (reference whisper/__init__.py:99-110)."""

    dropout_rate: float = 0.0
    add_adapter: bool = False  # accepted for config parity; inert in the
    adapter_dim: int = 256     # reference's active model as well
    add_gated_x_attn: int = 0
    bert_dim: int = 768
    num_langs: int = 0
    # legacy two-stream fusion order (reference model_all.py:166-191):
    # False = parallel deltas (the active model's design), True = sequential
    sequential_gated_x_attn: bool = False


def init_params(
    key: jax.Array, dims: ModelDimensions, extras: ModelExtras = ModelExtras()
) -> Params:
    """Random-initialize a full parameter pytree (float32 master weights).

    Gated-x-attn gates start at zero so a freshly added Flamingo layer is
    an identity function (parity: reference model.py:119,169).
    """
    keys = jax.random.split(key, 12)
    La, Lt, D = dims.n_audio_layer, dims.n_text_layer, dims.n_audio_state
    Dt = dims.n_text_state

    encoder = {
        "conv1": {
            "w": jax.random.normal(keys[0], (3, dims.n_mels, D), jnp.float32)
            / math.sqrt(3 * dims.n_mels),
            "b": jnp.zeros((D,), jnp.float32),
        },
        "conv2": {
            "w": jax.random.normal(keys[1], (3, D, D), jnp.float32) / math.sqrt(3 * D),
            "b": jnp.zeros((D,), jnp.float32),
        },
        "blocks": {
            "attn": _init_attn(keys[2], D, stack=(La,)),
            "attn_ln": _init_ln(D, stack=(La,)),
            "mlp": _init_mlp(keys[3], D, stack=(La,)),
            "mlp_ln": _init_ln(D, stack=(La,)),
        },
        "ln_post": _init_ln(D),
    }

    blocks = {
        "attn": _init_attn(keys[4], Dt, stack=(Lt,)),
        "attn_ln": _init_ln(Dt, stack=(Lt,)),
        "cross_attn": _init_attn(keys[5], Dt, stack=(Lt,)),
        "cross_attn_ln": _init_ln(Dt, stack=(Lt,)),
        "mlp": _init_mlp(keys[6], Dt, stack=(Lt,)),
        "mlp_ln": _init_ln(Dt, stack=(Lt,)),
    }
    if extras.add_gated_x_attn != 0:
        nl = max(extras.num_langs, 1)
        blocks["gated"] = {
            "langs": {
                "attn": _init_attn(keys[7], Dt, stack=(Lt, nl)),
                "attn_ln": _init_ln(Dt, stack=(Lt, nl)),
                "attn_gate": jnp.zeros((Lt, nl, 1), jnp.float32),
            },
            "ff_ln": _init_ln(Dt, stack=(Lt,)),
            "ff": _init_mlp(keys[8], Dt, stack=(Lt,)),
            "ff_gate": jnp.zeros((Lt, 1), jnp.float32),
        }

    decoder = {
        "token_embedding": jax.random.normal(
            keys[9], (dims.n_vocab, Dt), jnp.float32
        ) / math.sqrt(Dt),
        "pos_embedding": 0.01
        * jax.random.normal(keys[10], (dims.n_text_ctx, Dt), jnp.float32),
        "blocks": blocks,
        "ln": _init_ln(Dt),
    }
    if extras.add_gated_x_attn != 0 and extras.bert_dim != Dt:
        decoder["xt_projection"] = _init_linear(keys[11], extras.bert_dim, Dt)

    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------

@dataclass
class Whisper:
    """Container bundling dims, surgery flags, and the parameter pytree.

    The compute functions stay pure (params passed explicitly) so they can
    be jitted/pjitted; this class is the user-facing handle mirroring the
    reference ``Whisper`` module surface (model.py:342-429).
    """

    dims: ModelDimensions
    params: Params
    extras: ModelExtras = field(default_factory=ModelExtras)
    dtype: Any = jnp.float32
    # (n_text_layer, n_text_head) bool mask of cross-attn heads used for
    # DTW word alignment; default = all heads of the second half of the
    # decoder layers (upstream whisper default)
    alignment_heads: Optional[np.ndarray] = None

    def set_alignment_heads(self, dump: bytes) -> None:
        """Install a base85-gzip alignment-head bitmap (upstream format)."""
        from ..registry import decode_alignment_heads

        self.alignment_heads = decode_alignment_heads(
            dump, self.dims.n_text_layer, self.dims.n_text_head
        )

    def get_alignment_heads(self) -> np.ndarray:
        if self.alignment_heads is not None:
            return np.asarray(self.alignment_heads, dtype=bool)
        heads = np.zeros((self.dims.n_text_layer, self.dims.n_text_head), bool)
        heads[self.dims.n_text_layer // 2:] = True
        return heads

    @property
    def is_multilingual(self) -> bool:
        return self.dims.is_multilingual

    @property
    def num_languages(self) -> int:
        return self.dims.num_languages

    def embed_audio(self, mel: jax.Array) -> jax.Array:
        return encoder_apply(self.params, self.dims, mel, dtype=self.dtype)

    def logits(self, tokens: jax.Array, audio_features: jax.Array) -> jax.Array:
        out, _ = decoder_apply(
            self.params, self.dims, tokens, audio_features, dtype=self.dtype
        )
        return out

    def forward(self, mel: jax.Array, tokens: jax.Array, xt=None) -> jax.Array:
        feats = self.embed_audio(mel)
        out, _ = decoder_apply(
            self.params, self.dims, tokens, feats, xt=xt, dtype=self.dtype
        )
        return out

    __call__ = forward

    # bound in package __init__ to avoid circular imports:
    #   decode, detect_language, transcribe
