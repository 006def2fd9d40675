"""Multi-head attention primitives.

Numerics parity with reference `/root/reference/whisper/model.py:93-108`:
the per-head scale ``(n_state // n_head) ** -0.25`` is applied to *both*
q and k before the logits matmul, and softmax runs in float32 regardless
of the compute dtype.

Two execution paths behind one interface:

- ``backend="xla"``: einsum attention; XLA fuses scale/softmax/matmul and
  tiles the GEMMs onto the MXU. Default, used everywhere shapes are small
  (decoder ctx <= 448) or during incremental decode.
- ``backend="flash"``: Pallas splash/flash attention for the 1500-frame
  encoder self-attention, avoiding materializing the (T, T) score matrix
  in HBM. Falls back to XLA when Pallas is unavailable (e.g. CPU tests).

The reference's Python-dict KV cache (`model.py:394-425`) is replaced by
fixed-shape preallocated cache arrays updated with
``lax.dynamic_update_slice`` — see :func:`update_cache`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """(B, T, D) -> (B, H, T, D/H)."""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, D/H) -> (B, T, D)."""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def qkv_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    mask: Optional[jax.Array] = None,
    backend: str = "xla",
    return_qk: bool = False,
):
    """Scaled dot-product attention over projected q/k/v of shape (B, T, D).

    ``mask`` is an additive float mask broadcastable to (B, H, Tq, Tk)
    (or (Tq, Tk)). Returns (B, Tq, D); with ``return_qk`` also the fp32
    pre-softmax scaled scores (B, H, Tq, Tk) — the quantity the
    reference's forward hooks capture for DTW word alignment
    (reference model.py:102-108, timing.py:185-210).
    """
    d_head = q.shape[-1] // n_head
    scale = d_head**-0.25
    qh = split_heads(q, n_head) * scale
    kh = split_heads(k, n_head) * scale
    vh = split_heads(v, n_head)

    if backend == "flash" and mask is None and not return_qk and qh.shape[2] >= 1024:
        out = _flash_attention(qh, kh, vh)
        if out is not None:
            return merge_heads(out.astype(q.dtype))

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask
    logits = logits.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", weights, vh))
    if return_qk:
        return out, logits
    return out


def shard_map_attention(fn, qh, kh, vh):
    """Run an attention kernel per-shard under the ambient mesh.

    A Pallas custom call has no SPMD partitioning rule: with sharded
    operands XLA all-gathers them and runs the kernel REPLICATED on
    every device (measured: 12 all-gathers for one sharded call on an
    8-way mesh). When an explicit mesh is active (``jax.set_mesh``, the
    Trainer's mode) this wraps the kernel in ``jax.shard_map`` over the
    batch (data) and head (model — the Megatron head-parallel layout)
    axes so each device computes only its shard; no collectives are
    needed inside non-causal attention (T and Dh stay unsharded).
    Falls back to calling ``fn`` directly (old behavior) when no mesh is
    active or the axes don't divide.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        mesh = None
    if mesh is None or mesh.empty:
        return fn(qh, kh, vh)
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    shape = dict(mesh.shape)
    b, h = qh.shape[:2]
    data = (
        DATA_AXIS
        if shape.get(DATA_AXIS, 1) > 1 and b % shape[DATA_AXIS] == 0
        else None
    )
    model = (
        MODEL_AXIS
        if shape.get(MODEL_AXIS, 1) > 1 and h % shape[MODEL_AXIS] == 0
        else None
    )
    if data is None and model is None:
        return fn(qh, kh, vh)
    spec = P(data, model)
    wrapped = jax.shard_map(
        fn, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )
    return wrapped(qh, kh, vh)


def _flash_attention(qh, kh, vh):
    """Pallas TPU flash attention over (B, H, T, Dh); None if unavailable.

    At Whisper's d_head=64 this routes to the in-tree fused kernel
    (:mod:`ops.flash64`): its full-KV-in-VMEM forward with the softmax
    normalization folded into the narrow output is at forward parity with
    the tuned library kernel, and its custom-VJP backward (P recomputed
    from the saved row logsumexp, dK/dV accumulated across q-tiles in
    VMEM) measures ~19% faster fwd+bwd (2.93 vs 3.64 ms/op at
    B8/H12/T1500, v5e slope A/B — tools/flash64_bench.py).

    Other head sizes use the library kernel with tuned block sizes
    (the library defaults measured ~4x slower at the 1500-frame shape):
    block_q=512 / block_kv=full, padding to the block multiple with
    segment-id masking (pad tokens never attend or get attended).

    Under an active mesh, the kernel runs per-shard via
    :func:`shard_map_attention`.
    """
    if jax.devices()[0].platform != "tpu":
        return None
    import os

    if qh.shape[-1] == 64 and not os.environ.get("WF_DISABLE_FLASH64"):
        try:
            from .flash64 import flash64_attention

            return shard_map_attention(flash64_attention, qh, kh, vh)
        except Exception:
            pass  # import/trace-time failure: fall back to the library kernel
            # NOTE: a Mosaic failure surfaces later, at XLA compile time,
            # outside any try here — set WF_DISABLE_FLASH64=1 to force the
            # library kernel on a TPU generation where that happens.
    return _library_flash_attention(qh, kh, vh)


def _library_flash_attention(qh, kh, vh):
    """The tuned *library* flash path, callable directly so A/B tools
    (tools/flash64_bench.py) keep a real baseline now that
    :func:`_flash_attention` routes d_head=64 to the custom kernel."""
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )
    except Exception:
        return None
    def library_flash(qh, kh, vh):
        b, h, t, _ = qh.shape
        pad = (-t) % 512
        segment_ids = None
        if pad:
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            qh = jnp.pad(qh, widths)
            kh = jnp.pad(kh, widths)
            vh = jnp.pad(vh, widths)
            ids = (jax.lax.broadcasted_iota(jnp.int32, (b, t + pad), 1) >= t)
            ids = ids.astype(jnp.int32)
            segment_ids = SegmentIds(q=ids, kv=ids)
        tp = t + pad
        # v5e-measured at the 1500-frame encoder shape (d_head 64):
        # forward wants q-tiles of 512 against the full K/V (in-model
        # decode regressed ~10% with untiled q despite isolated
        # microbenches preferring it — tunnel microbenches mislead);
        # the dq/dkv backward passes prefer 512x512 tiles.
        bq, bkv = min(512, tp), min(1536, tp)
        bb = min(512, tp)
        bs = BlockSizes(
            block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
            block_q_major_dkv=bb, block_k_major_dkv=bb,
            block_q_dkv=bb, block_k_dkv=bb,
            block_q_dq=bb, block_k_dq=bb, block_k_major_dq=bb,
        )
        # q/k already carry the two half-scales; disable the kernel's own.
        out = flash_attention(
            qh, kh, vh, causal=False, sm_scale=1.0,
            segment_ids=segment_ids, block_sizes=bs,
        )
        return out[:, :, :t] if pad else out

    try:
        return shard_map_attention(library_flash, qh, kh, vh)
    except Exception:
        return None


def causal_mask(n_ctx: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask, parity with reference `model.py:281`."""
    return jnp.triu(jnp.full((n_ctx, n_ctx), -jnp.inf, dtype=dtype), k=1)


def cached_causal_mask(q_len: int, cache_len: int, offset) -> jax.Array:
    """Additive mask (q_len, cache_len) for attention over a preallocated
    KV cache where the current chunk is written at [offset, offset+q_len).

    Position ``i`` of the chunk may attend to cache slots ``j <= offset+i``.
    A per-row ``offset`` of shape (B,) (speculative decoding: rows advance
    at different rates) yields a (B, 1, q_len, cache_len) mask that
    broadcasts over heads.
    """
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, cache_len), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, cache_len), 1)
    if getattr(offset, "ndim", 0) == 1:
        q_pos = offset[:, None, None, None] + q_pos[None, None]
        k_pos = k_pos[None, None]
    else:
        q_pos = offset + q_pos
    return jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)


def update_cache(cache: jax.Array, new: jax.Array, offset) -> jax.Array:
    """Write ``new`` (..., T, d) into ``cache`` (..., T_max, d) at ``offset``
    along the second-to-last (time) axis. A (B,) ``offset`` writes each
    batch row (leading axis) at its own position."""
    if getattr(offset, "ndim", 0) == 1:
        return jax.vmap(
            lambda c, n, o: jax.lax.dynamic_update_slice(
                c, n.astype(c.dtype), (0,) * (c.ndim - 2) + (o, 0)
            )
        )(cache, new, offset)
    idx = (0,) * (cache.ndim - 2) + (offset, 0)
    return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), idx)


def cached_qkv_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    mask: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Self-attention against the decode self-KV cache.

    ``q`` (B, Tq, D); ``k``/``v`` are unsplit cache slabs (B, T_max, D),
    with K pre-scaled by ``(d/h)^-0.25`` at write time. The self cache
    stays unsplit/3-D: its time axis is short (<= n_text_ctx), so the
    per-step head split is cheap, while an unsplit minor dim of D=768
    tiles the TPU's (8, 128) layout with zero padding — a pre-split
    (B, H, T, 64) slab pads 64 -> 128 lanes and doubles both the cache
    bytes and the beam-reorder gather (measured: tools/xa_probe.py).
    Numerics parity: the reference applies the scale to both q and k
    (reference model.py:93-108); scaling k once at write time is the
    same multiplication, done earlier.

    With ``k_scale``/``v_scale`` (per-(token, head) (B, T_max, H) dequant
    scales, ``quantize="int8kv"``) the slabs may be int8: K's scale folds
    into the logits and V's into the attention weights. Scales apply
    BEFORE the additive mask — unwritten positions carry scale 0 and
    mask -inf, and ``0 * -inf`` would be NaN the other way around.
    """
    d_head = q.shape[-1] // n_head
    qh = split_heads(q, n_head) * (d_head**-0.25)
    kh = split_heads(k.astype(qh.dtype), n_head)  # pre-scaled at write
    vh = split_heads(v.astype(qh.dtype), n_head)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    )
    if k_scale is not None:  # (B, T, H) -> (B, H, 1, T)
        logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, :]
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    if v_scale is not None:
        weights = weights * v_scale.transpose(0, 2, 1)[:, :, None, :].astype(
            weights.dtype
        )
    return merge_heads(jnp.einsum("bhqk,bhkd->bhqd", weights, vh))


def cached_selector_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    mask: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Incremental (Tq == 1) self-attention over unsplit cache slabs with
    NO head-split transposes: per-head logits come from a (D, H)
    lane-group selector matrix S (S[d, h] = 1 iff lane d belongs to head
    h) — ``logits = (K (*) q) @ S`` — and the per-head weights expand
    back to lanes with ``@ S^T`` before one multiply-reduce over time.
    Same trick as the fused decode kernel (ops/decode_attn.py), at the
    XLA level: the profiler trace showed ``cached_qkv_attention``'s
    physical (B, T, D) -> (B, H, T, dh) transposes + layout copies cost
    more than the attention math at many-row (beam) shapes.

    Numerics: fp32 logits/softmax (exact f32 k*q products, single-term
    selector dots), weights cast to the compute dtype before the V
    reduce — same contract as cached_qkv_attention / the Pallas kernel.

    ``k_scale``/``v_scale`` ((B, T, H) per-token-per-head dequant scales,
    ``quantize="int8kv"``): int8 slabs dequant through the logits /
    weights, which in this form are ALREADY (B, T, H) — the scale folds
    are plain elementwise multiplies with no reshaping at all. Scales
    apply before the additive mask (0-scale unwritten rows vs -inf).
    """
    b, t_q, d = q.shape
    assert t_q == 1, "selector form is for incremental steps"
    d_head = d // n_head
    scale = d_head ** -0.25
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
    sel = (d_idx // d_head == h_idx).astype(jnp.float32)

    qs = (q[:, 0, :].astype(jnp.float32)) * scale  # (B, D); K pre-scaled
    prod = k.astype(jnp.float32) * qs[:, None, :]  # (B, T, D)
    logits = jnp.einsum(
        "btd,dh->bth", prod, sel, preferred_element_type=jnp.float32
    )  # (B, T, H) fp32
    if k_scale is not None:
        logits = logits * k_scale
    if mask is not None:
        # mask is (1|B, cache_len) additive over time after squeezing the
        # (q_len, head) axes; accept the cached_causal_mask shapes
        m = mask.reshape(mask.shape[0], -1, mask.shape[-1])[:, -1, :]
        logits = logits + m[:, :, None]
    w = jax.nn.softmax(logits, axis=1)  # over time
    if v_scale is not None:
        w = w * v_scale
    wl = jnp.einsum(
        "bth,dh->btd", w.astype(q.dtype).astype(jnp.float32),
        sel,
    )
    out = jnp.sum(wl * v.astype(jnp.float32), axis=1, keepdims=True)
    return out.astype(q.dtype)


def xa_qkv_attention(
    q: jax.Array, kT: jax.Array, vT: jax.Array, n_head: int,
    k_scale: Optional[jax.Array] = None, v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Cross-attention against a transposed, pre-scaled K/V slab.

    ``q`` (B, Tq, D); ``kT``/``vT`` are (B, H, Dh, Tk) with K pre-scaled
    at write time. This is the layout for the *large* static slabs the
    decode loop re-reads every token (audio cross-attention K/V: 1500
    frames; conditioning streams): with Dh=64 on the lane axis a
    (B, H, Tk, 64) slab pads 64 -> 128 and doubles its HBM bytes, while
    (B, H, 64, Tk) pads only Tk (1500 -> 1536, 2.4%) — and QK^T wants K
    in (d, k) orientation anyway. Measured on v5e at small/b8 per step
    (12 layers, K+V = 442 MB logical): unsplit-with-per-step-split
    2.74 ms, pre-split 3.50 ms, this layout 2.15 ms
    (tools/xa_probe.py). Cross-attention takes no mask.

    With ``k_scale``/``v_scale`` (per-head (B, H, 1, 1) dequant scales)
    the slabs may be int8: K's scale folds into q before QK^T and V's
    into the attention-weights matrix, so the slab itself feeds each dot
    as a bare int8->dtype convert, which XLA fuses into the operand read
    (measured 1.8x faster than the bf16 slab — tools/int8_probe.py).
    """
    d_head = q.shape[-1] // n_head
    qh = split_heads(q, n_head) * (d_head**-0.25)
    if k_scale is not None:
        qh = qh * k_scale.astype(qh.dtype)
    logits = jnp.einsum(
        "bhqd,bhdk->bhqk", qh, kT.astype(qh.dtype),
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    if v_scale is not None:
        weights = weights * v_scale.astype(weights.dtype)
    return merge_heads(
        jnp.einsum("bhqk,bhdk->bhqd", weights, vT.astype(q.dtype))
    )


def transpose_kv(x: jax.Array, n_head: int) -> jax.Array:
    """(B, T, D) projected K or V -> the (B, H, Dh, T) slab layout that
    :func:`xa_qkv_attention` consumes. One-time cost at prefill."""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 3, 1)
