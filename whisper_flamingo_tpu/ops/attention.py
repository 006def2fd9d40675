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


def _flash_attention(qh, kh, vh):
    """Pallas TPU flash attention over (B, H, T, Dh); None if unavailable.

    The library's default block sizes measured ~4x slower than tuned ones
    at Whisper's 1500-frame encoder shape (v5e); we use block_q=512 /
    block_kv=1536-ish tiles and pad the sequence to the block multiple
    with segment-id masking (pad tokens never attend or get attended).
    """
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )
    except Exception:
        return None
    if jax.devices()[0].platform != "tpu":
        return None
    try:
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
    except Exception:
        return None


def causal_mask(n_ctx: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask, parity with reference `model.py:281`."""
    return jnp.triu(jnp.full((n_ctx, n_ctx), -jnp.inf, dtype=dtype), k=1)


def cached_causal_mask(q_len: int, cache_len: int, offset) -> jax.Array:
    """Additive mask (q_len, cache_len) for attention over a preallocated
    KV cache where the current chunk is written at [offset, offset+q_len).

    Position ``i`` of the chunk may attend to cache slots ``j <= offset+i``.
    """
    q_pos = offset + jax.lax.broadcasted_iota(jnp.int32, (q_len, cache_len), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, cache_len), 1)
    return jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)


def update_cache(cache: jax.Array, new: jax.Array, offset) -> jax.Array:
    """Write ``new`` (B, T, D) into ``cache`` (B, T_max, D) at ``offset``."""
    return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), (0, offset, 0))
