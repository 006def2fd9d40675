"""Symmetric int8 quantization for the bytes-bound decode loop.

The incremental decode step re-reads large static operands from HBM every
token: the audio cross-attention K/V slabs (442 MB at small/b8), the
decoder projection/MLP weights (~198 MB) and the lm-head embedding
(80 MB). The step streams them at ~680 GB/s (tools/int8_probe.py) — it is
bytes-bound, so storing them int8 with per-channel scales halves the
bytes and measured 1.5-1.8x faster per workload on the v5e; XLA fuses
the int8->bf16 convert into the consuming dot's operand read (same
probe: an int8 slab attends in 0.358 ms vs 0.650 ms bf16).

This is an OPT-IN serving optimization (``DecodingOptions(quantize=
"int8")``); the parity default keeps everything in the compute dtype.
The reference has no quantized path; this module cites no reference
behavior.

Scale conventions (symmetric, zero-point-free):

- weights ``(..., D_in, D_out)``: per-output-channel, amax over the
  contraction axis -> scale ``(..., 1, D_out)``; folded into the matmul
  *output* (one cheap row-broadcast multiply).
- K/V slabs ``(..., H, Dh, T)``: per-head, amax over ``(Dh, T)`` ->
  scale ``(..., H, 1, 1)``; K's scale folds into q before QK^T, V's
  scale folds into the (tiny) attention-weights matrix before
  ``weights @ V``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_int8(x: jax.Array, axis) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization of ``x`` over ``axis``.

    Returns ``(q, scale)`` with ``q = round(x / scale)`` in [-127, 127]
    and ``scale`` keeping reduced dims (broadcastable for dequant:
    ``x ~= q * scale``). All-zero channels get scale 0 (q is then 0 and
    dequant reproduces exact zeros, e.g. the fused QKV's zero K-bias
    block or a zero-init gate's stream).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(xf * jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0))
    return q.astype(jnp.int8), scale


def quantize_tokenwise_kv(x: jax.Array, n_head: int) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8 for *incrementally written* K/V
    rows (the decode self cache, ``DecodingOptions(quantize="int8kv")``).

    ``x`` (..., T, D) -> ``(q, scale)`` with ``q`` int8 (..., T, D) and
    ``scale`` (..., T, H). Unlike the static slabs (per-head scales over
    the whole slab), each written token carries its own scale: the cache
    fills one token per step, so a slab-wide amax is unknowable at write
    time, and per-token scales keep the quantization error from growing
    with sequence length. K's scale folds into the attention logits and
    V's into the attention weights — both per-(position, head)
    elementwise multiplies on tiny matrices.
    """
    *lead, t, d = x.shape
    xh = x.astype(jnp.float32).reshape(*lead, t, n_head, d // n_head)
    amax = jnp.max(jnp.abs(xh), axis=-1)  # (..., T, H)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.round(xh * inv[..., None]).reshape(*lead, t, d)
    return q.astype(jnp.int8), scale


def quantize_linear_params(p: dict) -> dict:
    """Quantize one linear layer's params ``{"w": (..., D_in, D_out)
    [, "b"]}`` to ``{"w_q", "w_s" [, "b"]}`` (per-output-channel scales).

    Consumed by :func:`whisper_flamingo_tpu.models.whisper.linear`."""
    w_q, w_s = quantize_int8(p["w"], axis=-2)
    out = {"w_q": w_q, "w_s": w_s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantized_matmul(x: jax.Array, w_q: jax.Array, w_s: jax.Array) -> jax.Array:
    """``x @ dequant(w_q)`` with the per-output-channel scale applied to
    the matmul output; the int8->dtype convert feeds the dot directly
    (fused by XLA on TPU — tools/int8_probe.py section C)."""
    y = x @ w_q.astype(x.dtype)
    return y * jnp.squeeze(w_s, axis=-2).astype(x.dtype)
