"""Fused streaming MLP kernel for the incremental decode loop.

Why: the decode step is HBM-bytes-bound and the MLP owns 57% of the
per-step weight bytes (fc1+fc2 = 9.4 MB/layer bf16 at `small`). Measured
in-loop it runs ~4x above its streaming floor (`tools/decode_probe.py`:
0.58 ms vs 0.14 ms at small/b8) because XLA schedules fc1 -> gelu -> fc2
as three dependent ops — the fc2 weight stream cannot start until fc1's
output exists, so the HBM pipe drains twice per layer. This kernel
restores the overlap: a 1-D Pallas grid over column-tiles of fc1 (==
row-tiles of fc2) computes

    o += gelu(x @ fc1[:, tile] + b1[tile]) @ fc2[tile, :]

with the output block VMEM-resident across the whole sweep (its grid
index is constant, same accumulator pattern as ops/flash64's dK/dV) and
Pallas double-buffering the next tile's weight DMA against the current
tile's compute. Every weight byte is read exactly once per call, with no
inter-op drain.

The kernel is numerically equivalent to ``mlp_block`` up to a <=1.5e-7
erf approximation (Pallas TPU has no erf/erfc lowering — found on-chip,
the interpreter accepts them — so the exact GELU is computed with the
Abramowitz-Stegun 7.1.26 polynomial in f32: error two decades below the
f32 chain's own rounding, three below bf16); f32 accumulation
throughout, so if anything it rounds *less* than the unfused bf16
chain. An int8 variant takes the per-output-channel
quantized weights of the serving mode (`ops/quant.py`): fc1's scales are
applied before the GELU (the nonlinearity needs real values), fc2's fold
into the final output. No reference equivalent (the reference's decode
loop is Python-per-token); this is a TPU-native serving optimization.

Caveats: (a) Pallas custom calls carry no SPMD partitioning rule, so
under a TP mesh the weights would be all-gathered (correct but slow) —
the flag is a single-chip serving knob, like the rest of the decode
fast path; (b) long prefills fall back to XLA (see the rows bound in
``fused_mlp``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_F = 512  # ffn-axis tile: 6 grid steps at small (3072), 10 at large-v2

# Decode-loop dispatch switch (models/whisper.decoder_apply cache branch).
# Module-level like flash64.FWD_SUM so the on-chip A/B can flip it; the
# default is set by measurement (docs/performance.md).
ENABLED = False


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf, |abs err| <= 1.5e-7 (f32-exact for
    this kernel's purposes). Pallas TPU lowers exp but not erf/erfc."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exactish(h):
    return 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, *rest):
    *maybe_scale, o_ref = rest  # input refs precede the output ref
    i = pl.program_id(0)
    x = x_ref[...]
    h = jnp.dot(
        x, w1_ref[...].astype(x.dtype), preferred_element_type=jnp.float32
    )
    if maybe_scale:  # int8: dequant before the nonlinearity
        h = h * maybe_scale[0][...]
    h = h + b1_ref[...].astype(jnp.float32)
    a = _gelu_exactish(h).astype(x.dtype)
    part = jnp.dot(
        a, w2_ref[...].astype(x.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    o_ref[...] += part


def _call(x, w1, b1, w2, f, tile, *scales):
    rows, d = x.shape
    grid = (f // tile,)
    in_specs = [
        pl.BlockSpec((rows, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w1, b1.reshape(1, f), w2]
    if scales:
        in_specs.append(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(scales[0].reshape(1, f))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def fused_mlp(p, x: jax.Array) -> jax.Array:
    """Drop-in for ``mlp_block(p, x)`` on the decode path.

    ``p`` is the layer's mlp params ``{"fc1": {...}, "fc2": {...}}`` —
    plain (``w``) or int8-quantized (``w_q``/``w_s``, see
    ``quantize_decode_params``). ``x`` is (..., T, D); the leading axes
    fold into rows. Falls back to the unfused path when the ffn axis
    does not tile evenly (never the case for released Whisper sizes:
    4*D is a multiple of 512 for D in {384, 512, 768, 1024, 1280}).
    """
    fc1, fc2 = p["fc1"], p["fc2"]
    quantized = "w_q" in fc1
    w1 = fc1["w_q"] if quantized else fc1["w"]
    w2 = fc2["w_q"] if quantized else fc2["w"]
    d, f = w1.shape
    *lead, t, dx = x.shape
    # tile choice: a TILE_F-divisible ffn tiles normally; a small (test)
    # ffn runs as one step; a large non-divisible ffn would need the
    # whole weight pair VMEM-resident -> XLA fallback instead
    tile = TILE_F if f % TILE_F == 0 else (f if f <= TILE_F else None)
    rows = t
    for a in lead:
        rows *= a
    # the x and o blocks are whole-rows VMEM residents: the kernel is for
    # the incremental loop (rows = B*beams); a long prefill (B*T_prompt
    # rows) would blow the ~16 MB VMEM budget, so it keeps the XLA path
    # (it is a one-time batch GEMM that XLA already tiles well)
    if tile is None or d % 8 or rows > 1024:
        from .. import models

        return models.whisper.mlp_block(p, x)
    x2 = x.reshape(rows, dx)
    if quantized:
        out = _call(x2, w1, fc1["b"], w2, f, tile, fc1["w_s"].astype(jnp.float32))
        out = out * jnp.squeeze(fc2["w_s"], axis=-2).astype(jnp.float32)
    else:
        out = _call(x2, w1, fc1["b"], w2, f, tile)
    out = out.astype(x.dtype) + fc2["b"].astype(x.dtype)
    return out.reshape(*lead, t, dx)
