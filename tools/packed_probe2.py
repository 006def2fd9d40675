"""On-chip MXU-rate probe at flash-attention tile shapes, VMEM-resident.

tools/packed_probe.py's XLA-level sweep was swamped by tunnel round-trip
latency and HBM traffic for the (T,T) logits; this probe measures the
MXU itself: a Pallas kernel loops the exact attention matmul *pair* —
QK^T (contraction depth d) followed by scores*V (output width d) — with
everything resident in VMEM, tens of thousands of iterations per launch
so compute >> dispatch latency.

Variants:
  d=64      the Whisper head shape (the claimed half-rate case)
  d=128     full-lane reference rate
  packed    head-pair block-diagonal: (512,128)@(128,2*1536), computing
            two heads' exact logits in one full-depth matmul at 2x the
            MAC count — the round-2 verdict's proposed kernel move.

Decision rule:
  t(d=128 per FLOP) ~= t(d=64 per FLOP)  -> no depth deficit; the r2
      "half the MXU" claim is wrong and a fused kernel has ~2x headroom.
  t(d=64) ~= t(d=128) at HALF the FLOPs  -> deficit is real; then the
      packed variant's *useful* rate (= measured rate / 2) tells whether
      block-diagonal packing beats padding (it is cycle-equivalent in
      theory: full lanes x 2x MACs).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512  # flash q-tile
TK = 1536  # kv length (1500 padded)


def make_kernel(d: int, n: int, iters: int):
    """Loop: o = w @ v (TK->d wide), w' = o @ u (d deep -> n wide)."""

    def kernel(w_ref, v_ref, u_ref, out_ref):
        def body(i, w):
            o = jnp.dot(w, v_ref[:], preferred_element_type=jnp.float32)
            o = (o * 0.01).astype(jnp.bfloat16)  # (BQ, d)
            w2 = jnp.dot(o, u_ref[:], preferred_element_type=jnp.float32)
            return (w2 * 0.01).astype(jnp.bfloat16)  # (BQ, n)

        out_ref[:] = jax.lax.fori_loop(0, iters, body, w_ref[:])

    @jax.jit
    def run(w, v, u):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BQ, n), jnp.bfloat16),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, v, u)

    return run


def bench(name: str, d: int, n: int, iters: int, useful_frac: float = 1.0):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (BQ, n), jnp.bfloat16)
    v = jax.random.normal(key, (n, d), jnp.bfloat16) * 0.1
    u = jax.random.normal(key, (d, n), jnp.bfloat16) * 0.1
    f = make_kernel(d, n, iters)
    np.asarray(f(w, v, u))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(w, v, u))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    flops = 2 * 2 * BQ * n * d * iters  # two matmuls per iter
    print(
        f"{name:28s} d={d:4d} n={n:5d} iters={iters:7d}: {t*1e3:8.1f} ms"
        f"  {flops/t/1e12:6.1f} TF/s raw"
        f"  {useful_frac*flops/t/1e12:6.1f} TF/s useful"
    )
    return flops / t


if __name__ == "__main__":
    print("devices:", jax.devices())
    r64 = bench("pair d=64 (whisper head)", 64, TK, 200_000)
    r128 = bench("pair d=128 (full lane)", 128, TK, 100_000)
    r256 = bench("pair d=256", 256, TK, 50_000)
    # packed: both matmuls at full 128 depth/width but over 2*TK columns,
    # i.e. two heads' worth of logits per iteration at 2x MACs
    rp = bench("packed pair (2 heads blk)", 128, 2 * TK, 50_000, useful_frac=0.5)
    print()
    print(f"d=64 rate / d=128 rate: {r64/r128:.2f} "
          "(1.0 => no depth deficit; 0.5 => half-rate claim confirmed)")
    print(f"packed useful / d=64 raw: {0.5*rp/r64:.2f} "
          "(>1 => packing beats padding; ~0.5 => cycle-equivalent, refuted)")
