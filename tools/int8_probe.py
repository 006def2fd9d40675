"""Is the incremental decode step bytes-bound or latency-bound?

docs/performance.md (r2) measured the decode step's slab reads at
~205-254 GB/s effective (vs 819 peak) and attributed the gap to per-op
latency at 8-row matmuls, "not bytes". If that were literally true,
int8-quantizing the big resident operands (audio x-attn K/V 442 MB,
decoder weights ~198 MB, lm head 80 MB at small/b8) would buy nothing.
If the ~250 GB/s cap is a *rate* the pattern sustains regardless of
volume, halving the bytes halves the time — a ~1.5-1.7x greedy-decode
lever. This probe settles it on the chip.

Measurement discipline (every naive variant of this probe was wrong on
this image, see docs/performance.md):

- R reps of the workload run INSIDE one jitted program (an outer
  lax.scan) — per-call dispatch through the tunnel is ~2 ms, which
  swamped a first version of this probe that timed one 12-layer scan
  per call (it measured a flat ~2 ms for everything, "27 GB/s" matmuls);
- per-rep time is the SLOPE between R=8 and R=40, cancelling all
  per-call overhead;
- every rep depends on the carry (q / x derives from it; reductions go
  through jnp.maximum(k, c) with c carry-derived) so neither LICM nor
  algebraic simplification can hoist the HBM reads out of the loop;
- sync fetches one f32 scalar (the ~30 MB/s tunnel makes any larger
  fetch part of the measurement).

Workloads, all at the decode step's real shapes (small/b8, 12 layers):

A0. flat reduction over the whole (L,B,H,64,T) K/V slab, no layer scan:
    the raw streaming rate of the memory path, bf16 vs int8.
A.  the same bytes read through the decode loop's 12-layer scan.
B.  the real xa attention body: bf16 slabs vs int8 slabs with inline
    dequant (scales folded into q / the weights matrix, so the only
    added op is the int8->bf16 convert feeding each einsum). Also
    answers whether XLA fuses the convert into the dot's operand read
    or materializes a bf16 copy (which would make int8 *slower*).
C.  weight-matmul x(B,768) @ W(768,3072), bf16 vs int8 W with
    per-column scales — the MLP/projection/lm-head pattern.

Run on the real chip, CPU otherwise idle:  python tools/int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    L, T, H, Dh = 12, 1500, 12, 64
    D = H * Dh
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)
        return jnp.asarray(rng.standard_normal(shape), dtype)

    kT = mk((L, B, H, Dh, T), dt)
    vT = mk((L, B, H, Dh, T), dt)
    kT8 = mk((L, B, H, Dh, T), jnp.int8)
    vT8 = mk((L, B, H, Dh, T), jnp.int8)
    kTh = mk((L, B, H, Dh, T // 2), dt)
    vTh = mk((L, B, H, Dh, T // 2), dt)
    ks = jnp.full((L, B, H), 0.01, jnp.float32)
    vs = jnp.full((L, B, H), 0.01, jnp.float32)
    q0 = mk((B, Q, D), dt)
    scale = Dh**-0.25

    def split(x):
        b, t, d = x.shape
        return x.reshape(b, t, H, Dh).transpose(0, 2, 1, 3)

    def soft(logits):
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)

    # --- inner bodies: one rep == one pass over the slab -------------------
    # every body maps (carry x, operands) -> new x of the same shape, with
    # the operand reads data-dependent on x.

    def rep_flat(x, kv):
        k, v = kv
        c = jnp.mean(x).astype(k.dtype)  # carry-derived; defeats hoisting
        s = jnp.sum(jnp.maximum(k, c), dtype=jnp.float32) + jnp.sum(
            jnp.maximum(v, c), dtype=jnp.float32
        )
        return x + (s * 1e-20).astype(x.dtype)

    def rep_scan_sum(x, kv):
        def body(c, kv_l):
            k, v = kv_l
            cc = jnp.mean(c).astype(k.dtype)
            s = jnp.sum(jnp.maximum(k, cc), dtype=jnp.float32) + jnp.sum(
                jnp.maximum(v, cc), dtype=jnp.float32
            )
            return c + (s * 1e-20).astype(c.dtype), None

        return jax.lax.scan(body, x, kv)[0]

    def rep_xa(x, kv):
        def body(c, kv_l):
            k, v = kv_l  # (B,H,Dh,T) bf16, K pre-scaled at write
            qh = split(c) * scale
            w = soft(jnp.einsum("bhqd,bhdk->bhqk", qh, k,
                                preferred_element_type=jnp.float32))
            o = jnp.einsum("bhqk,bhdk->bhqd", w, v)
            return c + o.transpose(0, 2, 1, 3).reshape(c.shape), None

        return jax.lax.scan(body, x, kv)[0]

    def rep_xa_int8(x, kv):
        def body(c, kv_l):
            k8, v8, s_k, s_v = kv_l  # int8 slabs + per-(B,H) fp32 scales
            qh = split(c) * scale
            # K's dequant scale folds into q (per-head broadcast, tiny);
            # the slab feeds the dot as a bare int8->bf16 convert
            qh = qh * s_k[:, :, None, None].astype(dt)
            w = soft(jnp.einsum("bhqd,bhdk->bhqk", qh, k8.astype(dt),
                                preferred_element_type=jnp.float32))
            # V's scale folds into the (tiny) weights matrix
            w = w * s_v[:, :, None, None].astype(dt)
            o = jnp.einsum("bhqk,bhdk->bhqd", w, v8.astype(dt))
            return c + o.transpose(0, 2, 1, 3).reshape(c.shape), None

        return jax.lax.scan(body, x, kv)[0]

    F = 4 * D
    W = mk((L, D, F), dt)
    W8 = mk((L, D, F), jnp.int8)
    Ws = jnp.full((L, F), 0.01, jnp.float32)
    x0 = mk((B, Q, D), dt)

    def rep_w(x, w):
        def body(c, w_l):
            y = c[:, 0, :] @ w_l  # (B, F)
            r = jnp.sum(y, axis=1, dtype=jnp.float32)  # full-width reduce:
            return c + (r[:, None, None] * 1e-20).astype(c.dtype), None
            # ^ the dot can't be narrowed away

        return jax.lax.scan(body, x, w)[0]

    def rep_w8(x, wv):
        def body(c, wv_l):
            w8, s = wv_l
            y = (c[:, 0, :] @ w8.astype(dt)) * s[None, :].astype(dt)
            r = jnp.sum(y, axis=1, dtype=jnp.float32)
            return c + (r[:, None, None] * 1e-20).astype(c.dtype), None

        return jax.lax.scan(body, x, wv)[0]

    # --- slope timing -------------------------------------------------------
    def build(rep, R):
        def run(x, kv):
            def outer(c, _):
                return rep(c, kv), None

            out, _ = jax.lax.scan(outer, x, None, length=R)
            return jnp.sum(out.astype(jnp.float32))

        return jax.jit(run)

    R_LO, R_HI, ITERS = 8, 40, 8

    def slope_ms(rep, x, kv):
        ts = {}
        for R in (R_LO, R_HI):
            fn = build(rep, R)
            _ = np.asarray(fn(x, kv))  # compile + sync
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    r = fn(x, kv)
                np.asarray(r)  # one scalar through the tunnel
                best = min(best, (time.perf_counter() - t0) / ITERS)
            ts[R] = best
        return (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO) * 1000

    slab_gb = 2 * L * B * H * Dh * T / 1e9  # elements, GB at 1 byte/elem
    variants = [
        ("A0 flat sum bf16, no scan", rep_flat, q0, (kT, vT), slab_gb * 2),
        ("A0 flat sum int8, no scan", rep_flat, q0, (kT8, vT8), slab_gb),
        ("A scan sum bf16 (full bytes)", rep_scan_sum, q0, (kT, vT), slab_gb * 2),
        ("A scan sum int8 (half bytes)", rep_scan_sum, q0, (kT8, vT8), slab_gb),
        ("A scan sum bf16 T/2 (half bytes)", rep_scan_sum, q0, (kTh, vTh), slab_gb),
        ("B xa bf16 [shipped layout]", rep_xa, q0, (kT, vT), slab_gb * 2),
        ("B xa int8 inline dequant", rep_xa_int8, q0, (kT8, vT8, ks, vs), slab_gb),
        ("C matmul bf16 W", rep_w, x0, W, L * D * F * 2 / 1e9),
        ("C matmul int8 W", rep_w8, x0, (W8, Ws), L * D * F / 1e9),
    ]

    for name, rep, x, kv, gb in variants:
        ms = slope_ms(rep, x, kv)
        print(f"{name:34s} {ms:7.3f} ms/rep   eff-BW {gb / ms * 1000:6.0f} GB/s")


if __name__ == "__main__":
    main()
