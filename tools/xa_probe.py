"""Cross-attention KV cache layout sweep for the incremental decode step.

The per-token decode step must read the full audio K/V
(L x B x 1500 x 768 at small) from HBM. How that tensor is *stored*
decides the real bytes moved:

- unsplit (B, T, D=768): minor dim 768 tiles perfectly, but attention
  must split heads per step — a materialized transpose whose output
  (B, H, T, 64) pads 64 -> 128 lanes (2x write + 2x read per step);
- pre-split (B, H, T, 64): no per-step transform, but the resident slab
  itself pads 64 -> 128 (2x bytes read every step);
- K transposed (B, H, 64, T): lane dim is T (1500 -> 1536, 2.4% pad),
  sublane is 64 — near-zero padding, and QK^T wants K in (d, k)
  orientation anyway ("NT" GEMM);
- V choices analogously.

This probe times one jitted program per variant: a lax.scan over L=12
"layers", each doing the q(1-token) cross-attention against its cache
slice, exactly like the decode loop body. Run on the real chip:

    python tools/xa_probe.py [batch] [beam_q]

beam_q simulates the beam-grouped query length (15 for beam-15).
"""

import os
import sys

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
    k3 = jnp.asarray(rng.standard_normal((L, B, T, D)), dt)   # unsplit
    v3 = jnp.asarray(rng.standard_normal((L, B, T, D)), dt)
    k4 = jnp.asarray(rng.standard_normal((L, B, H, T, Dh)), dt)  # pre-split
    v4 = jnp.asarray(rng.standard_normal((L, B, H, T, Dh)), dt)
    kT = jnp.asarray(rng.standard_normal((L, B, H, Dh, T)), dt)  # K^T
    vT = jnp.asarray(rng.standard_normal((L, B, H, Dh, T)), dt)
    q = jnp.asarray(rng.standard_normal((B, Q, D)), dt)
    scale = Dh**-0.25

    def split(x):
        b, t, d = x.shape
        return x.reshape(b, t, H, Dh).transpose(0, 2, 1, 3)

    def soft(logits):
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)

    def body_unsplit(x, kv):
        k, v = kv
        qh = split(x) * scale
        kh = split(k) * scale
        vh = split(v)
        w = soft(jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32))
        o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return x + o.transpose(0, 2, 1, 3).reshape(x.shape), None

    def body_presplit(x, kv):
        k, v = kv
        qh = split(x) * scale
        w = soft(jnp.einsum("bhqd,bhkd->bhqk", qh, k,
                            preferred_element_type=jnp.float32))
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return x + o.transpose(0, 2, 1, 3).reshape(x.shape), None

    def body_kt_v4(x, kv):
        k, v = kv  # k (B,H,Dh,T) pre-scaled at write; v (B,H,T,Dh)
        qh = split(x) * scale
        w = soft(jnp.einsum("bhqd,bhdk->bhqk", qh, k,
                            preferred_element_type=jnp.float32))
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return x + o.transpose(0, 2, 1, 3).reshape(x.shape), None

    def body_kt_vt(x, kv):
        k, v = kv  # both (B,H,Dh,T)
        qh = split(x) * scale
        w = soft(jnp.einsum("bhqd,bhdk->bhqk", qh, k,
                            preferred_element_type=jnp.float32))
        o = jnp.einsum("bhqk,bhdk->bhqd", w, v)
        return x + o.transpose(0, 2, 1, 3).reshape(x.shape), None

    def body_sum_only(x, kv):
        k, v = kv  # pure HBM read floor: no attention structure at all
        s = jnp.sum(k, axis=(1, 2, 3)) + jnp.sum(v, axis=(1, 2, 3))
        return x + s[:, None, None].astype(x.dtype) * 0, None

    variants = {
        "sum-only read floor (K^T,V^T slabs)": (body_sum_only, (kT, vT), 1),
        "unsplit (B,T,768), split/step [old]": (body_unsplit, (k3, v3), 1),
        "pre-split (B,H,T,64) [new]": (body_presplit, (k4, v4), 1),
        "K^T (B,H,64,T) + V (B,H,T,64)": (body_kt_v4, (kT, v4), 1),
        "K^T + V^T (B,H,64,T)": (body_kt_vt, (kT, vT), 1),
        "K^T + V^T, scan unroll=4": (body_kt_vt, (kT, vT), 4),
        "K^T + V^T, scan unroll=12": (body_kt_vt, (kT, vT), 12),
    }

    from whisper_flamingo_tpu.profiling import timeit_device

    for name, (body, kv, unroll) in variants.items():
        fn = jax.jit(lambda q, kv, body=body, u=unroll: jax.lax.scan(body, q, kv, unroll=u)[0])
        dt_ms = timeit_device(fn, q, kv, iters=30) * 1000
        gb = 2 * L * B * T * D * 2 / 1e9  # unpadded K+V bytes
        print(f"{name:38s} {dt_ms:7.2f} ms   eff-BW {gb / dt_ms * 1000:6.0f} GB/s")


if __name__ == "__main__":
    main()
