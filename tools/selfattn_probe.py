"""Isolated beam-self-attention probe: why is the cached self-attention
chain ~430 us/layer at beam-15 shapes (120 rows, T=72, D=768) when its
bytes floor is ~33 us?

The beam-mode decode decomposition (tools/decode_probe.py small 8 6 15)
measured the self-attention chain at 5.19 ms of the 8.19 ms beam step —
by far the largest share — and the fused decode_attn kernel ties it
(0.93x end-to-end), so BOTH forms are far off the slab-read floor. This
probe times candidate formulations in isolation, slope-based (R reps in
one jitted lax.scan with a carry-dependent input so nothing hoists, tiny
output fetched for sync — the int8_probe methodology):

  chain      update_cache + cached_qkv_attention (what the loop runs)
  selector   head logits via the (D, H) lane-group selector matrix:
             logits = (K (*) q) @ S, out = (softmax @ S^T) (*) V summed
             over T — no head-split transposes of the K/V slabs
  kernel     ops/decode_attn per-row grid (rows sequential)
  kernel_m8  ops/decode_attn lockstep multi-row grid (8 rows/step)
  read       pure slab reduction (the bandwidth floor)

Usage: python tools/selfattn_probe.py [rows] [t_max] [d] [n_head] [reps]
       defaults: 120 72 768 12 40
"""

import functools
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

    from whisper_flamingo_tpu.ops import decode_attn
    from whisper_flamingo_tpu.ops.attention import (
        cached_causal_mask,
        cached_qkv_attention,
        update_cache,
    )

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    t_max = int(sys.argv[2]) if len(sys.argv) > 2 else 72
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 768
    n_head = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 40
    dtype = jnp.bfloat16
    offset = t_max - 2  # worst-case valid prefix

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((rows, 1, d)), dtype)
    k_new = jnp.asarray(rng.standard_normal((rows, 1, d)), dtype)
    v_new = jnp.asarray(rng.standard_normal((rows, 1, d)), dtype)
    k_cache = jnp.asarray(rng.standard_normal((rows, t_max, d)), dtype) * 0.3
    v_cache = jnp.asarray(rng.standard_normal((rows, t_max, d)), dtype) * 0.3
    scale = (d // n_head) ** -0.25
    mask = cached_causal_mask(1, t_max, offset)

    def chain(q, kn, vn, kc, vc):
        kc = update_cache(kc, kn * scale, offset)
        vc = update_cache(vc, vn, offset)
        return cached_qkv_attention(q, kc, vc, n_head, mask=mask), kc, vc

    d_head = d // n_head
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
    sel = (d_idx // d_head == h_idx).astype(jnp.float32)

    def selector(q, kn, vn, kc, vc):
        kc = update_cache(kc, kn * scale, offset)
        vc = update_cache(vc, vn, offset)
        qs = (q[:, 0, :] * scale).astype(jnp.float32)  # (B, D)
        prod = kc.astype(jnp.float32) * qs[:, None, :]  # (B, T, D)
        logits = jnp.einsum(  # (B, T, H) fp32
            "btd,dh->bth", prod, sel, preferred_element_type=jnp.float32
        )
        trow = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1)
        logits = jnp.where(trow <= offset, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=1)
        wl = jnp.einsum("bth,dh->btd", w.astype(dtype), sel.astype(dtype))
        out = jnp.sum(
            wl.astype(jnp.float32) * vc.astype(jnp.float32), axis=1,
            keepdims=True,
        )
        return out.astype(q.dtype), kc, vc

    def kernel(q, kn, vn, kc, vc):
        out, kc, vc = decode_attn._call(
            q, kn, vn, kc, vc, jnp.full((rows,), offset, jnp.int32), n_head
        )
        return out, kc, vc

    def kernel_m8(q, kn, vn, kc, vc):
        out, kc, vc = decode_attn._call_multi(
            q, kn, vn, kc, vc, jnp.full((1,), offset, jnp.int32), n_head, 8
        )
        return out, kc, vc

    def read(q, kn, vn, kc, vc):
        s = jnp.sum(kc.astype(jnp.float32), axis=1, keepdims=True) + jnp.sum(
            vc.astype(jnp.float32), axis=1, keepdims=True
        )
        return (s * q.astype(jnp.float32)).astype(q.dtype), kc, vc

    def make_timed(fn, n):
        @jax.jit
        def run(q, kn, vn, kc, vc):
            def body(carry, _):
                kc, vc, x = carry
                # carry-dependent input: nothing hoists out of the scan
                out, kc, vc = fn(q + x, kn, vn, kc, vc)
                return (kc, vc, out * 1e-6), None

            (kc, vc, out), _ = jax.lax.scan(
                body, (kc, vc, jnp.zeros_like(q)), None, length=n
            )
            return out[:, 0, :8]  # tiny fetch for sync

        return run

    for name, fn in [
        ("chain", chain),
        ("selector", selector),
        ("kernel", kernel),
        ("kernel_m8", kernel_m8),
        ("read", read),
    ]:
        if "kernel" in name and jax.default_backend() == "cpu":
            continue
        if name == "kernel_m8" and rows % 8:
            continue
        try:
            lo, hi = make_timed(fn, 4), make_timed(fn, reps + 4)
            _ = np.asarray(lo(q, k_new, v_new, k_cache, v_cache))
            _ = np.asarray(hi(q, k_new, v_new, k_cache, v_cache))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(lo(q, k_new, v_new, k_cache, v_cache))
                t1 = time.perf_counter()
                _ = np.asarray(hi(q, k_new, v_new, k_cache, v_cache))
                t2 = time.perf_counter()
                ts.append(((t2 - t1) - (t1 - t0)) / reps)
            best = min(ts)
            slab_gb = 2 * rows * t_max * d * 2 / 1e9
            print(
                f"{name:10s} {best * 1e6:9.1f} us/op   "
                f"({slab_gb / best:6.0f} GB/s effective K+V)",
                flush=True,
            )
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
