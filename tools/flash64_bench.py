"""A/B the custom flash64 kernel vs the library flash attention on chip,
at the train shape (B=8, H=12, T=1500, d=64, bf16).

Tunnel discipline: a single dispatch is ~30 ms of round-trip latency, so
each measurement runs the op N times inside ONE jitted scan with a
dependency chain, at two values of N — the per-op cost is the slope
(t(N2) - t(N1)) / (N2 - N1), latency cancels. Median of repeats.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, T, D = 8, 12, 1500, 64
N1, N2 = 8, 24


def chained_fwd(f, n):
    @jax.jit
    def run(q, k, v):
        def body(o, _):
            return f(q + 1e-6 * o, k, v), None

        o, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
        return o[0, 0, 0, :4]

    return run


def chained_grad(f, n):
    def loss(q, k, v):
        return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(dq, _):
            out = g(q + 1e-6 * dq, k, v)
            return out[0], None

        dq, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
        return dq[0, 0, 0, :4]

    return run


def timed(f, *args, repeats=5):
    np.asarray(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def slope(make, f, *args):
    t1 = timed(make(f, N1), *args)
    t2 = timed(make(f, N2), *args)
    return (t2 - t1) / (N2 - N1)


def main():
    from whisper_flamingo_tpu.ops.attention import _library_flash_attention
    from whisper_flamingo_tpu.ops.flash64 import flash64_attention

    key = jax.random.PRNGKey(0)
    qh = jax.random.normal(key, (B, H, T, D), jnp.bfloat16) * 0.3
    kh = jax.random.normal(key, (B, H, T, D), jnp.bfloat16) * 0.3
    vh = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)

    print(f"fwd  library: {slope(chained_fwd, _library_flash_attention, qh, kh, vh):7.2f} ms/op")
    print(f"fwd  flash64: {slope(chained_fwd, flash64_attention, qh, kh, vh):7.2f} ms/op")
    print(f"fwd+bwd library: {slope(chained_grad, _library_flash_attention, qh, kh, vh):7.2f} ms/op")
    print(f"fwd+bwd flash64: {slope(chained_grad, flash64_attention, qh, kh, vh):7.2f} ms/op")

    o1 = np.asarray(jax.jit(_library_flash_attention)(qh, kh, vh), np.float32)
    o2 = np.asarray(jax.jit(flash64_attention)(qh, kh, vh), np.float32)
    print("fwd max |lib - new|:", float(np.max(np.abs(o1 - o2))))


if __name__ == "__main__":
    main()
