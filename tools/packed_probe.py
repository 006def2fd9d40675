"""On-chip probe: does d_head=64 really halve the MXU rate, and does
head-pair packing (2x64 -> 128-lane contraction) buy anything?

Round-2 left one open claim (VERDICT #1): the train-MFU wall is the
attention kernel at d_head=64 — "QK^T has contraction depth 64 of 128;
weights*V has output width 64 of 128" — and the untested move was a
kernel folding head *pairs* into one 128-wide contraction. Mathematically
the block-diagonal packing

    [Q_h1 | Q_h2] (T,128)  @  [[K_h1^T, 0], [0, K_h2^T]] (128, 2T)

computes both heads' exact logits in one full-depth matmul, at the cost
of 2x the MAC count (half the MACs multiply structural zeros) — so it
can only win if the hardware charges a padded depth-64 matmul MORE than
its zero-padded-to-128 cycle count (e.g. layout/relayout overheads).
This probe measures the primitives directly on the chip:

  A. depth sweep: (M,d)@(d,N) then (M,N)@(N,d) chained, d in {64,128,256}
     — if t(d=128) ~= t(d=64), depth-64 is half-rate (the r2 claim);
     if t(d=128) ~= 2*t(d=64), depth-64 streams at proportional cost
     and the attention floor is ~2x lower than claimed.
  B. packed pair: one (M,128)@(128,2N) block-diagonal matmul vs two
     (M,64)@(64,N) — head-pair packing vs the padded baseline.
  C. narrow-N: (M,K)@(K,64) vs (M,K)@(K,128) — the weights*V output-lane
     question, same logic.

Timing discipline (CLAUDE.md): dependency-chained scan inside one jit,
sync via np.asarray, medians of repeats, same-session comparisons only.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1536  # ~1500 query rows, tile-aligned
N = 1536
ITERS = 100


def _time(f, *args, repeats=5):
    _sync = lambda r: np.asarray(r)  # scalar fetch (see _chain)
    _sync(f(*args))  # force real sync through the tunnel
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / ITERS


def _chain(body):
    """iters of `body` with a carry dependency so XLA can't fold them.

    Reduces the final carry to ONE f32 scalar on device: the host tunnel
    moves ~30 MB/s, so fetching the raw carry for sync would add
    ~65 us/iter per 196 KB of output — asymmetric across variants with
    different carry shapes, large enough to flip close comparisons."""

    def run(x, *ops):
        def step(c, _):
            return body(c, *ops), None

        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return sum(
            l.astype(jnp.float32).sum() for l in jax.tree.leaves(out)
        )

    return jax.jit(run)


def depth_sweep():
    print("=== A. contraction-depth sweep: (M,d)@(d,N) -> (M,N)@(N,d) ===")
    results = {}
    for d in (64, 128, 256):
        key = jax.random.PRNGKey(d)
        x = jax.random.normal(key, (M, d), jnp.bfloat16)
        b1 = jax.random.normal(key, (d, N), jnp.bfloat16)
        b2 = jax.random.normal(key, (N, d), jnp.bfloat16) * 0.01

        def body(c, b1, b2):
            s = jnp.dot(c, b1, preferred_element_type=jnp.bfloat16)
            return jnp.dot(s, b2, preferred_element_type=jnp.bfloat16) * 0.01

        t = _time(_chain(body), x, b1, b2)
        flops = 2 * 2 * M * d * N  # two matmuls per iter
        results[d] = t
        print(
            f"d={d:4d}: {t*1e6:8.1f} us/iter  {flops/t/1e12:6.1f} TF/s "
            f"(vs d=64: {t/results[64]:.2f}x time, {d//64}x FLOPs)"
        )
    return results


def packed_pair():
    print("=== B. head-pair packing for QK^T (one q-tile vs two heads) ===")
    key = jax.random.PRNGKey(0)
    q1 = jax.random.normal(key, (M, 64), jnp.bfloat16)
    q2 = jax.random.normal(key, (M, 64), jnp.bfloat16)
    k1 = jax.random.normal(key, (64, N), jnp.bfloat16)
    k2 = jax.random.normal(key, (64, N), jnp.bfloat16)

    # baseline: two separate depth-64 matmuls (what split-head attention
    # does). BOTH must depend on the scan carry — a loop-invariant
    # s2 = dot(q2, k2) gets hoisted out of the while-loop by XLA's LICM
    # and the baseline times ~1 matmul/iter instead of 2 (review r3);
    # carry the pair so each head's chain threads through.
    def sep(carry, k1, k2):
        c1, c2 = carry
        s1 = jnp.dot(c1, k1, preferred_element_type=jnp.bfloat16)
        s2 = jnp.dot(c2, k2, preferred_element_type=jnp.bfloat16)
        return (c1 + s1[:, :64] * 1e-6, c2 + s2[:, :64] * 1e-6)

    t_sep = _time(_chain(sep), (q1, q2), k1, k2)

    # packed: one (M,128) @ (128, 2N) block-diagonal matmul
    qp = jnp.concatenate([q1, q2], axis=1)  # (M, 128)
    kblk = jnp.zeros((128, 2 * N), jnp.bfloat16)
    kblk = kblk.at[:64, :N].set(k1).at[64:, N:].set(k2)

    def packed(c, kblk):
        s = jnp.dot(c, kblk, preferred_element_type=jnp.bfloat16)
        return c + jnp.concatenate([s[:, :64], s[:, N : N + 64]], axis=1) * 1e-6

    t_packed = _time(_chain(packed), qp, kblk)

    # batched (what XLA's batched attention einsum lowers to)
    qb = jnp.stack([q1, q2])  # (2, M, 64)
    kb = jnp.stack([k1, k2])  # (2, 64, N)

    def batched(c, kb):
        s = jnp.einsum("hmd,hdn->hmn", c, kb, preferred_element_type=jnp.bfloat16)
        return c + s[..., :64] * 1e-6

    t_bat = _time(_chain(batched), qb, kb)

    print(f"two separate (M,64)@(64,N):      {t_sep*1e6:8.1f} us/iter")
    print(f"packed (M,128)@(128,2N) blockdiag:{t_packed*1e6:8.1f} us/iter ({t_packed/t_sep:.2f}x)")
    print(f"batched einsum (2,M,64)@(2,64,N): {t_bat*1e6:8.1f} us/iter ({t_bat/t_sep:.2f}x)")
    return t_sep, t_packed, t_bat


def narrow_n():
    print("=== C. output-width sweep: (M,K)@(K,n) for weights*V ===")
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (M, N), jnp.bfloat16)
    results = {}
    for n in (64, 128, 256):
        v = jax.random.normal(key, (N, n), jnp.bfloat16)
        vT = jax.random.normal(key, (n, N), jnp.bfloat16) * 0.01

        def body(c, v, vT):
            o = jnp.dot(c, v, preferred_element_type=jnp.bfloat16)  # (M, n)
            return c + jnp.dot(o, vT, preferred_element_type=jnp.bfloat16) * 0.01

        t = _time(_chain(body), w, v, vT)
        results[n] = t
        flops = 2 * 2 * M * N * n
        print(
            f"n={n:4d}: {t*1e6:8.1f} us/iter  {flops/t/1e12:6.1f} TF/s "
            f"(vs n=64: {t/results[64]:.2f}x time, {n//64}x FLOPs)"
        )
    return results


if __name__ == "__main__":
    print("devices:", jax.devices())
    depth_sweep()
    packed_pair()
    narrow_n()
