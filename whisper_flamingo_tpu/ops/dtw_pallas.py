"""Pallas TPU kernel for the DTW anti-diagonal wavefront.

The TPU-native equivalent of the reference's Triton ``dtw_kernel``
(`/root/reference/whisper/triton_ops.py:13-40`): one kernel instance owns
the whole cost matrix and sweeps anti-diagonals; each diagonal is a VPU
vector op over the (padded) text axis. Where the Triton kernel needed an
explicit ``tl.debug_barrier()`` per diagonal, here the ``fori_loop``
carry *is* the dependency chain.

Same skew trick as the Triton version: the cost input is pre-skewed in
XLA so diagonal ``d`` of the DP is a contiguous row of ``x_skew``
(`triton_ops.py` skews with stride arithmetic; `timing.py:114-117`
upstream builds the same layout).

The backtrace stays on host (inherently sequential, O(N+M) and tiny);
:mod:`ops/dtw.py` dispatches between this kernel, the lax.scan wavefront,
and the numpy DP.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

INF = float("inf")  # plain python float: jnp scalars would be captured consts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=None)
def _dtw_pallas_program(n: int, m: int, interpret: bool = False):
    """Kernel for a fixed (N, M) cost matrix; returns trace rows per
    diagonal, shape (n+m, n_pad) int32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = _round_up(n + 1, 128)
    n_diag = n + m

    DIAG_TILE = 8  # diagonals per grid step (min sublane tile)
    n_diag_pad = _round_up(n_diag, DIAG_TILE)

    def kernel(x_rows_ref, trace_rows_ref, prev2_ref, prev1_ref):
        # one grid step owns 8 consecutive anti-diagonals (statically
        # unrolled — they are sequentially dependent); VMEM scratch
        # persists across grid steps, carrying the previous two diagonals
        step = pl.program_id(0)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

        @pl.when(step == 0)
        def _():
            prev2_ref[:] = jnp.full((1, n_pad), INF)
            prev1_ref[:] = jnp.where(i_idx == 0, 0.0, jnp.full((1, n_pad), INF))

        prev2 = prev2_ref[:]
        prev1 = prev1_ref[:]
        rows = []
        for r in range(DIAG_TILE):
            d = step * DIAG_TILE + r + 1
            j_idx = d - i_idx
            valid = (i_idx >= 1) & (j_idx >= 1) & (i_idx <= n) & (j_idx <= m)

            # shift by one lane: cost[i-1, *] comes from lane i-1
            c0 = jnp.where(i_idx == 0, INF, pltpu.roll(prev2, 1, axis=1))
            c1 = jnp.where(i_idx == 0, INF, pltpu.roll(prev1, 1, axis=1))
            c2 = prev1

            # reference tie-breaking (timing.py:95-100); the propagated
            # cost follows the same cascade (else-branch carries c2 even
            # on the c0 == c1 < c2 tie), NOT min()
            t = jnp.where(
                (c0 < c1) & (c0 < c2),
                0,
                jnp.where((c1 < c0) & (c1 < c2), 1, 2),
            ).astype(jnp.int32)
            c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))

            cur = jnp.where(valid, x_rows_ref[r : r + 1, :] + c, INF)
            rows.append(jnp.where(valid, t, -1))
            prev2, prev1 = prev1, cur

        trace_rows_ref[:] = jnp.concatenate(rows, axis=0)
        prev2_ref[:] = prev2
        prev1_ref[:] = prev1

    def run(x_skew):
        return pl.pallas_call(
            kernel,
            grid=(n_diag_pad // DIAG_TILE,),
            out_shape=jax.ShapeDtypeStruct((n_diag_pad, n_pad), jnp.int32),
            in_specs=[
                pl.BlockSpec(
                    (DIAG_TILE, n_pad), lambda d: (d, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (DIAG_TILE, n_pad), lambda d: (d, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((1, n_pad), jnp.float32),
                pltpu.VMEM((1, n_pad), jnp.float32),
            ],
            interpret=interpret,
        )(x_skew)

    return jax.jit(run)


def _skew(x: jnp.ndarray, n: int, m: int, n_pad: int) -> jnp.ndarray:
    """x (n, m) -> x_skew (n+m, n_pad) with x_skew[d-1, i] = x[i-1, d-i-1]."""
    d_idx = np.arange(1, n + m + 1)[:, None]
    i_idx = np.arange(n_pad)[None, :]
    j = d_idx - i_idx
    valid = (i_idx >= 1) & (j >= 1) & (i_idx <= n) & (j <= m)
    gather_i = np.clip(i_idx - 1, 0, n - 1)
    gather_j = np.clip(j - 1, 0, m - 1)
    vals = x[gather_i, gather_j]
    return jnp.where(jnp.asarray(valid), vals, 0.0)


def dtw_trace_pallas(x, interpret: bool = False) -> np.ndarray:
    """Fill the (N+1, M+1) trace matrix with the Pallas wavefront kernel."""
    x = jnp.asarray(x, jnp.float32)
    n, m = x.shape
    n_pad = _round_up(n + 1, 128)
    x_skew = _skew(x, n, m, n_pad)
    n_diag_pad = _round_up(n + m, 8)
    if x_skew.shape[0] < n_diag_pad:
        x_skew = jnp.pad(x_skew, ((0, n_diag_pad - x_skew.shape[0]), (0, 0)))
    traces = np.asarray(_dtw_pallas_program(n, m, interpret)(x_skew))

    trace = -np.ones((n + 1, m + 1), np.float32)
    i = np.arange(n_pad)
    for d in range(1, n + m + 1):
        j = d - i
        valid = (i >= 1) & (j >= 1) & (i <= n) & (j <= m)
        trace[i[valid], j[valid]] = traces[d - 1][valid]
    return trace
