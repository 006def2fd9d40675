"""Dynamic time warping for word-timestamp alignment.

TPU-native replacement for the reference's Numba ``dtw_cpu`` /
``backtrace`` (`/root/reference/whisper/timing.py:57-105`) and Triton
anti-diagonal ``dtw_kernel`` (`triton_ops.py:13-40`):

- :func:`dtw_costs_jax` — the O(N+M) anti-diagonal wavefront as one
  ``lax.scan`` XLA program; each step updates a whole diagonal on the
  VPU (the same parallelization the Triton kernel used per-block, minus
  the manual barriers — the scan carry *is* the barrier).
- :func:`backtrace_np` — the O(N+M) path walk on host (inherently
  sequential and tiny).
- :func:`dtw` — dispatch: device wavefront for the cost/trace fill, host
  backtrace, matching the reference's tie-breaking exactly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)


@lru_cache(maxsize=None)
def _dtw_program(n: int, m: int):
    """Build the jitted wavefront for a fixed (N, M) cost-matrix shape."""

    def run(x: jax.Array):
        # diagonals indexed by i in [0, N]; cell (i, j=d-i)
        i_idx = jnp.arange(n + 1)

        prev2 = jnp.full((n + 1,), INF)  # diagonal d-2
        prev1 = jnp.full((n + 1,), INF).at[0].set(0.0)  # diagonal d=0

        def body(carry, d):
            prev2, prev1 = carry
            j_idx = d - i_idx
            valid = (i_idx >= 1) & (j_idx >= 1) & (i_idx <= n) & (j_idx <= m)

            c0 = jnp.concatenate([jnp.array([INF]), prev2[:-1]])  # cost[i-1, j-1]
            c1 = jnp.concatenate([jnp.array([INF]), prev1[:-1]])  # cost[i-1, j]
            c2 = prev1  # cost[i, j-1]

            # reference tie-breaking (timing.py:95-100). The propagated
            # cost must follow the SAME cascade, not min(): in the tie
            # c0 == c1 < c2 the reference's else-branch propagates c2
            # even though it is larger.
            t = jnp.where(
                (c0 < c1) & (c0 < c2), 0, jnp.where((c1 < c0) & (c1 < c2), 1, 2)
            ).astype(jnp.int8)
            c = jnp.where(t == 0, c0, jnp.where(t == 1, c1, c2))

            xv = x[
                jnp.clip(i_idx - 1, 0, n - 1), jnp.clip(j_idx - 1, 0, m - 1)
            ]
            cur = jnp.where(valid, xv + c, INF)
            # keep cost[0,0]=0 alive on diagonal 0 only; boundaries stay INF
            return (prev1, cur), (cur, t)

        (_, _), (costs, traces) = jax.lax.scan(
            body, (prev2, prev1), jnp.arange(1, n + m + 1)
        )
        return costs, traces

    return jax.jit(run)


def dtw_costs_jax(x) -> tuple[np.ndarray, np.ndarray]:
    """Fill the (N+1, M+1) trace matrix on device; returns (cost, trace)
    as host arrays laid out like the reference's."""
    x = jnp.asarray(x, jnp.float32)
    n, m = x.shape
    costs_d, traces_d = _dtw_program(n, m)(x)
    costs_d = np.asarray(costs_d)  # (n+m, n+1) rows: diagonal d=1..n+m
    traces_d = np.asarray(traces_d)

    cost = np.full((n + 1, m + 1), INF, np.float32)
    trace = -np.ones((n + 1, m + 1), np.float32)
    cost[0, 0] = 0.0
    i = np.arange(n + 1)
    for d in range(1, n + m + 1):
        j = d - i
        valid = (i >= 1) & (j >= 1) & (j <= m)
        cost[i[valid], j[valid]] = costs_d[d - 1][valid]
        trace[i[valid], j[valid]] = traces_d[d - 1][valid]
    return cost, trace


def backtrace_np(trace: np.ndarray) -> np.ndarray:
    """Walk the trace matrix back from (N, M). Parity: timing.py:57-79."""
    i = trace.shape[0] - 1
    j = trace.shape[1] - 1
    trace = trace.copy()
    trace[0, :] = 2
    trace[:, 0] = 1

    result = []
    while i > 0 or j > 0:
        result.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError("Unexpected trace[i, j]")
    result = np.array(result)
    return result[::-1, :].T


def dtw_np(x: np.ndarray) -> np.ndarray:
    """Pure-numpy reference DP (parity check / tiny inputs).

    Parity: timing.py:82-105.
    """
    n, m = x.shape
    cost = np.full((n + 1, m + 1), INF, np.float32)
    trace = -np.ones((n + 1, m + 1), np.float32)
    cost[0, 0] = 0.0
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    return backtrace_np(trace)


def dtw(x) -> np.ndarray:
    """Monotonic alignment path for a (N_text, M_frames) cost matrix.

    Dispatch: tiny inputs -> numpy DP; TPU -> the hand-written Pallas
    wavefront kernel (ops/dtw_pallas.py); otherwise the lax.scan
    wavefront. All three produce identical paths (tested).
    """
    x = np.asarray(x, np.float32)
    if min(x.shape) == 0:
        return np.zeros((2, 0), np.int64)
    if x.size <= 64 * 64:
        return dtw_np(x)
    if jax.devices()[0].platform == "tpu":
        try:
            from .dtw_pallas import dtw_trace_pallas

            return backtrace_np(dtw_trace_pallas(x))
        except Exception:  # pragma: no cover - fall back to the scan path
            pass
    _, trace = dtw_costs_jax(x)
    return backtrace_np(trace)
