"""Fused self-attention step kernel for the incremental decode loop.

Why: the corrected r3 decode decomposition (`tools/decode_probe.py`,
docs/performance.md "r3 decode-step decomposition") measured the
self-attention chain at **0.98 ms of the 2.20 ms step** (small/b8
greedy) against a ~0.02 ms bytes roofline — the cache slab is only
~17 MB. The cost is not bandwidth but *op count*: per layer the XLA
chain runs ~8 dependent ops (two `dynamic_update_slice` cache writes,
three head-split transposes, two einsums, a masked fp32 softmax) on
(B, H, 1, ~T)-shaped tensors whose per-op fixed latency dwarfs their
compute. This kernel collapses the whole chain into ONE Pallas program
per layer:

    cache write -> masked logits -> softmax -> weighted V

with a 1-D grid over batch rows (each row's K/V cache slab streams
through VMEM once, double-buffered across rows).

The head dimension never materializes. The self cache is stored
*unsplit* (B, T, D) (see `ops/attention.cached_qkv_attention` for why),
so per-head logits are a lane-group reduction: with S the (D, H) 0/1
group-membership matrix (S[d, h] = 1 iff lane d belongs to head h),

    logits = (K * q) @ S            # (T, D) * (1, D) -> (T, H), one dot
    out    = sum_T (softmax @ S^T) * V   # expand weights back to lanes

replacing both head-split transposes and both batched einsums with two
tiny MXU dots and elementwise VPU work — and the output lanes land
already head-merged.

The (stale) cache row at the write position is substituted with the
incoming token's K/V via a vectorized `where` on the row index, so the
causal mask `j <= offset` covers the new token with no separate leg,
and the full updated block is written back (the slab is small; the
extra write is ~0.02 ms against the ~0.9 ms saved). A per-row offset
vector (continuous batching: slots advance independently) rides as a
scalar-prefetch operand indexed by the grid position.

Numerics match `cached_qkv_attention` (reference semantics
`/root/reference/whisper/model.py:62-108`): fp32 logits/softmax, the
(d/h)^-0.25 scale applied to q and K inside the kernel, weights cast to
the compute dtype for the V reduction, fp32 accumulation. No reference
equivalent of the fusion itself (the reference decodes Python-per-token
on GPU); this is a TPU-native serving optimization.

Caveats: (a) incremental steps only (q_len == 1) — prefill and
speculative verification (q_len = K+1) keep the XLA chain, which XLA
tiles well at those shapes; (b) like `ops/decode_mlp`, Pallas calls
carry no SPMD partitioning rule, so the flag is a single-chip serving
knob (sharded decode keeps the XLA path per shard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Decode-loop dispatch switch (models/whisper.decoder_apply cache
# branch). Module-level like decode_mlp.ENABLED / flash64.FWD_SUM so the
# on-chip A/B can flip it; the default is set by measurement
# (docs/performance.md).
ENABLED = True
# On CPU the kernel only runs interpreted (slow, and the XLA chain is
# bit-identical to the historical path), so dispatch is TPU-only unless
# a test forces it.
FORCE_CPU = False


# Measured crossover (tools/decode_attn_ab.py, docs/performance.md): at
# b8 greedy (8 rows) the per-row kernel wins ~1.30x; at beam-15 x b8
# (120 rows) it loses 0.89x — with many rows the XLA chain's batched
# einsums are no longer latency-dominated, while the kernel pays 120
# sequential grid steps. The per-row grid dispatches only below this
# row count.
MAX_ROWS = 32
# Lockstep path (scalar offset — greedy/beam decode loops, where every
# row writes the same cache position): rows pack ``m`` per grid step,
# cutting both the sequential-step count and the per-block DMA overhead
# m-fold. Measured (tools/decode_attn_ab.py small 8 beam15, on-chip):
# it moves beam-15 x b8 from the per-row grid's 0.89x to 0.93x vs the
# XLA chain — and m=12 (10 grid steps) ties m=8 (15 steps) at 0.927x,
# so the residual loss is not step count but the chain's batched-einsum
# throughput + XLA's cross-op pipelining at 120 rows. Default OFF;
# kept in-tree as the measured evidence (same policy as ops/decode_mlp).
MULTI_ENABLED = False
MAX_ROWS_LOCKSTEP = 256
# Per-grid-step VMEM budget for the multi-row blocks. Peak live set is
# roughly the double-buffered K+V input blocks (4*m*T*d*itemsize), the
# spliced ku/vu copies (2*m*T*d*itemsize) and ~2 live f32 (m*T, d)
# temps (8*m*T*d) — i.e. ~(6*itemsize + 8) bytes per cache element —
# against the chip's ~16 MB of VMEM.
_MULTI_VMEM_BYTES = 12 * 2 ** 20


def _pick_multi(rows: int, cache_len: int, d: int, itemsize: int) -> int:
    """Largest rows-per-grid-step that divides ``rows`` and fits VMEM
    (0 if none does)."""
    import os

    forced = os.environ.get("WF_DECODE_ATTN_M")  # probe/A-B override
    if forced:
        m = int(forced)
        if m * cache_len * d * (6 * itemsize + 8) > _MULTI_VMEM_BYTES:
            # an over-budget forced m would otherwise surface only as a
            # Mosaic compile error on-chip; fail the same way the
            # automatic picker does
            import warnings

            warnings.warn(
                f"WF_DECODE_ATTN_M={m} exceeds the per-grid-step VMEM "
                f"budget at cache_len={cache_len}, d={d}; ignoring the "
                "override", stacklevel=2,
            )
            return 0
        return m if rows % m == 0 else 0
    if not MULTI_ENABLED:
        return 0
    for m in (16, 8, 4, 2):
        if rows % m == 0 and (
            m * cache_len * d * (6 * itemsize + 8) <= _MULTI_VMEM_BYTES
        ):
            return m
    return 0


def dispatch(
    q_len: int, cache_len: int, rows: int,
    lockstep: bool = False, d: int | None = None, itemsize: int = 2,
) -> bool:
    """Trace-time predicate: route the decode loop's self-attention step
    through the fused kernel? Incremental steps only (prefill and
    speculative verification chunks keep the XLA chain), the cache time
    axis must be a sublane multiple (TPU block-shape rule for the 8-row
    write window; ``models.whisper.init_cache`` pads to this), and few
    enough batch rows that per-op latency, not throughput, dominates —
    or, when ``lockstep`` (scalar write offset) lets rows pack per grid
    step, up to ``MAX_ROWS_LOCKSTEP`` rows."""
    if not (ENABLED and q_len == 1 and cache_len % 8 == 0
            and (FORCE_CPU or jax.default_backend() != "cpu")):
        return False
    if rows <= MAX_ROWS:
        return True
    return (
        lockstep and rows <= MAX_ROWS_LOCKSTEP
        and d is not None and _pick_multi(rows, cache_len, d, itemsize) > 0
    )


def _kernel(off_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
            o_ref, krow_ref, vrow_ref, *, n_head: int):
    b = pl.program_id(0)
    off = off_ref[b]
    t_max, d = kc_ref.shape[1], kc_ref.shape[2]
    d_head = d // n_head
    scale = float(d_head) ** -0.25  # static; keeps operand dtypes

    cdtype = kc_ref.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
    is_new = row == off  # (T, 1) broadcast over lanes

    # Multiply in the source dtype (bitwise what `k_raw * scale` stores
    # on the unfused path), then cast to the cache dtype. The input block
    # holds the stale slot: substitute the incoming row for the
    # attention computation.
    kn = (kn_ref[0] * scale).astype(cdtype)  # (1, D)
    vn = vn_ref[0].astype(cdtype)
    ku = jnp.where(is_new, kn, kc_ref[0])  # (T, D), K pre-scaled
    vu = jnp.where(is_new, vn, vc_ref[0])
    # persist ONLY the 8-row aligned window holding the new token's K/V:
    # the output blocks are dynamically indexed at off//8 (index map
    # below) and the cache buffers are aliased, so the rest of the slab
    # is untouched in HBM — write traffic per step is 8 rows, not T
    # (TPU block shapes need sublane multiples; requires T % 8 == 0,
    # which init_cache guarantees). Mosaic has no dynamic_slice on
    # values, so the stale window re-loads from the input ref (dynamic
    # ref indexing IS lowered) and the new row splices in via a select.
    aligned = (off // 8) * 8
    wrow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    sel_new = wrow == (off - aligned)
    kwin = kc_ref[0, pl.dslice(aligned, 8), :]  # (8, D) stale window
    vwin = vc_ref[0, pl.dslice(aligned, 8), :]
    krow_ref[0] = jnp.where(sel_new, kn, kwin)
    vrow_ref[0] = jnp.where(sel_new, vn, vwin)

    # lane-group selector: S[d, h] = 1 iff d // d_head == h
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
    sel = (d_idx // d_head == h_idx).astype(jnp.float32)

    q = q_ref[0].astype(jnp.float32) * scale  # (1, D)
    prod = ku.astype(jnp.float32) * q  # (T, D) exact f32 products
    logits = jax.lax.dot(prod, sel, precision=jax.lax.Precision.HIGHEST)
    valid = row <= off  # (T, 1): causal mask over the cache prefix
    logits = jnp.where(valid, logits, -jnp.inf)  # (T, H)

    m = jnp.max(logits, axis=0, keepdims=True)  # row `off` is always valid
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=0, keepdims=True)  # (T, H) fp32

    # expand per-head weights back to lanes and reduce over time
    wl = jax.lax.dot(w, sel.T, precision=jax.lax.Precision.HIGHEST)
    wl = wl.astype(o_ref.dtype).astype(jnp.float32)  # weights in compute dtype
    out = jnp.sum(wl * vu.astype(jnp.float32), axis=0, keepdims=True)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_multi(off_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                  o_ref, krow_ref, vrow_ref, *, n_head: int):
    """Lockstep variant: one grid step attends ``m`` batch rows that all
    share the scalar write offset (greedy/beam decode loops). Same math
    as ``_kernel`` row-for-row — the big dots flatten (m, T, D) to
    (m*T, D) so each output element is the identical D-length
    contraction, and the softmax reduces over the sublane (T) axis of
    the (m, T, H) view — so results are bit-identical to the per-row
    grid."""
    off = off_ref[0]
    m, t_max, d = kc_ref.shape
    d_head = d // n_head
    scale = float(d_head) ** -0.25

    cdtype = kc_ref.dtype
    trow = jax.lax.broadcasted_iota(jnp.int32, (m, t_max, 1), 1)
    is_new = trow == off  # (m, T, 1), shared offset

    kn = (kn_ref[:, 0, :] * scale).astype(cdtype)  # (m, D)
    vn = vn_ref[:, 0, :].astype(cdtype)
    ku = jnp.where(is_new, kn[:, None, :], kc_ref[...])  # (m, T, D)
    vu = jnp.where(is_new, vn[:, None, :], vc_ref[...])

    # 8-row aligned write window, shared across the m rows (see _kernel
    # for why the window re-loads from the input ref and splices)
    aligned = (off // 8) * 8
    wrow = jax.lax.broadcasted_iota(jnp.int32, (m, 8, 1), 1)
    sel_new = wrow == (off - aligned)
    kwin = kc_ref[:, pl.dslice(aligned, 8), :]  # (m, 8, D) stale windows
    vwin = vc_ref[:, pl.dslice(aligned, 8), :]
    krow_ref[...] = jnp.where(sel_new, kn[:, None, :], kwin)
    vrow_ref[...] = jnp.where(sel_new, vn[:, None, :], vwin)

    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
    sel = (d_idx // d_head == h_idx).astype(jnp.float32)

    q = q_ref[:, 0, :].astype(jnp.float32) * scale  # (m, D)
    prod = ku.astype(jnp.float32) * q[:, None, :]  # (m, T, D) f32 products
    logits = jax.lax.dot(
        prod.reshape(m * t_max, d), sel,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(m, t_max, n_head)
    valid = trow <= off  # causal mask over the cache prefix
    logits = jnp.where(valid, logits, -jnp.inf)  # (m, T, H)

    mx = jnp.max(logits, axis=1, keepdims=True)  # row `off` always valid
    w = jnp.exp(logits - mx)
    w = w / jnp.sum(w, axis=1, keepdims=True)  # (m, T, H) fp32

    wl = jax.lax.dot(
        w.reshape(m * t_max, n_head), sel.T,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(m, t_max, d)
    wl = wl.astype(o_ref.dtype).astype(jnp.float32)  # compute-dtype weights
    out = jnp.sum(wl * vu.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[...] = out.astype(o_ref.dtype)  # (m, 1, D)


@functools.partial(jax.jit, static_argnames=("n_head", "m"))
def _call_multi(q, k_new, v_new, k_cache, v_cache, offsets, n_head, m):
    b, t_max, d = k_cache.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // m,),
        in_specs=[
            pl.BlockSpec((m, 1, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((m, 1, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((m, 1, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((m, t_max, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((m, t_max, d), lambda i, off: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((m, 1, d), lambda i, off: (i, 0, 0)),
            # cache outputs: one (m, 8, D) row-window block at the shared
            # write offset's aligned window; aliased to the input slabs
            pl.BlockSpec((m, 8, d), lambda i, off: (i, off[0] // 8, 0)),
            pl.BlockSpec((m, 8, d), lambda i, off: (i, off[0] // 8, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_multi, n_head=n_head),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},  # cache slabs update in place
        interpret=jax.default_backend() == "cpu",
    )(offsets, q, k_new, v_new, k_cache, v_cache)


@functools.partial(jax.jit, static_argnames=("n_head",))
def _call(q, k_new, v_new, k_cache, v_cache, offsets, n_head):
    b, t_max, d = k_cache.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            # (B, 1, D) operands: (1, 1, D) blocks keep the trailing two
            # dims equal to the array's (TPU block-shape rule)
            pl.BlockSpec((1, 1, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((1, t_max, d), lambda i, off: (i, 0, 0)),
            pl.BlockSpec((1, t_max, d), lambda i, off: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, d), lambda i, off: (i, 0, 0)),
            # cache outputs: one (1, 8, D) row-window block, dynamically
            # placed at the prefetched write offset's aligned window;
            # aliased to the input slabs
            pl.BlockSpec((1, 8, d), lambda i, off: (i, off[i] // 8, 0)),
            pl.BlockSpec((1, 8, d), lambda i, off: (i, off[i] // 8, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_head=n_head),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},  # cache slabs update in place
        interpret=jax.default_backend() == "cpu",
    )(offsets, q, k_new, v_new, k_cache, v_cache)


def fused_step(q, k_raw, v_raw, k_cache, v_cache, offset, n_head):
    """One incremental self-attention step, fused.

    Drop-in for the decode loop's cache-write + ``cached_qkv_attention``
    chain (models/whisper.decoder_apply): ``q``/``k_raw``/``v_raw`` are
    the current token's unscaled projections (B, 1, D); ``k_cache``/
    ``v_cache`` the unsplit slabs (B, T_max, D) with K pre-scaled;
    ``offset`` a scalar or (B,) write position. Returns
    ``(attn_out (B, 1, D), new_k_cache, new_v_cache)``.
    """
    b, _, d = q.shape
    if k_cache.shape[-2] % 8:
        raise ValueError(
            "fused_step needs a sublane-multiple cache length "
            f"(got {k_cache.shape[-2]}); init_cache pads to 8"
        )
    lockstep = getattr(offset, "ndim", 0) == 0
    if lockstep:
        m = _pick_multi(b, k_cache.shape[-2], d, k_cache.dtype.itemsize)
        if m:
            offsets = jnp.full((1,), offset, jnp.int32)
            return _call_multi(
                q, k_raw, v_raw, k_cache, v_cache, offsets, n_head, m
            )
    if lockstep:
        offsets = jnp.full((b,), offset, jnp.int32)
    else:
        offsets = offset.astype(jnp.int32)
    return _call(q, k_raw, v_raw, k_cache, v_cache, offsets, n_head)
