"""Encoder self-attention kernel sweep on the real chip (VERDICT r1 #4:
push train MFU toward 40%; docs/performance.md pins the wall at the
d_head-64 attention kernel).

Measurement discipline (hard-won):
- every timed function returns a SCALAR — returning the (8,1500,768)
  features puts an 18 MB device->host transfer (~0.6 s at the ~30 MB/s
  tunnel) inside the timed window and inflates per-iter time by ~60 ms;
- in-model timings (jitted stacked-scan encoder fwd / fwd+grad) are the
  decision metric; isolated-kernel timings are printed for diagnosis only;
- the XLA-einsum backward without remat materializes every layer's
  (B,H,1500,1500) scores for the scan and OOMs 16 GB HBM — flash (which
  recomputes from its saved LSE) is what makes the train path fit at all;
- the library kernel's scoped-VMEM budget is 16 MB: block_b x
  (block_q x block_kv fp32 scores + q/k/v/o tiles) must stay under it.

Usage: python tools/attn_probe.py [model] [batch] [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_flash(block_q=512, block_kv=1536, block_b=1, fold_heads=False,
               block_bwd=512):
    """Build a _flash_attention replacement with the given tiling."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    def _flash(qh, kh, vh):
        if jax.devices()[0].platform != "tpu":
            return None
        b, h, t, d = qh.shape
        if fold_heads:
            qh = qh.reshape(b * h, 1, t, d)
            kh = kh.reshape(b * h, 1, t, d)
            vh = vh.reshape(b * h, 1, t, d)
        bb_dim = qh.shape[0]
        pad = (-t) % 512
        segment_ids = None
        if pad:
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            qh = jnp.pad(qh, widths)
            kh = jnp.pad(kh, widths)
            vh = jnp.pad(vh, widths)
            ids = (jax.lax.broadcasted_iota(jnp.int32, (bb_dim, t + pad), 1) >= t)
            segment_ids = SegmentIds(q=ids.astype(jnp.int32), kv=ids.astype(jnp.int32))
        tp = t + pad
        bq, bkv = min(block_q, tp), min(block_kv, tp)
        bbwd = min(block_bwd, tp)
        bs = BlockSizes(
            block_q=bq, block_k_major=bkv, block_k=bkv,
            block_b=min(block_b, bb_dim),
            block_q_major_dkv=bbwd, block_k_major_dkv=bbwd,
            block_q_dkv=bbwd, block_k_dkv=bbwd,
            block_q_dq=bbwd, block_k_dq=bbwd, block_k_major_dq=bbwd,
        )
        out = flash_attention(qh, kh, vh, causal=False, sm_scale=1.0,
                              segment_ids=segment_ids, block_sizes=bs)
        out = out[:, :, :t] if pad else out
        if fold_heads:
            out = out.reshape(b, h, t, d)
        return out

    return _flash


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import encoder_apply, init_params
    from whisper_flamingo_tpu.ops import attention as attn_mod

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    only = set(sys.argv[3:])

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch_size, 80, 3000)), jnp.float32)

    def enc_loss(params, mel):
        return encoder_apply(params, dims, mel, dtype=jnp.bfloat16).astype(
            jnp.float32).mean()

    # isolated attention at the encoder shape (diagnostic only)
    h = dims.n_audio_head
    qkv = jnp.asarray(
        rng.standard_normal((3, batch_size, h, dims.n_audio_ctx,
                             dims.n_audio_state // h)), jnp.bfloat16)

    def iso(q, k, v):
        out = attn_mod._flash_attention(q, k, v)
        if out is None:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return out.astype(jnp.float32).mean()

    from whisper_flamingo_tpu.profiling import timeit_device

    def timeit(fn, *args, iters=20):
        return timeit_device(fn, *args, iters=iters)

    def grad_scalar(params, mel):
        g = jax.grad(enc_loss)(params, mel)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g))

    variants = {
        "tuned_q512": lambda: make_flash(512, 1536, 1),
        "xla": lambda: (lambda q, k, v: None),
        "b2": lambda: make_flash(512, 1536, 2),
        "b4_kv512": lambda: make_flash(512, 512, 4),
        "fold_b2_kvfull": lambda: make_flash(512, 1536, 2, fold_heads=True),
        "fold_b4_kv512": lambda: make_flash(512, 512, 4, fold_heads=True),
        "qfull": lambda: make_flash(1536, 1536, 1),
        "q1024_kv512": lambda: make_flash(1024, 512, 1),
    }
    if only:
        variants = {k: v for k, v in variants.items() if k in only}

    for name, factory in variants.items():
        attn_mod._flash_attention = factory()
        try:
            t_iso = timeit(jax.jit(iso), *qkv)
            t_f = timeit(jax.jit(enc_loss), params, mel)
            if name == "xla":
                print(f"{name:18s} iso {t_iso*1000:7.2f} ms  fwd {t_f*1000:7.1f} ms"
                      f"   fwd+grad SKIP (OOMs 16G HBM: scan saves fp32 scores)",
                      flush=True)
                continue
            t_g = timeit(jax.jit(grad_scalar), params, mel, iters=10)
            print(f"{name:18s} iso {t_iso*1000:7.2f} ms  fwd {t_f*1000:7.1f} ms"
                  f"   fwd+grad {t_g*1000:7.1f} ms", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:18s} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
