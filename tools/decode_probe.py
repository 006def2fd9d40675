"""Decode-loop decomposition probe (r2): where does the per-token time go?

Context: bench.py measures ~249 ms per greedy b8/small decode iteration
(encoder + prefill + 64 incremental steps). The HBM roofline for one
incremental step at this shape is ~0.9 ms:

  - audio cross-attn K/V read: 12 L x 8 B x 1500 T x 768 D x 2 (K,V)
    x 2 B (bf16)                                        = 442 MB
  - decoder weights (self qkv/o + xa q/o + mlp)          ~ 198 MB
  - tied-embedding lm head (51865 x 768 bf16)            ~  80 MB
  -> ~720 MB / 819 GB/s ~ 0.88 ms/step

This tool measures (a) the per-step slope via two sample_len points,
(b) the encoder/prefill share via the precomputed-features path, and
(c) ablations (skip audio-cross-attn reads / skip MLP) by monkeypatching
the block functions and rebuilding the compiled program, to localize any
gap between the slope and the roofline.

Usage: python tools/decode_probe.py [model] [batch] [iters] [beam_G]

With a 4th arg (beam width G) the probe decomposes the BEAM step
instead: the shared ablations plus beam-specific ones — the physical
self-cache reorder (`decoding._reorder_beam_cache` -> identity), the
top-k shortlist (`decoding._beam_topk` -> slice), and the logit-filter
stack (`decoding._apply_filters` -> EOT-suppress only, which keeps the
loop running its full budget so ablated runs stay comparable).
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

    import whisper_flamingo_tpu.decoding as D
    import whisper_flamingo_tpu.models.whisper as W
    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    beam = int(sys.argv[4]) if len(sys.argv) > 4 else None

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    # precomputed encoder output: run() skips the encoder when handed
    # (B, n_audio_ctx, n_audio_state)
    feats = D._make_encode_program(dims, jnp.bfloat16)(params, jnp.asarray(mel))
    feats = jnp.asarray(np.asarray(feats))  # force materialize on device

    def make_task(sample_len, beam=None):
        return D.DecodingTask(
            model,
            D.DecodingOptions(
                language="en",
                without_timestamps=True,
                sample_len=sample_len,
                fp16=True,
                beam_size=beam,
                suppress_tokens=f"-1,{eot}",
            ),
        )

    def timed(task, x, n=iters):
        r = task.run(x)
        assert all(len(t.tokens) >= task.options.sample_len for t in r), (
            "early exit: probe invalid"
        )
        t0 = time.perf_counter()
        for _ in range(n):
            task.run(x)  # device_get inside run syncs
        return (time.perf_counter() - t0) / n

    results = {}
    mode = f"beam{beam}" if beam else "greedy"

    def report(name, t):
        results[name] = t
        print(f"{name:44s} {t * 1000:8.1f} ms", flush=True)

    if not beam:
        for L in (16, 64):
            report(f"mel {mode} len={L}", timed(make_task(L), mel))
    for L in (16, 64):
        report(f"feats {mode} len={L}", timed(make_task(L, beam), feats))

    slope = (
        results[f"feats {mode} len=64"] - results[f"feats {mode} len=16"]
    ) / 48
    fixed = results[f"feats {mode} len=16"] - 16 * slope
    print(f"\nper-step slope        {slope * 1000:8.2f} ms")
    print(f"prefill+host fixed    {fixed * 1000:8.2f} ms")
    if not beam:
        enc = results["mel greedy len=64"] - results["feats greedy len=64"]
        print(f"encoder share         {enc * 1000:8.2f} ms")

    # -- ablations (features path, greedy len=64) --------------------------
    # NOTE the cached decode loop reads the audio K/V through the
    # TRANSPOSED-slab path (xa_qkv_attention) since the r2 cache-layout
    # work — ablating W.qkv_attention (the r2 version of this probe) is
    # a no-op for this program and reads as "xa is free", which is wrong.
    orig_xa = W.xa_qkv_attention
    orig_self = W.cached_qkv_attention
    orig_mlp = W.mlp_block

    def no_xa(q, kT, vT, n_head, k_scale=None, v_scale=None):
        return jnp.zeros_like(q)  # skip the slab read entirely

    def no_self(q, k, v, n_head, mask=None, k_scale=None, v_scale=None):
        return jnp.zeros_like(q)  # skip self-cache read+update use

    def no_self_sel(q, k, v, n_head, mask=None, k_scale=None, v_scale=None):
        return jnp.zeros_like(q)

    ablations = [
        ("no xa read", {W: {"xa_qkv_attention": no_xa}}),
        ("no self attn", {W: {"cached_qkv_attention": no_self,
                              "cached_selector_attention": no_self_sel}}),
        ("no mlp", {W: {"mlp_block": lambda p, x: x}}),
    ]
    if beam:
        # EOT-suppress-only filter: removes the filter stack's cost but
        # keeps the loop running its full token budget (comparable runs)
        def eot_only(cfg, logits, tokens, cur_len):
            v = logits.shape[-1]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
            return jnp.where(col == eot, -jnp.inf, logits)

        def fake_topk(logprobs, k):
            # token ids 0..k-1 (never EOT): selection cost without top_k
            idx = jnp.broadcast_to(
                jax.lax.broadcasted_iota(
                    jnp.int32, (1, k), 1
                ), (logprobs.shape[0], k),
            )
            return logprobs[:, :k], idx

        # the reorder ablation must neutralize BOTH lowerings: the
        # standalone pass (FUSE_REORDER=False) and the in-scan row_perm
        # (FUSE_REORDER=True, r4 default) — force the standalone path
        # and identity it, so "no cache reorder" means no reorder at all
        ablations += [
            ("no cache reorder",
             {D: {"_reorder_beam_cache": lambda cache, src: cache,
                  "FUSE_REORDER": False}}),
            ("no top_k", {D: {"_beam_topk": fake_topk}}),
            ("no filters", {D: {"_apply_filters": eot_only}}),
        ]
    else:
        ablations += [
            ("no xa, no mlp", {W: {"xa_qkv_attention": no_xa,
                                   "mlp_block": lambda p, x: x}}),
            ("no xa, self, mlp", {W: {"xa_qkv_attention": no_xa,
                                      "cached_qkv_attention": no_self,
                                      "mlp_block": lambda p, x: x}}),
        ]
    originals = {
        W: {"xa_qkv_attention": orig_xa,
            "cached_qkv_attention": orig_self,
            "cached_selector_attention": W.cached_selector_attention,
            "mlp_block": orig_mlp},
        D: {"_reorder_beam_cache": D._reorder_beam_cache,
            "FUSE_REORDER": D.FUSE_REORDER,
            "_beam_topk": D._beam_topk,
            "_apply_filters": D._apply_filters},
    }
    for name, mod_patches in ablations:
        try:
            for mod, patches in mod_patches.items():
                for attr, fn in patches.items():
                    setattr(mod, attr, fn)
            D._make_decode_program.cache_clear()
            report(
                f"feats {mode} len=64 [{name}]",
                timed(make_task(64, beam), feats),
            )
        finally:
            for mod, patches in mod_patches.items():
                for attr in patches:
                    setattr(mod, attr, originals[mod][attr])
    D._make_decode_program.cache_clear()

    base = results[f"feats {mode} len=64"]
    shares = [("no xa read", 0.54 if not beam else None),
              ("no self attn", None), ("no mlp", 0.14 if not beam else None)]
    if beam:
        shares += [("no cache reorder", None), ("no top_k", None),
                   ("no filters", None)]
    for name, roof in shares:
        cost = (base - results[f"feats {mode} len=64 [{name}]"]) / 64
        tag = f"(roofline ~{roof})" if roof else ""
        print(f"{name:20s} share/step {cost * 1000:8.2f} ms  {tag}")
    if not beam:
        rest = results["feats greedy len=64 [no xa, self, mlp]"] / 64
        print(f"{'residual (LNs, projections, lm head, filters, loop)':20s}"
              f" {rest * 1000:8.2f} ms/step at len=64")


if __name__ == "__main__":
    main()
