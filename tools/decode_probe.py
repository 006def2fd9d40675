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

Usage: python tools/decode_probe.py [model] [batch] [iters]
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

    def report(name, t):
        results[name] = t
        print(f"{name:44s} {t * 1000:8.1f} ms")

    for L in (16, 64):
        report(f"mel greedy len={L}", timed(make_task(L), mel))
    for L in (16, 64):
        report(f"feats greedy len={L}", timed(make_task(L), feats))

    slope = (results["feats greedy len=64"] - results["feats greedy len=16"]) / 48
    fixed = results["feats greedy len=16"] - 16 * slope
    enc = results["mel greedy len=64"] - results["feats greedy len=64"]
    print(f"\nper-step slope        {slope * 1000:8.2f} ms")
    print(f"prefill+host fixed    {fixed * 1000:8.2f} ms")
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

    def no_self(q, k, v, n_head, mask=None):
        return jnp.zeros_like(q)  # skip self-cache read+update use

    ablations = [
        ("no xa read", {"xa_qkv_attention": no_xa}),
        ("no self attn", {"cached_qkv_attention": no_self}),
        ("no mlp", {"mlp_block": lambda p, x: x}),
        ("no xa, no mlp", {"xa_qkv_attention": no_xa,
                           "mlp_block": lambda p, x: x}),
        ("no xa, self, mlp", {"xa_qkv_attention": no_xa,
                              "cached_qkv_attention": no_self,
                              "mlp_block": lambda p, x: x}),
    ]
    originals = {"xa_qkv_attention": orig_xa,
                 "cached_qkv_attention": orig_self,
                 "mlp_block": orig_mlp}
    for name, patches in ablations:
        try:
            for attr, fn in patches.items():
                setattr(W, attr, fn)
            D._make_decode_program.cache_clear()
            report(f"feats greedy len=64 [{name}]", timed(make_task(64), feats))
        finally:
            for attr in patches:
                setattr(W, attr, originals[attr])
    D._make_decode_program.cache_clear()

    base = results["feats greedy len=64"]
    for name, roof in [("no xa read", 0.54), ("no self attn", None),
                       ("no mlp", 0.14)]:
        cost = (base - results[f"feats greedy len=64 [{name}]"]) / 64
        tag = f"(roofline ~{roof})" if roof else ""
        print(f"{name:20s} share/step {cost * 1000:8.2f} ms  {tag}")
    rest = results["feats greedy len=64 [no xa, self, mlp]"] / 64
    print(f"{'residual (LNs, projections, lm head, filters, loop)':20s}"
          f" {rest * 1000:8.2f} ms/step at len=64")


if __name__ == "__main__":
    main()
