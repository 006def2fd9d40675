"""On-chip measurement of speculative decoding's cost model.

Zero-egress caveat: with random-init weights a real tiny->large-v2 pair
accepts ~nothing (argmax of noise), so the end-to-end speedup of a
TRAINED pair cannot be demonstrated here. What CAN be measured honestly:

1. the full-acceptance bound: draft == verifier (every token accepted)
   — the plumbing's best case, same program shape as a real pair;
2. the component costs: plain greedy step time of verifier and draft,
   and the verifier's verify-K step time (K+1 positions per weight
   stream) — from which the RTF-vs-acceptance curve follows:

       t_spec(alpha) ~= [K * t_draft + t_verify(K)] / E[tokens/round]
       E[tokens/round] = sum_{j<=K} alpha^j  (+1 bonus at full accept)

Prints both, plus the projected speedup at the 60-80% per-token
acceptance range reported for tiny->large speculation in the literature.

Usage: python tools/spec_ab.py [verifier] [draft] [iters]
       # defaults: small debug-draft 8; real pairing: large-v2 tiny
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_run(task, mel, iters):
    task.run(mel)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = task.run(mel)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.speculative import SpeculativeDecodingTask
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    v_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    d_name = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    batch, sample_len, K = 8, 64, 4

    def build(name):
        dims = MODEL_DIMS[name]
        params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        return Whisper(dims=dims, params=params, dtype=jnp.bfloat16)

    verifier = build(v_name)
    eot = get_tokenizer(True, language="en", task="transcribe").eot
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)
    audio_s = batch * 30.0

    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=sample_len,
        fp16=True, suppress_tokens=f"-1,{eot}",
    )

    # plain greedy baselines
    t_v, _ = timed_run(DecodingTask(verifier, opts), mel, iters)
    print(f"{v_name} plain greedy: {audio_s / t_v:.1f}x RT "
          f"({t_v / sample_len * 1e3:.2f} ms/token)")

    # full-acceptance bound: draft == verifier
    task = SpeculativeDecodingTask(verifier, verifier, opts, draft_len=K)
    t_full, _ = timed_run(task, mel, iters)
    rounds = int(task.last_stats["rounds"])
    acc = int(task.last_stats["accepted_tokens"])
    print(f"self-speculation (100% acceptance bound, K={K}): "
          f"{audio_s / t_full:.1f}x RT  rounds={rounds} accepted={acc}")

    # real pairing: random weights -> ~0% acceptance; measures the
    # worst-case overhead of drafting (each round nets 1 token)
    draft = build(d_name)
    task = SpeculativeDecodingTask(verifier, draft, opts, draft_len=K)
    t_rand, _ = timed_run(task, mel, max(iters // 2, 2))
    rounds = int(task.last_stats["rounds"])
    print(f"{v_name}+{d_name} (random weights ~0% acceptance): "
          f"{audio_s / t_rand:.1f}x RT  rounds={rounds}")

    # cost-model projection for a trained pair
    t_round0 = t_rand / max(rounds, 1)  # K draft steps + one verify-K
    for alpha in (0.6, 0.7, 0.8):
        e_tokens = sum(alpha**j for j in range(1, K + 1)) + 1
        t_proj = t_round0 * sample_len / e_tokens
        print(f"projected at alpha={alpha:.1f}: {audio_s / t_proj:.1f}x RT "
              f"({e_tokens:.2f} tokens/round)")


if __name__ == "__main__":
    main()
