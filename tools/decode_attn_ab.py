"""Same-session A/B: fused self-attention decode-step kernel vs XLA chain.

Flips ``ops.decode_attn.ENABLED`` between runs (clearing the decode
program cache so the flag reaches a fresh trace) and measures the full
decode surface with bench.py's honesty guard (EOT suppressed, full token
budget). Covers greedy bf16 + int8 (the self cache stays bf16 in int8
serving mode, so the kernel dispatches there too) and beam-15.

Usage:  python tools/decode_attn_ab.py [model] [iters] [legs]
        # defaults: small 12 greedy,int8,beam15
        # legs filters which measurements run (comma-separated substrings)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(task, mel, sample_len, iters):
    results = task.run(mel)  # warmup/compile
    for r in results:
        assert len(r.tokens) >= sample_len, "early EOT would inflate RTF"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            results = task.run(mel)
        best = min(best, (time.perf_counter() - t0) / iters)
    for r in results:
        assert len(r.tokens) >= sample_len
    return mel.shape[0] * 30.0 / best  # RTF


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu import decoding
    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.ops import decode_attn
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    batch, sample_len = 8, 64

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    def measure(fused, quantize=None, beam_size=None):
        decode_attn.ENABLED = fused
        decoding._make_decode_program.cache_clear()
        task = DecodingTask(
            model,
            DecodingOptions(
                language="en", without_timestamps=True, sample_len=sample_len,
                fp16=True, quantize=quantize, beam_size=beam_size,
                suppress_tokens=f"-1,{eot}",
            ),
        )
        rtf = run(task, mel, sample_len, iters)
        decode_attn.ENABLED = True
        return rtf

    legs = [
        ("greedy bf16", dict()),
        ("greedy int8", dict(quantize="int8")),
        ("beam15 bf16", dict(beam_size=15, )),
    ]
    if len(sys.argv) > 3:
        wanted = sys.argv[3].split(",")
        legs = [(t, kw) for t, kw in legs if any(w in t for w in wanted)]
    for tag, kw in legs:
        base1 = measure(False, **kw)
        fused = measure(True, **kw)
        base2 = measure(False, **kw)  # drift check
        base = max(base1, base2)
        print(
            f"{model_name} {tag}: unfused {base1:.1f}/{base2:.1f}x  "
            f"fused-attn {fused:.1f}x  speedup {fused / base:.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
