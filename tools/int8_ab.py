"""Same-session A/B: int8 decode serving mode vs the bf16 baseline.

Runs the full decode surface (DecodingTask.run) on the real chip with and
without DecodingOptions(quantize="int8"), same process, interleaved
baseline re-runs to bound tunnel drift. Uses bench.py's honesty guard
(EOT suppressed, full token budget asserted).

Usage:  python tools/int8_ab.py [model] [iters] [beams] [modes]
        # defaults: small 12 "greedy,15" int8
        # e.g. `large-v2 3 15 int8,int8kv` A/Bs both quantize modes
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

    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    beams = [
        None if b in ("greedy", "none") else int(b)
        for b in (sys.argv[3] if len(sys.argv) > 3 else "greedy,15").split(",")
    ]
    modes = (sys.argv[4] if len(sys.argv) > 4 else "int8").split(",")
    batch, sample_len = 8, 64

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    def task(quantize, beam):
        return DecodingTask(
            model,
            DecodingOptions(
                language="en", without_timestamps=True, sample_len=sample_len,
                fp16=True, beam_size=beam, quantize=quantize,
                suppress_tokens=f"-1,{eot}",
            ),
        )

    for beam in beams:
        it = iters if beam is None else max(iters // 3, 2)
        base1 = run(task(None, beam), mel, sample_len, it)
        quant = {m: run(task(m, beam), mel, sample_len, it) for m in modes}
        base2 = run(task(None, beam), mel, sample_len, it)  # drift check
        base = max(base1, base2)
        tag = "greedy" if beam is None else f"beam{beam}"
        print(
            f"{model_name} {tag}: bf16 {base1:.1f}/{base2:.1f}x  "
            + "  ".join(
                f"{m} {r:.1f}x (speedup {r / base:.3f}x)"
                for m, r in quant.items()
            )
        )


if __name__ == "__main__":
    main()
