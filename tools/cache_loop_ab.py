"""Same-session A/B of the decode-loop layer harness
(``models.whisper.CACHE_LOOP``): lax.scan with stacked ys vs the r4b
fori_loop with in-place dynamic_update_slice cache writes — on the
GREEDY path (the beam path is covered by tools/beam_reorder_ab.py).

Why: the r4 device trace (docs/performance.md) showed scan's ys
stacking forces XLA to copy the full (L, rows, T, D) k and v stacks
back into the decode while_loop's carry buffers every step. At greedy
b8 x small that's 2 x 66 MB of copy traffic per step against a ~1.5 ms
step.

Usage: python tools/cache_loop_ab.py [model] [iters]   # small 8
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

    from whisper_flamingo_tpu import decoding
    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models import whisper as W
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch, sample_len = 8, 64

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    def measure(loop):
        W.CACHE_LOOP = loop
        decoding._make_decode_program.cache_clear()
        task = DecodingTask(
            model,
            DecodingOptions(
                language="en", without_timestamps=True,
                sample_len=sample_len, fp16=True,
                suppress_tokens=f"-1,{eot}",
            ),
        )
        results = task.run(mel)  # warm/compile
        toks = [r.tokens for r in results]
        for r in results:
            assert len(r.tokens) >= sample_len, "early EOT: invalid"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                task.run(mel)
            best = min(best, (time.perf_counter() - t0) / iters)
        return batch * 30.0 / best, toks

    legs = [("scan (stacked ys)", "scan"),
            ("fori in-place DUS", "fori"),
            ("scan again (drift)", "scan")]
    toks_ref = None
    for tag, loop in legs:
        rtf, toks = measure(loop)
        if toks_ref is None:
            toks_ref = toks
        match = "tokens==base" if toks == toks_ref else "TOKENS DIFFER"
        print(f"{model_name} greedy {tag:24s} {rtf:7.1f}x RT  [{match}]",
              flush=True)
    W.CACHE_LOOP = "fori"


if __name__ == "__main__":
    main()
