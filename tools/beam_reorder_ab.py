"""Same-session A/B of the two beam-step cache fixes found by the
profiler trace (r3): the one-hot-matmul cache reorder
(``decoding.REORDER``) and the selector-form incremental self-attention
(``models.whisper.SELECTOR_SELF``) — individually and together, against
the r2 baseline (row-gather reorder + split-head chain).

Context: the beam-15 x b8 decomposition (tools/decode_probe.py small 8
6 15) measured self-attention at 5.19 ms and the cache reorder at 2.57
ms of the 8.19 ms step; the trace attributed most of both to layout
thrash — XLA lays the carried (L, 120, T, D) cache batch-minor for the
row gather, then full-stack-copies it twice per step for the attention
reads, and the gather itself lowers to chunked pad/maximum ops.

Usage: python tools/beam_reorder_ab.py [model] [iters] [beam]
       defaults: small 8 15
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
    beam = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    batch, sample_len = 8, 64

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    def measure(reorder, selector, fuse=False):
        decoding.REORDER = reorder
        decoding.FUSE_REORDER = fuse
        W.SELECTOR_SELF = selector
        decoding._make_decode_program.cache_clear()
        task = DecodingTask(
            model,
            DecodingOptions(
                language="en", without_timestamps=True,
                sample_len=sample_len, fp16=True, beam_size=beam,
                suppress_tokens=f"-1,{eot}",
            ),
        )
        results = task.run(mel)  # warm/compile
        toks0 = [r.tokens for r in results]
        for r in results:
            assert len(r.tokens) >= sample_len, "early EOT: invalid"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                results = task.run(mel)
            best = min(best, (time.perf_counter() - t0) / iters)
        return batch * 30.0 / best, toks0

    legs = [
        ("gather + split (r2 baseline)", "gather", False, False),
        ("matmul reorder", "matmul", False, False),
        ("selector self-attn", "gather", True, False),
        ("matmul + selector (r3 ship)", "matmul", True, False),
        ("in-scan fused reorder (r4)", "matmul", True, True),
        ("r3 ship again (drift)", "matmul", True, False),
    ]
    toks_ref = None
    for tag, reorder, selector, fuse in legs:
        rtf, toks = measure(reorder, selector, fuse)
        if toks_ref is None:
            toks_ref = toks
        match = "tokens==base" if toks == toks_ref else "TOKENS DIFFER"
        print(f"{model_name} beam{beam} {tag:32s} {rtf:7.1f}x RT  [{match}]",
              flush=True)
    decoding.REORDER = "matmul"
    decoding.FUSE_REORDER = True
    W.SELECTOR_SELF = True


if __name__ == "__main__":
    main()
