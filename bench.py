"""Headline benchmark: batched greedy decode throughput on one TPU chip.

Measures real-time factor (seconds of audio transcribed per second of
wall-clock) for Whisper ``small`` — the reference's most-used size — on
batched 30 s segments: full mel frontend + encoder + 64 incremental
KV-cached decoder steps per segment, all as compiled XLA programs.

Baseline: the rebuild's north star is >= 5x real-time per TPU v5e chip
(BASELINE.md); ``vs_baseline`` reports RTF / 5.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: keeps repeat bench runs out of the
    # (slow, remote) compile path
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params

    model_name = "small"
    batch = 8
    sample_len = 64  # typical utterance token budget per 30 s segment
    seconds_per_segment = 30.0

    dims = MODEL_DIMS[model_name]
    params = init_params(jax.random.PRNGKey(0), dims)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    task = DecodingTask(
        model,
        DecodingOptions(
            language="en", without_timestamps=True, sample_len=sample_len, fp16=True
        ),
    )

    # warmup (compile)
    task.run(mel)

    n_iters = 15
    t0 = time.perf_counter()
    for _ in range(n_iters):
        results = task.run(mel)
    jax.block_until_ready(results[0].audio_features)
    elapsed = time.perf_counter() - t0

    audio_seconds = n_iters * batch * seconds_per_segment
    rtf = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": f"greedy_decode_rtf_{model_name}_b{batch}",
                "value": round(rtf, 3),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 5.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
