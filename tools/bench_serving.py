"""Serving-path TPU benchmark (VERDICT r1 #10): BatchTranscriber
throughput and an end-to-end word-timestamp run on the TPU path (Pallas
DTW wavefront). Prints one JSON object; results are recorded in
docs/performance.md.

Reference scope being measured: the long-form driver + word timestamps
(`/root/reference/whisper/transcribe.py:386+`, `whisper/timing.py:163-242`)
which the reference only ever runs per-file on GPU/CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")

    from whisper_flamingo_tpu.audio import N_SAMPLES, SAMPLE_RATE
    from whisper_flamingo_tpu.decoding import DecodingOptions
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.serving import BatchTranscriber
    from whisper_flamingo_tpu.transcribe import transcribe

    out = {"platform": jax.devices()[0].platform}
    dims = MODEL_DIMS["small"]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)

    # --- BatchTranscriber throughput: 64 x 30 s segments, batch 16 ---
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(N_SAMPLES).astype(np.float32) * 0.02
             for _ in range(64)]
    bt = BatchTranscriber(
        model,
        options=DecodingOptions(language="en", without_timestamps=True,
                                sample_len=64, fp16=True),
        batch_sizes=(16,),
    )
    bt.transcribe_segments(waves[:16])  # compile
    t0 = time.perf_counter()
    results = bt.transcribe_segments(waves)
    dt = time.perf_counter() - t0
    assert len(results) == 64
    audio_s = 64 * N_SAMPLES / SAMPLE_RATE
    out["serving_segments"] = 64
    out["serving_wall_s"] = round(dt, 3)
    out["serving_rtf"] = round(audio_s / dt, 1)

    # --- transcribe_long: 10 minutes of audio as one padded batch ---
    long_audio = rng.standard_normal(600 * SAMPLE_RATE).astype(np.float32) * 0.02
    bt20 = BatchTranscriber(
        model,
        options=DecodingOptions(language="en", without_timestamps=True,
                                sample_len=64, fp16=True),
        batch_sizes=(20,),
    )
    t0 = time.perf_counter()
    bt20.transcribe_long(long_audio)
    dt = time.perf_counter() - t0
    out["long_600s_wall_s"] = round(dt, 3)
    out["long_600s_rtf"] = round(600 / dt, 1)

    # --- word timestamps end-to-end (Pallas DTW on TPU) ---
    audio = rng.standard_normal(20 * SAMPLE_RATE).astype(np.float32) * 0.02
    t0 = time.perf_counter()
    res = transcribe(model, audio, language="en", fp16=True,
                     word_timestamps=True, temperature=0.0)
    dt_first = time.perf_counter() - t0  # includes alignment compile
    t0 = time.perf_counter()
    res = transcribe(model, audio, language="en", fp16=True,
                     word_timestamps=True, temperature=0.0)
    dt = time.perf_counter() - t0
    n_words = sum(len(s.get("words", [])) for s in res["segments"])
    out["word_ts_20s_wall_s"] = round(dt, 3)
    out["word_ts_20s_first_s"] = round(dt_first, 3)
    out["word_ts_words"] = n_words
    out["word_ts_rtf"] = round(20 / dt, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
