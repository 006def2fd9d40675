"""On-chip throughput A/B: continuous batching vs padded batching.

Traffic model: N requests with per-request output budgets drawn from a
fixed seed (uniform lo..hi tokens) — random-init weights can't control
their own EOT, so per-request ``max_tokens`` caps stand in for real
output-length variance (the mechanism being measured is identical).
EOT is suppressed so caps fully determine lengths.

- padded: BatchTranscriber-style fixed batches of size ``slots`` decode
  sample_len=hi for every row (a padded batch must budget for its
  longest possible row);
- continuous: ContinuousBatcher with the same slots, per-request caps.

Prints seconds-of-audio/sec and tokens/sec for both plus the ratio.
Usage: python tools/cb_ab.py [model] [n_requests] [slots] [pooled]
       # defaults: small 32 8; a 4th arg "pooled" skips the 7 polled
       # variants and runs only padded + pooled (LPT vs arrival-order
       # admission) — the fast r5 A/B of the shipped sort_admission
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

    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.serving import ContinuousBatcher
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    lo, hi = 16, 96

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(480_000).astype(np.float32) * 0.05
             for _ in range(n_req)]
    budgets = rng.integers(lo, hi + 1, n_req).tolist()
    total_tokens = sum(budgets)
    audio_s = n_req * 30.0

    opts = dict(language="en", without_timestamps=True, fp16=True,
                suppress_tokens=f"-1,{eot}")

    # --- padded batching: every batch decodes the max budget ---
    task = DecodingTask(model, DecodingOptions(sample_len=hi, **opts))
    mels = log_mel_spectrogram(
        np.stack([np.asarray(pad_or_trim(w, N_SAMPLES)) for w in waves]),
        n_mels=dims.n_mels,
    )
    task.run(mels[:slots])  # compile
    if n_req % slots:  # warm the tail batch shape too, outside the timing
        task.run(mels[-(n_req % slots):])
    t0 = time.perf_counter()
    for i in range(0, n_req, slots):
        task.run(mels[i : i + slots])
    t_pad = time.perf_counter() - t0

    # --- continuous batching with per-request caps ---
    # symmetric with the padded leg: requests are device-resident mels
    # (the padded leg's mels are device-resident before its timing too),
    # so the A/B measures the batching MECHANISM, not the test harness's
    # tunnel transfer of raw waves (56 ms per 1.9 MB wave here; ~0.2 ms
    # over production PCIe)
    req_mels = [mels[i] for i in range(n_req)]

    print(f"traffic: {n_req} req, budgets {lo}-{hi} (total {total_tokens} tok)")
    print(f"padded     ({slots}/batch, {hi} tok each): {t_pad:6.2f}s "
          f"{audio_s / t_pad:7.1f}x RT  {n_req * hi / t_pad:6.0f} tok/s decoded")
    variants = [
        # (chunk, pipeline, stop_on_finish, drain_chunk)
        (8, False, False, 8),     # r3 sync baseline
        (8, True, False, 8),      # r3 pipelined
        (16, True, False, 16),    # r3 shipped default (fixed chunk)
        (24, True, False, 24),
        (16, True, True, 64),     # r4: stop-on-finish + drain
        (8, True, True, 64),
        (4, True, True, 96),
    ]
    if len(sys.argv) > 4 and sys.argv[4] == "pooled":
        variants = []
    for chunk, pipeline, stop, drain in variants:
        cb = ContinuousBatcher(
            model, options=DecodingOptions(sample_len=hi, **opts),
            slots=slots, chunk=chunk, pipeline=pipeline,
            stop_on_finish=stop, drain_chunk=drain,
        )
        # warmup + a full untimed pass first: exercises every refill
        # bucket, so the timed pass is warm (per-process persistent-cache
        # LOADS of the step program cost ~5 s and would otherwise land
        # mid-leg)
        cb.warmup()
        cb.transcribe_segments(req_mels, max_tokens=budgets)
        t0 = time.perf_counter()
        out = cb.transcribe_segments(req_mels, max_tokens=budgets)
        t_cb = time.perf_counter() - t0
        got_tokens = sum(len(r.tokens) for r in out)
        tag = (f"chunk={chunk:2d} pipe={int(pipeline)} "
               f"stop={int(stop)} drain={drain:2d}")
        print(f"continuous ({tag})       : {t_cb:6.2f}s "
              f"{audio_s / t_cb:7.1f}x RT  {got_tokens / t_cb:6.0f} useful tok/s"
              f"  ({t_pad / t_cb:.2f}x vs padded)")
    # --- r4: device-side refill (run_queued pooled mode) ---
    # one prefill dispatch + ONE compiled program for the whole traffic:
    # slots refill from a device-resident pool inside the decode loop
    cb = ContinuousBatcher(
        model, options=DecodingOptions(sample_len=hi, **opts), slots=slots,
    )
    cb.transcribe_segments(req_mels, max_tokens=budgets, pooled=True)  # warm
    # r5 A/B of the shipped LPT admission: same pooled program, only the
    # host-side admission order differs (3 reps each, best-of — decode
    # timing through the tunnel is noisy)
    for sort, tag in ((True, "LPT admission (default)"),
                      (False, "arrival-order admission")):
        t_cb = float("inf")
        for _ in range(3):
            ids = [cb.submit(m, budgets[i]) for i, m in enumerate(req_mels)]
            t0 = time.perf_counter()
            done = cb.run_queued(sort_admission=sort)
            t_cb = min(t_cb, time.perf_counter() - t0)
        got_tokens = sum(len(r.tokens) for _, r in done)
        print(f"continuous (POOLED, {tag:24s}): {t_cb:6.2f}s "
              f"{audio_s / t_cb:7.1f}x RT  {got_tokens / t_cb:6.0f} useful tok/s"
              f"  ({t_pad / t_cb:.2f}x vs padded)")
    print(f"ideal = {n_req * hi / total_tokens:.2f}x at zero refill/latency "
          f"overhead")


if __name__ == "__main__":
    main()
