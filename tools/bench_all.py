"""Extended benchmark sweep (documentation / round tracking; the driver's
headline metric remains bench.py). Prints one JSON object with greedy,
beam-15, and large-v2 decode RTF plus the small train-step time."""

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
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.training.optim import whisper_optimizer
    from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step

    out = {}
    rng = np.random.default_rng(0)
    mel = None

    def decode_rtf(model_name, beam, iters=8):
        nonlocal mel
        dims = MODEL_DIMS[model_name]
        params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
        mel = jnp.asarray(rng.standard_normal((8, 80, 3000)) * 0.05, jnp.float32)
        task = DecodingTask(model, DecodingOptions(
            language="en", without_timestamps=True, sample_len=64,
            beam_size=beam, fp16=True))
        task.run(mel)
        t0 = time.perf_counter()
        for _ in range(iters):
            task.run(mel)
        dt = (time.perf_counter() - t0) / iters
        return round(8 * 30 / dt, 1)

    out["greedy_small_b8_rtf"] = decode_rtf("small", None)
    out["beam15_small_b8_rtf"] = decode_rtf("small", 15, iters=4)
    out["greedy_large_v2_b8_rtf"] = decode_rtf("large-v2", None, iters=4)
    # The published protocol on the flagship model (VERDICT r1 #9;
    # reference README.md:96-101,113-117 + decode wrapper :40-44).
    out["beam15_large_v2_b8_rtf"] = decode_rtf("large-v2", 15, iters=3)

    dims = MODEL_DIMS["small"]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    tx, _ = whisper_optimizer(params, 1e-5, total_steps=1000)
    step = make_ce_train_step(dims, tx, dtype=jnp.bfloat16, donate=False)
    batch = {
        "input_ids": jnp.asarray(rng.standard_normal((8, 80, 3000)), jnp.float32),
        "dec_input_ids": jnp.asarray(rng.integers(0, 1000, (8, 128)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 1000, (8, 128)), jnp.int32),
    }
    state = TrainState.create(params, tx)
    state, m = step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, batch)
    _ = float(m["loss"])
    out["train_step_small_b8_ms"] = round((time.perf_counter() - t0) / 10 * 1000, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
