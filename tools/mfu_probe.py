"""Train-step MFU experiment sweep (VERDICT r1 #4): measure remat
policies / dtype choices on the real chip and print a table.

Usage: python tools/mfu_probe.py [model] [batch] [text_len]
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

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import init_params
    from whisper_flamingo_tpu.profiling import mfu, model_flops
    from whisper_flamingo_tpu.training.optim import whisper_optimizer
    from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    text_len = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.standard_normal((batch_size, 80, 3000)), jnp.float32
        ),
        "dec_input_ids": jnp.asarray(
            rng.integers(0, 1000, (batch_size, text_len)), jnp.int32
        ),
        "labels": jnp.asarray(
            rng.integers(0, 1000, (batch_size, text_len)), jnp.int32
        ),
    }
    flops = 3 * model_flops(dims, batch_size, mel_frames=3000, text_len=text_len)

    # decomposition: forward-only, forward+grad, full step
    from whisper_flamingo_tpu.models.whisper import decoder_apply, encoder_apply
    from whisper_flamingo_tpu.training.steps import ce_loss

    def fwd(params, batch):
        feats = encoder_apply(params, dims, batch["input_ids"], dtype=jnp.bfloat16)
        logits, _ = decoder_apply(
            params, dims, batch["dec_input_ids"], feats, dtype=jnp.bfloat16
        )
        return ce_loss(logits, batch["labels"])

    fwd_j = jax.jit(fwd)
    grad_j = jax.jit(jax.value_and_grad(fwd))

    def timeit(fn, *args, iters=10, sync=lambda r: None):
        r = fn(*args)
        sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        sync(r)
        return (time.perf_counter() - t0) / iters

    t_fwd = timeit(fwd_j, params, batch, sync=lambda r: float(r))
    t_grad = timeit(
        grad_j, params, batch, sync=lambda r: float(r[0])
    )
    fwd_flops = model_flops(dims, batch_size, mel_frames=3000, text_len=text_len)
    print(
        f"{'forward only':28s} {t_fwd * 1000:8.1f} ms        "
        f"mfu={mfu(fwd_flops / t_fwd):.3f}"
    )
    print(
        f"{'forward+grad (no remat)':28s} {t_grad * 1000:8.1f} ms        "
        f"mfu={mfu(3 * fwd_flops / t_grad):.3f}"
    )

    variants = [
        ("remat=full (r1 default)", dict(remat=True)),
        ("remat=none", dict(remat=False)),
        ("remat=dots", dict(remat="dots")),
    ]
    import gc

    for name, kw in variants:
        # fresh param buffers per variant: the step donates its state
        params_v = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
        tx, _ = whisper_optimizer(params_v, 1e-5, total_steps=1000)
        step = make_ce_train_step(dims, tx, dtype=jnp.bfloat16, donate=True, **kw)
        state = TrainState.create(params_v, tx)
        try:
            state, m = step(state, batch)
            _ = float(m["loss"])
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
            _ = float(m["loss"])
            dt = (time.perf_counter() - t0) / iters
            print(
                f"{name:28s} {dt * 1000:8.1f} ms/step   mfu={mfu(flops / dt):.3f}"
            )
        except Exception as e:  # e.g. OOM for remat=none on large models
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        # free this variant's buffers before the next one compiles
        state = m = step = tx = params_v = None
        gc.collect()


if __name__ == "__main__":
    main()
