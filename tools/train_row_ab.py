"""Same-session A/B of the bench train row (VERDICT r4 weak #6).

BENCH_r04 recorded 163.8 ms/step (MFU 0.320) for the small/b8 CE step
while the r3-session docs claim 157.8 ms (0.332); CLAUDE.md says train
steps are ±1% stable, so a −4% drift needs a same-session check that the
two r3 levers — the flash64 self-attention kernel and the no-clip
optimizer default — are actually engaged in the bench path, and a fresh
number for whichever doc is stale.

Runs the bench's exact `_train_bench` configuration three ways, each in
its own subprocess (the flash64 toggle is an env var read at trace time,
and compiled-program builders are process-cached):

  default    flash64 + no-clip (the bench path as shipped)
  noflash64  WF_DISABLE_FLASH64=1 -> library flash kernel
  clip       max_grad_norm=1.0 (the optax global-norm barrier)

Usage: python tools/train_row_ab.py [model] [iters]
       (child mode: --child <variant> <model> <iters>)
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = ("default", "noflash64", "clip")


def child(variant: str, model_name: str, iters: int) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import init_params
    from whisper_flamingo_tpu.profiling import mfu, model_flops
    from whisper_flamingo_tpu.training.optim import whisper_optimizer
    from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    batch_size, text_len = 8, 128
    max_grad_norm = 1.0 if variant == "clip" else None
    tx, _ = whisper_optimizer(
        params, 1e-5, total_steps=1000, max_grad_norm=max_grad_norm
    )
    step = make_ce_train_step(dims, tx, dtype=jnp.bfloat16, donate=False)
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
    state = TrainState.create(params, tx)
    state, m = step(state, batch)
    _ = float(m["loss"])  # sync warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    _ = float(m["loss"])  # host fetch forces completion of the chain
    dt = (time.perf_counter() - t0) / iters
    flops = 3 * model_flops(dims, batch_size, mel_frames=3000, text_len=text_len)
    print(f"RESULT {variant} {dt*1000:.1f} ms/step mfu={mfu(flops/dt, 'v5e'):.3f}",
          flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    here = os.path.abspath(__file__)
    rows = []
    for variant in VARIANTS:
        env = dict(os.environ)
        if variant == "noflash64":
            env["WF_DISABLE_FLASH64"] = "1"
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, here, "--child", variant, model_name, str(iters)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        out = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
        if proc.returncode != 0 or not out:
            print(f"{variant}: FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}")
            continue
        print(f"{out[0]}  (wall {time.perf_counter()-t0:.0f}s incl. init/compile)")
        rows.append(out[0])
    print()
    print(f"train_row_ab: {model_name} b8 text128, {iters} iters/variant, "
          "one session, shared compile cache")


if __name__ == "__main__":
    main()
