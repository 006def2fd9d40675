"""TransKD at flagship scale on ONE v5e chip: measured step time + HBM
(VERDICT r2 #8; SURVEY §7.3 hard-part 6 — teacher/student co-residency).

Ladder of configurations, likely-to-fit first, each in its OWN subprocess (an
OOM must not fragment the allocator for the next config). Teacher is
always the gated (Flamingo) large-v2 with bf16 frozen masters — init and
cast fused into one jit so the fp32 transient never materializes as a
whole tree; the student's frozen encoder is likewise bf16. Reports per
config: step-time + peak HBM, or the OOM. The reference ran this family
on 4x A6000 = 192 GB (transkd-asr_librispeech.py:203-257).

Run: python tools/transkd_flagship_probe.py            # full ladder
     python tools/transkd_flagship_probe.py <t> <s> <b>  # one config
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LADDER = [
    # likely-fit first (each expected-OOM config still burns its full
    # remote compile before failing).  large+large with fp32 AdamW is a
    # MEASURED compile-time OOM (args 15.49 G + temps 4.83 G = 20.32 G
    # vs 15.75 G HBM); adafactor's factored nu is what fits it.
    ("small", "small", 8, "adamw"),       # the reference's own protocol
    ("large-v2", "medium", 4, "adamw"),
    ("large-v2", "large-v2", 2, "adafactor"),
]


def run_config(teacher_name, student_name, batch, optimizer="adamw", xt_len=64):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import ModelExtras, init_params
    from whisper_flamingo_tpu.training.optim import (
        encoder_frozen_mask,
        whisper_optimizer,
    )
    from whisper_flamingo_tpu.training.steps import (
        TrainState,
        cast_frozen_bf16,
        make_kd_train_step,
    )

    tdims = MODEL_DIMS[teacher_name]
    sdims = MODEL_DIMS[student_name]
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=768)
    dev = jax.local_devices()[0]

    # init + frozen-cast fused in one jit: per-leaf fp32 transients only
    all_frozen = None  # computed inside to keep structures aligned

    @jax.jit
    def make_teacher(k):
        p = init_params(k, tdims, extras)
        return cast_frozen_bf16(p, jax.tree.map(lambda _: False, p))

    teacher = make_teacher(jax.random.PRNGKey(0))
    jax.block_until_ready(teacher)

    @jax.jit
    def make_student(k):
        p = init_params(k, sdims)
        return cast_frozen_bf16(p, encoder_frozen_mask(p))

    student = make_student(jax.random.PRNGKey(1))
    jax.block_until_ready(student)
    frozen_enc = encoder_frozen_mask(student)

    share = tdims.n_audio_state == sdims.n_audio_state
    tx, _ = whisper_optimizer(
        student, 1e-5, total_steps=1000, trainable_mask=frozen_enc,
        optimizer=optimizer,
    )
    step = make_kd_train_step(
        sdims, tx, teacher_dims=tdims,
        freeze_student_encoder=True, share_teacher_features=share,
        dtype=jnp.bfloat16, remat=True,
        donate=True,  # independent student: in-place master/moment update
    )
    rng = np.random.default_rng(0)
    batch_arrays = {
        "input_ids": jnp.asarray(rng.standard_normal((batch, 80, 3000)), jnp.float32),
        "dec_input_ids": jnp.asarray(rng.integers(0, 1000, (batch, 128)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 1000, (batch, 128)), jnp.int32),
        "xt": jnp.asarray(rng.standard_normal((1, batch, xt_len, 768)), jnp.bfloat16),
    }
    state = TrainState.create(student, tx)
    state, m = step(state, teacher, batch_arrays)
    _ = float(m["loss"])  # compile + warm
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        state, m = step(state, teacher, batch_arrays)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters * 1000
    args_gb = sum(
        x.nbytes for x in jax.tree.leaves((state, teacher, batch_arrays))
    ) / 2**30
    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    print(
        f"OK b{batch} opt={optimizer} step={dt:.0f} ms "
        f"resident={args_gb:.2f} GB peak_hbm={peak / 2**30:.2f} GB "
        f"share_feats={share}",
        flush=True,
    )


def main():
    if len(sys.argv) >= 4:
        run_config(
            sys.argv[1], sys.argv[2], int(sys.argv[3]),
            sys.argv[4] if len(sys.argv) > 4 else "adamw",
        )
        return
    for teacher, student, batch, opt in LADDER:
        name = f"teacher={teacher}(gated,bf16) student={student} b{batch} {opt}"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), teacher, student,
                 str(batch), opt],
                capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT (compile+run exceeded 2400 s)")
            continue
        if r.returncode == 0 and "OK" in r.stdout:
            print(f"{name}: {[l for l in r.stdout.splitlines() if 'OK' in l][0]}")
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            err = next(
                (l for l in reversed(tail) if "RESOURCE_EXHAUSTED" in l or "Error" in l),
                tail[-1] if tail else "no output",
            )
            print(f"{name}: FAILED ({err[:160]})")


if __name__ == "__main__":
    main()
