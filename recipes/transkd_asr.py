"""TransKD-ASR knowledge distillation (reference family D:
`transkd-asr_{librispeech,oracle,kloka_crawled}.py`,
`transKD-ASR_ml-superb.py`, `transkd_asr_taigi*.py`).

Run: python recipes/transkd_asr.py <config.yaml> [key=value ...]

Teacher = frozen translation-conditioned Flamingo (loaded from
``teacher_ckpt``); student = plain audio-only Whisper initialized from
the teacher (encoder strict, decoder minus gated weights — reference
transkd-asr_librispeech.py:611-623). Loss = alpha*CE + beta*T^2*KL with
label masking; optional frozen student encoder + teacher feature sharing.
"""

import jax

from common import (
    setup_mesh,
    build_conditioner,
    build_loader,
    build_model,
    load_config,
    make_xt_prepare,
    maybe_cast_frozen,
)

from whisper_flamingo_tpu.models.whisper import ModelExtras, init_params
from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.optim import encoder_frozen_mask, whisper_optimizer
from whisper_flamingo_tpu.training.steps import TrainState, make_eval_step, make_kd_train_step
from whisper_flamingo_tpu.training.trainer import Trainer


def init_student_from_teacher(teacher_params, student_params):
    """Copy everything except gated-x-attn weights (strict encoder /
    strict=False decoder semantics, reference :611-623).

    True copies (not aliases): the student state must own its buffers so
    the KD train step can donate it (in-place master/moment updates —
    required headroom for medium/large students on one 16 GB chip)
    without invalidating the live teacher tree."""
    import jax.numpy as jnp

    def copy(t):
        return jax.tree.map(lambda x: jnp.asarray(x).copy(), t)

    student = jax.tree.map(lambda x: x, student_params)
    student["encoder"] = copy(teacher_params["encoder"])
    t_dec = teacher_params["decoder"]
    s_dec = student["decoder"]
    for key in ("token_embedding", "pos_embedding", "ln"):
        s_dec[key] = copy(t_dec[key])
    for key in s_dec["blocks"]:
        if key != "gated":
            s_dec["blocks"][key] = copy(t_dec["blocks"][key])
    return student


def main():
    cfg = load_config()
    teacher = build_model(cfg, gated=True)
    if cfg.teacher_ckpt:
        from whisper_flamingo_tpu.training.checkpoints import load_torch_checkpoint

        teacher.params, _ = load_torch_checkpoint(
            cfg.teacher_ckpt, teacher.dims, teacher.extras
        )

    student_params = init_student_from_teacher(
        teacher.params,
        init_params(jax.random.PRNGKey(cfg.seed), teacher.dims, ModelExtras()),
    )

    tokenizer = get_tokenizer(teacher.is_multilingual, num_languages=teacher.num_languages, language=cfg.lang, task="transcribe")
    conditioner = build_conditioner(cfg)
    train_loader = build_loader(cfg, "train", tokenizer, training=True, translations=True)
    val_loader = build_loader(cfg, "validation", tokenizer, training=False, translations=True)

    freeze = bool(cfg.freeze_encoder)
    # the teacher is entirely frozen; the student's encoder optionally so
    teacher.params = maybe_cast_frozen(
        cfg, teacher.params, jax.tree.map(lambda _: False, teacher.params)
    )
    if freeze:
        student_params = maybe_cast_frozen(
            cfg, student_params, encoder_frozen_mask(student_params)
        )
    tx, _ = whisper_optimizer(
        student_params,
        cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        adam_epsilon=cfg.adam_epsilon,
        warmup_steps=cfg.warmup_steps,
        total_steps=cfg.num_train_steps,
        trainable_mask=encoder_frozen_mask(student_params) if freeze else None,
        max_grad_norm=cfg.max_grad_norm,
        accumulate_steps=cfg.gradient_accumulation_steps,
        optimizer=cfg.optimizer,
    )
    kd_step = make_kd_train_step(
        teacher.dims, tx,
        alpha=cfg.alpha, beta=cfg.beta, temperature=cfg.temperature,
        freeze_student_encoder=freeze,
        share_teacher_features=freeze,
        dtype=cfg.compute_dtype, remat=cfg.remat,
        # safe: init_student_from_teacher makes true copies, so the
        # student state owns its buffers (no teacher aliasing)
        donate=True,
    )
    prepare = make_xt_prepare(conditioner, cfg.num_langs)

    def step(state, batch):
        return kd_step(state, teacher.params, batch)

    trainer = Trainer(
        cfg=cfg, dims=teacher.dims, train_step=step,
        eval_step=make_eval_step(teacher.dims, dtype=cfg.compute_dtype),
        prepare_batch=prepare,
        mesh=setup_mesh(cfg),
    )
    state = trainer.shard_state(trainer.maybe_resume(TrainState.create(student_params, tx)))
    trainer.fit(state, train_loader, val_loaders={"val": val_loader})


if __name__ == "__main__":
    main()
