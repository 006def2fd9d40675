"""Prompt distillation (reference family E:
`distil-whisper-prompt_{librispeech,taigi}.py`).

Run: python recipes/distil_prompt.py <config.yaml>

Teacher sees ``[sot_prev]+prompt`` token streams, student sees plain
streams; the asymmetric teacher/student padding comes from the unified
collator's teacher_* fields (reference DistilPromptCollator,
utils.py:259-303).
"""

import jax

from common import build_loader, build_model, load_config, setup_mesh

from whisper_flamingo_tpu.data.dataset import SpeechDataset
from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.optim import encoder_frozen_mask, whisper_optimizer
from whisper_flamingo_tpu.training.steps import (
    TrainState,
    make_eval_step,
    make_prompt_kd_train_step,
)
from whisper_flamingo_tpu.training.trainer import Trainer


class PromptTeacherDataset(SpeechDataset):
    """Emit both the prompted (teacher) and plain (student) token streams."""

    def __getitem__(self, idx):
        ex = self.source[idx]
        saved = self.prompt_use
        self.prompt_use = False
        feat = super().__getitem__(idx, ex=ex)  # one source fetch
        self.prompt_use = saved

        prompt = ex.prompt or (ex.translations[0] if ex.translations else "")
        if prompt:
            prompt_tokens = self.tokenizer.encode(" " + prompt.strip())[
                -self.max_prompt_len:
            ]
            prefix = [self.tokenizer.sot_prev] + prompt_tokens
            feat["teacher_dec_input_ids"] = prefix + feat["dec_input_ids"]
            feat["teacher_labels"] = [-100] * len(prefix) + feat["labels"]
        else:
            feat["teacher_dec_input_ids"] = feat["dec_input_ids"]
            feat["teacher_labels"] = feat["labels"]
        return feat


def main():
    cfg = load_config()
    teacher = build_model(cfg, gated=False)
    if cfg.teacher_ckpt:
        from whisper_flamingo_tpu.training.checkpoints import load_torch_checkpoint

        teacher.params, _ = load_torch_checkpoint(cfg.teacher_ckpt, teacher.dims)
    student_params = jax.tree.map(lambda x: x, teacher.params)

    tokenizer = get_tokenizer(teacher.is_multilingual, num_languages=teacher.num_languages, language=cfg.lang, task="transcribe")
    train_loader = build_loader(cfg, "train", tokenizer, training=True)
    train_loader.dataset.__class__ = PromptTeacherDataset
    val_loader = build_loader(cfg, "validation", tokenizer, training=False)

    freeze = bool(cfg.freeze_encoder)
    from common import maybe_cast_frozen

    teacher.params = maybe_cast_frozen(
        cfg, teacher.params, jax.tree.map(lambda _: False, teacher.params)
    )
    if freeze:
        student_params = maybe_cast_frozen(cfg, student_params, encoder_frozen_mask(student_params))
    tx, _ = whisper_optimizer(
        student_params, cfg.learning_rate,
        weight_decay=cfg.weight_decay, adam_epsilon=cfg.adam_epsilon,
        warmup_steps=cfg.warmup_steps, total_steps=cfg.num_train_steps,
        trainable_mask=encoder_frozen_mask(student_params) if freeze else None,
        max_grad_norm=cfg.max_grad_norm,
        accumulate_steps=cfg.gradient_accumulation_steps,
        optimizer=cfg.optimizer,
    )
    kd_step = make_prompt_kd_train_step(
        teacher.dims, tx, alpha=cfg.alpha, beta=cfg.beta,
        temperature=cfg.temperature, freeze_student_encoder=freeze,
        dtype=cfg.compute_dtype, remat=cfg.remat,
    )

    def step(state, batch):
        return kd_step(state, teacher.params, batch)

    trainer = Trainer(
        cfg=cfg, dims=teacher.dims, train_step=step,
        eval_step=make_eval_step(teacher.dims, dtype=cfg.compute_dtype),
        mesh=setup_mesh(cfg),
    )
    state = trainer.shard_state(trainer.maybe_resume(TrainState.create(student_params, tx)))
    trainer.fit(state, train_loader, val_loaders={"val": val_loader})


if __name__ == "__main__":
    main()
