"""Audio-only / prompted Whisper fine-tuning (reference families A and B:
`whisper_ft_librispeech.py`, `whisper_ft_taigi.py`, `whisper_ft_ml-superb.py`,
`whisper_ft_kloka_*`, `whisper_prompt_*`).

Run: python recipes/whisper_ft.py <config.yaml> [key=value ...]

Set ``num_devices`` (data axis) and ``tp_size`` (model axis) for mesh
parallelism — the same compiled step runs sharded via GSPMD.

Prompt mode (``use_prompt: true``): prompt tokens are spliced as
``[sot_prev] + prompt`` with the prompt region label-masked, and the
encoder is frozen (reference `whisper_prompt_librispeech.py:146-162,
202-205`).
"""

from common import (
    build_loader,
    build_model,
    load_config,
    maybe_cast_frozen,
    setup_mesh,
)

from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.optim import encoder_frozen_mask, whisper_optimizer
from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step, make_eval_step
from whisper_flamingo_tpu.training.trainer import Trainer


def main():
    cfg = load_config()
    use_prompt = bool(cfg.extras.get("use_prompt", False))

    model = build_model(cfg, gated=False)
    tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages, language=cfg.lang, task="transcribe")

    train_loader = build_loader(cfg, "train", tokenizer, training=True, prompts=use_prompt)
    val_loader = build_loader(cfg, "validation", tokenizer, training=False, prompts=use_prompt)

    freeze = use_prompt or bool(cfg.freeze_encoder)
    if freeze:
        model.params = maybe_cast_frozen(
            cfg, model.params, encoder_frozen_mask(model.params)
        )
    tx, _ = whisper_optimizer(
        model.params,
        cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        adam_epsilon=cfg.adam_epsilon,
        warmup_steps=cfg.warmup_steps,
        total_steps=cfg.num_train_steps,
        trainable_mask=encoder_frozen_mask(model.params) if freeze else None,
        max_grad_norm=cfg.max_grad_norm,
        accumulate_steps=cfg.gradient_accumulation_steps,
        optimizer=cfg.optimizer,
    )
    step = make_ce_train_step(
        model.dims, tx, freeze_encoder=freeze, dtype=cfg.compute_dtype,
        remat=cfg.remat,
    )
    mesh = setup_mesh(cfg)
    trainer = Trainer(
        cfg=cfg, dims=model.dims, train_step=step,
        eval_step=make_eval_step(model.dims, dtype=cfg.compute_dtype),
        mesh=mesh,
    )
    state = trainer.shard_state(
        trainer.maybe_resume(TrainState.create(model.params, tx))
    )
    trainer.fit(state, train_loader, val_loaders={"val": val_loader})


if __name__ == "__main__":
    main()
