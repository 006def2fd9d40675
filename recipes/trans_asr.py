"""Trans-ASR: translation-conditioned gated-x-attn fine-tuning (reference
family C: `whisper-flamingo_{amis,seediq,kloka_crawled}.py`,
`trans_asr_{taigi,librispeech}.py`, `trans-asr_{kloka,oracle}.py`,
`trans-ASR_ml-superb.py`, `trilingual.py`).

Run: python recipes/trans_asr.py <config.yaml> [key=value ...]

The Whisper encoder is frozen and only the gated-x-attn parameter group
trains (reference whisper-flamingo_amis.py:159-161, utils.py:498-517);
per-batch translations go through the BERT conditioner into ``xt``
streams. ``oracle: true`` feeds the ground-truth transcript as the
conditioning text (reference trans-asr_oracle.py:118-119).
"""

from common import (
    setup_mesh,
    build_conditioner,
    build_loader,
    build_model,
    load_config,
    make_xt_prepare,
    maybe_cast_frozen,
)

from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.optim import (
    flamingo_trainable_mask,
    whisper_flamingo_optimizer,
)
from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step, make_eval_step
from whisper_flamingo_tpu.training.trainer import Trainer


def main():
    cfg = load_config()
    assert cfg.add_gated_x_attn, "trans_asr requires add_gated_x_attn: 1"

    model = build_model(cfg, gated=True)
    tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages, language=cfg.lang, task="transcribe")
    conditioner = build_conditioner(cfg)

    train_loader = build_loader(cfg, "train", tokenizer, training=True, translations=True)
    val_loader = build_loader(cfg, "validation", tokenizer, training=False, translations=True)

    prepare = make_xt_prepare(conditioner, cfg.num_langs)
    if cfg.extras.get("oracle"):
        base_prepare = prepare

        def prepare(batch):  # oracle: condition on the transcript itself
            batch = dict(batch)
            batch["all_translations"] = [[t] * max(cfg.num_langs, 1) for t in batch["text"]]
            return base_prepare(batch)

    train_xt_projection = bool(cfg.extras.get("train_xt_projection", False))
    model.params = maybe_cast_frozen(
        cfg, model.params,
        flamingo_trainable_mask(model.params, train_xt_projection),
    )
    tx, _ = whisper_flamingo_optimizer(
        model.params,
        cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        adam_epsilon=cfg.adam_epsilon,
        warmup_steps=cfg.warmup_steps,
        total_steps=cfg.num_train_steps,
        train_xt_projection=train_xt_projection,
        max_grad_norm=cfg.max_grad_norm,
        accumulate_steps=cfg.gradient_accumulation_steps,
        optimizer=cfg.optimizer,
    )
    step = make_ce_train_step(
        model.dims, tx, freeze_encoder=True, use_xt=True,
        dtype=cfg.compute_dtype, remat=cfg.remat,
    )
    trainer = Trainer(
        cfg=cfg, dims=model.dims, train_step=step,
        eval_step=make_eval_step(model.dims, use_xt=True, dtype=cfg.compute_dtype),
        prepare_batch=prepare,
        mesh=setup_mesh(cfg),
    )
    state = trainer.shard_state(trainer.maybe_resume(TrainState.create(model.params, tx)))
    trainer.fit(state, train_loader, val_loaders={"val": val_loader})


if __name__ == "__main__":
    main()
