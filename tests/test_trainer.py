"""End-to-end smoke: synthetic data through Trainer.fit with validation,
checkpointing, and resume."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from whisper_flamingo_tpu.config import TrainConfig
from whisper_flamingo_tpu.data.collator import WhisperCollator
from whisper_flamingo_tpu.data.dataset import DataLoader, SpeechDataset, SyntheticAsrSource
from whisper_flamingo_tpu.data.samplers import SortedBatchSampler
from whisper_flamingo_tpu.models.dims import ModelDimensions
from whisper_flamingo_tpu.models.whisper import init_params
from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.optim import whisper_optimizer
from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step, make_eval_step
from whisper_flamingo_tpu.training.trainer import CheckpointManager, Trainer

TINY = ModelDimensions(
    n_mels=80, n_audio_ctx=128, n_audio_state=64, n_audio_head=2,
    n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_head=2,
    n_text_state=64, n_text_layer=1,
)


def _loader(tok, n=4, bs=2):
    ds = SpeechDataset(source=SyntheticAsrSource(n=n, max_sec=2.0), tokenizer=tok)
    return DataLoader(
        ds, SortedBatchSampler(batch_size=bs, shapes=ds.mel_lengths()), WhisperCollator()
    )


def test_trainer_fit_and_resume(tmp_path):
    cfg = TrainConfig(
        train_id="smoke",
        log_output_dir=str(tmp_path / "logs"),
        check_output_dir=str(tmp_path / "ckpt"),
        learning_rate=1e-4,
        num_train_steps=4,
        validate_every_n_batches=2,
        monitor="val/loss",
    )
    tok = get_tokenizer(True, language="en", task="transcribe")
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx, _ = whisper_optimizer(params, cfg.learning_rate, total_steps=cfg.num_train_steps)
    trainer = Trainer(
        cfg=cfg,
        dims=TINY,
        train_step=make_ce_train_step(TINY, tx, dtype=jnp.float32, remat=False, donate=False),
        eval_step=make_eval_step(TINY),
    )
    state = TrainState.create(params, tx)
    state = trainer.fit(
        state,
        _loader(tok),
        val_loaders={"val": _loader(tok, n=2)},
        val_max_batches=1,
        log_every=2,
    )
    assert int(state.step) == 4
    assert os.path.exists(trainer.logger.path)
    ckpts = glob.glob(str(tmp_path / "ckpt" / "smoke" / "step-*"))
    assert ckpts, "no checkpoints written"

    # resume path restores params + step
    cfg2 = TrainConfig(**{**cfg.to_dict(), "resume_training": True})
    trainer2 = Trainer(
        cfg=cfg2, dims=TINY,
        train_step=trainer.train_step, eval_step=trainer.eval_step,
    )
    fresh = TrainState.create(init_params(jax.random.PRNGKey(1), TINY), tx)
    resumed = trainer2.maybe_resume(fresh)
    assert int(resumed.step) > 0
    np.testing.assert_allclose(
        np.asarray(resumed.params["decoder"]["ln"]["scale"]),
        np.asarray(state.params["decoder"]["ln"]["scale"]),
    )
