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


def test_resume_is_bit_identical(tmp_path):
    """A save/restore/continue run must match an uninterrupted run
    bit-for-bit: Adam moments, the warmup-schedule position, and the
    MultiSteps accumulation counter all live in the checkpoint
    (reference Lightning resume semantics, utils.py:519-655 +
    whisper_ft_librispeech.py:381-384)."""
    import jax.numpy as jnp

    from whisper_flamingo_tpu.training.steps import make_ce_train_step

    tok = get_tokenizer(True, language="en", task="transcribe")
    params = init_params(jax.random.PRNGKey(0), TINY)
    # warmup + accumulation make schedule position and mini_step matter
    tx, _ = whisper_optimizer(
        params, 1e-3, warmup_steps=3, total_steps=8, accumulate_steps=2
    )
    step_fn = make_ce_train_step(TINY, tx, dtype=jnp.float32, remat=False, donate=False)
    batches = [b for b in _loader(tok, n=8, bs=2)]
    assert len(batches) >= 4

    def drop_host(b):
        return {k: v for k, v in b.items() if not isinstance(v, (list, tuple, str))}

    # uninterrupted: 4 steps
    state_a = TrainState.create(params, tx)
    for b in batches[:4]:
        state_a, _ = step_fn(state_a, drop_host(b))

    # interrupted: 2 steps -> save -> restore into a fresh state -> 2 steps
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="val/loss")
    state_b = TrainState.create(params, tx)
    for b in batches[:2]:
        state_b, _ = step_fn(state_b, drop_host(b))
    mgr.save(state_b, {"val/loss": 1.0}, int(state_b.step))

    fresh = TrainState.create(init_params(jax.random.PRNGKey(7), TINY), tx)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), monitor="val/loss")
    state_c = mgr2.restore_last(fresh)
    assert state_c is not None
    assert int(state_c.step) == int(state_b.step)
    assert mgr2._scores, "top-k scores must survive a manager restart"
    for b in batches[2:4]:
        state_c, _ = step_fn(state_c, drop_host(b))

    flat_a = jax.tree_util.tree_leaves_with_path(state_a.params)
    flat_c = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(state_c.params)
    )
    for path, leaf_a in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(flat_c[key]), err_msg=key
        )
    # optimizer state (incl. Adam moments + counters) must also match
    for (pa, la), (pc, lc) in zip(
        jax.tree_util.tree_leaves_with_path(state_a.opt_state),
        jax.tree_util.tree_leaves_with_path(state_c.opt_state),
    ):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lc), err_msg=jax.tree_util.keystr(pa)
        )


def test_restore_full_state_mismatch_raises(tmp_path):
    """A FULL-state checkpoint restored against a template whose optimizer
    structure changed (e.g. accumulation turned on) must raise, not be
    silently mistaken for the legacy params-only layout and resumed with
    a fresh opt_state."""
    import pytest

    params = init_params(jax.random.PRNGKey(0), TINY)
    tx, _ = whisper_optimizer(params, 1e-3, total_steps=4)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), monitor="val/loss")
    mgr.save(state, {"val/loss": 1.0}, 0)

    tx2, _ = whisper_optimizer(
        params, 1e-3, total_steps=4, accumulate_steps=4
    )  # MultiSteps wraps the opt_state: different pytree structure
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), monitor="val/loss")
    with pytest.raises(Exception):
        mgr2.restore_last(TrainState.create(params, tx2))


def test_remat_spec_validation():
    """An unknown remat spec (e.g. yaml `remat=false` arriving as the
    string "false") fails with a ValueError naming the accepted values,
    not an AttributeError mid-trace."""
    import pytest

    from whisper_flamingo_tpu.models.whisper import _remat_wrap

    with pytest.raises(ValueError, match="remat spec"):
        _remat_wrap(lambda x, y: (x, y), "false")
    # accepted forms still work
    assert _remat_wrap(lambda x, y: (x, y), "none")
    assert _remat_wrap(lambda x, y: (x, y), "full")
    assert _remat_wrap(lambda x, y: (x, y), "dots")


def test_trainer_tokenizer_matches_model_vocab(tmp_path):
    """English-only (.en) dims must give the Trainer the gpt2 tokenizer
    (eot 50256), multilingual dims the multilingual one (eot 50257) —
    validation decodes hyps/refs with the trainer's tokenizer, so a
    mismatch silently corrupts WER/CER (regression: it was hardcoded
    multilingual)."""
    import dataclasses

    en_dims = dataclasses.replace(TINY, n_vocab=51864)
    v3_dims = dataclasses.replace(TINY, n_vocab=51866)  # large-v3: +<|yue|>

    def make(dims):
        cfg = TrainConfig(
            train_id="tok", lang="en", monitor="val/loss",
            check_output_dir=str(tmp_path), log_output_dir=str(tmp_path),
        )
        return Trainer(
            cfg=cfg, dims=dims, train_step=None, eval_step=None
        ).tokenizer  # built in __post_init__

    assert make(en_dims).eot == 50256  # gpt2 vocab
    assert make(TINY).eot == 50257  # multilingual vocab
    # large-v3 adds a 100th language; every later special token shifts by
    # one — the trainer must thread num_languages or timestamp_begin is
    # off by one and timestamp tokens leak into decoded validation text
    assert make(v3_dims).num_languages == 100
    assert make(v3_dims).timestamp_begin == make(TINY).timestamp_begin + 1
