"""Training orchestration: loop, validation, checkpointing, resume.

Replaces the reference's PyTorch-Lightning layer (SURVEY.md §1 L4,
`whisper_ft_librispeech.py:104-213,336-391`) with a plain loop around the
compiled train step:

- validate-before-train smoke pass (parity with every reference script's
  ``trainer.validate`` call before ``fit``);
- periodic teacher-forced validation producing loss / token-accuracy /
  WER / CER per split with normalized text (reference
  `whisper_ft_librispeech.py:151-213`);
- Orbax checkpointing: top-k on a monitored metric + ``last`` for resume
  (reference ``ModelCheckpoint`` recipes, `utils.py:519-655`);
- gradient accumulation via ``optax.MultiSteps``
  (`accumulate_grad_batches` parity);
- metrics to JSONL + stdout (wandb/tensorboard were the reference's
  sinks; JSONL is the structured equivalent and wandb attaches if
  importable and configured).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..metrics import token_accuracy, wer_cer
from ..models.dims import ModelDimensions
from ..normalizers import BasicTextNormalizer
from ..tokenizer import get_tokenizer
from .steps import TrainState


class MetricsLogger:
    """JSONL + stdout metric sink (wandb attaches when available)."""

    def __init__(self, log_dir: str, run_id: str, use_wandb: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_id}.metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                if wandb.run is not None:
                    self._wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time(), **{
            k: (float(v) if isinstance(v, (int, float, np.floating, jnp.ndarray, jax.Array)) else v)
            for k, v in metrics.items()
        }}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._fh.close()


class CheckpointManager:
    """Orbax-backed top-k + last checkpointing (reference utils.py:519-655).

    Persists the FULL training state — params, optimizer state (Adam
    moments, schedule/accumulation counters), and step — so a resumed run
    continues bit-identically, matching the reference's Lightning ckpt
    semantics (`whisper_ft_librispeech.py:381-384`, resume restores
    optimizer + scheduler + step). Top-k scores are persisted in
    ``last.meta.json`` so pruning survives restarts.
    """

    def __init__(
        self,
        directory: str,
        monitor: str = "val/loss",
        mode: str = "min",
        save_top_k: int = 3,
    ):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self._ckptr = ocp.StandardCheckpointer()
        self._scores: List[tuple] = []  # (score, path)
        meta = os.path.join(self.directory, "last.meta.json")
        if os.path.exists(meta):  # restart: reload top-k bookkeeping
            with open(meta) as f:
                for score, path in json.load(f).get("scores", []):
                    full = os.path.join(self.directory, path)
                    if os.path.exists(full):
                        self._scores.append((float(score), full))

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    @staticmethod
    def _state_dict(state: TrainState) -> Dict[str, Any]:
        return {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }

    def _write_meta(self, step: int, metrics: Dict[str, float]) -> None:
        with open(os.path.join(self.directory, "last.meta.json"), "w") as f:
            json.dump(
                {
                    "step": step,
                    "metrics": {k: float(v) for k, v in metrics.items()},
                    "scores": [
                        (s, os.path.basename(p)) for s, p in self._scores
                    ],
                },
                f,
            )

    def save(self, state: TrainState, metrics: Dict[str, float], step: int) -> None:
        score = float(metrics.get(self.monitor, np.nan))
        path = os.path.join(self.directory, f"step-{step:08d}")
        last = os.path.join(self.directory, "last")
        full = self._state_dict(state)
        self._ckptr.save(path, full, force=True)
        self._ckptr.save(last, full, force=True)
        self._ckptr.wait_until_finished()  # saves are async; don't race exit
        if not np.isnan(score):
            # re-saving the same step (e.g. val-grid + final) updates in place
            self._scores = [(s, p) for s, p in self._scores if p != path]
            self._scores.append((score, path))
            self._scores.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
            while len(self._scores) > self.save_top_k:
                _, worst = self._scores.pop()
                import shutil

                shutil.rmtree(worst, ignore_errors=True)
        self._write_meta(step, metrics)

    def restore_last(self, template: TrainState) -> Optional[TrainState]:
        """Restore the full TrainState from ``last``.

        ``template`` must be a freshly created state with the same
        optimizer, supplying the pytree structure. Round-1 checkpoints
        stored params only; those restore with a fresh opt_state and a
        warning.
        """
        last = os.path.join(self.directory, "last")
        if not os.path.exists(last):
            return None
        # positively detect the layout from the checkpoint's own metadata
        # instead of catching restore errors: a structure mismatch in a
        # *full-state* checkpoint (e.g. the optimizer config changed
        # between save and resume) must surface loudly, not be mistaken
        # for the legacy layout and silently resumed with a fresh
        # opt_state.
        is_full: Optional[bool] = None
        try:
            tree = self._ckptr.metadata(last).item_metadata.tree
            is_full = {"params", "opt_state", "step"} <= set(tree.keys())
        except Exception:
            pass  # metadata unreadable: fall back to trying full first
        if is_full or is_full is None:
            try:
                full = self._ckptr.restore(last, self._state_dict(template))
                return TrainState(
                    params=full["params"],
                    opt_state=full["opt_state"],
                    step=jnp.asarray(full["step"], jnp.int32),
                )
            except (KeyError, ValueError, TypeError):
                if is_full:
                    raise  # known full-state layout: real restore failure
        # legacy params-only layout: best-effort partial resume
        import warnings

        params = self._ckptr.restore(last, template.params)
        step = 0
        meta = os.path.join(self.directory, "last.meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                step = json.load(f).get("step", 0)
        warnings.warn(
            "checkpoint has params only (pre-full-state layout); "
            "optimizer state and schedule position start fresh"
        )
        return TrainState(
            params=params,
            opt_state=template.opt_state,
            step=jnp.asarray(step, jnp.int32),
        )


@dataclass
class Trainer:
    """Drives a compiled train step over a data iterable."""

    cfg: TrainConfig
    dims: ModelDimensions
    train_step: Callable  # (state, batch) -> (state, metrics)
    eval_step: Callable  # (params, batch) -> (loss, pred_tokens)
    prepare_batch: Optional[Callable] = None  # host hook (e.g. BERT xt)
    mesh: Any = None  # optional (data, model) mesh: batches/params shard
    logger: Optional[MetricsLogger] = None
    checkpoints: Optional[CheckpointManager] = None
    normalizer: Any = field(default_factory=lambda: BasicTextNormalizer(remove_diacritics=True))

    def __post_init__(self):
        use_wandb = bool(self.cfg.extras.get("wandb", False))
        if use_wandb:
            try:  # reference-style wandb run (whisper_ft_librispeech.py:344-360)
                import wandb

                if wandb.run is None:
                    wandb.init(
                        project=self.cfg.train_name,
                        name=self.cfg.train_id,
                        config=self.cfg.to_dict(),
                    )
            except Exception:
                use_wandb = False
        if self.logger is None:
            self.logger = MetricsLogger(
                self.cfg.log_output_dir, self.cfg.train_id, use_wandb=use_wandb
            )
        if self.checkpoints is None:
            self.checkpoints = CheckpointManager(
                os.path.join(self.cfg.check_output_dir, self.cfg.train_id),
                monitor=self.cfg.monitor,
            )
        # match the data pipeline's encoding: English-only (.en) models use
        # the gpt2 vocab with a different EOT id, and large-v3 adds a 100th
        # language that shifts every later special token — decoding
        # validation hyps with the wrong table silently corrupts WER/CER
        multilingual = self.dims.is_multilingual
        self.tokenizer = get_tokenizer(
            multilingual,
            num_languages=self.dims.num_languages if multilingual else 99,
            language=self.cfg.lang if multilingual else None,
            task="transcribe" if multilingual else None,
        )

    # -- validation --------------------------------------------------------

    def _mesh_ctx(self):
        import contextlib

        return jax.set_mesh(self.mesh) if self.mesh is not None else contextlib.nullcontext()

    def validate(
        self, params, loaders: Dict[str, Iterable], max_batches: Optional[int] = None
    ) -> Dict[str, float]:
        """Teacher-forced eval over named splits; returns flat metrics.

        Parity: reference validation_step/epoch
        (`whisper_ft_librispeech.py:151-213`) — loss, post-EOT-masked
        token accuracy, WER/CER over normalized text.
        """
        with self._mesh_ctx():
            return self._validate(params, loaders, max_batches)

    def _validate(
        self, params, loaders: Dict[str, Iterable], max_batches: Optional[int] = None
    ) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for split, loader in loaders.items():
            losses, accs, hyps, refs = [], [], [], []
            for i, batch in enumerate(loader):
                if max_batches is not None and i >= max_batches:
                    break
                if self.prepare_batch is not None:
                    batch = self.prepare_batch(batch)
                loss, preds = self.eval_step(
                    params, _device_batch(batch, self.mesh)
                )
                losses.append(float(loss))
                labels = np.asarray(batch["labels"])
                # drop rows added for mesh-divisibility padding
                preds = np.asarray(preds)[: labels.shape[0]]
                accs.append(
                    token_accuracy(preds, labels, eot=self.tokenizer.eot)
                )
                for row_pred, row_label in zip(preds, labels):
                    mask = row_label != -100
                    hyp_tokens = [
                        int(t) for t in row_pred[mask] if t != self.tokenizer.eot
                    ]
                    ref_tokens = [
                        int(t) for t in row_label[mask] if t != self.tokenizer.eot
                    ]
                    hyps.append(self.normalizer(self.tokenizer.decode(hyp_tokens)))
                    refs.append(self.normalizer(self.tokenizer.decode(ref_tokens)))
            if not losses:
                continue
            if self.cfg.extras.get("print_samples"):
                # reference prints PRED/REF pairs during validation
                # (whisper_ft_librispeech.py:198-202)
                for h, r in list(zip(hyps, refs))[:4]:
                    print(f"[{split}] PRED: {h}\n[{split}]  REF: {r}")
            wer, cer = wer_cer(hyps, refs)
            out[f"{split}/loss"] = float(np.mean(losses))
            out[f"{split}/acc"] = float(np.mean(accs))
            out[f"{split}/wer"] = wer
            out[f"{split}/cer"] = cer
        return out

    # -- training loop -----------------------------------------------------

    def fit(
        self,
        state: TrainState,
        train_loader: Iterable,
        val_loaders: Optional[Dict[str, Iterable]] = None,
        max_steps: Optional[int] = None,
        val_max_batches: Optional[int] = None,
        log_every: int = 50,
    ) -> TrainState:
        with self._mesh_ctx():
            return self._fit(
                state, train_loader, val_loaders, max_steps, val_max_batches,
                log_every,
            )

    def _fit(
        self,
        state: TrainState,
        train_loader: Iterable,
        val_loaders: Optional[Dict[str, Iterable]] = None,
        max_steps: Optional[int] = None,
        val_max_batches: Optional[int] = None,
        log_every: int = 50,
    ) -> TrainState:
        cfg = self.cfg
        max_steps = max_steps or cfg.num_train_steps
        val_every = cfg.validate_every_n_batches

        # validate-before-train smoke pass (reference :385-386)
        if val_loaders:
            metrics = self._validate(state.params, val_loaders, val_max_batches)
            self.logger.log(int(state.step), {"phase": "preval", **metrics})

        t0 = time.time()
        window_tokens = 0
        it = iter(_cycle(train_loader))
        while int(state.step) < max_steps:
            batch = next(it)
            if self.prepare_batch is not None:
                batch = self.prepare_batch(batch)
            window_tokens += int(np.prod(np.shape(batch["dec_input_ids"])))
            state, metrics = self.train_step(
                state, _device_batch(batch, self.mesh)
            )
            step = int(state.step)
            if step % log_every == 0:
                dt = time.time() - t0
                self.logger.log(
                    step,
                    {
                        **{k: float(v) for k, v in metrics.items()},
                        "tokens_per_sec": window_tokens / max(dt, 1e-9),
                    },
                )
                t0, window_tokens = time.time(), 0
            if val_loaders and val_every and step % val_every == 0:
                vmetrics = self._validate(state.params, val_loaders, val_max_batches)
                self.logger.log(step, vmetrics)
                self.checkpoints.save(state, vmetrics, step)

        # final validation + checkpoint (the loop may end off the val grid)
        step = int(state.step)
        final_metrics: Dict[str, float] = {}
        if val_loaders:
            final_metrics = self._validate(state.params, val_loaders, val_max_batches)
            self.logger.log(step, {"phase": "final", **final_metrics})
        self.checkpoints.save(state, final_metrics, step)
        return state

    def shard_state(self, state: TrainState) -> TrainState:
        """Place params/opt state onto the mesh per the TP rules."""
        if self.mesh is None:
            return state
        from ..parallel.mesh import shard_params

        return TrainState(
            params=shard_params(state.params, self.mesh),
            opt_state=jax.device_put(state.opt_state),
            step=state.step,
        )

    def maybe_resume(self, state: TrainState) -> TrainState:
        """Resume from ``last`` if configured (reference :381-384).

        Restores params + optimizer state + step so the continuation is
        bit-identical to an uninterrupted run (Adam moments and the
        linear-decay schedule position carry over)."""
        if not self.cfg.resume_training:
            return state
        restored = self.checkpoints.restore_last(state)
        return state if restored is None else restored


def _device_batch(batch: Dict[str, Any], mesh=None) -> Dict[str, Any]:
    """Drop host-only fields (strings) before feeding the compiled step;
    shard array fields over the data axis when a mesh is active."""
    arrays = {
        k: v
        for k, v in batch.items()
        if not isinstance(v, (list, tuple, str))
    }
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS, batch_axis, shard_batch

        d = mesh.shape[DATA_AXIS]
        lead = next(
            (
                np.shape(v)[batch_axis(k)]
                for k, v in arrays.items()
                if np.ndim(v) > batch_axis(k)
            ),
            0,
        )
        if lead % d != 0:
            # ragged final batch: repeat the last row up to divisibility,
            # but mask the padded rows' labels with -100 so they drop out
            # of every masked-mean loss/metric — the padded batch's loss
            # is then exactly the unpadded batch's loss (no reweighting).
            # The batch axis is per-field (xt's is axis 1, parallel.mesh
            # BATCH_AXES) so every field reaches the same padded B.
            pad = d - lead % d

            def _pad_rows(k, v):
                axis = batch_axis(k)
                if np.ndim(v) > axis and np.shape(v)[axis] == lead:
                    reps = np.repeat(np.take(v, [-1], axis=axis), pad, axis=axis)
                    v = np.concatenate([v, reps], axis=axis)
                    if k in ("labels", "teacher_labels"):
                        v[lead:] = -100
                return v

            arrays = {k: _pad_rows(k, v) for k, v in arrays.items()}
        arrays = shard_batch(arrays, mesh)
    return arrays


def _cycle(loader: Iterable):
    epoch = 0
    while True:
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        for item in loader:
            yield item
        epoch += 1
