"""Optimizers and schedules (optax).

Parity with reference `/root/reference/utils.py:474-517`:

- :func:`whisper_optimizer` — AdamW with the no-decay split (biases and
  LayerNorm scales get weight_decay=0, everything else — including the
  positional embedding and the tanh gates, as in the reference's
  name-substring filter — gets ``cfg.weight_decay``) and a linear
  warmup -> linear decay schedule (transformers
  ``get_linear_schedule_with_warmup``).
- :func:`whisper_flamingo_optimizer` — trains ONLY the gated-x-attn
  parameter group (torch name filter ``["gated_x_attn", "attn_gate",
  "ff"]`` == everything under the decoder blocks' ``gated`` subtree);
  all other parameters are frozen via ``optax.set_to_zero``. The
  reference leaves ``xt_projection`` out of this filter (untrained when
  bert_dim != n_state); pass ``train_xt_projection=True`` to include it.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int):
    """0 -> lr over warmup, then linearly to 0 at total_steps."""
    warmup = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    decay = optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))
    return optax.join_schedules([warmup, decay], [warmup_steps])


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def no_decay_mask(params) -> Any:
    """True where weight decay applies (parity: utils.py:475 ``no_decay =
    ["bias", "LayerNorm.weight"]`` — i.e. decay everywhere except biases
    and LN parameters)."""

    def decayable(path, leaf) -> bool:
        p = _path_str(path)
        leaf_name = p.rsplit("/", 1)[-1]
        if leaf_name == "b" or leaf_name == "bias":
            return False
        if leaf_name == "scale":  # LayerNorm weight
            return False
        return True

    return jax.tree_util.tree_map_with_path(decayable, params)


def flamingo_trainable_mask(params, train_xt_projection: bool = False) -> Any:
    """True for the gated-x-attn parameter group (utils.py:498-517)."""

    def trainable(path, leaf) -> bool:
        p = _path_str(path)
        if "/gated/" in p or p.endswith("/gated"):
            return True
        if train_xt_projection and "xt_projection" in p:
            return True
        return False

    return jax.tree_util.tree_map_with_path(trainable, params)


def encoder_frozen_mask(params) -> Any:
    """True for everything except the encoder subtree (freeze_encoder)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _path_str(path).startswith("encoder"), params
    )


def _masked_freeze(tx: optax.GradientTransformation, trainable_mask) -> optax.GradientTransformation:
    """Zero updates for frozen parameters."""
    def label(params):
        return jax.tree.map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label
    )


def _scheduled_decay(schedule, weight_decay: float, decay_mask):
    """Decoupled weight decay scaled by the lr schedule (AdamW semantics:
    ``update -= schedule(step) * wd * param``), applied after an inner
    transform whose output updates are already lr-scaled descent steps."""
    import jax.numpy as jnp

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scheduled decay requires params")
        lr = schedule(state.count)
        updates = jax.tree.map(
            # non-array leaves (optax MaskedNode under a frozen subtree's
            # multi_transform) pass through untouched; is_leaf stops
            # descent into the MaskedNode namedtuple container
            lambda u, p, m: u - lr * weight_decay * p
            if (m and isinstance(u, jax.Array))
            else u,
            updates, params, decay_mask,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode),
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def _build_inner_tx(schedule, optimizer, weight_decay, adam_epsilon, decay_mask):
    """Inner update rule shared by both optimizer builders.

    ``decay_mask``: pytree of bools (True = decay) or None for uniform
    decay (the flamingo single-param-group case, utils.py:498-517)."""
    if optimizer == "adafactor":
        if adam_epsilon != 1e-8:
            import warnings

            warnings.warn(
                f"adam_epsilon={adam_epsilon} has no effect with "
                "optimizer='adafactor' (Adafactor has its own eps pair)",
                stacklevel=3,
            )
        # NOT optax.adafactor's weight_decay_rate: optax applies that as a
        # flat per-step fraction AFTER the lr scaling (1%/step at the
        # default 0.01 — weights would collapse even during warmup).
        # _scheduled_decay reproduces AdamW's decoupled semantics:
        # update -= schedule(step) * wd * param.
        tx = optax.adafactor(
            schedule,
            multiply_by_parameter_scale=False,
            momentum=None,
        )
        if weight_decay:
            tx = optax.chain(
                tx, _scheduled_decay(schedule, weight_decay, decay_mask)
            )
        return tx
    if optimizer == "adamw":
        return optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=adam_epsilon,
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    raise ValueError(f"unknown optimizer {optimizer!r} (adamw|adafactor)")


def whisper_optimizer(
    params,
    learning_rate: float,
    *,
    weight_decay: float = 0.01,
    adam_epsilon: float = 1e-8,
    warmup_steps: int = 0,
    total_steps: int = 100_000,
    trainable_mask=None,
    max_grad_norm: float | None = None,
    accumulate_steps: int = 1,
    optimizer: str = "adamw",
):
    """AdamW + linear warmup/decay, with the reference's no-decay split.

    ``trainable_mask`` optionally freezes subtrees (e.g. the encoder);
    ``accumulate_steps`` wraps the update in optax.MultiSteps.
    ``max_grad_norm`` is off by default for parity — the reference never
    enables Lightning's ``gradient_clip_val`` (commented-out TODO only,
    old_stuff/sequential_flamingo.py:515) — and because the global-norm
    barrier measures 4.5 ms/step on chip (tools/opt_probe.py).

    ``optimizer="adafactor"`` swaps the inner AdamW for Adafactor with
    factored second moments and no momentum — optimizer state shrinks
    from 8 bytes/param to ~0.01, which is what lets the flagship
    teacher+student KD pair (2x gated large-v2) co-reside on one 16 GB
    v5e chip (fp32 Adam moments alone exceed HBM there; see
    docs/performance.md).  The reference has no equivalent knob — it
    rented 4x48 GB GPUs instead (transkd-asr_librispeech.py:203-257).
    """
    schedule = linear_warmup_schedule(learning_rate, warmup_steps, total_steps)
    tx = _build_inner_tx(
        schedule, optimizer, weight_decay, adam_epsilon, no_decay_mask(params)
    )
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if trainable_mask is not None:
        tx = _masked_freeze(tx, trainable_mask)
    if accumulate_steps > 1:
        # gradient accumulation (reference accumulate_grad_batches)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx, schedule


def whisper_flamingo_optimizer(
    params,
    learning_rate: float,
    *,
    weight_decay: float = 0.01,
    adam_epsilon: float = 1e-8,
    warmup_steps: int = 0,
    total_steps: int = 100_000,
    train_xt_projection: bool = False,
    max_grad_norm: float | None = None,
    accumulate_steps: int = 1,
    optimizer: str = "adamw",
):
    """Gated-x-attn-only AdamW (parity: utils.py:498-517 — single param
    group, weight_decay applied uniformly there). ``optimizer`` accepts
    the same ``adamw``/``adafactor`` choice as :func:`whisper_optimizer`
    (the memory-bound gated large-v2 case is exactly where Adafactor
    matters)."""
    schedule = linear_warmup_schedule(learning_rate, warmup_steps, total_steps)
    # uniform decay mask: the reference puts every flamingo param in one
    # group (utils.py:498-517); adafactor's decoupled decay needs it
    # explicit, adamw(mask=None) means the same thing
    uniform = jax.tree.map(lambda _: True, params)
    tx = _build_inner_tx(
        schedule, optimizer, weight_decay, adam_epsilon,
        uniform if optimizer == "adafactor" else None,
    )
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    tx = _masked_freeze(tx, flamingo_trainable_mask(params, train_xt_projection))
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx, schedule
