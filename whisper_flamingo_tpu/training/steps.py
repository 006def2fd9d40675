"""Compiled training steps: CE fine-tune, gated-x-attn (Flamingo), and
knowledge distillation.

Each builder returns a jitted ``step(state, batch, rng) -> (state,
metrics)`` covering the hot loops of the reference experiment families
(SURVEY.md §2.3):

- family A (audio-only fine-tune, `whisper_ft_librispeech.py:139-149`):
  teacher-forced CE with −100 ignore masking;
- family C (Trans-ASR, `whisper-flamingo_amis.py:176-203`): frozen
  encoder, conditioning streams ``xt``, CE;
- family D (TransKD, `transkd-asr_librispeech.py:278-354`): frozen
  Flamingo teacher + plain student,
  ``loss = α·CE + β·T²·KL(teacher‖student)`` with label masking and
  optional teacher-encoder feature sharing;
- family E (prompt distillation, `distil-whisper-prompt_librispeech.py`):
  asymmetric teacher (prompted) / student (unprompted) token streams.

TPU-first: the whole step (encoder fwd, decoder fwd, loss, backward,
optimizer) is one XLA program; data parallelism and tensor parallelism
come from running the same jit under a Mesh with sharded inputs/params
(GSPMD inserts the gradient psum — no Lightning/NCCL layer).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..models.dims import ModelDimensions
from ..models.whisper import decoder_apply, encoder_apply

LABEL_PAD = -100


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params, tx: optax.GradientTransformation) -> "TrainState":
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def cast_frozen_bf16(params: Any, trainable_mask: Any) -> Any:
    """Store frozen parameters in bf16 (trainable masters stay fp32).

    When the compute dtype is bf16, matmul/conv weights are cast to bf16
    at use anyway (models/whisper.linear), so a bf16 master for frozen
    subtrees is bit-identical in the forward while halving their HBM
    footprint — this is what lets the 2.5B-param gated large-v2 (frozen
    Whisper + trainable gated x-attn, reference README.md:96-101) train
    on one 16 GB v5e chip. Matches the reference's fp16 halving of
    frozen encoders at inference (demo notebook cell 17).

    Leaves consumed at *float32* are exempt and stay fp32, or the cast
    would change numerics: LayerNorm ``scale``/``bias`` (the fp32 LN
    islands read them at full precision) and the token/positional
    embeddings (summed in fp32 before the compute-dtype cast). They are
    a negligible share of the parameter bytes.
    """
    from jax.tree_util import DictKey, tree_map_with_path

    fp32_consumed = {"scale", "bias", "token_embedding", "pos_embedding"}

    def cast(path, train, p):
        if train or p.dtype != jnp.float32:
            return p
        last = path[-1]
        if isinstance(last, DictKey) and last.key in fp32_consumed:
            return p
        return p.astype(jnp.bfloat16)

    return tree_map_with_path(cast, trainable_mask, params)


def ce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over non-ignored positions (torch CrossEntropyLoss
    ignore_index=-100 parity)."""
    mask = labels != LABEL_PAD
    safe_labels = jnp.where(mask, labels, 0)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def kd_kl_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    labels: jax.Array,
    temperature: float,
) -> jax.Array:
    """T^2-scaled KL(teacher ‖ student), masked-mean over label positions.

    Parity: reference `transkd-asr_librispeech.py:322-342`.
    """
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    logp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(p * (logp - s), axis=-1)  # (B, T)
    mask = labels != LABEL_PAD
    return (t * t) * jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask), 1)


def make_ce_train_step(
    dims: ModelDimensions,
    tx: optax.GradientTransformation,
    *,
    freeze_encoder: bool = False,
    use_xt: bool = False,
    dtype=jnp.bfloat16,
    remat=True,  # False | True/'full' | a jax.checkpoint_policies name (e.g. 'dots')
    donate: bool = True,
) -> Callable:
    """CE fine-tune step (families A/B/C). ``use_xt`` enables the gated
    conditioning stream input."""

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        def loss_fn(params):
            feats = encoder_apply(
                params, dims, batch["input_ids"], dtype=dtype, remat=remat
            )
            if freeze_encoder:
                feats = jax.lax.stop_gradient(feats)
            logits, _ = decoder_apply(
                params,
                dims,
                batch["dec_input_ids"],
                feats,
                xt=batch.get("xt") if use_xt else None,
                dtype=dtype,
                remat=remat,
            )
            return ce_loss(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_kd_train_step(
    dims: ModelDimensions,
    tx: optax.GradientTransformation,
    *,
    alpha: float = 0.8,
    beta: float = 1.0,
    temperature: float = 2.0,
    freeze_student_encoder: bool = False,
    share_teacher_features: bool = False,
    teacher_uses_xt: bool = True,
    teacher_dims: ModelDimensions = None,
    dtype=jnp.bfloat16,
    remat=True,  # False | True/'full' | a jax.checkpoint_policies name (e.g. 'dots')
    donate: bool = False,
) -> Callable:
    """TransKD distillation step (family D).

    ``state.params`` is the student; the frozen teacher params are a
    separate argument so the XLA program co-locates both forwards.
    ``share_teacher_features`` reuses the teacher's encoder output for the
    student when the student's encoder is frozen
    (`transkd-asr_librispeech.py:315-320`).

    ``teacher_dims`` allows a LARGER teacher than the student
    (distil-whisper-style cross-size distillation; the KD loss only needs
    a shared vocab). Feature sharing requires same-size encoders.
    """
    teacher_dims = teacher_dims or dims
    if share_teacher_features and teacher_dims.n_audio_state != dims.n_audio_state:
        raise ValueError(
            "share_teacher_features needs matching encoder widths "
            f"(teacher {teacher_dims.n_audio_state} vs student {dims.n_audio_state})"
        )
    if teacher_dims.n_vocab != dims.n_vocab:
        raise ValueError("KD requires a shared vocabulary")

    def step(state: TrainState, teacher_params, batch: Dict[str, jax.Array]):
        teacher_feats = encoder_apply(
            teacher_params, teacher_dims, batch["input_ids"], dtype=dtype, remat=remat
        )
        teacher_logits, _ = decoder_apply(
            teacher_params,
            teacher_dims,
            batch["dec_input_ids"],
            teacher_feats,
            xt=batch.get("xt") if teacher_uses_xt else None,
            dtype=dtype,
            remat=remat,
        )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        def loss_fn(params):
            if share_teacher_features and freeze_student_encoder:
                feats = teacher_feats
            else:
                feats = encoder_apply(
                    params, dims, batch["input_ids"], dtype=dtype, remat=remat
                )
                if freeze_student_encoder:
                    feats = jax.lax.stop_gradient(feats)
            logits, _ = decoder_apply(
                params, dims, batch["dec_input_ids"], feats, dtype=dtype, remat=remat
            )
            ce = ce_loss(logits, batch["labels"])
            kd = kd_kl_loss(logits, teacher_logits, batch["labels"], temperature)
            return alpha * ce + beta * kd, (ce, kd)

        (loss, (ce, kd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "ce": ce, "kd": kd}

    # donation is opt-in: the student state may alias teacher params
    # (student is typically initialized from the teacher), in which case
    # donating the state would invalidate the live teacher buffers. Pass
    # donate=True when the student was created independently — on a
    # 16 GB chip the in-place master/moment update halves the optimizer
    # transient and is what lets the larger student sizes fit.
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_prompt_kd_train_step(
    dims: ModelDimensions,
    tx: optax.GradientTransformation,
    *,
    alpha: float = 0.8,
    beta: float = 1.0,
    temperature: float = 2.0,
    freeze_student_encoder: bool = False,
    dtype=jnp.bfloat16,
    remat=True,  # False | True/'full' | a jax.checkpoint_policies name (e.g. 'dots')
) -> Callable:
    """Prompt-distillation step (family E): teacher consumes the prompted
    token stream, student the unprompted one; the KD loss aligns the
    label region, which is identically laid out in both streams after the
    collator's asymmetric padding (`utils.py:259-303`).

    The teacher's per-position logits are gathered at the positions where
    ``teacher_labels`` is not −100, matching the student's valid region.
    """

    def step(state: TrainState, teacher_params, batch: Dict[str, jax.Array]):
        feats_t = encoder_apply(
            teacher_params, dims, batch["input_ids"], dtype=dtype, remat=remat
        )
        teacher_logits, _ = decoder_apply(
            teacher_params,
            dims,
            batch["teacher_dec_input_ids"],
            feats_t,
            dtype=dtype,
            remat=remat,
        )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        # align teacher logits to the student grid: both valid regions are
        # the (sorted) non-pad label positions; gather teacher valid
        # positions into the student's frame.
        t_valid = batch["teacher_labels"] != LABEL_PAD  # (B, Tt)
        s_valid = batch["labels"] != LABEL_PAD  # (B, Ts)
        t_idx = jnp.argsort(~t_valid, axis=1, stable=True)  # valid first
        s_idx = jnp.argsort(~s_valid, axis=1, stable=True)
        Ts = batch["labels"].shape[1]
        gathered = jnp.take_along_axis(
            teacher_logits, t_idx[:, :Ts, None], axis=1
        )  # teacher logits at its k-th valid position
        aligned = jnp.zeros_like(gathered)
        aligned = _scatter_rows(aligned, s_idx[:, :Ts], gathered)

        def loss_fn(params):
            feats = encoder_apply(
                params, dims, batch["input_ids"], dtype=dtype, remat=remat
            )
            if freeze_student_encoder:
                feats = jax.lax.stop_gradient(feats)
            logits, _ = decoder_apply(
                params, dims, batch["dec_input_ids"], feats, dtype=dtype, remat=remat
            )
            ce = ce_loss(logits, batch["labels"])
            kd = kd_kl_loss(logits, aligned, batch["labels"], temperature)
            return alpha * ce + beta * kd, (ce, kd)

        (loss, (ce, kd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "ce": ce, "kd": kd}

    # no donation: the student state may alias teacher params (student is
    # typically initialized from the teacher), and teacher args are live
    return jax.jit(step)


def _scatter_rows(dest: jax.Array, idx: jax.Array, src: jax.Array) -> jax.Array:
    """dest[b, idx[b, k]] = src[b, k] per batch row."""
    b = jnp.arange(dest.shape[0])[:, None]
    return dest.at[b, idx].set(src)


def _apply_av_encoder(encoder_apply_fn, video_params, video_cfg, batch, dtype):
    """Shared AV-encoder call for the train/eval steps: threads the
    per-row modality masks from the collator (``video_lens``/``fbank_lens``
    of 0 mark rows that lack that stream in a mixed-modality batch) and
    zeroes the fused conditioning for rows with NO modality at all —
    otherwise the zero-padded frontend input still yields conv-bias/LN
    junk that the gated x-attn would attend to."""
    import jax.numpy as _jnp

    vlens = batch.get("video_lens")
    flens = batch.get("fbank_lens")
    use_audio = video_cfg.audio_feat_dim is not None
    vfeats = encoder_apply_fn(
        video_params, video_cfg, video=batch["video"],
        audio=batch.get("fbank") if use_audio else None,
        video_mask=(vlens > 0) if vlens is not None else None,
        audio_mask=(flens > 0) if (use_audio and flens is not None) else None,
        dtype=dtype,
    )
    if vlens is not None:
        has_any = vlens > 0
        if use_audio and flens is not None and "fbank" in batch:
            has_any = has_any | (flens > 0)
        vfeats = vfeats * has_any.astype(vfeats.dtype)[:, None, None]
    return vfeats


def make_av_train_step(
    dims: ModelDimensions,
    video_cfg,
    tx: optax.GradientTransformation,
    *,
    prob_av: float = 0.5,
    prob_a: float = 0.25,
    freeze_video: bool = True,
    dtype=jnp.bfloat16,
    remat=True,  # False | True/'full' | a jax.checkpoint_policies name (e.g. 'dots')
) -> Callable:
    """Audio-visual gated-x-attn training step (upstream Whisper-Flamingo
    step 2: frozen Whisper encoder + frozen AV-HuBERT, only the gated
    x-attn layers learn — reference README.md:178-179, AV configs).

    Video features are computed inside the compiled step; modality
    dropout follows ``prob_av`` (both) / ``prob_a`` (audio only) /
    remainder (video only) — reference model_all encoder contract
    (SURVEY.md §2.4). When the batch carries ``fbank`` (stacked
    log-filterbank at the video rate) and the encoder config has an
    audio trunk, the AV-HuBERT audio stream joins the fusion
    (``--modalities avsr``).
    """
    from ..models.avhubert import avhubert_encoder_apply

    def step(state: TrainState, video_params, batch: Dict[str, jax.Array], rng):
        u = jax.random.uniform(rng, ())
        drop_video = (u >= prob_av) & (u < prob_av + prob_a)
        drop_audio = u >= prob_av + prob_a

        vfeats = _apply_av_encoder(
            avhubert_encoder_apply, video_params, video_cfg, batch, dtype
        )
        if freeze_video:
            vfeats = jax.lax.stop_gradient(vfeats)
        vfeats = jnp.where(drop_video, 0.0, vfeats)

        def loss_fn(params):
            feats = encoder_apply(
                params, dims, batch["input_ids"], dtype=dtype, remat=remat
            )
            feats = jax.lax.stop_gradient(feats)  # frozen Whisper encoder
            feats = jnp.where(drop_audio, 0.0, feats)
            logits, _ = decoder_apply(
                params,
                dims,
                batch["dec_input_ids"],
                feats,
                xt=vfeats[None],  # one conditioning stream: the video
                dtype=dtype,
                remat=remat,
            )
            return ce_loss(logits, batch["labels"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step)


def make_av_eval_step(
    dims: ModelDimensions,
    video_cfg,
    *,
    dtype=jnp.float32,
) -> Callable:
    """Teacher-forced AV eval: the video stream is encoded and fed through
    gated x-attn exactly as in training (no modality dropout at eval) —
    validating an AV model audio-only would score a forward whose trained
    gated layers contribute nothing. Returns (loss, argmax tokens);
    bind ``video_params`` with functools.partial to fit the Trainer's
    ``(params, batch)`` eval interface."""
    from ..models.avhubert import avhubert_encoder_apply

    def step(video_params, params, batch):
        vfeats = _apply_av_encoder(
            avhubert_encoder_apply, video_params, video_cfg, batch, dtype
        )
        feats = encoder_apply(params, dims, batch["input_ids"], dtype=dtype)
        logits, _ = decoder_apply(
            params, dims, batch["dec_input_ids"], feats,
            xt=vfeats[None], dtype=dtype,
        )
        loss = ce_loss(logits, batch["labels"])
        return loss, jnp.argmax(logits, axis=-1)

    return jax.jit(step)


def make_eval_step(
    dims: ModelDimensions,
    *,
    use_xt: bool = False,
    dtype=jnp.float32,
) -> Callable:
    """Teacher-forced eval: returns (loss, argmax tokens) — the
    reference's validation recipe (`whisper_ft_librispeech.py:151-213`)."""

    def step(params, batch):
        feats = encoder_apply(params, dims, batch["input_ids"], dtype=dtype)
        logits, _ = decoder_apply(
            params,
            dims,
            batch["dec_input_ids"],
            feats,
            xt=batch.get("xt") if use_xt else None,
            dtype=dtype,
        )
        loss = ce_loss(logits, batch["labels"])
        return loss, jnp.argmax(logits, axis=-1)

    return jax.jit(step)
