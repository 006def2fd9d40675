"""Audio-visual Whisper-Flamingo training (the upstream "step 2": frozen
audio-FT Whisper + frozen AV-HuBERT video encoder, gated x-attn layers
learn on lip-video features; reference README.md:170-179,
config/audio-visual/av_en-x_*.yaml).

Run: python recipes/av_train.py configs/audio-visual/av_en-x_large.yaml

The manifest must provide a ``video`` field per utterance (path to a .npy
of (T, H, W) grayscale lip crops, 25 fps / max 750 frames) — the MuAViC
preprocessing layout (reference preparation/README.md). Set
``dataset: synthetic_av`` for a smoke run with random video.
"""

import functools
import zlib

import jax
import numpy as np

from common import (
    build_loader,
    build_model,
    load_config,
    maybe_cast_frozen,
    setup_mesh,
)

from whisper_flamingo_tpu.data.dataset import SpeechDataset
from whisper_flamingo_tpu.models.avhubert import (
    VIDEO_ENCODER_CONFIGS,
    init_video_encoder,
    load_avhubert_torch,
)
from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.optim import whisper_flamingo_optimizer
from whisper_flamingo_tpu.training.steps import (
    TrainState,
    make_av_eval_step,
    make_av_train_step,
)
from whisper_flamingo_tpu.training.trainer import Trainer


class VideoSpeechDataset(SpeechDataset):
    """SpeechDataset emitting the lip-video frames alongside the mel;
    with ``emit_fbank`` (avsr trunk configs) also the stacked-fbank
    audio stream, featurized from the SAME processed waveform as the mel
    so babble noise hits both modalities consistently."""

    video_hw: int = 88
    emit_fbank: bool = False
    fbank_dim: int = 104  # sliced for tiny test trunks (debug-av)

    def __getitem__(self, idx):
        ex = self.source[idx]
        self.emit_wav = self.emit_fbank
        feat = super().__getitem__(idx, ex=ex)  # one source fetch
        video = ex.video
        if video is None:  # synthetic: derive deterministic random frames
            # stable digest, NOT hash(): str hashes are salted per process
            rng = np.random.default_rng(zlib.crc32(ex.id.encode()))
            n_frames = max(int(feat["audio_frames"] // 4), 2)  # ~25 fps
            video = rng.standard_normal(
                (n_frames, self.video_hw, self.video_hw)
            ).astype(np.float32)
        elif isinstance(video, str):
            video = np.load(video).astype(np.float32)
        feat["video"] = video
        if self.emit_fbank:
            from whisper_flamingo_tpu.models.avhubert import (
                stacked_fbank_features,
            )

            feat["fbank"] = stacked_fbank_features(feat.pop("wav"))[
                :, : self.fbank_dim
            ]
        return feat


def main():
    cfg = load_config()
    model = build_model(cfg, gated=True)

    vcfg_name = cfg.extras.get("video_encoder", "large" if "large" in cfg.model_name else "base")
    vcfg = VIDEO_ENCODER_CONFIGS[vcfg_name]
    if cfg.video_model_ckpt:
        from whisper_flamingo_tpu.training.checkpoints import (
            torch_load_prefer_safe,
        )

        state = torch_load_prefer_safe(cfg.video_model_ckpt)
        state = state.get("model", state)
        video_params = load_avhubert_torch(state, vcfg)
    else:
        video_params = init_video_encoder(jax.random.PRNGKey(cfg.seed), vcfg)

    tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages, language=cfg.lang, task="transcribe")
    train_loader = build_loader(cfg, "train", tokenizer, training=True)
    val_loader = build_loader(cfg, "validation", tokenizer, training=False)
    for loader in (train_loader, val_loader):  # upgrade to video datasets
        loader.dataset.__class__ = VideoSpeechDataset
        if vcfg.audio_feat_dim is not None:  # avsr trunk: add fbank stream
            loader.dataset.emit_fbank = True
            loader.dataset.fbank_dim = vcfg.audio_feat_dim

    from whisper_flamingo_tpu.training.optim import flamingo_trainable_mask

    model.params = maybe_cast_frozen(
        cfg, model.params, flamingo_trainable_mask(model.params)
    )
    if cfg.freeze_video_model:
        video_params = maybe_cast_frozen(
            cfg, video_params, jax.tree.map(lambda _: False, video_params)
        )
    tx, _ = whisper_flamingo_optimizer(
        model.params, cfg.learning_rate,
        weight_decay=cfg.weight_decay, adam_epsilon=cfg.adam_epsilon,
        warmup_steps=cfg.warmup_steps, total_steps=cfg.num_train_steps,
        max_grad_norm=cfg.max_grad_norm,
        accumulate_steps=cfg.gradient_accumulation_steps,
        optimizer=cfg.optimizer,
    )
    av_step = make_av_train_step(
        model.dims, vcfg, tx,
        prob_av=cfg.prob_av, prob_a=cfg.prob_a,
        freeze_video=bool(cfg.freeze_video_model),
        dtype=cfg.compute_dtype, remat=cfg.remat,
    )

    rng_holder = {"key": jax.random.PRNGKey(cfg.seed)}

    def step(state, batch):
        rng_holder["key"], sub = jax.random.split(rng_holder["key"])
        return av_step(state, video_params, batch, sub)

    trainer = Trainer(
        cfg=cfg, dims=model.dims, train_step=step,
        # validation must exercise the trained AV path (video -> gated
        # x-attn), not an audio-only forward — the monitor selects
        # checkpoints on this loss
        eval_step=functools.partial(
            make_av_eval_step(model.dims, vcfg, dtype=cfg.compute_dtype),
            video_params,
        ),
        mesh=setup_mesh(cfg),
    )
    state = trainer.shard_state(trainer.maybe_resume(TrainState.create(model.params, tx)))
    trainer.fit(state, train_loader, val_loaders={"val": val_loader})


if __name__ == "__main__":
    main()
