"""AV-HuBERT-style video encoder and the audio-visual model wrapper.

The reference consumed AV-HuBERT through an external fairseq checkout
(`/root/reference/README.md:47-59,130-154`); only the *contract* survives
in its tree (SURVEY.md §2.4): encoder args ``video, video_model_path,
av_hubert_path, prob_av, prob_a, av_hubert_encoder, av_fusion`` and
``forward(x, x_v, test_a, test_v)`` (`whisper/model_all.py:303-331`),
video features as the second gated-x-attn stream (``av_fusion:
"separate"``), modality dropout (``prob_use_av / prob_av / prob_a``,
`config/audio-visual/av_en-x_large.yaml:25-45`), and the 750-frame /
30 s video window (`whisper/audio.py:19`).

This module provides the TPU-native equivalent:

- :func:`video_encoder_apply` — visual ResNet frontend (models/visual.py)
  + conv-positional-embedding transformer (the AV-HuBERT encoder shape:
  proj 512->D, grouped conv posemb k=128/g=16, pre-LN blocks), as pure
  functions over a param pytree with an import mapping for fairseq
  ``encoder.*`` keys;
- :class:`AVWhisper` — bundles a Whisper with the video encoder; video
  features are routed into the decoder's gated cross-attention stream,
  with ``test_a`` / ``test_v`` modality masks and train-time modality
  dropout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import qkv_attention
from .dims import ModelDimensions
from .visual import init_visual_frontend, visual_frontend_apply
from .whisper import (
    Params,
    Whisper,
    layer_norm,
    linear,
    mlp_block,
)


@dataclass(frozen=True)
class VideoEncoderConfig:
    """AV-HuBERT encoder shape. large_noise_pt_noise_ft_433h: 24 layers,
    1024 dim, 16 heads; base: 12 layers, 768 dim, 12 heads.

    ``audio_feat_dim`` enables the AV-HuBERT *audio* trunk (the
    ``--modalities avsr`` contract, reference README.md:130-154): stacked
    log-filterbank features (26 mels x 4-frame stack = 104 at 25 fps)
    projected to the embed dim and fused with the video stream before the
    transformer — ``modality_fuse="concat"`` (the released checkpoints'
    setting: concat to 2D, LayerNorm(2D), Linear(2D -> D)) or ``"add"``.
    ``None`` (the default) is the video-only trunk: a video-only export
    has no ``feature_extractor_audio``/fuse keys, and routing its
    features through a random fuse LN + 2D->D Linear would silently
    destroy them — use the ``*-avsr`` configs for avsr checkpoints.
    """

    embed_dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    ffn_dim: int = 4096
    conv_pos: int = 128
    conv_pos_groups: int = 16
    frontend_dim: int = 512
    layer_norm_first: bool = True
    audio_feat_dim: Optional[int] = None
    modality_fuse: str = "concat"

    @property
    def fused_dim(self) -> int:
        if self.audio_feat_dim is None or self.modality_fuse == "add":
            return self.embed_dim
        return 2 * self.embed_dim


VIDEO_ENCODER_CONFIGS = {
    # video-only trunks (upstream's --modalities vsr checkpoints)
    "large": VideoEncoderConfig(),
    "base": VideoEncoderConfig(embed_dim=768, n_layers=12, n_heads=12, ffn_dim=3072,
                               layer_norm_first=False),
    # audio+video trunks (--modalities avsr, e.g. large_noise_pt_noise_ft_433h)
    "large-avsr": VideoEncoderConfig(audio_feat_dim=104),
    "base-avsr": VideoEncoderConfig(embed_dim=768, n_layers=12, n_heads=12,
                                    ffn_dim=3072, layer_norm_first=False,
                                    audio_feat_dim=104),
    "debug": VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2, ffn_dim=128,
                                conv_pos=8, conv_pos_groups=2),
    # tiny audio+video trunk for tests
    "debug-av": VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2, ffn_dim=128,
                                   conv_pos=8, conv_pos_groups=2, audio_feat_dim=8),
}


def _conv_pos_embed(p: Params, x: jax.Array, cfg: VideoEncoderConfig) -> jax.Array:
    """Grouped temporal conv positional embedding (wav2vec2/AV-HuBERT style)."""
    k = cfg.conv_pos
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [(pad, pad)],
        feature_group_count=cfg.conv_pos_groups,
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["b"].astype(x.dtype)
    if k % 2 == 0:
        out = out[:, :-1]
    return jax.nn.gelu(out, approximate=False)


def avhubert_encoder_apply(
    params: Params,
    cfg: VideoEncoderConfig,
    video: Optional[jax.Array] = None,
    audio: Optional[jax.Array] = None,
    *,
    video_mask: Optional[jax.Array] = None,
    audio_mask: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """AV-HuBERT encoder over either or both modalities.

    ``video``: (B, T, H, W) lip crops; ``audio``: (B, T, audio_feat_dim)
    stacked log-filterbank features at the 25 fps video rate (see
    :func:`stacked_fbank_features`). A missing modality contributes
    zeros, matching AV-HuBERT's modality-dropout/inference semantics
    (``--modalities vsr/asr/avsr``, reference README.md:130-154): the
    fused feature is cat([audio, video]) -> LayerNorm(2D) ->
    Linear(2D -> D) for ``modality_fuse="concat"``.

    ``video_mask``/``audio_mask``: optional (B,) bools for mixed-modality
    batches — False rows have that stream's features zeroed BEFORE
    fusion (the same point AV-HuBERT's own modality dropout zeroes: the
    frontend's conv-bias/LN output for an all-zero padded input is NOT
    zero, so masking the input alone would condition the decoder on
    bias-derived junk).
    Returns (B, T, embed_dim)."""
    if video is None and audio is None:
        raise ValueError("at least one of video/audio must be given")

    def _mask_rows(feat, mask):
        if mask is None:
            return feat
        return feat * mask.astype(feat.dtype)[:, None, None]

    vfeat = None
    if video is not None:
        feats = visual_frontend_apply(params["frontend"], video, dtype=dtype)
        vfeat = _mask_rows(linear(params["proj"], feats.astype(dtype)), video_mask)

    if cfg.audio_feat_dim is None:
        if vfeat is None:
            raise ValueError("video-only trunk (audio_feat_dim=None) needs video")
        x = vfeat
    else:
        afeat = None
        if audio is not None:
            afeat = _mask_rows(
                linear(params["proj_audio"], audio.astype(dtype)), audio_mask
            )
        if vfeat is None:
            vfeat = jnp.zeros_like(afeat)
        if afeat is None:
            afeat = jnp.zeros_like(vfeat)
        if cfg.modality_fuse == "concat":
            # audio stream leads: AV-HuBERT fuses cat([audio, video])
            x = jnp.concatenate([afeat, vfeat], axis=-1)
        else:  # "add"
            x = afeat + vfeat
        x = layer_norm(params["fuse_ln"], x)
        if "post_proj" in params:
            x = linear(params["post_proj"], x)

    x = x + _conv_pos_embed(params["pos_conv"], x, cfg)
    if not cfg.layer_norm_first:
        x = layer_norm(params["ln_pre"], x)

    n_heads = cfg.n_heads

    def block_fn(x, bp):
        if cfg.layer_norm_first:  # pre-LN (large)
            h = layer_norm(bp["attn_ln"], x)
            q, k, v = linear(bp["q"], h), linear(bp["k"], h), linear(bp["v"], h)
            x = x + linear(bp["out"], qkv_attention(q, k, v, n_heads))
            x = x + mlp_block(bp["mlp"], layer_norm(bp["mlp_ln"], x))
        else:  # post-LN (base)
            q, k, v = linear(bp["q"], x), linear(bp["k"], x), linear(bp["v"], x)
            x = layer_norm(bp["attn_ln"], x + linear(bp["out"], qkv_attention(q, k, v, n_heads)))
            x = layer_norm(bp["mlp_ln"], x + mlp_block(bp["mlp"], x))
        return x, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    if cfg.layer_norm_first:
        x = layer_norm(params["ln_post"], x)
    return x


def video_encoder_apply(
    params: Params,
    cfg: VideoEncoderConfig,
    frames: jax.Array,
    *,
    dtype=jnp.float32,
) -> jax.Array:
    """(B, T, H, W) lip crops -> (B, T, embed_dim); video-only entry
    (``--modalities vsr``). With an audio trunk configured, the audio
    stream contributes zeros, per AV-HuBERT's missing-modality rule."""
    return avhubert_encoder_apply(params, cfg, video=frames, dtype=dtype)


def stacked_fbank_features(
    audio: "np.ndarray", sample_rate: int = 16000, *,
    n_filters: int = 26, stack_order: int = 4,
    normalize: bool = True,
) -> "np.ndarray":
    """Waveform -> (T_25fps, n_filters*stack_order) stacked log filterbank.

    AV-HuBERT's audio frontend (the ``--modalities avsr`` input): 26-mel
    log filterbank at 100 fps (25 ms window / 10 ms hop, HTK mel scale,
    power spectrum over a 512-point rFFT, 0.97 pre-emphasis — the
    python_speech_features ``logfbank`` defaults), then every
    ``stack_order``=4 consecutive frames concatenated to one 104-dim
    vector at the 25 fps video rate (av_hubert's utils stacker,
    zero-padding the tail frame group). Host-side numpy (data-prep path,
    like the reference's loader).

    ``normalize`` applies AV-HuBERT's per-frame feature normalization
    (``F.layer_norm(feats, feats.shape[1:])`` over the stacked 104 dims
    when the model config sets ``normalize=True`` — the released large
    noise_ft checkpoints' setting; av_hubert hubert_dataset postprocess).
    Raw log-energies sit around [-15, 5], far outside the distribution
    the trained ``proj_audio`` expects."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim != 1:
        audio = audio.reshape(-1)
    # pre-emphasis
    emph = np.concatenate([audio[:1], audio[1:] - 0.97 * audio[:-1]])
    win, hop, nfft = int(0.025 * sample_rate), int(0.01 * sample_rate), 512
    n_frames = 1 + max(0, int(np.ceil((len(emph) - win) / hop)))
    pad = (n_frames - 1) * hop + win - len(emph)
    emph = np.pad(emph, (0, max(0, pad)))
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = emph[idx]
    power = np.abs(np.fft.rfft(frames, nfft)) ** 2 / nfft  # (T, 257)

    # HTK mel filterbank, lowfreq 0 .. highfreq sr/2
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    mel_pts = mel_to_hz(np.linspace(0.0, hz_to_mel(sample_rate / 2), n_filters + 2))
    bins = np.floor((nfft + 1) * mel_pts / sample_rate).astype(int)
    fbank = np.zeros((n_filters, nfft // 2 + 1), np.float32)
    for i in range(n_filters):
        lo, ctr, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, ctr):
            fbank[i, b] = (b - lo) / max(ctr - lo, 1)
        for b in range(ctr, hi):
            fbank[i, b] = (hi - b) / max(hi - ctr, 1)
    feats = power @ fbank.T
    feats = np.log(np.where(feats == 0, np.finfo(np.float32).eps, feats))

    if len(feats) % stack_order:
        res = stack_order - len(feats) % stack_order
        feats = np.concatenate([feats, np.zeros((res, n_filters), feats.dtype)])
    feats = feats.reshape(-1, stack_order * n_filters).astype(np.float32)
    if normalize and len(feats):
        mu = feats.mean(axis=1, keepdims=True)
        var = feats.var(axis=1, keepdims=True)
        feats = (feats - mu) / np.sqrt(var + 1e-5)
    return feats.astype(np.float32)


def init_video_encoder(key: jax.Array, cfg: VideoEncoderConfig) -> Params:
    k = jax.random.split(key, 8)
    D, L, F = cfg.embed_dim, cfg.n_layers, cfg.ffn_dim

    def lin(key, din, dout, stack=()):
        return {
            "w": jax.random.normal(key, (*stack, din, dout), jnp.float32) / math.sqrt(din),
            "b": jnp.zeros((*stack, dout), jnp.float32),
        }

    def ln(d, stack=()):
        return {"scale": jnp.ones((*stack, d), jnp.float32),
                "bias": jnp.zeros((*stack, d), jnp.float32)}

    blocks = {
        "q": lin(k[0], D, D, (L,)),
        "k": lin(k[1], D, D, (L,)),
        "v": lin(k[2], D, D, (L,)),
        "out": lin(k[3], D, D, (L,)),
        "attn_ln": ln(D, (L,)),
        "mlp": {"fc1": lin(k[4], D, F, (L,)), "fc2": lin(k[5], F, D, (L,))},
        "mlp_ln": ln(D, (L,)),
    }
    params = {
        "frontend": init_visual_frontend(k[6]),
        "proj": lin(k[7], cfg.frontend_dim, D),
        "pos_conv": {
            "w": jax.random.normal(
                jax.random.fold_in(key, 99),
                (cfg.conv_pos, D // cfg.conv_pos_groups, D),
                jnp.float32,
            ) * math.sqrt(4.0 / (cfg.conv_pos * D)),
            "b": jnp.zeros((D,), jnp.float32),
        },
        "blocks": blocks,
        "ln_post" if cfg.layer_norm_first else "ln_pre": ln(D),
    }
    if cfg.audio_feat_dim is not None:
        params["proj_audio"] = lin(
            jax.random.fold_in(key, 101), cfg.audio_feat_dim, D
        )
        params["fuse_ln"] = ln(cfg.fused_dim)
        if cfg.fused_dim != D:
            params["post_proj"] = lin(jax.random.fold_in(key, 102), cfg.fused_dim, D)
    return params


def load_avhubert_torch(state: Dict[str, Any], cfg: VideoEncoderConfig) -> Params:
    """Best-effort import of fairseq AV-HuBERT encoder weights.

    Key map (fairseq hubert/av-hubert naming):
      encoder.layers.{i}.self_attn.{q,k,v,out}_proj -> blocks.{q,k,v,out}
      encoder.layers.{i}.self_attn_layer_norm       -> blocks.attn_ln
      encoder.layers.{i}.fc1/fc2                    -> blocks.mlp
      encoder.layers.{i}.final_layer_norm           -> blocks.mlp_ln
      encoder.pos_conv.0                            -> pos_conv
      encoder.layer_norm                            -> ln_post/ln_pre
      feature extractor resnet                      -> frontend (visual.py)
    """
    from .visual import load_visual_frontend_torch

    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params = init_video_encoder(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(np.asarray, params)
    L = cfg.n_layers

    def put(dst, leaf, arrs):
        dst[leaf] = np.stack(arrs)

    prefix = "encoder.layers"
    for name, ours in [("self_attn.q_proj", "q"), ("self_attn.k_proj", "k"),
                       ("self_attn.v_proj", "v"), ("self_attn.out_proj", "out")]:
        put(params["blocks"][ours], "w",
            [t(state[f"{prefix}.{i}.{name}.weight"]).T for i in range(L)])
        put(params["blocks"][ours], "b",
            [t(state[f"{prefix}.{i}.{name}.bias"]) for i in range(L)])
    for tname, ours in [("self_attn_layer_norm", "attn_ln"), ("final_layer_norm", "mlp_ln")]:
        put(params["blocks"][ours], "scale",
            [t(state[f"{prefix}.{i}.{tname}.weight"]) for i in range(L)])
        put(params["blocks"][ours], "bias",
            [t(state[f"{prefix}.{i}.{tname}.bias"]) for i in range(L)])
    put(params["blocks"]["mlp"]["fc1"], "w",
        [t(state[f"{prefix}.{i}.fc1.weight"]).T for i in range(L)])
    put(params["blocks"]["mlp"]["fc1"], "b",
        [t(state[f"{prefix}.{i}.fc1.bias"]) for i in range(L)])
    put(params["blocks"]["mlp"]["fc2"], "w",
        [t(state[f"{prefix}.{i}.fc2.weight"]).T for i in range(L)])
    put(params["blocks"]["mlp"]["fc2"], "b",
        [t(state[f"{prefix}.{i}.fc2.bias"]) for i in range(L)])

    if "encoder.pos_conv.0.weight_v" in state:
        # fairseq wraps pos_conv in nn.utils.weight_norm(..., dim=2), so
        # real checkpoints ship weight_g (1, 1, K) + weight_v (O, I/g, K)
        # instead of a plain weight; reconstruct w = v * g / ||v||, with
        # the norm over all dims except 2 (torch norm_except_dim)
        v = t(state["encoder.pos_conv.0.weight_v"])
        g = t(state["encoder.pos_conv.0.weight_g"])
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = v * (g / norm)
        params["pos_conv"]["w"] = w.transpose(2, 1, 0)  # (O,I/g,K)->(K,I/g,O)
        params["pos_conv"]["b"] = t(state["encoder.pos_conv.0.bias"])
    elif "encoder.pos_conv.0.weight" in state:
        # torch conv1d (O, I/g, K) -> (K, I/g, O)
        params["pos_conv"]["w"] = t(state["encoder.pos_conv.0.weight"]).transpose(2, 1, 0)
        params["pos_conv"]["b"] = t(state["encoder.pos_conv.0.bias"])
    ln_key = "ln_post" if cfg.layer_norm_first else "ln_pre"
    if "encoder.layer_norm.weight" in state:
        params[ln_key]["scale"] = t(state["encoder.layer_norm.weight"])
        params[ln_key]["bias"] = t(state["encoder.layer_norm.bias"])

    # real fairseq checkpoints key the visual trunk as
    # feature_extractor_video.resnet.{frontend3D.*, trunk.layer*} — the
    # frontend loader wants frontend3D.* + bare layer* (the same shape the
    # reference's own key surgery produces, resnet.py:143-158)
    resnet_keys = {}
    for k, v in state.items():
        if "resnet." not in k:
            continue
        sub = k.split("resnet.", 1)[1]
        if sub.startswith("trunk."):
            sub = sub[len("trunk."):]
        resnet_keys[sub] = v
    if resnet_keys:
        params["frontend"] = load_visual_frontend_torch(resnet_keys)
    if "feature_extractor_video.proj.weight" in state:
        params["proj"]["w"] = t(state["feature_extractor_video.proj.weight"]).T
        params["proj"]["b"] = t(state["feature_extractor_video.proj.bias"])

    # --- audio trunk (avsr): AVHubertModel's feature_extractor_audio,
    # top-level fused-feature layer_norm (NOT encoder.layer_norm), and
    # post_extract_proj (concat 2D -> D) ---
    has_audio_keys = "feature_extractor_audio.proj.weight" in state
    if cfg.audio_feat_dim is not None:
        if not has_audio_keys:
            # a video-only export routed through random fuse_ln/post_proj
            # would silently destroy the imported features
            raise ValueError(
                "config expects the avsr audio trunk (audio_feat_dim="
                f"{cfg.audio_feat_dim}) but the checkpoint has no "
                "feature_extractor_audio keys — use the video-only config "
                "(e.g. 'large'/'base' instead of '*-avsr')"
            )
        params["proj_audio"]["w"] = t(state["feature_extractor_audio.proj.weight"]).T
        params["proj_audio"]["b"] = t(state["feature_extractor_audio.proj.bias"])
        if "layer_norm.weight" in state:
            params["fuse_ln"]["scale"] = t(state["layer_norm.weight"])
            params["fuse_ln"]["bias"] = t(state["layer_norm.bias"])
        if "post_extract_proj.weight" in state and "post_proj" in params:
            params["post_proj"]["w"] = t(state["post_extract_proj.weight"]).T
            params["post_proj"]["b"] = t(state["post_extract_proj.bias"])
    elif has_audio_keys:
        raise ValueError(
            "checkpoint carries an avsr audio trunk "
            "(feature_extractor_audio keys) but the config is video-only — "
            "use the matching '*-avsr' config"
        )
    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Audio-visual Whisper wrapper
# ---------------------------------------------------------------------------

@dataclass
class AVWhisper:
    """Whisper + video encoder with gated x-attn fusion
    (``av_fusion="separate"``) and modality dropout.

    The video stream rides the same decoder machinery as translated-text
    conditioning: features are projected (via ``xt_projection`` when
    dims differ) and consumed by the per-stream gated sub-blocks.
    """

    whisper: Whisper
    video_params: Params
    video_cfg: VideoEncoderConfig
    prob_av: float = 0.5  # P(use both) during training
    prob_a: float = 0.25  # P(audio only); remainder = video only

    @property
    def dims(self) -> ModelDimensions:
        return self.whisper.dims

    def _conditioning(self, video, audio, *, dtype):
        """The gated-x-attn conditioning stream from the AV-HuBERT trunk.

        Modality availability selects the AV-HuBERT input mode
        (``--modalities vsr/asr/avsr``): whichever of video / stacked-
        fbank audio is given feeds the trunk, the missing one contributes
        zeros pre-fuse (AV-HuBERT's own missing-modality rule). ``audio``
        only participates when the trunk is configured
        (``audio_feat_dim``). Returns None when nothing conditions."""
        a_in = audio if self.video_cfg.audio_feat_dim is not None else None
        if video is None and a_in is None:
            return None
        return avhubert_encoder_apply(
            self.video_params, self.video_cfg,
            video=jnp.asarray(video) if video is not None else None,
            audio=jnp.asarray(a_in) if a_in is not None else None,
            dtype=dtype,
        )

    def encode(
        self,
        mel: jax.Array,
        video: Optional[jax.Array] = None,
        audio: Optional[jax.Array] = None,
        *,
        test_a: bool = False,
        test_v: bool = False,
        rng: Optional[jax.Array] = None,
        training: bool = False,
        dtype=jnp.float32,
    ):
        """Returns (audio_features, video_features-or-None) applying the
        modality masks: ``test_a`` ZEROES the conditioning stream (shape
        preserved — identical to training's drop_video, so gated x-attn
        still sees a present-but-zero stream), ``test_v`` zeroes the
        Whisper audio features; during training, modality dropout per
        prob_av/prob_a. ``audio`` optionally feeds the AV-HuBERT audio
        trunk (avsr)."""
        from .whisper import encoder_apply

        drop_video = test_a or (video is None and audio is None)
        drop_audio = test_v

        if training and rng is not None and video is not None:
            u = jax.random.uniform(rng, ())
            # both: u < prob_av; audio-only: u < prob_av + prob_a; else video-only
            drop_video = jnp.logical_or(
                drop_video, (u >= self.prob_av) & (u < self.prob_av + self.prob_a)
            )
            drop_audio = jnp.logical_or(drop_audio, u >= self.prob_av + self.prob_a)

        audio_features = encoder_apply(self.whisper.params, self.dims, mel, dtype=dtype)
        if isinstance(drop_audio, jax.Array) or drop_audio:
            audio_features = jnp.where(drop_audio, 0.0, audio_features)

        video_features = self._conditioning(video, audio, dtype=dtype)
        if video_features is not None and (
            isinstance(drop_video, jax.Array) or drop_video
        ):
            video_features = jnp.where(drop_video, 0.0, video_features)
        if video_features is None and test_a:
            # no modality inputs at all but the test_a protocol asks for a
            # present-but-zero stream (see decode()): a length-1 zero
            # stream is exactly equivalent to a zeroed full trunk forward
            b = audio_features.shape[0]
            video_features = jnp.zeros((b, 1, self.video_cfg.embed_dim), dtype)
        return audio_features, video_features

    def decode(self, mel, options, video=None, audio=None,
               test_a: bool = False, test_v: bool = False):
        """AV decode: parity surface with reference
        ``whisper.decode(model, mel, options, x_v, test_v, test_a)``
        (decoding.py:801-838); ``audio`` adds the AV-HuBERT audio-trunk
        stream (``--modalities avsr``, reference README.md:130-154)."""
        from ..decoding import decode as decode_fn

        xt = None
        mel_arr = jnp.asarray(mel)
        if test_a:
            # present-but-ZERO conditioning stream — the same definition
            # training's drop_video applies (training/steps.py), so train
            # and decode see identical conditioning under the same flag.
            # With every frame identically zero, the gated x-attn output
            # is frame-count independent (uniform softmax over identical
            # keys/values), so a length-1 stream is exactly equivalent to
            # zeroing a full trunk forward — and skips the trunk entirely.
            # This also covers `--modalities asr` where no video/fbank is
            # even loaded (reference decoding.py:648-672 still threads the
            # stream there).
            b = mel_arr.shape[0] if mel_arr.ndim == 3 else 1
            vf = jnp.zeros((b, 1, self.video_cfg.embed_dim), self.whisper.dtype)
        else:
            vf = self._conditioning(video, audio, dtype=self.whisper.dtype)
        if vf is not None and vf.ndim == 3:
            xt = vf[None]  # one conditioning stream
        mel = mel_arr
        if test_v:
            # zero the encoder *features*, matching what training's
            # modality dropout produces (training/steps.py drop_audio
            # zeroes features). Zeroing the mel instead would still yield
            # nonzero features (conv biases + positional embedding + LN),
            # silently skewing train/test conditioning. Zero features of
            # encoder-output shape take the decode path's pre-encoded
            # branch, so the audio trunk is bypassed entirely.
            d = self.dims
            shape = mel.shape[:-2] + (d.n_audio_ctx, d.n_audio_state)
            mel = jnp.zeros(shape, self.whisper.dtype)
        return decode_fn(self.whisper, mel, options, xt=xt)
