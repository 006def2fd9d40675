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
    1024 dim, 16 heads; base: 12 layers, 768 dim, 12 heads."""

    embed_dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    ffn_dim: int = 4096
    conv_pos: int = 128
    conv_pos_groups: int = 16
    frontend_dim: int = 512
    layer_norm_first: bool = True


VIDEO_ENCODER_CONFIGS = {
    "large": VideoEncoderConfig(),
    "base": VideoEncoderConfig(embed_dim=768, n_layers=12, n_heads=12, ffn_dim=3072,
                               layer_norm_first=False),
    "debug": VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2, ffn_dim=128,
                                conv_pos=8, conv_pos_groups=2),
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


def video_encoder_apply(
    params: Params,
    cfg: VideoEncoderConfig,
    frames: jax.Array,
    *,
    dtype=jnp.float32,
) -> jax.Array:
    """(B, T, H, W) lip crops -> (B, T, embed_dim) video features."""
    feats = visual_frontend_apply(params["frontend"], frames, dtype=dtype)
    x = linear(params["proj"], feats.astype(dtype))
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

    if "encoder.pos_conv.0.weight" in state:
        # torch conv1d (O, I/g, K) -> (K, I/g, O)
        params["pos_conv"]["w"] = t(state["encoder.pos_conv.0.weight"]).transpose(2, 1, 0)
        params["pos_conv"]["b"] = t(state["encoder.pos_conv.0.bias"])
    ln_key = "ln_post" if cfg.layer_norm_first else "ln_pre"
    if "encoder.layer_norm.weight" in state:
        params[ln_key]["scale"] = t(state["encoder.layer_norm.weight"])
        params[ln_key]["bias"] = t(state["encoder.layer_norm.bias"])

    resnet_keys = {
        k.split("resnet.", 1)[1]: v for k, v in state.items() if "resnet." in k
    }
    if resnet_keys:
        params["frontend"] = load_visual_frontend_torch(resnet_keys)
    if "feature_extractor_video.proj.weight" in state:
        params["proj"]["w"] = t(state["feature_extractor_video.proj.weight"]).T
        params["proj"]["b"] = t(state["feature_extractor_video.proj.bias"])
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

    def encode(
        self,
        mel: jax.Array,
        video: Optional[jax.Array] = None,
        *,
        test_a: bool = False,
        test_v: bool = False,
        rng: Optional[jax.Array] = None,
        training: bool = False,
        dtype=jnp.float32,
    ):
        """Returns (audio_features, video_features-or-None) applying the
        modality masks: ``test_a`` drops video, ``test_v`` drops audio;
        during training, modality dropout per prob_av/prob_a."""
        from .whisper import encoder_apply

        drop_video = test_a or video is None
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

        video_features = None
        if video is not None:
            video_features = video_encoder_apply(
                self.video_params, self.video_cfg, video, dtype=dtype
            )
            if isinstance(drop_video, jax.Array) or drop_video:
                video_features = jnp.where(drop_video, 0.0, video_features)
        return audio_features, video_features

    def decode(self, mel, options, video=None, test_a: bool = False, test_v: bool = False):
        """AV decode: parity surface with reference
        ``whisper.decode(model, mel, options, x_v, test_v, test_a)``
        (decoding.py:801-838)."""
        from ..decoding import decode as decode_fn

        xt = None
        if video is not None and not test_a:
            vf = video_encoder_apply(
                self.video_params, self.video_cfg, jnp.asarray(video),
                dtype=self.whisper.dtype,
            )
            if vf.ndim == 3:
                xt = vf[None]  # one conditioning stream
        mel = jnp.asarray(mel)
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
