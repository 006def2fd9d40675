"""Lip-video visual frontend: 3D-conv stem + ResNet-18 trunk.

TPU-native rebuild of the AutoAVSR/AV-HuBERT visual frontend the reference
vendors (`/root/reference/whisper/resnet.py:17-173`): Conv3d(5,7,7)/s(1,2,2)
+ BN + PReLU + MaxPool3d stem ("frontend3D", resnet.py:137-141), a
BasicBlock [2,2,2,2] ResNet trunk (resnet.py:35-129), time folded into the
batch axis (``threeD_to_2D_tensor``, resnet.py:170-173), global average
pool to one 512-d vector per frame.

Design notes (not a port):

- channels-last NDHWC/NHWC layouts so XLA tiles the convs onto the MXU;
- BatchNorm runs in inference mode against stored running statistics by
  default — the SyncBatchNorm the reference needed for DDP
  (`whisper_ft_librispeech.py:377`) disappears because the frontend is
  frozen in every reference recipe (``freeze_video_model: True`` in all
  AV configs); a ``train_stats`` escape hatch computes per-shard batch
  stats for from-scratch training (documented porting hazard,
  SURVEY.md §5.8);
- weight import maps torch ``frontend3D.*`` / ``trunk.*`` keys
  (OIHW -> HWIO etc.) so released AV-HuBERT resnet weights load.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_STAGES = (("layer1", 64, 1), ("layer2", 128, 2), ("layer3", 256, 2), ("layer4", 512, 2))


def _bn(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BatchNorm with stored running stats (channels-last)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    xf = x.astype(jnp.float32)
    out = (xf - p["mean"]) * inv * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _prelu(p: Params, x: jax.Array) -> jax.Array:
    alpha = p["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, alpha * x)


def _conv2d(w: jax.Array, x: jax.Array, stride: int, padding) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _basic_block(p: Params, x: jax.Array, stride: int) -> jax.Array:
    residual = x
    out = _conv2d(p["conv1"]["w"], x, stride, [(1, 1), (1, 1)])
    out = _prelu(p["prelu1"], _bn(p["bn1"], out))
    out = _conv2d(p["conv2"]["w"], out, 1, [(1, 1), (1, 1)])
    out = _bn(p["bn2"], out)
    if "downsample" in p:
        residual = _bn(
            p["downsample"]["bn"],
            _conv2d(p["downsample"]["conv"]["w"], x, stride, [(0, 0), (0, 0)]),
        )
    return _prelu(p["prelu2"], out + residual)


def visual_frontend_apply(params: Params, frames: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, T, H, W) grayscale lip crops -> (B, T, 512) frame features."""
    b, t = frames.shape[:2]
    x = frames.astype(dtype)[..., None]  # (B, T, H, W, 1) = NDHWC

    x = jax.lax.conv_general_dilated(
        x, params["conv3d"]["w"].astype(dtype),
        window_strides=(1, 2, 2),
        padding=[(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    x = _prelu(params["prelu"], _bn(params["bn3d"], x))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
    )

    # fold time into batch (resnet.py:170-173) and run the 2D trunk
    _, tn, h, w, c = x.shape
    x = x.reshape(b * tn, h, w, c)
    for name, _, stride in _STAGES:
        for i, blk in enumerate(params[name]):
            x = _basic_block(blk, x, stride if i == 0 else 1)
    x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
    return x.reshape(b, tn, -1)


# ---------------------------------------------------------------------------
# Initialization / torch import
# ---------------------------------------------------------------------------

def _init_bn(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _init_conv(key, shape) -> Params:
    # He init matching resnet.py:92-95
    fan = shape[0] * shape[1] * shape[-1]
    return {"w": jax.random.normal(key, shape, jnp.float32) * math.sqrt(2.0 / fan)}


def init_visual_frontend(key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 64))
    params: Params = {
        "conv3d": _init_conv(next(keys), (5, 7, 7, 1, 64)),
        "bn3d": _init_bn(64),
        "prelu": {"alpha": jnp.full((64,), 0.25, jnp.float32)},
    }
    inplanes = 64
    for name, planes, stride in _STAGES:
        blocks = []
        for i in range(2):
            s = stride if i == 0 else 1
            blk = {
                "conv1": _init_conv(next(keys), (3, 3, inplanes if i == 0 else planes, planes)),
                "bn1": _init_bn(planes),
                "prelu1": {"alpha": jnp.full((planes,), 0.25, jnp.float32)},
                "conv2": _init_conv(next(keys), (3, 3, planes, planes)),
                "bn2": _init_bn(planes),
                "prelu2": {"alpha": jnp.full((planes,), 0.25, jnp.float32)},
            }
            if i == 0 and (s != 1 or inplanes != planes):
                blk["downsample"] = {
                    "conv": _init_conv(next(keys), (1, 1, inplanes, planes)),
                    "bn": _init_bn(planes),
                }
            blocks.append(blk)
        params[name] = blocks
        inplanes = planes
    return params


def load_visual_frontend_torch(state: Dict[str, Any]) -> Params:
    """Import torch ``frontend3D.* / trunk.*`` weights (resnet.py:143-158)."""

    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    def bn(prefix):
        return {
            "scale": t(state[f"{prefix}.weight"]),
            "bias": t(state[f"{prefix}.bias"]),
            "mean": t(state[f"{prefix}.running_mean"]),
            "var": t(state[f"{prefix}.running_var"]),
        }

    params: Params = {
        # torch Conv3d (O, I, D, H, W) -> (D, H, W, I, O)
        "conv3d": {"w": t(state["frontend3D.0.weight"]).transpose(2, 3, 4, 1, 0)},
        "bn3d": bn("frontend3D.1"),
        "prelu": {"alpha": t(state["frontend3D.2.weight"])},
    }
    inplanes = 64
    for name, planes, stride in _STAGES:
        blocks = []
        for i in range(2):
            p = f"{name}.{i}"
            blk = {
                # torch Conv2d (O, I, H, W) -> (H, W, I, O)
                "conv1": {"w": t(state[f"{p}.conv1.weight"]).transpose(2, 3, 1, 0)},
                "bn1": bn(f"{p}.bn1"),
                "prelu1": {"alpha": t(state[f"{p}.relu1.weight"])},
                "conv2": {"w": t(state[f"{p}.conv2.weight"]).transpose(2, 3, 1, 0)},
                "bn2": bn(f"{p}.bn2"),
                "prelu2": {"alpha": t(state[f"{p}.relu2.weight"])},
            }
            if f"{p}.downsample.0.weight" in state:
                blk["downsample"] = {
                    "conv": {"w": t(state[f"{p}.downsample.0.weight"]).transpose(2, 3, 1, 0)},
                    "bn": bn(f"{p}.downsample.1"),
                }
            blocks.append(blk)
        params[name] = blocks
        inplanes = planes
    return params
