"""Checkpoint interchange: OpenAI ``.pt`` / Lightning ``.ckpt`` <-> JAX pytree,
plus Orbax-based native checkpointing for training.

The reference loads official Whisper checkpoints with ``strict=False`` so
newly added gated-x-attn weights stay randomly initialized
(`/root/reference/whisper/__init__.py:152-164`), and re-keys Lightning
checkpoints by stripping the ``model.`` prefix
(`/root/reference/whisper_ft_librispeech.py:116-127`). Both behaviors are
reproduced here: :func:`load_torch_state` seeds an initialized pytree with
whatever keys are present.

Layout translation (torch -> ours):

- per-layer modules ``{encoder,decoder}.blocks.{i}.*`` stack into arrays
  with a leading layer axis (the model scans over layers);
- ``nn.Linear`` weights (out, in) transpose to (in, out);
- ``nn.Conv1d`` weights (out, in, k) transpose to (k, in, out);
- LayerNorm ``weight``/``bias`` become ``scale``/``bias``;
- the encoder's sinusoidal position buffer is recomputed, not stored.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dims import ModelDimensions
from ..models.whisper import ModelExtras, Params, init_params


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def _attn_entries(prefix: str, tree: Dict[str, Any]):
    """(torch submodule name, our subtree, transpose) for one attention."""
    yield f"{prefix}.query.weight", tree["q"], "w"
    yield f"{prefix}.query.bias", tree["q"], "b"
    yield f"{prefix}.key.weight", tree["k"], "w"
    yield f"{prefix}.value.weight", tree["v"], "w"
    yield f"{prefix}.value.bias", tree["v"], "b"
    yield f"{prefix}.out.weight", tree["out"], "w"
    yield f"{prefix}.out.bias", tree["out"], "b"


def _assign(slot: Dict[str, Any], leaf: str, value: np.ndarray, layer=None, lang=None):
    """Write a torch tensor into a (possibly stacked) pytree leaf."""
    if leaf == "w" and value.ndim == 2:
        value = value.T  # (out, in) -> (in, out)
    arr = np.asarray(slot[leaf])
    if layer is None:
        slot[leaf] = value.reshape(arr.shape)
        return
    arr = arr.copy()
    if lang is None:
        arr[layer] = value.reshape(arr.shape[1:])
    else:
        arr[layer, lang] = value.reshape(arr.shape[2:])
    slot[leaf] = arr


def load_torch_state(
    state_dict: Mapping[str, Any],
    dims: ModelDimensions,
    extras: ModelExtras = ModelExtras(),
    *,
    seed: int = 0,
    strict: bool = False,
) -> Params:
    """Build a parameter pytree from a torch Whisper state dict.

    Unknown keys raise when ``strict``; missing keys keep their random
    initialization (reference ``strict=False`` semantics).
    """
    params = jax.tree.map(np.asarray, init_params(jax.random.PRNGKey(seed), dims, extras))
    enc, dec = params["encoder"], params["decoder"]
    consumed = set()

    def take(torch_key: str, slot, leaf, layer=None, lang=None):
        if torch_key in state_dict:
            _assign(slot, leaf, _to_numpy(state_dict[torch_key]), layer, lang)
            consumed.add(torch_key)

    # --- encoder stem ---
    for name, sub in [("conv1", enc["conv1"]), ("conv2", enc["conv2"])]:
        key = f"encoder.{name}.weight"
        if key in state_dict:
            sub["w"] = _to_numpy(state_dict[key]).transpose(2, 1, 0)
            consumed.add(key)
        take(f"encoder.{name}.bias", sub, "b")
    take("encoder.ln_post.weight", enc["ln_post"], "scale")
    take("encoder.ln_post.bias", enc["ln_post"], "bias")
    consumed.add("encoder.positional_embedding")  # recomputed sinusoids

    # --- decoder globals ---
    if "decoder.token_embedding.weight" in state_dict:
        dec["token_embedding"] = _to_numpy(state_dict["decoder.token_embedding.weight"])
        consumed.add("decoder.token_embedding.weight")
    if "decoder.positional_embedding" in state_dict:
        dec["pos_embedding"] = _to_numpy(state_dict["decoder.positional_embedding"])
        consumed.add("decoder.positional_embedding")
    take("decoder.ln.weight", dec["ln"], "scale")
    take("decoder.ln.bias", dec["ln"], "bias")
    if "decoder.xt_projection.weight" in state_dict and "xt_projection" in dec:
        take("decoder.xt_projection.weight", dec["xt_projection"], "w")
        take("decoder.xt_projection.bias", dec["xt_projection"], "b")

    # --- per-layer blocks ---
    def load_blocks(side: str, tree: Dict[str, Any], n_layer: int, cross: bool):
        for i in range(n_layer):
            p = f"{side}.blocks.{i}"
            for tk, slot, leaf in _attn_entries(f"{p}.attn", tree["attn"]):
                take(tk, slot, leaf, layer=i)
            take(f"{p}.attn_ln.weight", tree["attn_ln"], "scale", layer=i)
            take(f"{p}.attn_ln.bias", tree["attn_ln"], "bias", layer=i)
            if cross:
                for tk, slot, leaf in _attn_entries(f"{p}.cross_attn", tree["cross_attn"]):
                    take(tk, slot, leaf, layer=i)
                take(f"{p}.cross_attn_ln.weight", tree["cross_attn_ln"], "scale", layer=i)
                take(f"{p}.cross_attn_ln.bias", tree["cross_attn_ln"], "bias", layer=i)
            take(f"{p}.mlp.0.weight", tree["mlp"]["fc1"], "w", layer=i)
            take(f"{p}.mlp.0.bias", tree["mlp"]["fc1"], "b", layer=i)
            take(f"{p}.mlp.2.weight", tree["mlp"]["fc2"], "w", layer=i)
            take(f"{p}.mlp.2.bias", tree["mlp"]["fc2"], "b", layer=i)
            take(f"{p}.mlp_ln.weight", tree["mlp_ln"], "scale", layer=i)
            take(f"{p}.mlp_ln.bias", tree["mlp_ln"], "bias", layer=i)
            if "gated" in tree:
                g = tree["gated"]
                n_langs = np.asarray(g["langs"]["attn_gate"]).shape[1]
                for j in range(n_langs):
                    gp = f"{p}.gated_x_attn_layers.{j}"
                    for tk, slot, leaf in _attn_entries(f"{gp}.attn", g["langs"]["attn"]):
                        take(tk, slot, leaf, layer=i, lang=j)
                    take(f"{gp}.attn_ln.weight", g["langs"]["attn_ln"], "scale", layer=i, lang=j)
                    take(f"{gp}.attn_ln.bias", g["langs"]["attn_ln"], "bias", layer=i, lang=j)
                    take(f"{gp}.attn_gate", g["langs"], "attn_gate", layer=i, lang=j)
                take(f"{p}.ff_ln.weight", g["ff_ln"], "scale", layer=i)
                take(f"{p}.ff_ln.bias", g["ff_ln"], "bias", layer=i)
                take(f"{p}.ff.0.weight", g["ff"]["fc1"], "w", layer=i)
                take(f"{p}.ff.0.bias", g["ff"]["fc1"], "b", layer=i)
                take(f"{p}.ff.2.weight", g["ff"]["fc2"], "w", layer=i)
                take(f"{p}.ff.2.bias", g["ff"]["fc2"], "b", layer=i)
                take(f"{p}.ff_gate", g, "ff_gate", layer=i)

    load_blocks("encoder", enc["blocks"], dims.n_audio_layer, cross=False)
    load_blocks("decoder", dec["blocks"], dims.n_text_layer, cross=True)

    if strict:
        missing = [k for k in state_dict if k not in consumed]
        if missing:
            raise KeyError(f"unconsumed checkpoint keys: {missing[:10]}...")
    return jax.tree.map(jnp.asarray, params)


def strip_prefix(state_dict: Mapping[str, Any], prefix: str = "model.") -> Dict[str, Any]:
    """Re-key a Lightning checkpoint state dict (reference
    `whisper_ft_librispeech.py:116-127`)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def torch_load_prefer_safe(path: str):
    """torch.load with ``weights_only=True`` first: plain tensor/state-dict
    checkpoints (OpenAI ``.pt``, Lightning ``.ckpt``, fairseq dumps of
    tensors) load fine in safe mode, which cannot execute pickled code.
    Only fall back to the unrestricted unpickler — an arbitrary-code-
    execution surface — with a warning naming the file. IO errors
    (missing/unreadable file) propagate directly: they are not a safe-mode
    failure and must not trigger the fallback (which would misleadingly
    warn and re-read the file)."""
    import pickle

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except OSError:
        raise
    except (pickle.UnpicklingError, RuntimeError, AttributeError, ValueError):
        import warnings

        warnings.warn(
            f"checkpoint {path!r} needs the unrestricted pickle loader "
            "(weights_only=False); only load checkpoints you trust"
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def load_torch_checkpoint(
    path: str,
    dims: Optional[ModelDimensions] = None,
    extras: ModelExtras = ModelExtras(),
) -> Tuple[Params, ModelDimensions]:
    """Read an OpenAI ``.pt`` (``{dims, model_state_dict}``) or Lightning
    ``.ckpt`` (``{state_dict}`` with ``model.`` prefixes) file."""
    ckpt = torch_load_prefer_safe(path)
    if "model_state_dict" in ckpt:
        state = ckpt["model_state_dict"]
        if dims is None:
            dims = ModelDimensions.from_dict(ckpt["dims"])
    elif "state_dict" in ckpt:
        state = strip_prefix(ckpt["state_dict"])
        if dims is None:
            raise ValueError("Lightning checkpoints carry no dims; pass dims=")
    else:
        state = ckpt
        if dims is None:
            raise ValueError("raw state dict carries no dims; pass dims=")
    return load_torch_state(state, dims, extras), dims


def save_torch_checkpoint(params: Params, dims: ModelDimensions, path: str) -> None:
    """Write an OpenAI-format ``.pt`` (``{dims, model_state_dict}``) so
    checkpoints trained here load in torch-based Whisper stacks."""
    import torch

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in to_torch_state_dict(params, dims).items()
    }
    torch.save({"dims": dims.to_dict(), "model_state_dict": state}, path)


def to_torch_state_dict(params: Params, dims: ModelDimensions) -> Dict[str, np.ndarray]:
    """Export the pytree back to OpenAI-style torch keys (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    params = jax.tree.map(np.asarray, params)
    enc, dec = params["encoder"], params["decoder"]

    for name in ("conv1", "conv2"):
        out[f"encoder.{name}.weight"] = enc[name]["w"].transpose(2, 1, 0)
        out[f"encoder.{name}.bias"] = enc[name]["b"]
    out["encoder.ln_post.weight"] = enc["ln_post"]["scale"]
    out["encoder.ln_post.bias"] = enc["ln_post"]["bias"]
    out["decoder.token_embedding.weight"] = dec["token_embedding"]
    out["decoder.positional_embedding"] = dec["pos_embedding"]
    out["decoder.ln.weight"] = dec["ln"]["scale"]
    out["decoder.ln.bias"] = dec["ln"]["bias"]
    if "xt_projection" in dec:
        out["decoder.xt_projection.weight"] = dec["xt_projection"]["w"].T
        out["decoder.xt_projection.bias"] = dec["xt_projection"]["b"]

    def dump_attn(prefix, tree, i, j=None):
        sel = (lambda a: a[i]) if j is None else (lambda a: a[i, j])
        out[f"{prefix}.query.weight"] = sel(tree["q"]["w"]).T
        out[f"{prefix}.query.bias"] = sel(tree["q"]["b"])
        out[f"{prefix}.key.weight"] = sel(tree["k"]["w"]).T
        out[f"{prefix}.value.weight"] = sel(tree["v"]["w"]).T
        out[f"{prefix}.value.bias"] = sel(tree["v"]["b"])
        out[f"{prefix}.out.weight"] = sel(tree["out"]["w"]).T
        out[f"{prefix}.out.bias"] = sel(tree["out"]["b"])

    def dump_blocks(side, tree, n_layer, cross):
        for i in range(n_layer):
            p = f"{side}.blocks.{i}"
            dump_attn(f"{p}.attn", tree["attn"], i)
            out[f"{p}.attn_ln.weight"] = tree["attn_ln"]["scale"][i]
            out[f"{p}.attn_ln.bias"] = tree["attn_ln"]["bias"][i]
            if cross:
                dump_attn(f"{p}.cross_attn", tree["cross_attn"], i)
                out[f"{p}.cross_attn_ln.weight"] = tree["cross_attn_ln"]["scale"][i]
                out[f"{p}.cross_attn_ln.bias"] = tree["cross_attn_ln"]["bias"][i]
            out[f"{p}.mlp.0.weight"] = tree["mlp"]["fc1"]["w"][i].T
            out[f"{p}.mlp.0.bias"] = tree["mlp"]["fc1"]["b"][i]
            out[f"{p}.mlp.2.weight"] = tree["mlp"]["fc2"]["w"][i].T
            out[f"{p}.mlp.2.bias"] = tree["mlp"]["fc2"]["b"][i]
            out[f"{p}.mlp_ln.weight"] = tree["mlp_ln"]["scale"][i]
            out[f"{p}.mlp_ln.bias"] = tree["mlp_ln"]["bias"][i]
            if "gated" in tree:
                g = tree["gated"]
                n_langs = g["langs"]["attn_gate"].shape[1]
                for j in range(n_langs):
                    gp = f"{p}.gated_x_attn_layers.{j}"
                    dump_attn(f"{gp}.attn", g["langs"]["attn"], i, j)
                    out[f"{gp}.attn_ln.weight"] = g["langs"]["attn_ln"]["scale"][i, j]
                    out[f"{gp}.attn_ln.bias"] = g["langs"]["attn_ln"]["bias"][i, j]
                    out[f"{gp}.attn_gate"] = g["langs"]["attn_gate"][i, j]
                out[f"{p}.ff_ln.weight"] = g["ff_ln"]["scale"][i]
                out[f"{p}.ff_ln.bias"] = g["ff_ln"]["bias"][i]
                out[f"{p}.ff.0.weight"] = g["ff"]["fc1"]["w"][i].T
                out[f"{p}.ff.0.bias"] = g["ff"]["fc1"]["b"][i]
                out[f"{p}.ff.2.weight"] = g["ff"]["fc2"]["w"][i].T
                out[f"{p}.ff.2.bias"] = g["ff"]["fc2"]["b"][i]
                out[f"{p}.ff_gate"] = g["ff_gate"][i]

    dump_blocks("encoder", enc["blocks"], dims.n_audio_layer, cross=False)
    dump_blocks("decoder", dec["blocks"], dims.n_text_layer, cross=True)
    return out
