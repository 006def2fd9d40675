"""whisper_flamingo_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of
Whisper-Flamingo (gated cross-attention Whisper for multimodal / translated-
text conditioning, knowledge distillation, and prompt-conditioned ASR).

Public surface parity with the reference vendored package
(`/root/reference/whisper/__init__.py:11-15`): ``load_audio``,
``log_mel_spectrogram``, ``pad_or_trim``, ``DecodingOptions``,
``DecodingResult``, ``decode``, ``detect_language``, ``ModelDimensions``,
``Whisper``, ``transcribe``, ``load_model``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .audio import load_audio, log_mel_spectrogram, pad_or_trim  # noqa: F401
from .models.dims import MODEL_DIMS, ModelDimensions, available_models  # noqa: F401
from .models.whisper import ModelExtras, Whisper, init_params  # noqa: F401
from .decoding import (  # noqa: F401
    DecodingOptions,
    DecodingResult,
    decode,
    detect_language,
)
from .speculative import decode_speculative  # noqa: F401
from . import serving  # noqa: F401
from .transcribe import transcribe  # noqa: F401

__version__ = "0.1.0"


def load_model(
    name: str,
    device=None,  # accepted for API parity; placement is managed by JAX
    download_root: Optional[str] = None,
    in_memory: bool = False,
    dropout_rate: float = 0.0,
    add_adapter: bool = False,
    adapter_dim: int = 256,
    add_gated_x_attn: int = 0,
    bert_dim: int = 768,
    num_langs: int = 0,
    seed: int = 0,
    dtype=None,
) -> Whisper:
    """Build a Whisper model, optionally seeded from a checkpoint.

    Parity with the reference factory (`whisper/__init__.py:99-164`),
    including the fork's model-surgery flags. ``name`` is either a size
    from :data:`available_models` (randomly initialized unless a matching
    ``.pt`` exists under ``download_root``) or a path to an OpenAI ``.pt``
    / Lightning ``.ckpt`` checkpoint, loaded with ``strict=False``
    semantics so newly added gated-x-attn weights stay randomly
    initialized (`whisper/__init__.py:159`).
    """
    import jax.numpy as jnp

    from .training.checkpoints import load_torch_checkpoint

    extras = ModelExtras(
        dropout_rate=dropout_rate,
        add_adapter=add_adapter,
        adapter_dim=adapter_dim,
        add_gated_x_attn=add_gated_x_attn,
        bert_dim=bert_dim,
        num_langs=num_langs,
    )

    ckpt_path = None
    alignment_heads = None
    if os.path.isfile(name):
        ckpt_path = name
        dims = None
    elif name in MODEL_DIMS:
        from .registry import alignment_heads_for, download_checkpoint

        dims = MODEL_DIMS[name]
        alignment_heads = alignment_heads_for(
            name, dims.n_text_layer, dims.n_text_head
        )
        candidate = os.path.join(download_root or "", f"{name}.pt")
        if download_root and os.path.isfile(candidate):
            ckpt_path = candidate
        elif name != "debug":
            try:
                ckpt_path = download_checkpoint(name, download_root)
            except Exception as e:  # offline: fall back to random init
                import warnings

                warnings.warn(
                    f"could not fetch pretrained weights for {name!r} ({e}); "
                    "using random initialization"
                )
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {available_models}"
        )

    if ckpt_path is not None:
        params, dims = load_torch_checkpoint(ckpt_path, dims, extras)
    else:
        params = init_params(jax.random.PRNGKey(seed), dims, extras)

    return Whisper(
        dims=dims,
        params=params,
        extras=extras,
        dtype=dtype or jnp.float32,
        alignment_heads=alignment_heads,
    )


# bind inference entry points onto the model handle (parity: model.py:427-429)
Whisper.decode = decode
Whisper.detect_language = detect_language
Whisper.transcribe = transcribe
