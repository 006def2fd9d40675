"""Text conditioners: produce the ``xt`` streams consumed by the gated
cross-attention decoder.

The reference runs a HF BERT over the translation strings inside every
training step (`/root/reference/whisper-flamingo_amis.py:182-193`:
``bert-base-chinese``; `transkd-asr_librispeech.py:284-310`:
``bert-base-multilingual-cased``, one pass per translation language).
Here the same contract sits behind one interface with two TPU-appropriate
implementations:

- :class:`HFBertConditioner` — a Flax BERT executed as a jitted program
  (padding quantized so XLA compiles a handful of shapes). Weights come
  from a local HF cache, or random-init from a config for tests.
- :class:`PrecomputedConditioner` — embedding lookup from an on-disk
  store keyed by text hash, for the high-throughput path where
  translations are static per utterance (the usual case: they are
  offline MT outputs, `translation/` pipeline).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Sequence

import numpy as np


class TextConditioner:
    """Interface: list of strings -> (B, S, D) float32 embeddings."""

    dim: int

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        raise NotImplementedError

    def encode_multi(self, all_texts: Sequence[Sequence[str]]) -> np.ndarray:
        """(n_langs lists of B strings) -> (n_langs, B, S, D), padded to a
        common length."""
        encoded = [self.encode(list(texts)) for texts in all_texts]
        s_max = max(e.shape[1] for e in encoded)
        out = np.zeros(
            (len(encoded), encoded[0].shape[0], s_max, self.dim), np.float32
        )
        for i, e in enumerate(encoded):
            out[i, :, : e.shape[1]] = e
        return out


class HFBertConditioner(TextConditioner):
    """Flax BERT over raw strings (jitted, shape-bucketed).

    ``model_name`` mirrors the reference's ``cfg.bert_encoder``
    (bert-base-chinese / bert-base-multilingual-cased). With
    ``pretrained=False`` a random-initialized model of the right
    architecture is built from config only (offline tests).
    """

    def __init__(
        self,
        model_name: str = "bert-base-multilingual-cased",
        max_length: int = 512,
        pad_multiple: int = 16,
        pretrained: bool = True,
        dtype=None,
        hidden_size: int = 0,  # offline-fallback width (0 -> 96); a real
        # (pretrained/cached) model's own width always wins
    ):
        import jax
        import jax.numpy as jnp
        from transformers import FlaxBertModel

        # the Auto* lazy imports route through transformers' torch modeling
        # machinery, which is broken in some environments / import orders;
        # treat them as optional and fall back to the offline path
        try:
            from transformers import AutoConfig, AutoTokenizer
        except Exception:  # pragma: no cover
            AutoConfig = AutoTokenizer = None

        self.max_length = max_length
        self.pad_multiple = pad_multiple
        if pretrained:
            if AutoTokenizer is None:
                raise RuntimeError(
                    "transformers Auto imports unavailable; cannot load a "
                    "pretrained conditioner in this environment"
                )
            self.tokenizer = AutoTokenizer.from_pretrained(model_name)
            self.model = FlaxBertModel.from_pretrained(model_name, from_pt=True)
        else:
            config = None
            if AutoConfig is not None and _cached(model_name):
                try:
                    config = AutoConfig.from_pretrained(model_name)
                    self.tokenizer = AutoTokenizer.from_pretrained(model_name)
                except Exception:
                    config = None
            if config is None:
                from transformers import BertConfig

                config = BertConfig(
                    vocab_size=1024, hidden_size=hidden_size or 96,
                    num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=256,
                    max_position_embeddings=max_length,
                )
                self.tokenizer = _ByteTokenizer(config.vocab_size)
            self.model = FlaxBertModel(config)
        self.dim = self.model.config.hidden_size

        def fwd(params, input_ids, attention_mask):
            out = self.model.module.apply(
                {"params": params},
                input_ids,
                attention_mask,
                jnp.zeros_like(input_ids),
                jnp.broadcast_to(
                    jnp.arange(input_ids.shape[1])[None], input_ids.shape
                ),
            )
            return out.last_hidden_state

        self._fwd = jax.jit(fwd)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        import jax.numpy as jnp

        enc = self.tokenizer(
            list(texts),
            padding=True,
            truncation=True,
            max_length=self.max_length,
            return_tensors="np",
        )
        ids = enc["input_ids"]
        mask = enc["attention_mask"]
        # quantize length so XLA reuses a small set of compiled shapes
        target = -(-ids.shape[1] // self.pad_multiple) * self.pad_multiple
        target = min(target, self.max_length)
        if ids.shape[1] < target:
            pad = target - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        out = self._fwd(self.model.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, np.float32)


class PrecomputedConditioner(TextConditioner):
    """Lookup conditioner backed by a dict / npz of precomputed embeddings."""

    def __init__(self, store: Dict[str, np.ndarray], dim: int, max_length: int = 512):
        self.store = store
        self.dim = dim
        self.max_length = max_length

    @staticmethod
    def key(text: str) -> str:
        return hashlib.sha1(text.encode("utf-8")).hexdigest()

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        embs = [self.store[self.key(t)] for t in texts]
        s_max = min(max(e.shape[0] for e in embs), self.max_length)
        out = np.zeros((len(embs), s_max, self.dim), np.float32)
        for i, e in enumerate(embs):
            s = min(e.shape[0], s_max)
            out[i, :s] = e[:s]
        return out


class _ByteTokenizer:
    """Minimal offline tokenizer (bytes -> ids) for random-init tests."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def __call__(self, texts, padding=True, truncation=True, max_length=512,
                 return_tensors="np"):
        rows = [
            [1] + [2 + (b % (self.vocab_size - 3)) for b in t.encode("utf-8")][: max_length - 2]
            + [2]
            for t in texts
        ]
        n = max(len(r) for r in rows)
        ids = np.zeros((len(rows), n), np.int32)
        mask = np.zeros((len(rows), n), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _cached(model_name: str) -> bool:
    """True when HF has the config locally (zero-egress safe)."""
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained(model_name, local_files_only=True)
        return True
    except Exception:
        return False
