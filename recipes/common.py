"""Shared recipe plumbing: config -> datasets, loaders, model, conditioner.

Replaces the copy-paste preamble of the reference's ~40 experiment scripts
(SURVEY.md §2.3) with one builder. Dataset selection comes from the
config's ``dataset`` key:

- ``synthetic``  — deterministic random utterances (smoke tests, CI);
- ``manifest:<path>`` — TSV/CSV manifest of wav paths + text
  (+ translation columns);
- ``hf:<name>[:<config>]`` — HuggingFace datasets (librispeech_asr,
  google/fleurs, formospeech/*), needs a local HF cache.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from whisper_flamingo_tpu.config import TrainConfig
from whisper_flamingo_tpu.data.collator import WhisperCollator
from whisper_flamingo_tpu.data.dataset import (
    DataLoader,
    HFAsrSource,
    ManifestAsrSource,
    SpeechDataset,
    SyntheticAsrSource,
)
from whisper_flamingo_tpu.data.samplers import (
    DistributedBatchSampler,
    ShuffledBatchSampler,
    SortedBatchSampler,
)


def build_source(spec: str, split: str, cfg: TrainConfig):
    if spec == "synthetic" or not spec:
        n = int(cfg.extras.get("synthetic_n", 32))
        n_trans = cfg.num_langs if cfg.add_gated_x_attn else 0
        # fixed utterance length -> one padded shape -> one XLA program
        # (smoke configs set this to keep CI compile counts down)
        fixed_sec = cfg.extras.get("synthetic_sec")
        kw = (
            {"min_sec": float(fixed_sec), "max_sec": float(fixed_sec)}
            if fixed_sec
            else {}
        )
        return SyntheticAsrSource(
            n=n if split == "train" else max(n // 4, 2),
            seed=0 if split == "train" else 1,
            n_translations=n_trans,
            **kw,
        )
    if spec.startswith("manifest:"):
        return ManifestAsrSource(spec.split(":", 1)[1].format(split=split))
    if spec.startswith("hf:"):
        parts = spec.split(":")
        name = parts[1]
        config = parts[2] if len(parts) > 2 else None
        return HFAsrSource(name, split=split, config=config)
    raise ValueError(f"unknown dataset spec: {spec!r}")


def build_loader(cfg: TrainConfig, split: str, tokenizer, *, training: bool,
                 translations: bool = False, prompts: bool = False):
    source = build_source(str(cfg.extras.get("dataset", "synthetic")), split, cfg)

    # attach translation conditioning text (trans.txt trees / CSVs) and
    # optionally substitute pseudo-label training text
    # (reference transkd-asr_librispeech.py:103-146, flamingo_amis.yaml:37)
    from whisper_flamingo_tpu.data.translations import (
        CsvLookup,
        TranslatedSource,
        build_lookups,
    )

    # keyed on the SPLIT, not the training flag: pseudo-labeling the train
    # split runs with training=False but must still see the train CSV
    csv_key = cfg.translation_csv_train if split == "train" else cfg.translation_csv_eval
    lookups = build_lookups(
        cfg.translation_base_dirs, [csv_key] if csv_key else []
    )
    if lookups:
        source = TranslatedSource(
            source, lookups,
            drop_missing=bool(cfg.extras.get("drop_missing_translations", False)),
        )
    if training and cfg.use_pseudo_labels and cfg.pseudo_csv_path_train:
        pseudo = CsvLookup(cfg.pseudo_csv_path_train, value_column="pseudo_text")

        class _PseudoSource:
            def __init__(self, base):
                self.base = base

            def __len__(self):
                return len(self.base)

            def lengths(self):
                return self.base.lengths()

            def __getitem__(self, idx):
                ex = self.base[idx]
                replacement = pseudo(ex.id)
                if replacement:
                    ex.text = replacement
                return ex

        source = _PseudoSource(source)
    noise_wavs = []
    noise_fn = cfg.noise_fn if training else cfg.noise_fn_val
    if noise_fn and os.path.exists(noise_fn):
        with open(noise_fn) as f:  # tsv of noise wav paths (reference utils.py:30)
            noise_wavs = [line.split("\t")[0].strip() for line in f if line.strip()]
    # eval-time noise (the 0 dB babble protocol) via noise_prob_eval;
    # snr >= 1000 means effectively clean (reference --noise-snr 1000)
    eval_noise_prob = float(cfg.extras.get("noise_prob_eval", 0.0))
    if cfg.noise_snr_eval >= 1000:
        eval_noise_prob = 0.0
    ds = SpeechDataset(
        source=source,
        tokenizer=tokenizer,
        audio_max_length=cfg.audio_max_length,
        spec_augment=cfg.spec_augment if training else "",
        noise_prob=cfg.noise_prob if training else eval_noise_prob,
        noise_wavs=noise_wavs,
        noise_snr=cfg.noise_snr_train if training else cfg.noise_snr_eval,
        translations_use=translations,
        prompt_use=prompts,
        max_prompt_len=cfg.max_prompt_len,
        seed=cfg.seed,
        training=training,
    )
    # under a mesh the global batch must divide the data axis: use exact
    # fixed-size batches (drop ragged remainders)
    drop_last = cfg.num_devices * cfg.tp_size > 1
    sampler = SortedBatchSampler(
        batch_size=cfg.batch_size, shapes=ds.mel_lengths(), drop_last=drop_last
    )
    if training:
        sampler = ShuffledBatchSampler(sampler, seed=cfg.seed)
    if cfg.num_devices > 1 and "process_index" in cfg.extras:
        sampler = DistributedBatchSampler(
            sampler, cfg.num_devices, int(cfg.extras["process_index"])
        )
    return DataLoader(ds, sampler, WhisperCollator())


def setup_mesh(cfg: TrainConfig):
    """Build the (data, model) mesh when the config asks for parallelism.

    ``num_devices`` x ``tp_size`` must match the available devices
    (reference num_devices semantics, whisper_ft_librispeech.py:362-377 —
    but GSPMD shardings instead of DDP)."""
    total = cfg.num_devices * cfg.tp_size
    if total <= 1:
        return None
    from whisper_flamingo_tpu.parallel.mesh import make_mesh

    return make_mesh(cfg.num_devices, cfg.tp_size)


def build_model(cfg: TrainConfig, *, gated: bool = None):
    from whisper_flamingo_tpu import load_model

    gated = cfg.add_gated_x_attn if gated is None else gated
    model = load_model(
        cfg.model_name,
        dropout_rate=cfg.dropout_rate,
        add_gated_x_attn=1 if gated else 0,
        bert_dim=cfg.bert_dim,
        num_langs=cfg.num_langs,
        seed=cfg.seed,
        dtype=cfg.compute_dtype,
    )
    if cfg.pt_ckpt:
        from whisper_flamingo_tpu.training.checkpoints import load_torch_checkpoint

        model.params, _ = load_torch_checkpoint(cfg.pt_ckpt, model.dims, model.extras)
    return model


def maybe_cast_frozen(cfg: TrainConfig, params, trainable_mask):
    """Store frozen subtrees in bf16 when computing in bf16 (numerically
    identical — weights are cast at use anyway; halves frozen-param HBM,
    which is what fits the 2.2B-param gated large-v2 on one 16 GB v5e).
    Disable with ``frozen_params_bf16: false``."""
    import jax.numpy as jnp

    from whisper_flamingo_tpu.training.steps import cast_frozen_bf16

    if cfg.compute_dtype != jnp.bfloat16:
        return params
    if not cfg.extras.get("frozen_params_bf16", True):
        return params
    return cast_frozen_bf16(params, trainable_mask)


def build_conditioner(cfg: TrainConfig):
    from whisper_flamingo_tpu.models.bert import HFBertConditioner

    pretrained = bool(cfg.extras.get("bert_pretrained", True))
    cond = HFBertConditioner(
        cfg.bert_encoder, pretrained=pretrained,
        hidden_size=int(cfg.bert_dim or 0),  # honored by the offline stub
    )
    if cond.dim != cfg.bert_dim:
        # fail at build time with the real story, not with a shape/KeyError
        # deep inside the jitted step (the model only creates xt_projection
        # when bert_dim != n_text_state, so a conditioner of the wrong
        # width cannot be silently projected)
        raise ValueError(
            f"conditioner '{cfg.bert_encoder}' emits {cond.dim}-dim states "
            f"but the config says bert_dim={cfg.bert_dim}; set bert_dim to "
            "the conditioner's true width"
        )
    return cond


def make_xt_prepare(conditioner, num_langs: int):
    """Batch hook: run the text conditioner over the translation strings
    (reference whisper-flamingo_amis.py:182-193 / transkd:284-310)."""

    def prepare(batch):
        if "all_translations" not in batch:
            return batch
        per_lang = list(zip(*batch["all_translations"]))[:num_langs]
        batch = dict(batch)
        batch["xt"] = conditioner.encode_multi(per_lang)
        return batch

    return prepare


def load_config(argv=None) -> TrainConfig:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="yaml config path")
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args(argv)
    overrides = {}
    for item in args.overrides:
        k, v = item.split("=", 1)
        try:
            import ast

            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        overrides[k] = v
    cfg = TrainConfig.from_yaml(args.config, **overrides)
    if cfg.extras.get("platform"):  # e.g. smoke configs force CPU
        jax.config.update("jax_platforms", str(cfg.extras["platform"]))
    if cfg.extras.get("cpu_devices"):  # virtual device count for CPU meshes
        jax.config.update("jax_num_cpu_devices", int(cfg.extras["cpu_devices"]))
    return cfg
