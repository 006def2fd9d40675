"""Out-of-domain / batched evaluation (reference family G:
`whisper_eval_fleurs.py`, `trans-ASR_eval_fleurs.py`, plus the deleted
canonical free-decode matrix `slurm/whisper_decode_video_slurm*.sh`).

Run: python recipes/evaluate.py <config.yaml> [mode=teacher_forced|decode]
                                              [beam_size=N] [split=test]

- ``teacher_forced``: validation-style loss/acc/WER/CER (the reference's
  trainer.validate path);
- ``decode``: real batched (greedy or beam) decoding + normalized WER —
  the protocol of the published results (beam 15 reported / beam 1 quick,
  README.md:113-117).
"""

import time

import numpy as np

from common import (
    build_conditioner,
    build_loader,
    build_model,
    load_config,
    make_xt_prepare,
)

from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
from whisper_flamingo_tpu.metrics import wer_cer
from whisper_flamingo_tpu.normalizers import BasicTextNormalizer
from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.steps import make_eval_step
from whisper_flamingo_tpu.training.trainer import Trainer


def main():
    cfg = load_config()
    mode = cfg.extras.get("mode", "teacher_forced")
    split = cfg.extras.get("split", "validation")
    use_xt = bool(cfg.add_gated_x_attn)

    model = build_model(cfg)
    tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages, language=cfg.lang, task="transcribe")
    loader = build_loader(cfg, split, tokenizer, training=False, translations=use_xt)
    prepare = make_xt_prepare(build_conditioner(cfg), cfg.num_langs) if use_xt else None

    if mode == "teacher_forced":
        trainer = Trainer(
            cfg=cfg, dims=model.dims, train_step=None,
            eval_step=make_eval_step(model.dims, use_xt=use_xt, dtype=cfg.compute_dtype),
            prepare_batch=prepare,
        )
        metrics = trainer.validate(model.params, {split: loader})
        print({k: round(v, 4) for k, v in metrics.items()})
        return

    # free-running batched decode
    beam = cfg.extras.get("beam_size")
    options = DecodingOptions(
        language=cfg.lang,
        without_timestamps=True,
        beam_size=int(beam) if beam else None,
        fp16="16" in str(cfg.precision),
    )
    task = DecodingTask(model, options)
    normalizer = BasicTextNormalizer(remove_diacritics=True)
    hyps, refs = [], []
    t0 = time.time()
    audio_seconds = 0.0
    for batch in loader:
        if prepare is not None:
            batch = prepare(batch)
        from whisper_flamingo_tpu.audio import pad_or_trim

        mel = pad_or_trim(np.asarray(batch["input_ids"]), 3000, axis=-1)
        results = task.run(mel, xt=batch.get("xt"))
        audio_seconds += float(np.sum(batch["wav_lens"])) / 16000.0
        for r, ref in zip(results, batch["text"]):
            hyps.append(normalizer(r.text))
            refs.append(normalizer(ref))
    wall = time.time() - t0
    wer, cer = wer_cer(hyps, refs)
    out = {
        "split": split,
        "n_utts": len(hyps),
        "wer": round(wer, 4),
        "cer": round(cer, 4),
        "rtf": round(audio_seconds / max(wall, 1e-9), 2),
    }
    if cfg.extras.get("bleu"):  # En->X protocol (reference notebook cell 20)
        try:
            import sacrebleu

            out["bleu"] = round(
                sacrebleu.corpus_bleu(hyps, [refs]).score, 2
            )
        except ImportError:
            pass
    print(out)


if __name__ == "__main__":
    main()
