"""Pseudo-label generation (reference family F:
`generate_pseudo_labels_{librispeech_flamingo,librispeech_prompt,taigi,
taigi_prompt,kloka_crawled,ml-superb,oracle}.py`).

Run: python recipes/generate_pseudo_labels.py <config.yaml> [out=labels.csv]

Offline batch inference of the (optionally translation-conditioned)
teacher. NB parity: the reference uses TEACHER-FORCED ARGMAX rather than
free-running decode (`generate_pseudo_labels_librispeech_flamingo.py:
264-277`); output CSV columns are id,pseudo_text,ground_truth,wer
(`:288-301`). Set ``free_decode: true`` to use real (greedy/beam)
decoding instead.
"""

import csv

import numpy as np

from common import (
    build_conditioner,
    build_loader,
    build_model,
    load_config,
    make_xt_prepare,
)

from whisper_flamingo_tpu.metrics import wer_cer
from whisper_flamingo_tpu.normalizers import BasicTextNormalizer
from whisper_flamingo_tpu.tokenizer import get_tokenizer
from whisper_flamingo_tpu.training.steps import make_eval_step
from whisper_flamingo_tpu.training.trainer import _device_batch


def main():
    cfg = load_config()
    out_path = cfg.extras.get("out", f"pseudo_labels_{cfg.train_id}.csv")
    use_xt = bool(cfg.add_gated_x_attn)

    model = build_model(cfg)
    tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages, language=cfg.lang, task="transcribe")
    loader = build_loader(cfg, "train", tokenizer, training=False, translations=use_xt)
    prepare = (
        make_xt_prepare(build_conditioner(cfg), cfg.num_langs) if use_xt else None
    )
    eval_step = make_eval_step(model.dims, use_xt=use_xt, dtype=cfg.compute_dtype)
    normalizer = BasicTextNormalizer(remove_diacritics=True)

    free_decode = bool(cfg.extras.get("free_decode", False))
    if free_decode:
        from whisper_flamingo_tpu.audio import pad_or_trim
        from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask

        beam = cfg.extras.get("beam_size")
        task = DecodingTask(
            model,
            DecodingOptions(
                language=cfg.lang, without_timestamps=True,
                beam_size=int(beam) if beam else None,
                fp16="16" in str(cfg.precision),
            ),
        )

    rows = []
    for batch in loader:
        if prepare is not None:
            batch = prepare(batch)
        if free_decode:
            mel = pad_or_trim(np.asarray(batch["input_ids"]), 3000, axis=-1)
            results = task.run(mel, xt=batch.get("xt"))
            pseudos = [r.text.strip() for r in results]
        else:
            _, preds = eval_step(model.params, _device_batch(batch))
            preds = np.asarray(preds)
            labels = np.asarray(batch["labels"])
            pseudos = []
            for i in range(preds.shape[0]):
                mask = labels[i] != -100
                hyp_tokens = [int(t) for t in preds[i][mask] if t != tokenizer.eot]
                pseudos.append(tokenizer.decode(hyp_tokens).strip())
        for i, pseudo in enumerate(pseudos):
            truth = batch["text"][i]
            wer, _ = wer_cer([normalizer(pseudo)], [normalizer(truth)])
            rows.append(
                {"id": batch["ids"][i], "pseudo_text": pseudo,
                 "ground_truth": truth, "wer": round(wer, 4)}
            )

    with open(out_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["id", "pseudo_text", "ground_truth", "wer"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} pseudo labels to {out_path}")


if __name__ == "__main__":
    main()
