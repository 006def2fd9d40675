"""Offline translation generation (reference `translation/` pipeline:
one script per engine/direction — seamlessm4t_eng-*.py, mbart.py,
m2m100.py, t5.py, opus_mt.py — unified here behind --engine).

Produces the conditioning text consumed by Trans-ASR / TransKD:

- LibriSpeech layout: mirrors per-chapter ``*.trans.txt`` trees
  (reference translation/seamlessm4t_eng-deu.py:14-34 output shape);
- manifest/CSV layout: ``*_translated_ind_{split}.csv`` with columns
  id,text,translation (the Formosan-language shape).

Usage:
  python recipes/translate.py --engine seamless-m4t --src eng --tgt deu \
      --input data/librispeech/train-clean-100 --output out_dir
  python recipes/translate.py --engine m2m100 --src en --tgt fr \
      --input data/train.csv --output out.csv

Per-batch failures emit empty translations instead of aborting (parity
with the reference's catch-and-continue, seamlessm4t_eng-deu.py:31-34).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENGINES = {
    "seamless-m4t": "facebook/seamless-m4t-v2-large",
    "mbart": "facebook/mbart-large-50-many-to-many-mmt",
    "m2m100": "facebook/m2m100_418M",
    "t5": "google-t5/t5-base",
    "opus-mt": "Helsinki-NLP/opus-mt-{src}-{tgt}",
}


def build_translator(engine: str, model_name: str, src: str, tgt: str, batch_size: int):
    """Return fn(list[str]) -> list[str]. Needs a local HF cache."""
    from transformers import pipeline

    if engine == "t5":
        task = f"translation_{src}_to_{tgt}"
        pipe = pipeline(task, model=model_name)
        return lambda texts: [r["translation_text"] for r in pipe(texts, batch_size=batch_size)]

    kwargs = {}
    if engine in ("mbart", "m2m100", "seamless-m4t"):
        kwargs = {"src_lang": src, "tgt_lang": tgt}
    pipe = pipeline("translation", model=model_name, **kwargs)
    return lambda texts: [r["translation_text"] for r in pipe(texts, batch_size=batch_size)]


def iter_librispeech_trans(root: str):
    """Yield (trans_file_path, [(utt_id, text), ...]) per chapter."""
    for dirpath, _, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".trans.txt"):
                path = os.path.join(dirpath, fn)
                rows = []
                with open(path) as f:
                    for line in f:
                        utt_id, text = line.strip().split(" ", 1)
                        rows.append((utt_id, text))
                yield path, rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--engine", choices=sorted(ENGINES), required=True)
    parser.add_argument("--model", default=None, help="override HF model name")
    parser.add_argument("--src", required=True)
    parser.add_argument("--tgt", required=True)
    parser.add_argument("--input", required=True,
                        help="LibriSpeech split dir or CSV with id,text columns")
    parser.add_argument("--output", required=True)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    model_name = args.model or ENGINES[args.engine].format(src=args.src, tgt=args.tgt)
    translate = build_translator(args.engine, model_name, args.src, args.tgt,
                                 args.batch_size)

    def safe_translate(texts):
        try:
            return translate(texts)
        except Exception as e:  # parity: emit empties, keep going
            print(f"batch failed ({type(e).__name__}: {e}); emitting empties")
            return [""] * len(texts)

    if os.path.isdir(args.input):
        # LibriSpeech tree -> mirrored .trans.txt tree
        n = 0
        for path, rows in iter_librispeech_trans(args.input):
            rel = os.path.relpath(path, args.input)
            out_path = os.path.join(args.output, rel)
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            translations = safe_translate([t for _, t in rows])
            with open(out_path, "w") as f:
                for (utt_id, _), tr in zip(rows, translations):
                    f.write(f"{utt_id} {tr}\n")
            n += len(rows)
        print(f"translated {n} utterances into {args.output}")
    else:
        # CSV -> CSV with translation column
        with open(args.input, newline="") as f:
            rows = list(csv.DictReader(f))
        texts = [r.get("text", "") for r in rows]
        translations = []
        for i in range(0, len(texts), args.batch_size):
            translations.extend(safe_translate(texts[i : i + args.batch_size]))
        for r, tr in zip(rows, translations):
            r["translation"] = tr
        with open(args.output, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        print(f"translated {len(rows)} rows into {args.output}")


if __name__ == "__main__":
    main()
