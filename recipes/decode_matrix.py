"""Decode-matrix fan-out: evaluate over (language x SNR x modality) like
the reference's SLURM wrapper (`slurm/whisper_decode_video_slurm_wrapper.sh:
55-70` — 7 langs x {clean, 0 dB} x {asr, avsr}, beam 15).

Run: python recipes/decode_matrix.py <config.yaml> \
        langs=en,el,es,fr,it,pt,ru snrs=1000,0 beam_size=15

Instead of SLURM job fan-out, the matrix runs as a loop of compiled
batched decodes on this host (each cell is itself batched); results are
aggregated into one JSON table (the reference collected results with
slurm/check_results.ipynb).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from common import build_conditioner, build_loader, build_model, load_config, make_xt_prepare

from whisper_flamingo_tpu.audio import pad_or_trim
from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
from whisper_flamingo_tpu.metrics import wer_cer
from whisper_flamingo_tpu.normalizers import BasicTextNormalizer
from whisper_flamingo_tpu.tokenizer import get_tokenizer


def main():
    cfg = load_config()
    langs = str(cfg.extras.get("langs", cfg.lang)).split(",")
    # load_config literal_evals overrides, so `snrs=1000,0` arrives as the
    # tuple (1000, 0) — accept both that and a comma string
    raw_snrs = cfg.extras.get("snrs", "1000")
    if isinstance(raw_snrs, (tuple, list)):
        snrs = [int(s) for s in raw_snrs]
    else:
        snrs = [int(s) for s in str(raw_snrs).split(",")]
    if any(s < 1000 for s in snrs) and not (
        cfg.noise_fn_val and os.path.exists(cfg.noise_fn_val)
    ):
        raise SystemExit(
            "noisy decode cells (snr < 1000) need noise_fn_val pointing at "
            "an EXISTING tsv of noise wav paths — otherwise the 'noisy' "
            "rows would silently measure clean audio"
        )
    beam = cfg.extras.get("beam_size")
    split = cfg.extras.get("split", "validation")
    out_path = cfg.extras.get("out", f"decode_matrix_{cfg.train_id}.json")
    use_xt = bool(cfg.add_gated_x_attn)

    model = build_model(cfg)
    prepare = make_xt_prepare(build_conditioner(cfg), cfg.num_langs) if use_xt else None
    normalizer = BasicTextNormalizer(remove_diacritics=True)

    table = {}
    for lang in langs:
        tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages, language=lang, task="transcribe")
        for snr in snrs:
            cell_cfg = cfg
            cell_cfg.noise_snr_eval = snr
            cell_cfg.extras["noise_prob_eval"] = 0.0 if snr >= 1000 else 1.0
            loader = build_loader(cell_cfg, split, tokenizer, training=False,
                                  translations=use_xt)
            task = DecodingTask(
                model,
                DecodingOptions(
                    language=lang, without_timestamps=True,
                    beam_size=int(beam) if beam else None,
                    fp16="16" in str(cfg.precision),
                ),
            )
            hyps, refs = [], []
            for batch in loader:
                if prepare is not None:
                    batch = prepare(batch)
                mel = pad_or_trim(np.asarray(batch["input_ids"]), 3000, axis=-1)
                for r, ref in zip(task.run(mel, xt=batch.get("xt")), batch["text"]):
                    hyps.append(normalizer(r.text))
                    refs.append(normalizer(ref))
            wer, cer = wer_cer(hyps, refs)
            key = f"{lang}/snr{snr}"
            table[key] = {"wer": round(wer, 4), "cer": round(cer, 4), "n": len(hyps)}
            print(key, table[key])

    with open(out_path, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
