"""Whisper-Flamingo demo: the reference Colab notebook flow
(`/root/reference/notebooks/whisper_flamingo_demo.ipynb`) as a script.

1. load a (gated-x-attn) model,
2. batch-decode 30 s segments with beam search,
3. optionally condition on a second stream (video features or translated
   text embeddings),
4. score WER with the fairseq-style protocol (normalized text).

With no arguments it runs self-contained on synthetic audio and a
randomly initialized debug model (no downloads); point ``--model`` at a
real checkpoint and ``--audio`` at wav files for real transcription.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import whisper_flamingo_tpu as whisper
from whisper_flamingo_tpu.metrics import wer_cer
from whisper_flamingo_tpu.normalizers import BasicTextNormalizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="debug")
    parser.add_argument("--audio", nargs="*", default=[])
    parser.add_argument("--language", default="en")
    parser.add_argument("--beam_size", type=int, default=None)
    parser.add_argument("--platform", default=None, help="e.g. cpu for local runs")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    model = whisper.load_model(args.model)
    print(f"model={args.model} dims={model.dims.n_audio_state}x{model.dims.n_audio_layer}")

    if args.audio:
        waves = [whisper.load_audio(path) for path in args.audio]
    else:
        print("no audio given; using synthetic noise (debug demo)")
        rng = np.random.default_rng(0)
        waves = [rng.standard_normal(16000 * 5).astype(np.float32) * 0.05
                 for _ in range(2)]

    mels = np.stack([
        np.asarray(whisper.log_mel_spectrogram(whisper.pad_or_trim(w), n_mels=model.dims.n_mels))
        for w in waves
    ])
    options = whisper.DecodingOptions(
        language=args.language,
        beam_size=args.beam_size,
        without_timestamps=True,
        sample_len=32 if args.model == "debug" else None,
        fp16=args.model != "debug",
    )
    results = whisper.decode(model, mels, options)
    normalizer = BasicTextNormalizer(remove_diacritics=True)
    for i, r in enumerate(results):
        print(f"[{i}] avg_logprob={r.avg_logprob:.3f}  text={r.text!r}")

    if len(results) >= 2:
        wer, cer = wer_cer(
            [normalizer(results[0].text)], [normalizer(results[1].text)]
        )
        print(f"(demo metric plumbing: wer={wer:.3f} cer={cer:.3f})")


if __name__ == "__main__":
    main()
