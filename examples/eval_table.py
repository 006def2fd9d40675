"""Notebook-equivalent eval table (reference
``notebooks/whisper_flamingo_demo.ipynb`` cells 13-31): reproduce the
Table-4 flow — batched decode of an audio-only Whisper and an
audio-visual Whisper-Flamingo for En ASR (fairseq-13a WER) and En-Ru ST
(sacreBLEU), clean and at 0 dB babble.

With no checkpoints in the environment (zero egress) the models fall
back to random init and the numbers are meaningless — the point is the
executable protocol: the same data path, noise mixing, decode options,
normalizer, and scoring as the notebook. Point ``--checkpoint`` /
``--flamingo-checkpoint`` / ``--video-model-ckpt`` at the released
``whisper_en-x_small.pt`` / ``whisper-flamingo_en-x_small.pt`` /
``large_noise_pt_noise_ft_433h.pt`` files and ``--manifest`` at a MuAViC
test TSV to reproduce the published table (beam 15:
``--beam-size 15``; the notebook's default is beam 1).

CI runs this on synthetic data: ``python examples/eval_table.py
--platform cpu --model-type debug --synthetic 4``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Synthetic references: En ASR transcripts and their Ru translations
# (the ST task scores hypotheses against Russian references —
# notebook cell 20: sacrebleu.corpus_bleu(hypo, [refs])).
SYNTH_TEXT = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "speech recognition systems transcribe spoken language",
        "the weather was clear and the road was empty",
        "she read the report twice before the meeting",
        "a small boat crossed the river at dawn",
        "the museum opens at nine in the morning",
        "he carried two heavy bags up the stairs",
        "music played softly in the next room",
    ],
    "ru": [
        "быстрая коричневая лиса перепрыгивает через ленивую собаку",
        "системы распознавания речи транскрибируют устную речь",
        "погода была ясной и дорога была пустой",
        "она дважды прочитала отчет перед совещанием",
        "маленькая лодка пересекла реку на рассвете",
        "музей открывается в девять утра",
        "он нес две тяжелые сумки вверх по лестнице",
        "в соседней комнате тихо играла музыка",
    ],
}


def synthetic_examples(n, seed=3407):
    """n seeded (audio, {lang: ref}) pairs; audio is band-limited noise."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        dur = 16000 * int(rng.integers(2, 4))
        wave = (rng.standard_normal(dur) * 0.05).astype(np.float32)
        out.append((wave, {lang: SYNTH_TEXT[lang][i % len(SYNTH_TEXT[lang])]
                           for lang in SYNTH_TEXT}))
    return out


def manifest_examples(path, lang):
    """MuAViC-style TSV: id, wav_path [, video_path], text."""
    from whisper_flamingo_tpu.data.dataset import ManifestAsrSource

    src = ManifestAsrSource(path, load_video=False)
    return [(src[i].audio, {lang: src[i].text}) for i in range(len(src))]


def score(hyps, refs, lang):
    """Notebook cell 20: En -> fairseq-13a WER, otherwise corpus BLEU."""
    if lang == "en":
        from whisper_flamingo_tpu.metrics import fairseq_wer

        return "WER%", 100.0 * fairseq_wer(hyps, refs)
    try:
        import sacrebleu

        return "BLEU", sacrebleu.corpus_bleu(hyps, [refs]).score
    except ImportError:
        from whisper_flamingo_tpu.metrics import wer_cer

        return "WER%(no-sacrebleu)", 100.0 * wer_cer(hyps, refs)[0]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-type", default="small")
    parser.add_argument("--checkpoint", default="",
                        help="audio-only system weights (whisper_en-x_small.pt)")
    parser.add_argument("--flamingo-checkpoint", default="",
                        help="AV system weights (whisper-flamingo_en-x_small.pt)")
    parser.add_argument("--video-model-ckpt", default="",
                        help="AV-HuBERT weights (large_noise_pt_noise_ft_433h.pt)")
    parser.add_argument("--manifest", default="",
                        help="test TSV; default: synthetic utterances")
    parser.add_argument("--synthetic", type=int, default=4,
                        help="synthetic utterance count when no --manifest")
    parser.add_argument("--langs", default="en,ru")
    parser.add_argument("--snrs", default="1000,0",
                        help="1000 = clean (reference noise_snr convention)")
    parser.add_argument("--noise-wav", default="",
                        help="babble wav; synthetic babble if omitted")
    parser.add_argument("--beam-size", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--sample-len", type=int, default=None,
                        help="cap decode length (CI synthetic runs)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import whisper_flamingo_tpu as whisper
    from whisper_flamingo_tpu.audio import pad_or_trim
    from whisper_flamingo_tpu.data.noise import add_noise
    from whisper_flamingo_tpu.models.avhubert import (
        VIDEO_ENCODER_CONFIGS,
        AVWhisper,
        init_video_encoder,
        load_avhubert_torch,
        stacked_fbank_features,
    )
    from whisper_flamingo_tpu.normalizers import (
        BasicTextNormalizer,
        EnglishTextNormalizer,
    )

    langs = args.langs.split(",")
    snrs = [int(s) for s in args.snrs.split(",")]
    debug = args.model_type == "debug"
    sample_len = args.sample_len if args.sample_len else (16 if debug else None)

    # ---- systems (notebook cells 15 and 26) -----------------------------
    audio_model = whisper.load_model(args.checkpoint or args.model_type)
    vcfg_name = ("debug-av" if debug
                 else ("large" if "large" in args.model_type else "base") + "-avsr")
    vcfg = VIDEO_ENCODER_CONFIGS[vcfg_name]
    flamingo = whisper.load_model(
        args.flamingo_checkpoint or args.model_type,
        add_gated_x_attn=1, num_langs=1, bert_dim=vcfg.embed_dim,
    )
    if args.video_model_ckpt:
        from whisper_flamingo_tpu.training.checkpoints import torch_load_prefer_safe

        state = torch_load_prefer_safe(args.video_model_ckpt)
        video_params = load_avhubert_torch(state.get("model", state), vcfg)
    else:
        import jax

        video_params = init_video_encoder(jax.random.PRNGKey(0), vcfg)
    av = AVWhisper(whisper=flamingo, video_params=video_params, video_cfg=vcfg)

    # ---- noise (notebook cell 11: one babble wav mixed at --snr) --------
    if args.noise_wav:
        noise = [whisper.load_audio(args.noise_wav)]
    else:  # synthetic babble: sum of shifted utterance copies
        rng = np.random.default_rng(1)
        noise = [np.sum([np.roll(rng.standard_normal(16000 * 4), s)
                         for s in (0, 1777, 6151)], axis=0).astype(np.float32) * 0.05]

    en_norm = EnglishTextNormalizer()
    basic_norm = BasicTextNormalizer(remove_diacritics=True)

    def decode_system(name, lang, snr):
        examples = (manifest_examples(args.manifest, lang) if args.manifest
                    else synthetic_examples(args.synthetic))
        options = whisper.DecodingOptions(
            language=lang, without_timestamps=True,
            beam_size=args.beam_size if args.beam_size > 1 else None,
            task="transcribe" if lang == "en" else "translate",
            sample_len=sample_len, fp16=not debug,
        )
        norm = en_norm if lang == "en" else basic_norm
        noise_rng = np.random.default_rng(0)
        hyps, refs = [], []
        for start in range(0, len(examples), args.batch_size):
            chunk = examples[start:start + args.batch_size]
            waves = []
            for wave, _ in chunk:
                if snr < 1000:
                    wave = add_noise(wave * 32768.0, noise, snr,
                                     noise_rng).astype(np.float32) / 32768.0
                waves.append(wave)
            mels = np.stack([
                np.asarray(whisper.log_mel_spectrogram(
                    pad_or_trim(w), n_mels=audio_model.dims.n_mels))
                for w in waves
            ])
            if name == "audio":
                results = whisper.decode(audio_model, mels, options)
            else:  # avsr: synthetic video + real stacked-fbank audio trunk
                vrng = np.random.default_rng(start)
                t = 24 if debug else 64
                hw = 48 if debug else 88
                video = vrng.standard_normal(
                    (len(chunk), t, hw, hw)).astype(np.float32)
                fbanks = None
                if vcfg.audio_feat_dim is not None:
                    # trunk width is 104 for the real configs; the debug
                    # trunk is narrower, so crop the feature axis to fit
                    fbs = [stacked_fbank_features(w) for w in waves]
                    fbanks = np.zeros(
                        (len(fbs), t, vcfg.audio_feat_dim), np.float32)
                    for i, fb in enumerate(fbs):
                        tt = min(len(fb), t)
                        fbanks[i, :tt] = fb[:tt, :vcfg.audio_feat_dim]
                results = av.decode(mels, options, video=video, audio=fbanks)
            for (_, ref_by_lang), r in zip(chunk, results):
                hyps.append(norm(r.text))
                refs.append(norm(ref_by_lang[lang]))
        return score(hyps, refs, lang)

    rows = []
    for sys_name, label in (("audio", f"Whisper {args.model_type} (audio)"),
                            ("avsr", f"Whisper-Flamingo {args.model_type} (AV)")):
        for lang in langs:
            task = "En ASR" if lang == "en" else f"En-{lang.title()} ST"
            vals = {}
            for snr in snrs:
                metric, v = decode_system(sys_name, lang, snr)
                vals[snr] = (metric, v)
            rows.append((label, task, vals))

    col = {1000: "clean"}
    headers = ["System", "Task", "Metric"] + [
        col.get(s, f"{s} dB babble") for s in snrs]
    widths = [max(len(h), 34) for h in headers[:1]] + [12] * (len(headers) - 1)
    line = "| " + " | ".join(h.ljust(w) for h, w in zip(headers, widths)) + " |"
    print(line)
    print("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for label, task, vals in rows:
        metric = next(iter(vals.values()))[0]
        cells = [label, task, metric] + [f"{vals[s][1]:.2f}" for s in snrs]
        print("| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |")
    if not (args.checkpoint and args.flamingo_checkpoint):
        print("\n(random-init weights — numbers are plumbing-only; pass "
              "--checkpoint/--flamingo-checkpoint/--video-model-ckpt for "
              "the published table)")


if __name__ == "__main__":
    main()
