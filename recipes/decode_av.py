"""Audio-visual decode CLI — the deleted upstream ``whisper_decode_video.py``
contract (reference README.md:130-154):

  python recipes/decode_av.py --lang en --model-type large-v2 \
      --modalities avsr --use_av_hubert_encoder 1 --av_fusion separate \
      --checkpoint-path ckpt.pt --av-hubert-ckpt avhubert.pt \
      --beam-size 15 --noise-snr 1000 --manifest data/test.tsv

Modalities: ``asr`` (audio only, test_a), ``vsr`` (video only, test_v),
``avsr`` (both). Outputs hypothesis/reference files + WER.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import whisper_flamingo_tpu as whisper
from whisper_flamingo_tpu.audio import pad_or_trim
from whisper_flamingo_tpu.metrics import wer_cer
from whisper_flamingo_tpu.models.avhubert import (
    VIDEO_ENCODER_CONFIGS,
    AVWhisper,
    init_video_encoder,
    load_avhubert_torch,
)
from whisper_flamingo_tpu.normalizers import BasicTextNormalizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lang", default="en")
    parser.add_argument("--model-type", default="large-v2")
    parser.add_argument("--modalities", default="avsr", choices=["asr", "vsr", "avsr"])
    parser.add_argument("--use_av_hubert_encoder", type=int, default=1)
    parser.add_argument("--av_fusion", default="separate", choices=["separate"])
    parser.add_argument("--checkpoint-path", default="")
    parser.add_argument("--av-hubert-ckpt", default="")
    parser.add_argument("--beam-size", type=int, default=1)
    parser.add_argument("--noise-snr", type=int, default=1000)
    parser.add_argument("--noise-wav", default="",
                        help="babble wav mixed at --noise-snr when snr < 1000 "
                             "(reference: single LRS3 babble file, README.md:68-78)")
    parser.add_argument("--manifest", required=True,
                        help="TSV: id, wav_path, text [, video_path]")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--decode-dir", default="decode_out")
    parser.add_argument("--video-encoder", default="",
                        choices=["", *VIDEO_ENCODER_CONFIGS],
                        help="override the AV-HuBERT size (default: by model-type)")
    args = parser.parse_args()

    # avsr wants the audio-trunk config variant; asr/vsr the video-only one
    default_vcfg = ("large" if "large" in args.model_type else "base") + (
        "-avsr" if args.modalities == "avsr" else ""
    )
    vcfg = VIDEO_ENCODER_CONFIGS[args.video_encoder or default_vcfg]
    model = whisper.load_model(
        args.checkpoint_path or args.model_type,
        add_gated_x_attn=1, num_langs=1, bert_dim=vcfg.embed_dim,
    )
    if args.av_hubert_ckpt:
        from whisper_flamingo_tpu.training.checkpoints import (
            torch_load_prefer_safe,
        )

        state = torch_load_prefer_safe(args.av_hubert_ckpt)
        video_params = load_avhubert_torch(state.get("model", state), vcfg)
    else:
        video_params = init_video_encoder(__import__("jax").random.PRNGKey(0), vcfg)
    av = AVWhisper(whisper=model, video_params=video_params, video_cfg=vcfg)

    from whisper_flamingo_tpu.data.dataset import ManifestAsrSource

    source = ManifestAsrSource(args.manifest, load_video=args.modalities != "asr")
    normalizer = BasicTextNormalizer(remove_diacritics=True)

    # noisy eval (the 0 dB babble protocol): refuse to silently report
    # "noisy" numbers measured on clean audio
    noise_wavs = None
    if args.noise_snr < 1000:
        if not args.noise_wav:
            raise SystemExit("--noise-snr < 1000 requires --noise-wav")
        from whisper_flamingo_tpu.audio import load_audio
        from whisper_flamingo_tpu.data.noise import add_noise

        noise_wavs = [load_audio(args.noise_wav)]
        noise_rng = np.random.default_rng(0)
    options = whisper.DecodingOptions(
        language=args.lang, beam_size=args.beam_size if args.beam_size > 1 else None,
        without_timestamps=True,
    )

    os.makedirs(args.decode_dir, exist_ok=True)
    hyps, refs = [], []
    for start in range(0, len(source), args.batch_size):
        batch = [source[i] for i in range(start, min(start + args.batch_size, len(source)))]
        if noise_wavs is not None:
            for ex in batch:
                ex.audio = add_noise(
                    ex.audio * 32768.0, noise_wavs, args.noise_snr, noise_rng
                ).astype(np.float32) / 32768.0
        mels = np.stack([
            np.asarray(whisper.log_mel_spectrogram(pad_or_trim(ex.audio), n_mels=model.dims.n_mels))
            for ex in batch
        ])
        video = None
        if args.modalities != "asr":
            vids = [ex.video for ex in batch]  # loaded once by the source
            max_t = max(v.shape[0] for v in vids)
            video = np.zeros((len(vids), max_t, *vids[0].shape[1:]), np.float32)
            for i, v in enumerate(vids):
                video[i, : v.shape[0]] = v
        fbanks = None
        if args.modalities == "avsr" and vcfg.audio_feat_dim is not None:
            # the avsr contract feeds the (noise-mixed) audio into the
            # AV-HuBERT audio trunk as stacked log filterbanks at the
            # video rate (reference README.md:130-154)
            from whisper_flamingo_tpu.models.avhubert import stacked_fbank_features

            fbs = [stacked_fbank_features(ex.audio) for ex in batch]
            fbanks = np.zeros((len(fbs), video.shape[1], fbs[0].shape[1]), np.float32)
            for i, fb in enumerate(fbs):
                t = min(len(fb), video.shape[1])
                fbanks[i, :t] = fb[:t]
        results = av.decode(
            mels, options, video=video, audio=fbanks,
            test_a=args.modalities == "asr", test_v=args.modalities == "vsr",
        )
        for ex, r in zip(batch, results):
            hyps.append(normalizer(r.text))
            refs.append(normalizer(ex.text))

    with open(os.path.join(args.decode_dir, "hypo.txt"), "w") as f:
        f.write("\n".join(hyps))
    with open(os.path.join(args.decode_dir, "ref.txt"), "w") as f:
        f.write("\n".join(refs))
    wer, cer = wer_cer(hyps, refs)
    print({"modalities": args.modalities, "snr": args.noise_snr,
           "wer": round(wer, 4), "cer": round(cer, 4), "n": len(hyps)})


if __name__ == "__main__":
    main()
