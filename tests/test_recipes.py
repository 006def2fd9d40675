"""Default-on end-to-end recipe smokes (VERDICT r1 #7: every recipe
``main()`` must run in the default suite — the commit-67ac805 class of
import-time crash is invisible to unit tests).

Runs IN-PROCESS (not subprocess) so the jax runtime and the lru-cached
compiled programs are shared across cells: all smoke configs use the same
``debug`` model dims, so encoder/decoder/train programs compile once.
Each cell is a real recipe run on synthetic data with 2-4 train steps.
"""

import importlib.util
import os
import sys
import wave

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPES_DIR = os.path.join(ROOT, "recipes")
if RECIPES_DIR not in sys.path:
    sys.path.insert(0, RECIPES_DIR)

_MODULES = {}


def _recipe_main(script: str):
    if script not in _MODULES:
        spec = importlib.util.spec_from_file_location(
            "recipe_" + os.path.splitext(os.path.basename(script))[0],
            os.path.join(ROOT, script),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MODULES[script] = mod
    return _MODULES[script].main


RECIPES = [
    # family A: audio-only FT; DP x TP variant on the virtual mesh
    ("recipes/whisper_ft.py", "configs/smoke/ft.yaml", []),
    ("recipes/whisper_ft.py", "configs/smoke/ft_dp.yaml", []),
    # family B: prompted FT (sot_prev splice + frozen encoder)
    ("recipes/whisper_ft.py", "configs/smoke/ft.yaml",
     ["use_prompt=true", "train_id=smoke_ft_prompt"]),
    # family C: Trans-ASR bilingual / trilingual / oracle
    ("recipes/trans_asr.py", "configs/smoke/trans_asr.yaml", []),
    # bf16 path: exercises the frozen-params-bf16 cast (mixed-dtype state)
    ("recipes/trans_asr.py", "configs/smoke/trans_asr.yaml",
     ["precision=16-mixed", "train_id=smoke_trans_asr_bf16"]),
    ("recipes/trans_asr.py", "configs/smoke/trans_asr_trilingual.yaml", []),
    ("recipes/trans_asr.py", "configs/smoke/trans_asr_oracle.yaml", []),
    # family D: TransKD distillation
    ("recipes/transkd_asr.py", "configs/smoke/transkd.yaml", []),
    # family E: prompt distillation
    ("recipes/distil_prompt.py", "configs/smoke/distil_prompt.yaml", []),
    # AV surface
    ("recipes/av_train.py", "configs/smoke/av.yaml", []),
    # avsr: audio+video trunk — the fbank stream rides the train step
    ("recipes/av_train.py", "configs/smoke/av.yaml",
     ["video_encoder=debug-av", "train_id=smoke_avsr"]),
    # family G: eval — free decode and teacher-forced with conditioning
    ("recipes/evaluate.py", "configs/smoke/ft.yaml",
     ["mode=decode", "beam_size=2"]),
    ("recipes/evaluate.py", "configs/smoke/trans_asr.yaml",
     ["mode=teacher_forced"]),
    # family F: pseudo-labels
    ("recipes/generate_pseudo_labels.py", "configs/smoke/trans_asr.yaml",
     ["out={tmp}/pl.csv"]),
    # family H: keyword stats
    ("recipes/keyword_stats.py", "configs/smoke/ft.yaml",
     ["out={tmp}/kw.json"]),
    # decode matrix (lang x SNR fan-out)
    ("recipes/decode_matrix.py", "configs/smoke/trans_asr.yaml",
     ["langs=en", "snrs=1000", "out={tmp}/matrix.json"]),
]


@pytest.mark.parametrize(
    "script,config,overrides",
    RECIPES,
    ids=[f"{r[0].split('/')[-1]}:{r[1].split('/')[-1]}:{'+'.join(r[2])}" for r in RECIPES],
)
def test_recipe_smoke(script, config, overrides, tmp_path, monkeypatch):
    overrides = [o.format(tmp=tmp_path) for o in overrides]
    argv = [
        script,
        config,
        *overrides,
        f"check_output_dir={tmp_path}/ckpt",
        f"log_output_dir={tmp_path}/logs",
    ]
    monkeypatch.chdir(ROOT)
    monkeypatch.setattr(sys, "argv", argv)
    _recipe_main(script)()


def _write_wav(path, seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(int(seconds * sr)) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return path


def test_decode_av_recipe(tmp_path, monkeypatch):
    """The upstream whisper_decode_video.py CLI contract end-to-end
    (asr modality, debug sizes, wav manifest)."""
    for i in range(2):
        _write_wav(tmp_path / f"u{i}.wav", seed=i)
    manifest = tmp_path / "test.tsv"
    manifest.write_text(
        "id\twav_path\ttext\n"
        + "".join(f"u{i}\t{tmp_path}/u{i}.wav\thello world {i}\n" for i in range(2))
    )
    monkeypatch.chdir(ROOT)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "recipes/decode_av.py",
            "--model-type", "debug",
            "--video-encoder", "debug",
            "--modalities", "asr",
            "--manifest", str(manifest),
            "--decode-dir", str(tmp_path / "decode"),
            "--batch-size", "2",
        ],
    )
    _recipe_main("recipes/decode_av.py")()
    assert (tmp_path / "decode" / "hypo.txt").exists()
    assert (tmp_path / "decode" / "ref.txt").read_text().splitlines()[0]


def test_decode_matrix_noisy_cells_require_noise_file(tmp_path, monkeypatch):
    """snrs=1000,0 must parse (literal_eval makes it a tuple) and then
    refuse to run the noisy cells without noise_fn_val — 'noisy' rows
    silently measured on clean audio is the failure this guards."""
    monkeypatch.chdir(ROOT)
    monkeypatch.setattr(sys, "argv", [
        "recipes/decode_matrix.py", "configs/smoke/trans_asr.yaml",
        "langs=en", "snrs=1000,0", f"out={tmp_path}/m.json",
        f"check_output_dir={tmp_path}/ckpt", f"log_output_dir={tmp_path}/logs",
    ])
    with pytest.raises(SystemExit, match="noise_fn_val"):
        _recipe_main("recipes/decode_matrix.py")()


def test_eval_table_example(tmp_path, monkeypatch, capsys):
    """The notebook-equivalent Table-4 flow (examples/eval_table.py vs
    reference notebooks/whisper_flamingo_demo.ipynb cells 13-31): both
    systems x {En ASR WER, En-Ru ST BLEU} x {clean, 0 dB babble} on
    synthetic data, printing the table."""
    monkeypatch.chdir(ROOT)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "examples/eval_table.py",
            "--model-type", "debug",
            "--synthetic", "2",
            "--batch-size", "2",
            "--sample-len", "8",
        ],
    )
    _recipe_main("examples/eval_table.py")()
    out = capsys.readouterr().out
    assert "Whisper-Flamingo debug (AV)" in out
    assert "En-Ru ST" in out and "0 dB babble" in out
    # one metric cell per (system, task, snr): 4 rows x 2 snr columns
    assert out.count("|") >= 6 * 4
