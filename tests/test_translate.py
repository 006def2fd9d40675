"""Tests for recipes/translate.py — the offline translation generator
(VERDICT r1 §2.2: 'translation generation ... has zero tests').

The HF MT engines need network, so the translator factory is stubbed;
what's under test is everything else the reference scripts do: the
LibriSpeech mirrored *.trans.txt tree (reference
translation/seamlessm4t_eng-deu.py:14-34), the CSV id,text,translation
layout, and the per-batch catch-and-continue (emit empties, keep going;
reference :31-34).
"""

import csv
import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_translate():
    spec = importlib.util.spec_from_file_location(
        "recipe_translate", os.path.join(ROOT, "recipes", "translate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(mod, argv):
    old = sys.argv
    sys.argv = ["translate.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_librispeech_tree_layout(tmp_path, monkeypatch, capsys):
    mod = _load_translate()
    monkeypatch.setattr(
        mod, "build_translator",
        lambda *a, **k: lambda texts: [f"DE:{t.lower()}" for t in texts],
    )
    src = tmp_path / "train-clean-100" / "19" / "198"
    src.mkdir(parents=True)
    (src / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 GOOD MORNING\n"
    )
    out = tmp_path / "out"
    _run(mod, ["--engine", "m2m100", "--src", "en", "--tgt", "de",
               "--input", str(tmp_path / "train-clean-100"),
               "--output", str(out)])
    mirrored = out / "19" / "198" / "19-198.trans.txt"
    assert mirrored.exists()
    lines = mirrored.read_text().splitlines()
    assert lines == ["19-198-0000 DE:hello world", "19-198-0001 DE:good morning"]
    assert "translated 2 utterances" in capsys.readouterr().out


def test_csv_layout_and_batch_failure(tmp_path, monkeypatch, capsys):
    """CSV in -> CSV out with a translation column; a failing batch emits
    empties instead of aborting the run."""
    mod = _load_translate()
    calls = []

    def translator(texts):
        calls.append(list(texts))
        if len(calls) == 2:  # second batch fails mid-run
            raise RuntimeError("engine OOM")
        return [f"T({t})" for t in texts]

    monkeypatch.setattr(mod, "build_translator", lambda *a, **k: translator)
    src = tmp_path / "in.csv"
    with open(src, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "text"])
        w.writeheader()
        for i in range(5):
            w.writerow({"id": f"u{i}", "text": f"sentence {i}"})
    out = tmp_path / "out.csv"
    _run(mod, ["--engine", "mbart", "--src", "en_XX", "--tgt", "fr_XX",
               "--input", str(src), "--output", str(out),
               "--batch_size", "2"])
    with open(out, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["translation"] for r in rows] == [
        "T(sentence 0)", "T(sentence 1)", "", "", "T(sentence 4)",
    ]
    assert len(calls) == 3  # 2+2+1, run continued past the failure
    assert "batch failed" in capsys.readouterr().out


def test_engine_table_covers_reference_pipelines():
    """One entry per reference translation engine family
    (translation/{seamlessm4t_*,mbart,m2m100,t5,opus_mt}.py)."""
    mod = _load_translate()
    assert set(mod.ENGINES) == {"seamless-m4t", "mbart", "m2m100", "t5", "opus-mt"}
    assert mod.ENGINES["opus-mt"].format(src="en", tgt="de").endswith("opus-mt-en-de")
