"""HF dataset-source field maps against fake in-memory datasets
(VERDICT r1 #8): the reference's per-dataset quirks — kloka
config_names "+"-concat + empty-"chinese" filter + language_dialect
prompt (whisper-flamingo_amis.py:47-77, whisper_ft_kloka_crawled.py:
106-112), fleurs "transcription" field (whisper_eval_fleurs.py:73) —
must survive refactors. Fakes are real ``datasets.Dataset`` objects
built with ``from_dict``, so ``.filter``/``concatenate_datasets`` run
for real; only the hub fetch is stubbed.
"""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from whisper_flamingo_tpu.data.dataset import HFAsrSource


def _audio(n=1600, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    return {"array": rng.standard_normal(n).astype(np.float32), "sampling_rate": sr}


def _fake_kloka(config_name):
    """Two dialect configs; each has one empty-chinese row to filter."""
    rows = {
        "amis_a": {
            "audio": [_audio(seed=1), _audio(seed=2), _audio(seed=3)],
            "text": ["a one", "a two", "a three"],
            "chinese": ["中文一", "", "中文三"],
            "language": ["阿美語", "阿美語", "阿美語"],
            "dialect": ["海岸", "海岸", "海岸"],
        },
        "amis_b": {
            "audio": [_audio(seed=4), _audio(seed=5)],
            "text": ["b one", "b two"],
            "chinese": ["  ", "中文五"],
            "language": ["阿美語", "阿美語"],
            "dialect": ["秀姑巒", "秀姑巒"],
        },
    }
    return datasets.Dataset.from_dict(rows[config_name])


def test_kloka_concat_filter_prompt(monkeypatch):
    calls = []

    def fake_load(name, config=None, split=None, **kw):
        calls.append((name, config, split))
        return _fake_kloka(config)

    monkeypatch.setattr(datasets, "load_dataset", fake_load)
    src = HFAsrSource(
        "formospeech/kloka_crawled_asr", split="train", config="amis_a + amis_b"
    )
    # split mapping: our "train" -> dataset "+_train" with HF split "train"
    assert calls == [
        ("formospeech/kloka_crawled_asr_train", "amis_a", "train"),
        ("formospeech/kloka_crawled_asr_train", "amis_b", "train"),
    ]
    # 5 rows - 2 empty-chinese = 3 (the reference's filter)
    assert len(src) == 3
    texts = [src[i].text for i in range(3)]
    assert texts == ["a one", "a three", "b two"]
    # translation stream comes from the chinese column
    assert src[0].translations == ["中文一"]
    # prompt = language_dialect (whisper_ft_kloka_crawled.py:112)
    assert src[0].prompt == "阿美語_海岸"
    assert src[2].prompt == "阿美語_秀姑巒"


def test_kloka_eval_split_maps_to_eval_dataset(monkeypatch):
    calls = []

    def fake_load(name, config=None, split=None, **kw):
        calls.append((name, config, split))
        return _fake_kloka("amis_a")

    monkeypatch.setattr(datasets, "load_dataset", fake_load)
    HFAsrSource("formospeech/kloka_crawled_asr", split="validation", config="amis_a")
    # eval corpora are a SEPARATE dataset whose HF split is still "train"
    assert calls == [("formospeech/kloka_crawled_asr_eval", "amis_a", "train")]


def test_fleurs_field_map(monkeypatch):
    def fake_load(name, config=None, split=None, **kw):
        assert (name, config) == ("google/fleurs", "en_us")
        return datasets.Dataset.from_dict(
            {
                "audio": [_audio(seed=7)],
                "transcription": ["the fleurs text"],
                "raw_transcription": ["The Fleurs Text."],
                "id": [42],
            }
        )

    monkeypatch.setattr(datasets, "load_dataset", fake_load)
    src = HFAsrSource("google/fleurs", split="validation", config="en_us")
    ex = src[0]
    assert ex.text == "the fleurs text"  # transcription, not raw_transcription
    assert ex.id == "42"


def test_librispeech_defaults_and_resample(monkeypatch):
    def fake_load(name, config=None, split=None, **kw):
        return datasets.Dataset.from_dict(
            {
                "audio": [_audio(n=800, sr=8000)],
                "text": ["HELLO WORLD"],
                "id": ["1089-134686-0000"],
            }
        )

    monkeypatch.setattr(datasets, "load_dataset", fake_load)
    src = HFAsrSource("librispeech_asr", split="train.clean.100")
    ex = src[0]
    assert ex.text == "HELLO WORLD"
    assert len(ex.audio) == 1600  # 8 kHz resampled to 16 kHz
    assert ex.translations == [] and ex.prompt == ""


def test_already_suffixed_name_not_double_suffixed(monkeypatch):
    """A config naming the concrete suffixed dataset for the REQUESTED
    split must not get the suffix appended again; a name carrying a
    DIFFERENT split's suffix gets this split's suffix appended so the
    bogus combination fails loudly at load_dataset instead of silently
    serving the wrong corpus."""
    calls = []

    def fake_load(name, config=None, split=None, **kw):
        calls.append((name, config, split))
        return _fake_kloka("amis_a")

    monkeypatch.setattr(datasets, "load_dataset", fake_load)
    # concrete train corpus, train split: untouched, HF split remapped
    HFAsrSource("formospeech/kloka_crawled_asr_train", split="train", config="amis_a")
    assert calls[-1] == ("formospeech/kloka_crawled_asr_train", "amis_a", "train")
    # concrete eval corpus, validation split: untouched likewise
    HFAsrSource("formospeech/kloka_crawled_asr_eval", split="validation", config="amis_a")
    assert calls[-1] == ("formospeech/kloka_crawled_asr_eval", "amis_a", "train")
    # MISMATCHED suffix (train corpus asked for validation): the appended
    # suffix produces a nonexistent name -> loud failure downstream, never
    # a silent train-as-validation read
    HFAsrSource("formospeech/kloka_crawled_asr_train", split="validation", config="amis_a")
    assert calls[-1] == ("formospeech/kloka_crawled_asr_train_eval", "amis_a", "train")
