"""Long-form transcribe driver + writers + CLI surface."""

import io
import os
import wave

import jax
import numpy as np
import pytest

from whisper_flamingo_tpu import load_model, transcribe
from whisper_flamingo_tpu.writers import get_writer


@pytest.fixture(scope="module")
def model():
    return load_model("debug")


def _write_wav(path, seconds=35.0, sr=16000):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal(int(seconds * sr)) * 1000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return str(path)


def test_transcribe_long_audio(model, tmp_path):
    wav = _write_wav(tmp_path / "x.wav")
    result = transcribe(
        model, wav, language="en", sample_len=12, fp16=False,
        temperature=0.0, verbose=None,
    )
    assert set(result) == {"text", "segments", "language"}
    assert result["language"] == "en"
    assert isinstance(result["segments"], list) and result["segments"]
    for seg in result["segments"]:
        for key in ("seek", "start", "end", "text", "tokens", "avg_logprob",
                    "compression_ratio", "no_speech_prob"):
            assert key in seg


def test_transcribe_word_timestamps(model, tmp_path):
    wav = _write_wav(tmp_path / "y.wav", seconds=5.0)
    result = transcribe(
        model, wav, language="en", sample_len=10, fp16=False,
        word_timestamps=True, verbose=None,
    )
    for seg in result["segments"]:
        assert "words" in seg


def test_writers(tmp_path):
    result = {
        "text": "hello world",
        "language": "en",
        "segments": [
            {
                "id": 0, "seek": 0, "start": 0.0, "end": 1.5,
                "text": " hello world", "tokens": [1, 2],
                "temperature": 0.0, "avg_logprob": -0.1,
                "compression_ratio": 1.0, "no_speech_prob": 0.01,
                "words": [
                    {"word": " hello", "start": 0.0, "end": 0.7, "probability": 0.9},
                    {"word": " world", "start": 0.7, "end": 1.5, "probability": 0.8},
                ],
            }
        ],
    }
    for fmt, check in {
        "txt": "hello world",
        "vtt": "WEBVTT",
        "srt": "00:00:00,000 --> 00:00:01,500",
        "tsv": "start\tend\ttext",
        "json": '"language"',
    }.items():
        writer = get_writer(fmt, str(tmp_path))
        writer(result, "audio.wav")
        content = open(tmp_path / f"audio.{fmt}").read()
        assert check in content, (fmt, content)


def test_srt_word_highlighting(tmp_path):
    result = {
        "text": "hello world",
        "language": "en",
        "segments": [
            {
                "id": 0, "seek": 0, "start": 0.0, "end": 1.5,
                "text": " hello world", "tokens": [1, 2],
                "temperature": 0.0, "avg_logprob": -0.1,
                "compression_ratio": 1.0, "no_speech_prob": 0.01,
                "words": [
                    {"word": " hello", "start": 0.0, "end": 0.7, "probability": 0.9},
                    {"word": " world", "start": 0.7, "end": 1.5, "probability": 0.8},
                ],
            }
        ],
    }
    writer = get_writer("srt", str(tmp_path))
    writer(result, "audio.wav", {"highlight_words": True})
    content = open(tmp_path / "audio.srt").read()
    assert "<u>" in content  # word-level karaoke highlighting
    writer2 = get_writer("vtt", str(tmp_path))
    writer2(result, "audio.wav", {"max_line_width": 6, "max_line_count": 1})
    content2 = open(tmp_path / "audio.vtt").read()
    assert content2.count("-->") >= 2  # line splitting produced cues
