"""Tokenizer parity against the reference implementation (loaded read-only)."""

import pytest

from whisper_flamingo_tpu.tokenizer import LANGUAGES, get_tokenizer

from conftest import import_reference_whisper


@pytest.fixture(scope="module")
def ref_tokenizer_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_tokenizer", "/root/reference/whisper/tokenizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_language_table_matches(ref_tokenizer_mod):
    assert LANGUAGES == ref_tokenizer_mod.LANGUAGES


@pytest.mark.parametrize("multilingual", [True, False])
def test_encoding_parity(ref_tokenizer_mod, multilingual):
    ours = get_tokenizer(multilingual, language="en" if multilingual else None,
                         task="transcribe" if multilingual else None)
    theirs = ref_tokenizer_mod.get_tokenizer(
        multilingual, language="en" if multilingual else None,
        task="transcribe" if multilingual else None)

    for text in [
        "Hello, world!",
        " The quick brown fox jumps over the lazy dog.",
        "chien déjà vu – ωμέγα 中文測試 123",
    ]:
        assert ours.encode(text) == theirs.encode(text)
        assert ours.decode(ours.encode(text)) == text

    assert ours.eot == theirs.eot
    assert ours.sot == theirs.sot
    assert ours.sot_sequence == theirs.sot_sequence
    if multilingual:
        assert ours.timestamp_begin == theirs.timestamp_begin
        assert ours.no_speech == theirs.no_speech
        assert ours.no_timestamps == theirs.no_timestamps
        assert ours.sot_prev == theirs.sot_prev
        assert ours.all_language_tokens == theirs.all_language_tokens
        assert ours.non_speech_tokens == theirs.non_speech_tokens
        assert (
            ours.sot_sequence_including_notimestamps
            == theirs.sot_sequence_including_notimestamps
        )


def test_special_token_ids():
    tok = get_tokenizer(True, language="en", task="transcribe")
    assert tok.sot == 50258
    assert tok.eot == 50257
    assert tok.timestamp_begin == 50364
    assert tok.sot_sequence == (50258, 50259, 50359)


def test_word_splitting():
    tok = get_tokenizer(True, language="en", task="transcribe")
    tokens = tok.encode(" hello world, nice day")
    words, word_tokens = tok.split_tokens_on_spaces(tokens)
    assert "".join(words) == " hello world, nice day"
    assert sum(word_tokens, []) == tokens
