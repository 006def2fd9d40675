"""Decoding-engine parity: greedy and beam search vs the reference
implementation on a shared random tiny model."""

import numpy as np
import pytest

from conftest import import_reference_whisper

from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask, decode
from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.whisper import ModelExtras, Whisper
from whisper_flamingo_tpu.training.checkpoints import load_torch_state

DIMS = MODEL_DIMS["debug"]


@pytest.fixture(scope="module")
def models():
    import torch

    torch.manual_seed(7)
    whisper = import_reference_whisper()
    ref_dims = whisper.ModelDimensions(**DIMS.to_dict())
    ref = whisper.model.Whisper(
        ref_dims, dropout_rate=0.0, add_adapter=False, adapter_dim=256,
        add_gated_x_attn=0, bert_dim=768, num_langs=0,
    )
    ref.eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = load_torch_state(ref.state_dict(), DIMS, ModelExtras())
    ours = Whisper(dims=DIMS, params=params)
    return ref, ours


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(11)
    return rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5


def _ref_decode(ref, mel, **opts):
    import torch

    whisper = import_reference_whisper()

    # The fork's beam path is bit-rotted: tokens are repeated x n_group but
    # audio features are not (decoding.py:743 vs :155-164, after the fork
    # disabled the KV cache), so any beam_size > 1 crashes with a batch
    # mismatch. Patch the inference to the upstream semantics (features
    # repeated per beam) so the reference algorithm is runnable for parity.
    orig = whisper.decoding.DecodingTask._get_audio_features

    def patched(self, mel, x_v=None, test_a=False, test_v=False):
        features, x_v = orig(self, mel, x_v, test_a, test_v)
        return features.repeat_interleave(self.n_group, dim=0), x_v

    orig_dl = whisper.decoding.DecodingTask._detect_language

    def patched_dl(self, audio_features, tokens):
        return orig_dl(self, audio_features[:: self.n_group], tokens)

    whisper.decoding.DecodingTask._get_audio_features = patched
    whisper.decoding.DecodingTask._detect_language = patched_dl
    try:
        options = whisper.DecodingOptions(fp16=False, **opts)
        with torch.no_grad():
            return whisper.decode(ref, torch.from_numpy(mel), options)
    finally:
        whisper.decoding.DecodingTask._get_audio_features = orig
        whisper.decoding.DecodingTask._detect_language = orig_dl


def _our_decode(ours, mel, **opts):
    return decode(ours, mel, DecodingOptions(fp16=False, **opts))


@pytest.mark.parametrize("without_timestamps", [True, False])
def test_greedy_parity(models, mel, without_timestamps):
    ref, ours = models
    kw = dict(
        language="en", sample_len=16, without_timestamps=without_timestamps
    )
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]
        assert g.text == e.text
        assert np.isclose(g.avg_logprob, e.avg_logprob, atol=1e-3)
        assert np.isclose(g.no_speech_prob, e.no_speech_prob, atol=1e-3)


def test_beam_parity(models, mel):
    ref, ours = models
    kw = dict(language="en", sample_len=12, beam_size=3, without_timestamps=True)
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]
        assert np.isclose(g.avg_logprob, e.avg_logprob, atol=1e-3)


def test_beam_patience_runs(models, mel):
    _, ours = models
    res = _our_decode(
        ours, mel, language="en", sample_len=10, beam_size=2, patience=2.0,
        without_timestamps=True,
    )
    assert len(res) == 2
    assert all(isinstance(r.text, str) for r in res)


@pytest.mark.parametrize("patience,length_penalty", [(1.5, None), (2.0, 0.6)])
def test_beam_patience_parity(models, mel, patience, length_penalty):
    ref, ours = models
    kw = dict(
        language="en", sample_len=24, beam_size=3, patience=patience,
        length_penalty=length_penalty, without_timestamps=True,
    )
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]
        assert np.isclose(g.avg_logprob, e.avg_logprob, atol=1e-3)


def test_beam_with_timestamps_parity(models, mel):
    ref, ours = models
    kw = dict(language="en", sample_len=16, beam_size=2, without_timestamps=False)
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]


def test_prompt_and_prefix(models, mel):
    ref, ours = models
    kw = dict(
        language="en", sample_len=8, without_timestamps=True,
        prompt="previous context words", prefix="the",
    )
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    task = DecodingTask(ours, DecodingOptions(fp16=False, **kw))
    assert task.initial_tokens[0] == task.tokenizer.sot_prev
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]


def test_temperature_sampling_runs(models, mel):
    _, ours = models
    res = _our_decode(
        ours, mel, language="en", sample_len=8, temperature=0.8, best_of=2,
        without_timestamps=True,
    )
    assert len(res) == 2
    for r in res:
        assert r.temperature == 0.8


def test_language_detection(models, mel):
    from whisper_flamingo_tpu.decoding import detect_language

    _, ours = models
    toks, probs = detect_language(ours, mel)
    assert toks.shape == (2,)
    assert len(probs) == 2 and abs(sum(probs[0].values()) - 1.0) < 1e-3


def test_translate_task(models, mel):
    ref, ours = models
    kw = dict(language="de", task="translate", sample_len=8, without_timestamps=True)
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    task = DecodingTask(ours, DecodingOptions(fp16=False, **kw))
    assert task.tokenizer.translate in task.initial_tokens
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]


def test_language_autodetect_decode(models, mel):
    _, ours = models
    res = _our_decode(
        ours, mel, language=None, sample_len=6, without_timestamps=True
    )
    assert len(res) == 2
    from whisper_flamingo_tpu.tokenizer import LANGUAGES

    assert all(r.language in LANGUAGES for r in res)


def test_custom_suppress_tokens(models, mel):
    ref, ours = models
    kw = dict(
        language="en", sample_len=8, without_timestamps=True,
        suppress_tokens="220,50256",
    )
    expected = _ref_decode(ref, mel, **kw)
    got = _our_decode(ours, mel, **kw)
    for e, g in zip(expected, got):
        assert g.tokens == [int(t) for t in e.tokens]


def test_prompt_length_bucketing(models, mel):
    _, ours = models
    lengths = set()
    for n in (5, 37, 45, 70):
        task = DecodingTask(
            ours,
            DecodingOptions(
                fp16=False, language="en", without_timestamps=True,
                prompt=list(range(100, 100 + n)), bucket_prompt_lengths=True,
            ),
        )
        kept = len(task.initial_tokens) - 1 - len(
            task.tokenizer.sot_sequence_including_notimestamps
        )
        assert kept == 1 << (n.bit_length() - 1)  # floor power of 2
        lengths.add(len(task.initial_tokens))
    assert len(lengths) <= 3  # 37/45/70 -> 32/32/64; 5 -> 4

    # off by default: exact reference length
    task = DecodingTask(
        ours,
        DecodingOptions(fp16=False, language="en", without_timestamps=True,
                        prompt=list(range(100, 145))),
    )
    kept = len(task.initial_tokens) - 1 - len(
        task.tokenizer.sot_sequence_including_notimestamps
    )
    assert kept == 45


def test_audio_features_retention_policy(models, mel):
    """Results hold no device buffers by default; opting in returns a
    host numpy copy of the encoder features (HBM-safe serving loops)."""
    import jax

    _, ours = models
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=4, without_timestamps=True
    )
    res = decode(ours, mel, opts)
    assert all(r.audio_features is None for r in res)

    res = decode(ours, mel, opts, return_audio_features=True)
    d = ours.dims
    for r in res:
        assert isinstance(r.audio_features, np.ndarray)
        assert not isinstance(r.audio_features, jax.Array)
        assert r.audio_features.shape == (d.n_audio_ctx, d.n_audio_state)


def test_cache_loop_flag_equivalence(models, mel):
    """models.whisper.CACHE_LOOP: the fori_loop in-place cache harness
    (r4b ship, deletes the scan's full-stack carry copy-back — docs/
    performance.md) vs the lax.scan harness run the same block math, so
    tokens and scores must match exactly at both flag values, greedy
    and beam."""
    from whisper_flamingo_tpu import decoding
    from whisper_flamingo_tpu.models import whisper as W

    _, ours = models
    assert W.CACHE_LOOP == "fori"  # shipped default
    for kw in (
        dict(language="en", sample_len=10, without_timestamps=True),
        dict(language="en", sample_len=10, beam_size=3, without_timestamps=True),
    ):
        base = _our_decode(ours, mel, **kw)
        W.CACHE_LOOP = "scan"
        decoding._make_decode_program.cache_clear()
        try:
            scan = _our_decode(ours, mel, **kw)
        finally:
            W.CACHE_LOOP = "fori"
            decoding._make_decode_program.cache_clear()
        for b, u in zip(base, scan):
            assert b.tokens == u.tokens
            assert np.isclose(b.avg_logprob, u.avg_logprob, atol=1e-6)


def test_beam_fused_reorder_flag_equivalence(models, mel):
    """decoding.FUSE_REORDER (in-scan cache permutation) vs the
    standalone reorder pass: bit-exact same contraction, so tokens and
    scores must match exactly at both flag values."""
    from whisper_flamingo_tpu import decoding

    _, ours = models
    kw = dict(language="en", sample_len=10, beam_size=3, without_timestamps=True)
    assert decoding.FUSE_REORDER  # shipped default
    base = _our_decode(ours, mel, **kw)
    decoding.FUSE_REORDER = False
    decoding._make_decode_program.cache_clear()
    try:
        unfused = _our_decode(ours, mel, **kw)
    finally:
        decoding.FUSE_REORDER = True
        decoding._make_decode_program.cache_clear()
    for b, u in zip(base, unfused):
        assert b.tokens == u.tokens
        assert np.isclose(b.avg_logprob, u.avg_logprob, atol=1e-6)
