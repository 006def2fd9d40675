"""Batch serving wrapper: request padding, batch bucketing, unpadding."""

import numpy as np

from whisper_flamingo_tpu import load_model
from whisper_flamingo_tpu.decoding import DecodingOptions
from whisper_flamingo_tpu.serving import BatchTranscriber


def test_batch_transcriber_pads_and_unpads():
    model = load_model("debug")
    svc = BatchTranscriber(
        model,
        options=DecodingOptions(
            language="en", without_timestamps=True, sample_len=6, fp16=False
        ),
        batch_sizes=(2, 4),
    )
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(16000 * (i % 3 + 1)).astype(np.float32) * 0.05
             for i in range(5)]
    results = svc.transcribe_segments(waves)
    assert len(results) == 5
    assert all(isinstance(r.text, str) for r in results)

    # same audio decoded in different batch groupings gives the same text
    again = svc.transcribe_segments(waves[:1])
    assert again[0].tokens == results[0].tokens


def test_continuous_batcher_matches_individual_decodes():
    """Continuous refill with more requests than slots: every request's
    tokens must equal its own standalone greedy decode (random-init
    models EOT at varying points, so slots genuinely refill mid-flight)."""
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=10, fp16=False
    )
    rng = np.random.default_rng(5)
    waves = [rng.standard_normal(16000 * (i % 3 + 1)).astype(np.float32) * 0.2
             for i in range(7)]

    cb = ContinuousBatcher(model, options=opts, slots=3, chunk=4)
    got = cb.transcribe_segments(waves)

    task = DecodingTask(model, opts)
    for i, w in enumerate(waves):
        mel = log_mel_spectrogram(
            np.asarray(pad_or_trim(w, N_SAMPLES))[None],
            n_mels=model.dims.n_mels,
        )
        ref = task.run(mel)[0]
        assert got[i].tokens == ref.tokens, f"request {i}"
        assert abs(got[i].avg_logprob - ref.avg_logprob) < 1e-3
        assert abs(got[i].no_speech_prob - ref.no_speech_prob) < 1e-5


def test_continuous_batcher_submit_poll_streaming():
    """Requests submitted WHILE others are mid-decode still produce
    results identical to standalone decodes (the server-loop API)."""
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=8, fp16=False
    )
    rng = np.random.default_rng(21)
    waves = [rng.standard_normal(16000 * (i % 2 + 1)).astype(np.float32) * 0.2
             for i in range(6)]
    cb = ContinuousBatcher(model, options=opts, slots=2, chunk=3)

    ids, got = [], {}
    arrivals = list(range(len(waves)))
    # submit two up front, then one more after every poll (mid-flight)
    ids.append(cb.submit(waves[arrivals.pop(0)]))
    ids.append(cb.submit(waves[arrivals.pop(0)]))
    while cb.pending or arrivals:
        for rid, res in cb.poll():
            got[rid] = res
        if arrivals:
            ids.append(cb.submit(waves[arrivals.pop(0)]))
    assert sorted(got) == sorted(ids)

    task = DecodingTask(model, opts)
    for i, w in enumerate(waves):
        mel = log_mel_spectrogram(
            np.asarray(pad_or_trim(w, N_SAMPLES))[None], n_mels=model.dims.n_mels
        )
        ref = task.run(mel)[0]
        assert got[ids[i]].tokens == ref.tokens, f"request {i}"


def test_continuous_batcher_pipelined_and_mel_submit():
    """pipeline=True (harvest lags one chunk, device fetch hidden behind
    compute) and precomputed-mel submission both stay token-identical to
    standalone decodes, including mixed wave+mel traffic."""
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=10, fp16=False
    )
    rng = np.random.default_rng(11)
    waves = [rng.standard_normal(16000 * (i % 3 + 1)).astype(np.float32) * 0.2
             for i in range(7)]
    mels = [
        np.asarray(log_mel_spectrogram(
            np.asarray(pad_or_trim(w, N_SAMPLES))[None], n_mels=model.dims.n_mels
        ))[0]
        for w in waves
    ]
    # mixed traffic: even requests as waves, odd as precomputed mels
    reqs = [w if i % 2 == 0 else mels[i] for i, w in enumerate(waves)]

    cb = ContinuousBatcher(model, options=opts, slots=3, chunk=4, pipeline=True)
    got = cb.transcribe_segments(reqs)

    task = DecodingTask(model, opts)
    for i in range(len(waves)):
        ref = task.run(mels[i][None])[0]
        assert got[i].tokens == ref.tokens, f"request {i}"
        assert abs(got[i].avg_logprob - ref.avg_logprob) < 1e-3


def test_continuous_batcher_speculative_slots():
    """Continuous batching composes with speculation: slots advance by
    spec rounds (draft==verifier exercises multi-token acceptance) and
    every request still matches its standalone greedy decode."""
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=10, fp16=False
    )
    rng = np.random.default_rng(12)
    waves = [rng.standard_normal(16000 * (i % 2 + 1)).astype(np.float32) * 0.2
             for i in range(5)]
    cb = ContinuousBatcher(
        model, options=opts, slots=2, chunk=6, draft_model=model, draft_len=2
    )
    got = cb.transcribe_segments(waves)
    task = DecodingTask(model, opts)
    for i, w in enumerate(waves):
        mel = log_mel_spectrogram(
            np.asarray(pad_or_trim(w, N_SAMPLES))[None], n_mels=model.dims.n_mels
        )
        ref = task.run(mel)[0]
        assert got[i].tokens == ref.tokens, f"request {i}"


def test_continuous_batcher_pooled_device_refill():
    """run_queued (device-side refill: ONE compiled program decodes the
    whole pool, refilling slots from a device-resident pool inside its
    loop) matches per-utterance greedy decodes token-for-token — with
    more requests than slots so pool refills genuinely happen in-loop,
    and per-request caps so rows finish at different steps."""
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=10, fp16=False
    )
    rng = np.random.default_rng(5)
    waves = [rng.standard_normal(16000 * (i % 3 + 1)).astype(np.float32) * 0.2
             for i in range(7)]
    caps = [10, 3, 7, 10, 2, 10, 5]

    cb = ContinuousBatcher(model, options=opts, slots=3)
    got = cb.transcribe_segments(waves, max_tokens=caps, pooled=True)

    task = DecodingTask(model, opts)
    for i, w in enumerate(waves):
        mel = log_mel_spectrogram(
            np.asarray(pad_or_trim(w, N_SAMPLES))[None],
            n_mels=model.dims.n_mels,
        )
        ref = task.run(mel)[0]
        want = ref.tokens[:caps[i]]
        assert got[i].tokens == want, f"request {i}"
        assert abs(got[i].no_speech_prob - ref.no_speech_prob) < 1e-5

    # pool_cap splits the queue into waves; results are unchanged
    cb2 = ContinuousBatcher(model, options=opts, slots=3)
    again = cb2.transcribe_segments(waves, max_tokens=caps, pooled=True,
                                    pool_cap=4)
    assert [r.tokens for r in again] == [r.tokens for r in got]

    # LPT admission (sort_admission, the r5 drain-tail lever) only moves
    # device scheduling: arrival-order admission returns the same rows.
    cb3 = ContinuousBatcher(model, options=opts, slots=3)
    ids = [cb3.submit(w, caps[i]) for i, w in enumerate(waves)]
    by_id = dict(cb3.run_queued(sort_admission=False))
    assert [by_id[r].tokens for r in ids] == [r.tokens for r in got]


def test_continuous_batcher_pooled_speculative():
    """Device-side refill composes with speculative slot stepping."""
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=8, fp16=False
    )
    rng = np.random.default_rng(12)
    waves = [rng.standard_normal(16000 * (i % 2 + 1)).astype(np.float32) * 0.2
             for i in range(5)]
    plain = ContinuousBatcher(model, options=opts, slots=2).transcribe_segments(
        waves
    )
    spec = ContinuousBatcher(
        model, options=opts, slots=2, draft_model=model, draft_len=2
    ).transcribe_segments(waves, pooled=True)
    assert [r.tokens for r in spec] == [r.tokens for r in plain]


def test_continuous_batcher_per_request_caps():
    """max_tokens caps each request's generated length independently."""
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=12, fp16=False,
        # suppress EOT so length is cap-determined
        suppress_tokens="-1,50257",
    )
    rng = np.random.default_rng(8)
    waves = [rng.standard_normal(16000).astype(np.float32) * 0.2
             for _ in range(4)]
    caps = [2, 5, 9, 12]
    got = ContinuousBatcher(model, options=opts, slots=2, chunk=3).transcribe_segments(
        waves, max_tokens=caps
    )
    assert [len(r.tokens) for r in got] == caps


def test_continuous_batcher_int8():
    """The int8 serving mode composes: quantized weight prep + int8 xa
    slabs spliced per row."""
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, fp16=False,
        quantize="int8",
    )
    rng = np.random.default_rng(6)
    waves = [rng.standard_normal(16000).astype(np.float32) * 0.2
             for _ in range(3)]
    got = ContinuousBatcher(model, options=opts, slots=2, chunk=3).transcribe_segments(waves)
    assert all(isinstance(r.text, str) and np.isfinite(r.avg_logprob) for r in got)


def test_continuous_batcher_validation():
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    import pytest

    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatcher(model, DecodingOptions(language="en", beam_size=2))
    with pytest.raises(ValueError, match="language"):
        ContinuousBatcher(model, DecodingOptions())
    # int8kv is rejected outright (ADVICE r3: it used to silently degrade
    # to plain int8 — the slot cache has no int8 self-cache layout)
    with pytest.raises(ValueError, match="int8kv"):
        ContinuousBatcher(
            model, DecodingOptions(language="en", quantize="int8kv")
        )


def test_batch_transcriber_speculative():
    """draft_model switches to speculative decoding; tokens identical."""
    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, fp16=False
    )
    rng = np.random.default_rng(1)
    waves = [rng.standard_normal(16000 * 2).astype(np.float32) * 0.05
             for _ in range(3)]
    plain = BatchTranscriber(model, options=opts, batch_sizes=(4,))
    spec = BatchTranscriber(
        model, options=opts, batch_sizes=(4,), draft_model=model, draft_len=2
    )
    base = plain.transcribe_segments(waves)
    got = spec.transcribe_segments(waves)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens


def test_transcribe_long_batches_windows():
    model = load_model("debug")
    svc = BatchTranscriber(
        model,
        options=DecodingOptions(
            language="en", without_timestamps=True, sample_len=4, fp16=False
        ),
        batch_sizes=(2, 4),
    )
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(16000 * 70).astype(np.float32) * 0.05  # 3 windows
    text = svc.transcribe_long(audio)
    assert isinstance(text, str)


def test_large_v3_mel128_forward():
    import jax
    import jax.numpy as jnp

    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.models.dims import ModelDimensions
    from whisper_flamingo_tpu.models.whisper import encoder_apply, init_params

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51866, n_text_ctx=448, n_text_head=2,
        n_text_state=64, n_text_layer=1,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    audio = np.random.default_rng(0).standard_normal(48000).astype(np.float32)
    mel = log_mel_spectrogram(audio, n_mels=128)
    assert mel.shape == (128, 300)
    feats = encoder_apply(params, dims, jnp.asarray(mel)[None])
    assert feats.shape == (1, 150, 64)


def test_continuous_batcher_warmup_and_dynamic_chunk():
    """warmup() precompiles every program without disturbing live state,
    and the runtime-chunk stepper variants (stop_on_finish on/off,
    different chunk/drain_chunk) all stay token-identical to standalone
    decodes — the chunk policy is a scheduling knob, never a results
    knob."""
    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.serving import ContinuousBatcher

    model = load_model("debug")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=10, fp16=False
    )
    rng = np.random.default_rng(11)
    waves = [rng.standard_normal(16000 * (i % 2 + 1)).astype(np.float32) * 0.2
             for i in range(5)]

    task = DecodingTask(model, opts)
    refs = []
    for w in waves:
        mel = log_mel_spectrogram(
            np.asarray(pad_or_trim(w, N_SAMPLES))[None], n_mels=model.dims.n_mels
        )
        refs.append(task.run(mel)[0].tokens)

    for kwargs in (
        {"chunk": 3, "stop_on_finish": True},
        {"chunk": 3, "stop_on_finish": False},
        {"chunk": 2, "drain_chunk": 16},
    ):
        cb = ContinuousBatcher(model, options=opts, slots=2, **kwargs)
        cb.warmup()
        assert all(r < 0 for r in cb._slot_req), "warmup must not occupy slots"
        got = cb.transcribe_segments(waves)
        for i in range(len(waves)):
            assert got[i].tokens == refs[i], (kwargs, i)
