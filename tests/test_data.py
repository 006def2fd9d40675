"""Data plane: collator, samplers, spec augment, noise mixing, dataset."""

import numpy as np

from whisper_flamingo_tpu.data.collator import WhisperCollator
from whisper_flamingo_tpu.data.dataset import (
    DataLoader,
    SpeechDataset,
    SyntheticAsrSource,
)
from whisper_flamingo_tpu.data.noise import add_noise
from whisper_flamingo_tpu.data.samplers import (
    DistributedBatchSampler,
    LengthBatchSampler,
    SortedBatchSampler,
)
from whisper_flamingo_tpu.ops.spec_augment import spec_augment_np
from whisper_flamingo_tpu.tokenizer import get_tokenizer


def test_collator_padding():
    coll = WhisperCollator(pad_multiple_frames=100, pad_multiple_tokens=8)
    feats = [
        {
            "input_ids": np.zeros((80, 150), np.float32),
            "labels": [1, 2, 3],
            "dec_input_ids": [9, 1, 2],
            "wav_lens": 24000,
        },
        {
            "input_ids": np.ones((80, 310), np.float32),
            "labels": [4, 5, 6, 7, 8],
            "dec_input_ids": [9, 4, 5, 6, 7],
            "wav_lens": 49600,
        },
    ]
    batch = coll(feats)
    assert batch["input_ids"].shape == (2, 80, 400)  # rounded to 100
    assert batch["labels"].shape == (2, 8)  # rounded to 8
    assert batch["labels"][0, 3] == -100
    assert batch["dec_input_ids"][0, 3] == 50257
    assert batch["wav_lens"].tolist() == [24000, 49600]


def test_sorted_batch_sampler():
    shapes = [5, 1, 9, 3, 7, 2, 8, 4]
    s = SortedBatchSampler(batch_size=3, shapes=shapes)
    batches = list(s)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(8))
    # descending within batch
    for b in batches:
        lens = [shapes[i] for i in b]
        assert lens == sorted(lens, reverse=True)


def test_length_batch_sampler_bins():
    shapes = [10, 20, 30, 40, 100, 200]
    s = LengthBatchSampler(batch_bins=120, shapes=shapes)
    batches = list(s)
    flat = sorted(i for b in batches for i in b)
    assert flat == list(range(6))
    # ESPnet semantics: the batch closes on (and includes) the item that
    # overflows the bin; all-but-last items of a batch stay within bins
    for b in batches:
        if len(b) > 1:
            prefix = b[1:]  # descending order -> all but the largest
            assert (len(b) - 1) * max(shapes[i] for i in prefix) <= 120
    # batches group short utterances together
    assert any(len(b) >= 2 for b in batches)


def test_distributed_batch_sampler():
    base = SortedBatchSampler(batch_size=2, shapes=list(range(16)))
    a = list(DistributedBatchSampler(base, 2, 0))
    b = list(DistributedBatchSampler(base, 2, 1))
    assert len(a) == len(b)
    assert not set(map(tuple, a)) & set(map(tuple, b))


def test_spec_augment_respects_audio_frames():
    rng = np.random.default_rng(0)
    x = np.ones((300, 80), np.float32)
    out = spec_augment_np(x, audio_frames=100, rng=rng)
    # time masks start within [0, audio_frames) and extend at most
    # max_time_width (reference draws the mask end independently), so
    # rows beyond audio_frames + max_time_width are never touched
    assert (out[200:] == 1).all()
    assert out.shape == x.shape
    assert (out != 1).any()  # something was masked


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    clean = (rng.standard_normal(16000) * 1000).astype(np.float32)
    noise = (rng.standard_normal(8000) * 500).astype(np.float32)
    mixed = add_noise(clean, [noise], noise_snr=0, rng=rng)
    assert mixed.dtype == np.int16
    assert len(mixed) == len(clean)
    resid = mixed.astype(np.float32) - clean
    snr = 10 * np.log10(np.mean(clean**2) / np.mean(resid**2))
    assert abs(snr) < 1.0  # requested 0 dB


def test_speech_dataset_and_loader():
    tok = get_tokenizer(True, language="en", task="transcribe")
    src = SyntheticAsrSource(n=6, n_translations=2)
    ds = SpeechDataset(
        source=src, tokenizer=tok, spec_augment="ls-basic",
        translations_use=True,
    )
    item = ds[0]
    assert item["input_ids"].shape[0] == 80
    assert item["dec_input_ids"][: 4] == list(
        tok.sot_sequence_including_notimestamps
    )
    assert item["labels"][:3] == item["dec_input_ids"][1:4]
    assert item["labels"][-1] == tok.eot
    assert len(item["all_translations"]) == 2

    sampler = SortedBatchSampler(batch_size=3, shapes=ds.mel_lengths())
    loader = DataLoader(ds, sampler, WhisperCollator())
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["input_ids"].shape[0] == 3
    assert "all_translations" in batches[0]


def test_prompt_dataset():
    tok = get_tokenizer(True, language="en", task="transcribe")

    class PromptSource(SyntheticAsrSource):
        def __getitem__(self, idx):
            ex = super().__getitem__(idx)
            ex.prompt = "some translation prompt"
            return ex

    ds = SpeechDataset(source=PromptSource(n=2), tokenizer=tok, prompt_use=True)
    item = ds[0]
    assert item["dec_input_ids"][0] == tok.sot_prev
    n_prefix = item["prompt_lens"]
    assert all(l == -100 for l in item["labels"][:n_prefix])
    assert item["labels"][n_prefix : n_prefix + 3] == item["dec_input_ids"][n_prefix + 1 : n_prefix + 4]


def test_spec_augment_jax_on_device():
    import jax
    import jax.numpy as jnp

    from whisper_flamingo_tpu.ops.spec_augment import spec_augment_jax

    x = jnp.ones((2, 300, 80))
    frames = jnp.asarray([100, 250], jnp.int32)
    out = spec_augment_jax(jax.random.PRNGKey(0), x, frames)
    out = np.asarray(out)
    assert out.shape == (2, 300, 80)
    assert (out != 1).any()  # something masked
    # time masks start within the true frames; nothing beyond
    # frames + max_time_width is touched
    assert (out[0, 200:] == 1).all()


def test_prefetch_loader_releases_producer_on_early_exit():
    """Abandoning iteration early must not leave the producer thread
    blocked on a full queue forever (regression: validate loops honoring
    max_batches leaked one blocked thread per pass)."""
    import gc
    import threading
    import time

    from whisper_flamingo_tpu.data.dataset import PrefetchLoader

    before = threading.active_count()
    loader = PrefetchLoader([{"i": i} for i in range(100)], prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # generator finalizer -> stop event
    del it
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_collator_mixed_prompt_batch():
    """A batch mixing prompted and unprompted rows must collate: prompt
    fields are keyed on presence in ANY row, missing rows default to
    prompt_lens=0 / empty prompt (regression: first-row check KeyError'd
    or silently dropped the field)."""
    coll = WhisperCollator(pad_multiple_frames=100, pad_multiple_tokens=8)
    base = {"input_ids": np.zeros((80, 100), np.float32),
            "labels": [1, 2], "dec_input_ids": [9, 1]}
    with_prompt = dict(base, prompt_lens=3, prompt="hello")
    without = dict(base)
    for order in ([with_prompt, without], [without, with_prompt]):
        batch = coll([dict(f) for f in order])
        assert batch["prompt_lens"].tolist() in ([3, 0], [0, 3])
        assert sorted(batch["prompt"]) == ["", "hello"]


def test_collator_video_length_quantized():
    """Video padding is quantized (default 50 frames) so AV batches reuse
    compiled shapes instead of recompiling per batch."""
    coll = WhisperCollator()
    feats = [
        {"input_ids": np.zeros((80, 100), np.float32), "labels": [1],
         "dec_input_ids": [9], "video": np.zeros((63, 8, 8), np.float32)},
        {"input_ids": np.zeros((80, 100), np.float32), "labels": [2],
         "dec_input_ids": [9], "video": np.zeros((41, 8, 8), np.float32)},
    ]
    batch = coll(feats)
    assert batch["video"].shape == (2, 100, 8, 8)  # 63 -> 100
    assert batch["video_lens"].tolist() == [63, 41]


def test_collator_mixed_modality_rows():
    """Any-row keying for video/fbank: a batch mixing rows with and
    without a modality zero-fills the missing rows (modality drop)
    instead of KeyError-ing or silently dropping the field on a
    first-row check."""
    coll = WhisperCollator()
    with_av = {
        "input_ids": np.zeros((80, 100), np.float32), "labels": [1],
        "dec_input_ids": [9],
        "video": np.ones((40, 8, 8), np.float32),
        "fbank": np.ones((40, 104), np.float32),
    }
    without = {
        "input_ids": np.zeros((80, 100), np.float32), "labels": [2],
        "dec_input_ids": [9],
    }
    for order in ([with_av, without], [without, with_av]):
        batch = coll([dict(f) for f in order])
        i_av = 0 if order[0] is with_av else 1
        assert batch["video"].shape[0] == 2
        assert batch["fbank"].shape == (2, batch["video"].shape[1], 104)
        assert batch["video_lens"].tolist()[i_av] == 40
        assert batch["video_lens"].tolist()[1 - i_av] == 0
        assert batch["video"][1 - i_av].sum() == 0.0
        assert batch["fbank"][1 - i_av].sum() == 0.0
        assert batch["fbank"][i_av, :40].sum() > 0


def test_manifest_source_loads_video(tmp_path):
    """A manifest with a video_path column yields AsrExample.video (the
    AV training path; regression: real video silently replaced by
    synthetic noise because the field never existed)."""
    import wave

    from whisper_flamingo_tpu.data.dataset import ManifestAsrSource

    wav_path = tmp_path / "a.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(np.zeros(1600, np.int16).tobytes())
    vid = np.arange(5 * 4 * 4, dtype=np.float32).reshape(5, 4, 4)
    np.save(tmp_path / "a.npy", vid)
    manifest = tmp_path / "m.tsv"
    manifest.write_text("id\twav_path\ttext\tvideo_path\nu0\ta.wav\thi\ta.npy\n")

    src = ManifestAsrSource(str(manifest), audio_root=str(tmp_path))
    ex = src[0]
    assert ex.video is not None and ex.video.shape == (5, 4, 4)
    np.testing.assert_array_equal(ex.video, vid)


def test_spec_augment_jax_matches_np_statistics():
    """The on-device mask geometry must follow the numpy/reference
    sampling (width = the SECOND draw of each pair, zero-width skip):
    compare the mean masked fraction over many draws (regression: the
    jax path once masked width from the first draw — a different
    distribution)."""
    import jax

    from whisper_flamingo_tpu.ops.spec_augment import (
        spec_augment_jax,
        spec_augment_np,
    )

    T, F = 200, 80
    frames = 200
    n = 2000
    rng = np.random.default_rng(0)
    x = np.ones((T, F), np.float32)

    np_frac = np.mean([
        (spec_augment_np(
            x, frames, max_freq_width=27, n_freq_mask=1,
            max_time_width=100, n_time_mask=1,
            rng=np.random.default_rng(i),
        ) == 0).mean()
        for i in range(n)
    ])
    xs = np.ones((n, T, F), np.float32)
    out = jax.jit(
        lambda k, x, f: spec_augment_jax(
            k, x, f, max_freq_width=27, n_freq_mask=1,
            max_time_width=100, n_time_mask=1,
        )
    )(jax.random.PRNGKey(0), xs, np.full((n,), frames, np.int32))
    jax_frac = float((np.asarray(out) == 0).mean())
    # same sampling law -> same expected masked fraction (loose tolerance
    # for 300-draw Monte Carlo noise)
    assert abs(np_frac - jax_frac) < 0.02, (np_frac, jax_frac)


def test_prefetch_loader_slow_consumer_terminates():
    """A consumer slower than the producer must still receive the
    end-of-iteration sentinel (regression: the sentinel was dropped via
    put_nowait when the queue was full at producer completion, hanging
    the consumer forever after it drained the remaining items)."""
    import time

    from whisper_flamingo_tpu.data.dataset import PrefetchLoader

    loader = PrefetchLoader([{"i": i} for i in range(5)], prefetch=1)
    got = []
    for item in loader:  # must terminate, not hang
        time.sleep(0.05)  # slower than the producer
        got.append(item["i"])
    assert got == list(range(5))
