"""Speculative greedy decoding (whisper_flamingo_tpu/speculative.py).

The load-bearing property is the classical speculative guarantee: output
tokens are IDENTICAL to plain greedy decode, regardless of draft quality
— exercised at both acceptance extremes (independent random draft ~= 0%
acceptance; draft == verifier = 100% acceptance). Also pins the per-row
offset primitives the speculative loop added to the decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
from whisper_flamingo_tpu.models.dims import MODEL_DIMS, ModelDimensions
from whisper_flamingo_tpu.models.whisper import (
    Whisper,
    decoder_apply,
    fuse_decode_qkv,
    init_cache,
    init_params,
)
from whisper_flamingo_tpu.speculative import SpeculativeDecodingTask, decode_speculative

DIMS = MODEL_DIMS["debug"]


def _draft_dims():
    # a genuinely smaller draft: fewer layers/heads, same vocab + mels
    return ModelDimensions(
        n_mels=DIMS.n_mels, n_audio_ctx=DIMS.n_audio_ctx, n_audio_state=32,
        n_audio_head=1, n_audio_layer=1, n_vocab=DIMS.n_vocab,
        n_text_ctx=DIMS.n_text_ctx, n_text_head=1, n_text_state=32,
        n_text_layer=1,
    )


def test_per_row_offset_decoder_matches_scalar():
    """decoder_apply with a (B,) offset equals scalar-offset runs row-wise:
    positional embeddings, causal masks, and cache writes all per-row."""
    params = fuse_decode_qkv(init_params(jax.random.PRNGKey(0), DIMS))
    rng = np.random.default_rng(0)
    B, L = 3, 16
    xa = jnp.asarray(rng.standard_normal((B, DIMS.n_audio_ctx, DIMS.n_text_state)),
                     jnp.float32)
    cache = init_cache(params, DIMS, xa, max_len=L)
    # seed the caches identically at offset 0 with a 4-token prefix
    prefix = jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 4)), jnp.int32)
    _, cache = decoder_apply(params, DIMS, prefix, cache=cache, offset=0)

    tok = jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 2)), jnp.int32)
    offsets = jnp.asarray([4, 5, 6], jnp.int32)
    got, got_cache = decoder_apply(params, DIMS, tok, cache=cache, offset=offsets)

    for i in range(B):
        ref, ref_cache = decoder_apply(
            params, DIMS, tok[i : i + 1], cache=jax.tree.map(
                lambda a: a[:, i : i + 1] if a.ndim >= 2 and a.shape[1] == B else a,
                cache,
            ),
            offset=int(offsets[i]),
        )
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref[0]), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_cache["k"][:, i]), np.asarray(ref_cache["k"][:, 0]),
            atol=1e-5,
        )


def _models():
    params_v = init_params(jax.random.PRNGKey(0), DIMS)
    params_d = init_params(jax.random.PRNGKey(7), _draft_dims())
    return (
        Whisper(dims=DIMS, params=params_v),
        Whisper(dims=_draft_dims(), params=params_d),
    )


@pytest.mark.parametrize("draft_len", [1, 3])
def test_speculative_matches_greedy_random_draft(draft_len):
    model, draft = _models()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((3, DIMS.n_mels, 3000)).astype(np.float32) * 0.4
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=10, without_timestamps=True
    )
    base = DecodingTask(model, opts).run(mel)
    task = SpeculativeDecodingTask(model, draft, opts, draft_len=draft_len)
    got = task.run(mel)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
        assert abs(g.avg_logprob - b.avg_logprob) < 1e-3
        assert abs(g.no_speech_prob - b.no_speech_prob) < 1e-5
    assert int(task.last_stats["rounds"]) >= 1


def test_speculative_full_acceptance_path():
    """draft == verifier accepts every drafted token: rounds collapse to
    ~sample_len/(K+1) and tokens still match plain greedy exactly."""
    model, _ = _models()
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, DIMS.n_mels, 3000)).astype(np.float32) * 0.4
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=12, without_timestamps=True
    )
    base = DecodingTask(model, opts).run(mel)
    task = SpeculativeDecodingTask(model, model, opts, draft_len=3)
    got = task.run(mel)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
    rounds = int(task.last_stats["rounds"])
    # full acceptance: every round advances K+1 tokens (prefill produced
    # the first, 11 remain at 4/round -> exactly 3 rounds)
    assert rounds == 3, rounds


@pytest.mark.parametrize("with_timestamps", [False, True])
def test_speculative_with_timestamps(with_timestamps):
    """The timestamp logit rules apply per drafted/verified position
    against the hypothesis prefix — tokens (incl. timestamp tokens and
    the pairing/monotonicity rules) match plain greedy exactly."""
    model, draft = _models()
    rng = np.random.default_rng(11)
    mel = rng.standard_normal((2, DIMS.n_mels, 3000)).astype(np.float32) * 0.4
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=10,
        without_timestamps=not with_timestamps,
    )
    base = DecodingTask(model, opts).run(mel)
    got = SpeculativeDecodingTask(model, draft, opts, draft_len=3).run(mel)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
    # the self-pair exercises acceptance THROUGH the timestamp rules
    got2 = SpeculativeDecodingTask(model, model, opts, draft_len=3).run(mel)
    for b, g in zip(base, got2):
        assert g.tokens == b.tokens


def test_spec_round_cap_finished_row_keeps_last_token():
    """Regression (review finding): a row sitting at lens == caps ==
    max_len (full budget, no EOT) while other rows keep decoding must
    keep its final token — the round's (K+1)-wide all-EOT write for
    inactive rows previously clamped its start index back onto position
    max_len-1 and clobbered the last real token. Drives make_spec_round
    directly with manufactured uneven per-row state."""
    import jax.numpy as jnp

    from whisper_flamingo_tpu.decoding import DecodingTask
    from whisper_flamingo_tpu.models.whisper import (
        init_cache, prepare_decode_params,
    )
    from whisper_flamingo_tpu.speculative import make_spec_round

    model, draft = _models()
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=6, without_timestamps=True
    )
    task = DecodingTask(model, opts)
    K, max_len = 3, task.max_len
    pv = prepare_decode_params(model.params, jnp.float32, False)
    pd = prepare_decode_params(draft.params, jnp.float32, False)
    rng = np.random.default_rng(14)
    B = 2
    xa_v = jnp.asarray(
        rng.standard_normal((B, DIMS.n_audio_ctx, DIMS.n_text_state)), jnp.float32
    )
    xa_d = jnp.asarray(
        rng.standard_normal((B, draft.dims.n_audio_ctx, draft.dims.n_text_state)),
        jnp.float32,
    )
    tokens = jnp.asarray(
        rng.integers(0, 1000, (B, max_len + K + 1)), jnp.int32
    )
    state = {
        "tokens": tokens,
        # row 0: cap-finished at the full budget; row 1: mid-decode
        "lens": jnp.asarray([max_len, max_len - 2], jnp.int32),
        "caps": jnp.full((B,), max_len, jnp.int32),
        "finished": jnp.asarray([True, False]),
        "sum_logprobs": jnp.zeros((B,), jnp.float32),
        "cache_v": init_cache(pv, DIMS, xa_v, max_len=max_len + K),
        "cache_d": init_cache(pd, draft.dims, xa_d, max_len=max_len + K),
    }
    round_fn = make_spec_round(
        DIMS, draft.dims, task.filter_cfg, task.tokenizer.eot, K, jnp.float32
    )
    out = round_fn(pv, pd, state)
    # the finished row's real tokens (everything below max_len) intact
    np.testing.assert_array_equal(
        np.asarray(out["tokens"][0, :max_len]), np.asarray(tokens[0, :max_len])
    )
    assert int(out["lens"][0]) == max_len


def test_speculative_with_prompt():
    """Prompts ride the initial-token sequence (sot_prev + prompt + sot
    seq) — the speculative prefill must handle the longer window and
    still match plain greedy (the serving path decodes prompted windows
    when chaining context)."""
    model, draft = _models()
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((2, DIMS.n_mels, 3000)).astype(np.float32) * 0.4
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True,
        prompt=[21, 99, 7],
    )
    base = DecodingTask(model, opts).run(mel)
    got = SpeculativeDecodingTask(model, draft, opts, draft_len=2).run(mel)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens


def test_speculative_int8_composes():
    model, draft = _models()
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, DIMS.n_mels, 3000)).astype(np.float32) * 0.4
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True,
        quantize="int8",
    )
    base = DecodingTask(model, opts).run(mel)
    got = SpeculativeDecodingTask(model, draft, opts, draft_len=2).run(mel)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens


def test_speculative_int8kv_composes(monkeypatch):
    """Regression (ADVICE r3): quantize='int8kv' must actually enable the
    int8 self cache on the speculative path (it used to degrade to plain
    int8 via a bool). Token-identity vs plain greedy under the SAME
    int8kv mode is the speculative guarantee; the per-token quantization
    scales make the multi-token verify writes identical to greedy's
    one-token writes."""
    from whisper_flamingo_tpu import speculative as spec_mod

    # record what the spec program actually asks init_cache for
    seen = []
    real_init_cache = spec_mod.init_cache

    def spy(*args, **kwargs):
        seen.append(kwargs.get("quantize_self", False))
        return real_init_cache(*args, **kwargs)

    monkeypatch.setattr(spec_mod, "init_cache", spy)

    model, draft = _models()
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, DIMS.n_mels, 3000)).astype(np.float32) * 0.4
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True,
        quantize="int8kv",
    )
    base = DecodingTask(model, opts).run(mel)
    got = SpeculativeDecodingTask(model, draft, opts, draft_len=2).run(mel)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
    assert seen and all(seen), "int8kv did not reach the spec caches"


def test_speculative_validation():
    model, draft = _models()
    mel = np.zeros((1, DIMS.n_mels, 3000), np.float32)
    with pytest.raises(ValueError, match="greedy-only"):
        SpeculativeDecodingTask(
            model, draft, DecodingOptions(language="en", beam_size=2,
                                          without_timestamps=True)
        )
    with pytest.raises(ValueError, match="temperature"):
        SpeculativeDecodingTask(
            model, draft, DecodingOptions(language="en", temperature=0.5,
                                          without_timestamps=True)
        )
    # decode_speculative convenience: single-segment unbatched mel
    out = decode_speculative(
        model, draft, jnp.asarray(mel[0]),
        DecodingOptions(language="en", fp16=False, sample_len=4,
                        without_timestamps=True),
        draft_len=2,
    )
    assert isinstance(out.tokens, list)
