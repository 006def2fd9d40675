"""Speculative greedy decoding: a small draft model proposes K tokens,
the flagship verifies them in ONE forward.

Why this is a TPU-native lever: the incremental decode step is
HBM-bytes-bound (docs/performance.md) — every token re-streams the
decoder weights (~1.2 GB/step bf16 at large-v2) and K/V slabs. Verifying
K drafted tokens in one forward streams those bytes ONCE for up to K+1
accepted tokens, so flagship RTF scales with the draft's acceptance rate
while the output stays **token-identical to plain greedy** (the
classical speculative-decoding guarantee for argmax acceptance; exact in
exact arithmetic and pinned at f32 — under bf16 compute a near-tie in
the logits can in principle resolve differently between the K+1-wide
verify matmul and plain greedy's 1-wide step, the same tiling-order
caveat any batched-vs-single forward carries). The draft (e.g. ``tiny``,
39 M params) adds K cheap steps.

No reference equivalent (the reference decodes one token per Python
round-trip, `/root/reference/whisper/decoding.py:688-718`); the model
pairing mirrors the repo's own distillation family (SURVEY §2.3 D/E)
where a small student tracks the flagship teacher.

Scope (asserted): greedy only (``temperature=0``, no beam/best_of — the
acceptance rule is exact for argmax), no conditioning streams. The full
logit-filter stack (suppress / blank / timestamp rules) applies at every
drafted and verified position against the hypothesis prefix, so
timestamped decoding speculates too. Both models must share the
tokenizer vocabulary and mel bins. Composes with the int8 serving mode
(``quantize="int8"`` quantizes both models in-program).

Mechanics (per loop round, per row; n = current length, s[n-1] not yet
fed to either cache — the standing invariant):

1. draft K steps at per-row offsets → d_1…d_K (the first step re-feeds
   [s[n-2], s[n-1]] to repair the draft cache's one-slot lag after a
   fully-accepted round);
2. verifier forward over [s[n-1], d_1 … d_K] at offsets n-1 … n+K-1 →
   its greedy choices v_1…v_(K+1) and their logprobs;
3. accept the longest prefix with v_j == d_j (a tokens) plus the bonus
   token v_(a+1): exactly what plain greedy would have produced — a
   fully-accepted round nets K+1 tokens from one flagship pass;
4. rows advance by a+1 each (clamped at the token budget / first EOT);
   per-row cache offsets mean rows at different lengths coexist. Stale
   cache slots from rejected drafts sit exactly in the range the next
   round overwrites before attending (writes land before the causal
   mask exposes them), so no rollback pass is needed.
"""

from __future__ import annotations

from functools import lru_cache, cached_property
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decoding import (
    DecodingOptions,
    DecodingResult,
    DecodingTask,
    _apply_filters,
    _FilterConfig,
    _make_encode_program,
)
from .models.whisper import (
    Whisper,
    decoder_apply,
    init_cache,
    prepare_decode_params,
)

NEG_INF = float("-inf")


def make_spec_round(dims_v, dims_d, cfg: _FilterConfig, eot: int, K: int, dtype):
    """One draft-K-verify-accept round over per-row state — the shared
    engine of ``_make_spec_program``'s while-loop and the continuous
    batcher's speculative stepper (``serving.ContinuousBatcher``).

    State contract: ``tokens`` (B, >= max(caps)+K) eot-filled buffer,
    ``lens``/``caps``/``finished`` (B,), ``sum_logprobs`` (B,),
    ``cache_v``/``cache_d`` decode caches with >= max(caps)+K slots, plus
    optional ``accepted``/``rounds`` scalar diagnostics. Rows advance by
    (accepted prefix + bonus) each call, clamped per-row at ``caps`` and
    first EOT; inactive rows are no-ops (their cache rewrites reproduce
    existing values)."""
    pos_k = jnp.arange(K + 1, dtype=jnp.int32)[None, :]  # (1, K+1)

    def round_fn(params_vp, params_dp, s):
        tokens, n, caps = s["tokens"], s["lens"], s["caps"]
        active = ~s["finished"] & (n < caps)
        last = jnp.take_along_axis(tokens, (n - 1)[:, None], axis=1)

        # -- draft K tokens at per-row offsets ----------------------------
        # The first step feeds TWO tokens [s(n-2), s(n-1)] at offset n-2:
        # after a fully-accepted round (a == K, K+1 tokens appended) the
        # draft cache is one slot behind the verifier's (it never fed its
        # own d_K), and this re-feed repairs exactly that slot; in every
        # other case it rewrites an already-valid slot with the same value.
        first2 = jnp.take_along_axis(
            tokens,
            jnp.concatenate([(n - 2)[:, None], (n - 1)[:, None]], axis=1),
            axis=1,
        )
        # drafts are written into a scratch copy of the buffer so the
        # logit filters (timestamp rules read the token history) see the
        # hypothesis prefix at each drafted/verified position
        tmp = tokens
        write1 = jax.vmap(
            lambda t, v, o: jax.lax.dynamic_update_slice(t, v, (o,))
        )
        cache_d, cur, drafts = s["cache_d"], first2, []
        for j in range(K):
            lg, cache_d = decoder_apply(
                params_dp, dims_d, cur, cache=cache_d,
                offset=n - 2 + j if j == 0 else n - 1 + j, dtype=dtype,
            )
            flt = _apply_filters(cfg, lg[:, -1].astype(jnp.float32), tmp, n + j)
            nxt = jnp.argmax(flt, axis=-1).astype(jnp.int32)
            drafts.append(nxt)
            tmp = write1(tmp, nxt[:, None], n + j)
            cur = nxt[:, None]
        draft = jnp.stack(drafts, axis=1)  # (B, K)

        # -- verify in one forward -----------------------------------------
        # K+1 positions: the verifier's choice after ALL K drafts is the
        # classical bonus token, so a fully-accepted round nets K+1 tokens
        # from one flagship weight stream
        feed = jnp.concatenate([last, draft], axis=1)  # (B, K+1)
        v_logits, cache_v = decoder_apply(
            params_vp, dims_v, feed, cache=s["cache_v"],
            offset=n - 1, dtype=dtype,
        )
        # greedy-equivalent filtering per verify position j: the buffer
        # prefix there is [accepted..., d_1..d_j] — exactly greedy's token
        # history when j <= accepted+1 (beyond that the choices are
        # discarded anyway)
        flt = jnp.stack(
            [
                _apply_filters(
                    cfg, v_logits[:, j].astype(jnp.float32), tmp, n + j
                )
                for j in range(K + 1)
            ],
            axis=1,
        )  # (B, K+1, V)
        choice = jnp.argmax(flt, axis=-1).astype(jnp.int32)  # (B, K+1)
        tok_lp = jnp.take_along_axis(
            jax.nn.log_softmax(flt, axis=-1), choice[..., None], axis=-1
        )[..., 0]  # (B, K+1)

        # -- acceptance: longest matching prefix + bonus token -------------
        match = (choice[:, :K] == draft).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,) in [0, K]
        n_new = a + 1  # accepted prefix + bonus, in [1, K+1]
        n_new = jnp.minimum(n_new, caps - n)  # per-row token budget
        takes = pos_k < n_new[:, None]  # (B, K+1)
        hit_eot = (choice == eot) & takes
        has_eot = jnp.any(hit_eot, axis=1)
        first_eot = jnp.argmax(hit_eot, axis=1)
        n_new = jnp.where(has_eot, first_eot + 1, n_new)
        n_new = jnp.where(active, n_new, 0)
        takes = pos_k < n_new[:, None]

        vals = jnp.where(takes, choice, eot)
        tokens = jax.vmap(
            lambda t, v, o: jax.lax.dynamic_update_slice(t, v, (o,))
        )(tokens, vals, n)
        lens = n + n_new
        out = dict(
            s,
            tokens=tokens,
            lens=lens,
            finished=s["finished"] | jnp.any(hit_eot, axis=1) | (lens >= caps),
            sum_logprobs=s["sum_logprobs"] + jnp.sum(tok_lp * takes, axis=1),
            cache_v=cache_v,
            cache_d=cache_d,
        )
        if "accepted" in s:
            out["accepted"] = s["accepted"] + jnp.sum(n_new)
            out["rounds"] = s["rounds"] + 1
        return out

    return round_fn


@lru_cache(maxsize=None)
def _make_spec_program(
    dims_v,
    dims_d,
    cfg: _FilterConfig,
    eot: int,
    max_len: int,
    draft_len: int,
    dtype,
    no_speech,
    sot_index: int,
    quantize: Optional[str] = None,
):
    """Jitted prefill + speculative loop for one static configuration.

    ``quantize`` is the DecodingOptions.quantize mode string ("int8" /
    "int8kv" / None), plumbed whole — not collapsed to a bool — so
    "int8kv" actually enables the int8 decode self cache here exactly as
    it does in the plain decode program (decoding._make_decode_program).
    """
    K = draft_len
    quantize_self = quantize == "int8kv"

    def prefill_and_loop(params_v, params_d, feats_v, feats_d, init_tokens, rng):
        del rng  # greedy-only: acceptance is exact for argmax
        B, init_len = init_tokens.shape
        params_vp = prepare_decode_params(params_v, dtype, bool(quantize))
        params_dp = prepare_decode_params(params_d, dtype, bool(quantize))

        cache_len = max_len + K
        cache_v = init_cache(
            params_vp, dims_v, feats_v, max_len=cache_len, dtype=dtype,
            quantize=bool(quantize), quantize_self=quantize_self,
        )
        cache_d = init_cache(
            params_dp, dims_d, feats_d, max_len=cache_len, dtype=dtype,
            quantize=bool(quantize), quantize_self=quantize_self,
        )
        logits_v, cache_v = decoder_apply(
            params_vp, dims_v, init_tokens, cache=cache_v, offset=0, dtype=dtype
        )
        _, cache_d = decoder_apply(
            params_dp, dims_d, init_tokens, cache=cache_d, offset=0, dtype=dtype
        )
        no_speech_probs = jax.nn.softmax(
            logits_v[:, sot_index].astype(jnp.float32), axis=-1
        )[:, no_speech] if no_speech is not None else jnp.full((B,), jnp.nan)

        # width max_len+K+1: the round's (K+1)-wide write at offset n can
        # land at n == max_len for a cap-finished row; the extra column
        # keeps dynamic_update_slice from clamping the start index back
        # onto the row's final real token (all clamped-region writes are
        # EOT into the always-EOT tail)
        tokens = jnp.full((B, max_len + K + 1), eot, dtype=jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, init_tokens.astype(jnp.int32), (0, 0)
        )
        # first generated token: the full filter stack at the prefill
        # position (cur_len == sample_begin -> blank filter), identical
        # to the plain greedy body's first iteration
        flt = _apply_filters(
            cfg, logits_v[:, -1].astype(jnp.float32), tokens,
            jnp.asarray(init_len, jnp.int32),
        )
        t0 = jnp.argmax(flt, axis=-1).astype(jnp.int32)
        lp0 = jnp.take_along_axis(
            jax.nn.log_softmax(flt, axis=-1), t0[:, None], axis=1
        )[:, 0]
        tokens = jax.lax.dynamic_update_slice(tokens, t0[:, None], (0, init_len))

        state = {
            "tokens": tokens,
            "lens": jnp.full((B,), init_len + 1, jnp.int32),
            "caps": jnp.full((B,), max_len, jnp.int32),
            "finished": t0 == eot,
            "sum_logprobs": lp0,
            "cache_v": cache_v,
            "cache_d": cache_d,
            "accepted": jnp.zeros((), jnp.int32),  # diagnostics
            "rounds": jnp.zeros((), jnp.int32),
        }

        round_fn = make_spec_round(dims_v, dims_d, cfg, eot, K, dtype)

        def cond(s):
            return jnp.any(~s["finished"] & (s["lens"] < s["caps"]))

        def body(s):
            return round_fn(params_vp, params_dp, s)

        state = jax.lax.while_loop(cond, body, state)
        return {
            "tokens": state["tokens"],
            "sum_logprobs": state["sum_logprobs"],
            "no_speech_probs": no_speech_probs,
            "spec_accepted": state["accepted"],
            "spec_rounds": state["rounds"],
        }

    return jax.jit(prefill_and_loop, donate_argnums=())


class SpeculativeDecodingTask(DecodingTask):
    """DecodingTask whose compiled program drafts with a second model.

    Host-side behavior (result assembly, language detection, ranking) is
    inherited — the out-dict the program returns carries the same fields
    as the greedy program's, so results are built identically and the
    tokens are identical to plain greedy by construction.
    """

    def __init__(
        self,
        model: "Whisper",
        draft_model: "Whisper",
        options: DecodingOptions,
        draft_len: int = 4,
    ):
        super().__init__(model, options)
        if options.beam_size is not None or options.best_of is not None:
            raise ValueError("speculative decoding is greedy-only")
        if options.temperature != 0:
            raise ValueError("speculative decoding requires temperature=0")
        if draft_model.dims.n_vocab != model.dims.n_vocab:
            raise ValueError("draft and verifier must share the vocabulary")
        if draft_model.dims.n_mels != model.dims.n_mels:
            raise ValueError("draft and verifier must share the mel frontend")
        if "gated" in model.params.get("decoder", {}).get("blocks", {}):
            raise ValueError("speculative decoding does not take conditioning streams")
        if draft_len < 1:
            raise ValueError("draft_len must be >= 1")
        self.draft_model = draft_model
        self.draft_len = int(draft_len)
        self.last_stats: Optional[dict] = None

    @cached_property
    def _compiled(self):
        program = _make_spec_program(
            self.model.dims,
            self.draft_model.dims,
            self.filter_cfg,
            self.tokenizer.eot,
            self.max_len,
            self.draft_len,
            self.compute_dtype,
            self.tokenizer.no_speech,
            self.sot_index,
            quantize=self.options.quantize,
        )

        def call(params, audio_features, init_tokens, rng):
            mel = self._draft_mel
            d = self.draft_model
            if mel.shape[-2:] == (d.dims.n_audio_ctx, d.dims.n_audio_state):
                feats_d = mel.astype(self.compute_dtype)
            else:
                feats_d = _make_encode_program(d.dims, self.compute_dtype)(
                    d.params, mel
                )
            out = program(
                params, d.params, audio_features, feats_d, init_tokens, rng
            )
            self.last_stats = {
                "accepted_tokens": out["spec_accepted"],
                "rounds": out["spec_rounds"],
            }
            return {
                k: v for k, v in out.items() if not k.startswith("spec_")
            }

        return call

    def run(self, mel, xt=None) -> List[DecodingResult]:
        if xt is not None:
            raise ValueError("speculative decoding does not take conditioning streams")
        mel = jnp.asarray(mel)
        d = self.model.dims
        if mel.shape[-2:] == (d.n_audio_ctx, d.n_audio_state):
            # the inherited run() accepts precomputed VERIFIER encoder
            # features, but the draft needs its own features from raw mel
            raise ValueError(
                "speculative decoding requires raw mel input (the draft "
                "model computes its own encoder features)"
            )
        self._draft_mel = mel
        return super().run(mel)


def decode_speculative(
    model: "Whisper",
    draft_model: "Whisper",
    mel,
    options: DecodingOptions = DecodingOptions(without_timestamps=True),
    draft_len: int = 4,
) -> List[DecodingResult]:
    """Greedy decode with draft-model speculation; token-identical to
    ``decode(model, mel, options)`` but the flagship streams its weights
    once per ~(accepted+1) tokens instead of once per token."""
    single = mel.ndim == 2
    if single:
        mel = mel[None]
    result = SpeculativeDecodingTask(model, draft_model, options, draft_len).run(mel)
    return result[0] if single else result
