"""Batch transcription service for production serving.

The reference had no serving story (decode was a per-file CLI / notebook
loop). This module provides the deployment-shaped wrapper around the
compiled decode programs:

- :class:`BatchTranscriber` — fixed-batch compiled decoding with request
  padding: callers submit arbitrary numbers of utterances; the service
  pads to one of a small set of batch sizes (compile-cache bounded),
  decodes as a single XLA program per batch, and unpads.
- :func:`BatchTranscriber.transcribe_files` — long-form path over files.

Throughput scales with the batch size (the 30 s window is fixed-shape);
multi-chip serving runs one replica per chip or shards the batch over a
data mesh (tested in tests/test_sharded_decode.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from functools import lru_cache

from .audio import N_SAMPLES, load_audio, log_mel_spectrogram, pad_or_trim
from .decoding import DecodingOptions, DecodingResult, DecodingTask
from .utils import compression_ratio as _compression_ratio


@dataclass
class BatchTranscriber:
    """Compiled fixed-shape batch decoding with request padding.

    ``draft_model`` switches greedy decoding to speculative decoding
    (``speculative.SpeculativeDecodingTask``): the draft proposes
    ``draft_len`` tokens per round and the flagship verifies them in one
    weight-stream pass — token-identical output, fewer flagship steps.
    """

    model: object
    options: DecodingOptions = field(default_factory=lambda: DecodingOptions(
        language="en", without_timestamps=True
    ))
    batch_sizes: Sequence[int] = (1, 4, 8, 16)
    draft_model: object = None
    draft_len: int = 4

    def __post_init__(self):
        self._tasks = {}

    def _task(self) -> DecodingTask:
        key = (self.options,)
        if key not in self._tasks:
            if self.draft_model is not None:
                from .speculative import SpeculativeDecodingTask

                self._tasks[key] = SpeculativeDecodingTask(
                    self.model, self.draft_model, self.options,
                    draft_len=self.draft_len,
                )
            else:
                self._tasks[key] = DecodingTask(self.model, self.options)
        return self._tasks[key]

    def _pick_batch(self, n: int) -> int:
        for b in sorted(self.batch_sizes):
            if n <= b:
                return b
        return max(self.batch_sizes)

    def warmup(self) -> None:
        """Compile all batch shapes ahead of serving traffic."""
        for b in self.batch_sizes:
            mel = np.zeros((b, self.model.dims.n_mels, 3000), np.float32)
            self._task().run(mel)

    def transcribe_segments(self, waveforms: Sequence[np.ndarray]) -> List[DecodingResult]:
        """Decode a list of <=30 s waveforms; returns one result each."""
        results: List[DecodingResult] = []
        i = 0
        while i < len(waveforms):
            b = self._pick_batch(len(waveforms) - i)
            chunk = list(waveforms[i : i + b])
            n_real = len(chunk)
            while len(chunk) < b:  # pad the batch with silence
                chunk.append(np.zeros(16000, np.float32))
            padded = np.stack([np.asarray(pad_or_trim(w, N_SAMPLES)) for w in chunk])
            # the model decides the mel bins (large-v3 uses 128, not 80)
            mel = log_mel_spectrogram(padded, n_mels=self.model.dims.n_mels)
            out = self._task().run(mel)
            results.extend(out[:n_real])
            i += n_real
        return results

    def transcribe_long(self, audio: np.ndarray) -> str:
        """Long audio as ONE decode batch: split into 30 s windows and
        decode them together (valid when windows are independent, i.e.
        no prompt chaining — the ``condition_on_previous_text=False``
        regime). For an hour of audio this is one compiled decode of
        batch 120 instead of 120 sequential window decodes."""
        audio = np.asarray(audio, np.float32)
        n_windows = max(1, -(-len(audio) // N_SAMPLES))
        windows = [
            audio[i * N_SAMPLES : (i + 1) * N_SAMPLES] for i in range(n_windows)
        ]
        results = self.transcribe_segments(windows)
        return "".join(r.text if r.text.startswith(" ") else " " + r.text
                       for r in results).strip()

    def transcribe_files(self, paths: Sequence[str], **transcribe_kwargs):
        """Long-form transcription per file (arbitrary durations), with the
        full sequential driver (prompt chaining, timestamp segmentation)."""
        from .transcribe import transcribe

        return [
            transcribe(self.model, load_audio(p), language=self.options.language,
                       **transcribe_kwargs)
            for p in paths
        ]


@lru_cache(maxsize=None)
def _make_cb_programs(dims, cfg, eot, max_len, dtype, no_speech,
                      sot_index, quantize, dims_d=None, draft_len=4):
    """Compiled pieces of the continuous batcher (one set per static
    configuration): ``prep`` (one-time param transform), ``prefill``
    (a BATCH of k requests -> k-row state, bucketed on k so refills cost
    one dispatch, not one per request), ``splice`` (scatter k rows into
    the batch state at given slots, donated/in-place; out-of-range slot
    indices drop, so bucket-padding rows are inert), ``step`` (advance
    every slot up to a RUNTIME number of tokens at per-row offsets,
    donated; also returns compact aux copies of the host-visible row
    state so one fetch per poll harvests everything), ``empty_state``.

    With ``dims_d`` (a draft model) the stepper runs speculative rounds
    (``speculative.make_spec_round``) instead of single greedy steps —
    continuous batching and speculation compose: each dispatch advances
    every slot by up to draft_len+1 verified tokens per flagship pass."""
    import jax
    import jax.numpy as jnp

    from .decoding import _apply_filters
    from .models.whisper import (
        decoder_apply,
        encoder_apply,
        init_cache,
        prepare_decode_params,
    )

    spec = dims_d is not None
    K = draft_len
    # sublane-rounded like init_cache (the _cache_zeros slabs must match
    # the shapes the prefill's init_cache produces for splice)
    cache_len = -(-(max_len + (K if spec else 0)) // 8) * 8
    # +1 beyond the write window: a cap-finished row's (K+1)-wide
    # all-EOT write at offset max_len must not clamp back onto its
    # final real token
    buf_w = max_len + (K + 1 if spec else 1)

    def prep(params):
        return prepare_decode_params(params, dtype, quantize)

    def _prefill_model(params, model_dims, mel, init_tokens):
        feats = encoder_apply(params, model_dims, mel, dtype=dtype)
        cache = init_cache(
            params, model_dims, feats, max_len=cache_len, dtype=dtype,
            quantize=quantize,
        )
        logits, cache = decoder_apply(
            params, model_dims, init_tokens, cache=cache, offset=0, dtype=dtype
        )
        return logits, cache

    def prefill(params_v, mel, init_tokens, caps, params_d=None):
        # batch-generic: mel (k, n_mels, frames), init_tokens (k, L),
        # caps (k,) -> a k-row state fragment for splice
        k_req = mel.shape[0]
        logits, cache_v = _prefill_model(params_v, dims, mel, init_tokens)
        row = {"cache_v": cache_v}
        if spec:
            _, row["cache_d"] = _prefill_model(params_d, dims_d, mel, init_tokens)
        init_len = init_tokens.shape[1]
        nsp = jax.nn.softmax(
            logits[:, sot_index].astype(jnp.float32), axis=-1
        )[:, no_speech] if no_speech is not None else jnp.full((k_req,), jnp.nan)
        tokens = jnp.full((k_req, buf_w), eot, jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, init_tokens.astype(jnp.int32), (0, 0)
        )
        flt = _apply_filters(
            cfg, logits[:, -1].astype(jnp.float32), tokens,
            jnp.asarray(init_len, jnp.int32),
        )
        t0 = jnp.argmax(flt, axis=-1).astype(jnp.int32)
        lp0 = jnp.take_along_axis(
            jax.nn.log_softmax(flt, axis=-1), t0[:, None], axis=1
        )[:, 0]
        tokens = jax.lax.dynamic_update_slice(tokens, t0[:, None], (0, init_len))
        caps = jnp.minimum(caps, max_len).astype(jnp.int32).reshape(-1)
        row.update(
            tokens=tokens,
            lens=jnp.full((k_req,), init_len + 1, jnp.int32),
            caps=caps,
            finished=(t0 == eot) | (init_len + 1 >= caps),
            sum_logprobs=lp0,
            no_speech_probs=nsp,
        )
        return row

    def _cache_zeros(model_dims, slots):
        def z(shape, dt=dtype):
            return jnp.zeros(shape, dt)

        L = model_dims.n_text_layer
        D, H = model_dims.n_text_state, model_dims.n_text_head
        Ta, Dh = model_dims.n_audio_ctx, D // H
        cache = {
            "k": z((L, slots, cache_len, D)),
            "v": z((L, slots, cache_len, D)),
            "xa_k": z((L, slots, H, Dh, Ta), jnp.int8 if quantize else dtype),
            "xa_v": z((L, slots, H, Dh, Ta), jnp.int8 if quantize else dtype),
        }
        if quantize:
            cache["xa_k_s"] = z((L, slots, H, 1, 1), jnp.float32)
            cache["xa_v_s"] = z((L, slots, H, 1, 1), jnp.float32)
        return cache

    def empty_state(slots: int):
        # idle slots are born "finished" with inert lens (2: the spec
        # round gathers positions n-2/n-1); splice overwrites
        state = {
            "tokens": jnp.full((slots, buf_w), eot, jnp.int32),
            "lens": jnp.full((slots,), 2, jnp.int32),
            "caps": jnp.full((slots,), max_len, jnp.int32),
            "finished": jnp.ones((slots,), bool),
            "sum_logprobs": jnp.zeros((slots,), jnp.float32),
            "no_speech_probs": jnp.zeros((slots,), jnp.float32),
            "cache_v": _cache_zeros(dims, slots),
        }
        if spec:
            state["cache_d"] = _cache_zeros(dims_d, slots)
        return state

    def splice(state, rows, slot_idx):
        # scatter k prefilled rows into the batch state at slot_idx
        # (k,); out-of-range indices (bucket padding) drop — donated, so
        # the scatters are in place
        out = dict(state)
        for key in ("tokens", "lens", "caps", "finished", "sum_logprobs",
                    "no_speech_probs"):
            out[key] = state[key].at[slot_idx].set(
                rows[key].astype(state[key].dtype), mode="drop"
            )
        for ck in ("cache_v", "cache_d") if spec else ("cache_v",):
            cache = dict(state[ck])
            for key, val in rows[ck].items():
                cache[key] = state[ck][key].at[:, slot_idx].set(
                    val.astype(state[ck][key].dtype), mode="drop"
                )
            out[ck] = cache
        return out

    def greedy_body(params_v, s2):
        tokens, n = s2["tokens"], s2["lens"]
        active = ~s2["finished"]
        last = jnp.take_along_axis(tokens, (n - 1)[:, None], axis=1)
        lg, cache = decoder_apply(
            params_v, dims, last, cache=s2["cache_v"], offset=n - 1, dtype=dtype
        )
        flt = _apply_filters(cfg, lg[:, -1].astype(jnp.float32), tokens, n)
        nxt = jnp.argmax(flt, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(flt, axis=-1), nxt[:, None], axis=1
        )[:, 0]
        nxt = jnp.where(active, nxt, eot)
        tokens = jax.vmap(
            lambda t, v, o: jax.lax.dynamic_update_slice(t, v, (o,))
        )(tokens, nxt[:, None], n)
        lens = n + active.astype(jnp.int32)
        return dict(
            s2,
            tokens=tokens,
            lens=lens,
            sum_logprobs=s2["sum_logprobs"] + lp * active,
            finished=s2["finished"] | (nxt == eot) | (lens >= s2["caps"]),
            cache_v=cache,
        )

    if spec:
        from .speculative import make_spec_round

        round_fn = make_spec_round(dims, dims_d, cfg, eot, K, dtype)

    def step(params_v, state, iters, stop_on_finish, params_d=None):
        """Advance every slot by up to ``iters`` loop iterations.

        ``iters`` is a RUNTIME scalar (token steps, or spec rounds when a
        draft runs): the chunk length costs no retrace/recompile, so the
        host can shorten chunks under queue pressure and lengthen them to
        amortize dispatch in the drain phase. ``stop_on_finish`` (runtime
        bool) ends the chunk as soon as any slot newly finishes — set
        when requests are queued, so a freed slot refills after this
        dispatch instead of idling out the rest of a fixed chunk
        (the chunk-granularity head-of-line cost, docs/performance.md)."""
        entry_finished = state["finished"]

        def cond(c):
            s2, i = c
            newly = jnp.any(s2["finished"] & ~entry_finished)
            return (
                (i < iters)
                & jnp.any(~s2["finished"])
                & ~(stop_on_finish & newly)
            )

        def body(c):
            s2, i = c
            # round_fn's dict(s, ...) carries the extra no_speech_probs
            # field through untouched
            s2 = round_fn(params_v, params_d, s2) if spec else greedy_body(params_v, s2)
            return (s2, i + 1)

        state, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))
        # compact aux copies of the host-visible row state: ONE fetch
        # per poll harvests tokens+lens+finished+scores for every slot.
        # The concatenates materialize fresh buffers, so the aux stays
        # valid after ``state`` is donated into the next step/splice
        # (a bare ``state["tokens"]`` alias would be invalidated).
        aux_i = jnp.concatenate(
            [state["tokens"],
             state["lens"][:, None],
             state["finished"].astype(jnp.int32)[:, None]], axis=1
        )
        aux_f = jnp.stack(
            [state["sum_logprobs"], state["no_speech_probs"]], axis=1
        )
        return state, aux_i, aux_f

    def run_pooled(params_v, pool, state, n_req, params_d=None):
        """Decode an entire admitted request pool in ONE dispatch.

        ``pool`` is a prefilled row fragment (the ``prefill`` output) with
        leading dim P (a static pool bucket; rows >= ``n_req`` are inert
        padding); ``state`` an ``empty_state``. The while_loop interleaves
        the greedy/speculative step with DEVICE-SIDE refill: each
        iteration scans the slots, and any finished slot with pool rows
        remaining (a) scatters its occupant's tokens/length/scores into
        the (P, ...) output buffers and (b) splices the next pool row in —
        so refill costs zero host round trips and zero idle chunk tails
        (the chunk-granularity head-of-line cost of the polled stepper,
        measured in docs/performance.md). Host traffic for the whole
        pool: one prefill dispatch, one run_pooled dispatch, one fetch.

        Slot occupancy rides ``slot_req`` (pool-row index per slot; the
        sentinel P means empty and makes every output scatter drop).
        """
        slots = state["lens"].shape[0]
        P = pool["lens"].shape[0]
        state = dict(
            state,
            slot_req=jnp.full((slots,), P, jnp.int32),
            next_idx=jnp.asarray(0, jnp.int32),
            out_tokens=jnp.full((P, buf_w), eot, jnp.int32),
            out_lens=jnp.zeros((P,), jnp.int32),
            out_lp=jnp.zeros((P,), jnp.float32),
            out_nsp=jnp.zeros((P,), jnp.float32),
        )

        def _harvest_into(st, s):
            """Scatter slot s's row state into the output buffers at its
            pool-row id (the P sentinel drops)."""
            rid = st["slot_req"][s]
            return dict(
                st,
                out_tokens=st["out_tokens"].at[rid].set(
                    st["tokens"][s], mode="drop"),
                out_lens=st["out_lens"].at[rid].set(
                    st["lens"][s], mode="drop"),
                out_lp=st["out_lp"].at[rid].set(
                    st["sum_logprobs"][s], mode="drop"),
                out_nsp=st["out_nsp"].at[rid].set(
                    st["no_speech_probs"][s], mode="drop"),
            )

        def _splice_from_pool(st, s):
            """Harvest slot s, then splice pool row ``next_idx`` into it."""
            st = _harvest_into(st, s)
            nxt = st["next_idx"]
            out = dict(
                st,
                tokens=st["tokens"].at[s].set(pool["tokens"][nxt]),
                lens=st["lens"].at[s].set(pool["lens"][nxt]),
                caps=st["caps"].at[s].set(pool["caps"][nxt]),
                finished=st["finished"].at[s].set(pool["finished"][nxt]),
                sum_logprobs=st["sum_logprobs"].at[s].set(
                    pool["sum_logprobs"][nxt]),
                no_speech_probs=st["no_speech_probs"].at[s].set(
                    pool["no_speech_probs"][nxt]),
                slot_req=st["slot_req"].at[s].set(nxt),
                next_idx=nxt + 1,
            )
            for ck in ("cache_v", "cache_d") if spec else ("cache_v",):
                cache = dict(st[ck])
                for key in cache:
                    cache[key] = st[ck][key].at[:, s].set(pool[ck][key][:, nxt])
                out[ck] = cache
            return out

        def _step(st):
            return round_fn(params_v, params_d, st) if spec else greedy_body(
                params_v, st)

        # nested loops: the INNER while is the hot decode path — the
        # plain per-token step with NO conditionals — and exits only
        # when a slot newly finishes while pool rows remain (or all
        # slots finish). The refill pass (per-slot lax.cond splices)
        # lives in the OUTER body, so its cost is paid per refill
        # event, not per token: a first cut ran the conds inside the
        # token loop and measured SLOWER than the polled stepper
        # (the conds defeat in-place carry aliasing — docs/performance.md).
        def inner_cond(st):
            refill_wanted = (st["next_idx"] < n_req) & jnp.any(st["finished"])
            return jnp.any(~st["finished"]) & ~refill_wanted

        def outer_body(st):
            for s in range(slots):  # static unroll: slots is small
                st = jax.lax.cond(
                    st["finished"][s] & (st["next_idx"] < n_req),
                    lambda st, s=s: _splice_from_pool(st, s),
                    lambda st: st,
                    st,
                )
            return jax.lax.while_loop(inner_cond, _step, st)

        def outer_cond(st):
            return jnp.any(~st["finished"]) | (st["next_idx"] < n_req)

        state = jax.lax.while_loop(outer_cond, outer_body, state)
        for s in range(slots):  # final occupants
            state = _harvest_into(state, s)
        return (state["out_tokens"], state["out_lens"],
                state["out_lp"], state["out_nsp"])

    return {
        "prep": jax.jit(prep),
        "prefill": jax.jit(prefill),
        "splice": jax.jit(splice, donate_argnums=(0,)),
        "step": jax.jit(step, donate_argnums=(1,)),
        # no donation: the outputs are tiny (P, buf_w) buffers, so the
        # big state slabs can't be reused and donating only warns
        "run_pooled": jax.jit(run_pooled),
        "empty_state": empty_state,
    }


class ContinuousBatcher:
    """Continuous-batching greedy decode: finished slots refill mid-flight.

    ``BatchTranscriber`` pads requests into fixed batches, so every batch
    waits for its SLOWEST row — with realistic output-length variance
    (say 10–100 tokens) roughly half of all row-steps decode padding.
    This serves a fixed number of ``slots`` instead: rows carry per-row
    lengths (the vector-offset decode primitives built for speculative
    decoding), the compiled stepper advances all slots up to ``chunk``
    tokens per dispatch, and whenever a slot finishes the host splices a
    freshly prefilled request into its row — throughput is bound by
    TOTAL tokens, not slots x max tokens.

    Greedy only (per-row beam bookkeeping is a different program);
    results are token-identical to per-utterance ``decode()`` (pinned in
    tests/test_serving.py). The reference has no serving story at all
    (SURVEY §2: decode was a notebook loop); continuous batching is the
    standard production-serving answer to head-of-line blocking.

    Overhead design (measured, tools/cb_ab.py — docs/performance.md):
    refills are BATCHED (one bucketed prefill dispatch + one scatter
    splice per poll, not one per request), every poll harvests all row
    state in ONE device fetch, and ``pipeline=True`` (default) fetches
    step k-1's results while step k runs, hiding the device round trip
    behind compute at the cost of finished slots idling one chunk before
    refill. The chunk length is a RUNTIME argument of one compiled
    stepper (no per-chunk-config program): under queue pressure the
    stepper runs ``chunk``-token chunks and (``stop_on_finish``) can end
    a chunk the moment any slot newly finishes so the freed slot refills
    next poll instead of idling out the chunk — measured to LOSE through
    a high-dispatch-latency link (each early chunk end costs a dispatch
    round trip; docs/performance.md), so it defaults off; the crossover
    is dispatch_cost ≈ chunk_remainder x step_time. With an empty queue
    the stepper switches to ``drain_chunk`` (default 4x) to amortize the
    dispatch round trip. Call :meth:`warmup` to pay the one-time program
    loads before traffic. Flip ``pipeline=False`` for freshest-result
    streaming semantics. For offline/throughput traffic use
    :meth:`run_queued` (device-side pooled refill) instead of polling.
    """

    def __init__(self, model, options: Optional[DecodingOptions] = None,
                 slots: int = 8, chunk: int = 16, draft_model=None,
                 draft_len: int = 4, pipeline: bool = True,
                 stop_on_finish: bool = False,
                 drain_chunk: Optional[int] = None):
        from .decoding import DecodingTask

        self.model = model
        self.draft_model = draft_model
        self.draft_len = draft_len
        self.options = options or DecodingOptions(
            language="en", without_timestamps=True
        )
        if self.options.beam_size is not None or self.options.best_of is not None:
            raise ValueError("continuous batching is greedy-only")
        if self.options.temperature != 0:
            raise ValueError("continuous batching requires temperature=0")
        if self.options.language is None:
            raise ValueError("continuous batching needs a fixed language")
        if self.options.quantize == "int8kv":
            # the slot-major cache (_make_cb_programs) has no int8
            # self-cache variant; silently degrading to plain int8 would
            # misreport the serving mode, so reject it outright (int8kv
            # is the *beam* serving mode anyway — docs/performance.md —
            # and the batcher is greedy-only)
            raise ValueError(
                "continuous batching supports quantize='int8' only; "
                "'int8kv' (int8 decode self cache) is not implemented "
                "for the slot cache"
            )
        if draft_model is not None:
            if draft_model.dims.n_vocab != model.dims.n_vocab:
                raise ValueError("draft and verifier must share the vocabulary")
            if draft_model.dims.n_mels != model.dims.n_mels:
                raise ValueError("draft and verifier must share the mel frontend")
        self.slots = slots
        self.chunk = chunk
        # queue-empty drain phase: nothing to refill, so amortize the
        # dispatch/fetch round trip over longer chunks
        self.drain_chunk = drain_chunk if drain_chunk is not None else 4 * chunk
        self.stop_on_finish = stop_on_finish
        self.pipeline = pipeline
        # borrow DecodingTask's option plumbing (initial tokens, filter
        # config, max_len) without running its compiled program
        self._task = DecodingTask(model, self.options)
        self._programs = _make_cb_programs(
            model.dims,
            self._task.filter_cfg,
            self._task.tokenizer.eot,
            self._task.max_len,
            self._task.compute_dtype,
            self._task.tokenizer.no_speech,
            self._task.sot_index,
            self.options.quantize == "int8",
            dims_d=draft_model.dims if draft_model is not None else None,
            draft_len=draft_len,
        )
        self._prepped = None
        self._prepped_d = None

    def _prep(self):
        if self._prepped is None:
            self._prepped = self._programs["prep"](self.model.params)
            if self.draft_model is not None:
                self._prepped_d = self._programs["prep"](self.draft_model.params)
        return self._prepped

    def _prefill_many(self, reqs) -> dict:
        """Prefill a list of (wave_or_mel, max_tokens) requests in ONE
        bucketed dispatch; returns a k_pad-row state fragment. Waves
        share one batched device mel computation; precomputed mels
        transfer as-is (they ARE the request payload)."""
        import jax.numpy as jnp

        k = len(reqs)
        k_pad = 1 << (k - 1).bit_length()  # bucket: 1, 2, 4, 8, ...
        n_mels = self.model.dims.n_mels
        wave_rows = [
            (i, np.asarray(pad_or_trim(np.asarray(p, np.float32), N_SAMPLES)))
            for i, (p, _) in enumerate(reqs) if np.ndim(p) == 1
        ]
        mel_rows: dict = {
            i: jnp.asarray(p, jnp.float32)
            for i, (p, _) in enumerate(reqs) if np.ndim(p) == 2
        }
        if wave_rows:
            wmels = log_mel_spectrogram(
                np.stack([w for _, w in wave_rows]), n_mels=n_mels
            )
            for j, (i, _) in enumerate(wave_rows):
                mel_rows[i] = wmels[j]
        zero = jnp.zeros((n_mels, N_SAMPLES // 160), jnp.float32)
        mel = jnp.stack([mel_rows.get(i, zero) for i in range(k_pad)])
        init = jnp.asarray(
            np.tile(np.asarray(self._task.initial_tokens, np.int32), (k_pad, 1))
        )
        caps = np.full(k_pad, self._task.max_len, np.int32)
        for i, (_, mt) in enumerate(reqs):
            if mt is not None:
                caps[i] = self._task.sample_begin + int(mt)
        kw = {}
        if self.draft_model is not None:
            self._prep()
            kw["params_d"] = self._prepped_d
        return self._programs["prefill"](
            self._prep(), mel, init, jnp.asarray(caps), **kw
        )

    # -- incremental serving API -------------------------------------------
    #
    # submit() enqueues a request and returns its id; poll() fills idle
    # slots from the queue, advances every slot by one compiled chunk,
    # and returns whatever finished. A server loop interleaves arbitrary
    # submit/poll calls; transcribe_segments() below is the batch wrapper.

    def _ensure_state(self):
        if getattr(self, "_state", None) is None:
            self._state = self._programs["empty_state"](self.slots)
            self._slot_req = [-1] * self.slots  # request id per slot
            self._slot_gen = [-1] * self.slots  # poll count at splice time
            self._queue: list = []
            self._next_id = 0
            self._poll_n = 0
            self._pending_aux = None  # (poll_n, aux_i, aux_f) when pipelined

    def submit(self, wave, max_tokens: Optional[int] = None) -> int:
        """Enqueue one request; returns a request id. Accepts a <=30 s
        waveform (1-D) or a precomputed log-mel segment
        ((n_mels, 3000) — e.g. a feature-cached request)."""
        self._ensure_state()
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, wave, max_tokens))
        return rid

    @property
    def pending(self) -> int:
        self._ensure_state()
        return len(self._queue) + sum(r >= 0 for r in self._slot_req)

    def _fill_idle_slots(self):
        idle = [s for s in range(self.slots) if self._slot_req[s] < 0]
        take = min(len(idle), len(self._queue))
        if not take:
            return
        import jax.numpy as jnp

        reqs = [self._queue.pop(0) for _ in range(take)]
        rows = self._prefill_many([(w, mt) for _, w, mt in reqs])
        k_pad = rows["lens"].shape[0]
        # bucket-padding rows scatter out of range -> dropped
        slot_idx = np.full(k_pad, self.slots, np.int32)
        slot_idx[:take] = idle[:take]
        self._state = self._programs["splice"](
            self._state, rows, jnp.asarray(slot_idx)
        )
        for j, (rid, _, _) in enumerate(reqs):
            self._slot_req[idle[j]] = rid
            self._slot_gen[idle[j]] = self._poll_n

    def _harvest(self, tagged_aux) -> List[tuple]:
        """Fetch one aux pair (a single device round trip) and finalize
        every finished slot it covers. ``tagged_aux`` carries the poll
        count of the step that produced it: slots spliced AFTER that
        step are skipped (their aux rows describe the previous
        occupant)."""
        import jax

        aux_n, aux_i, aux_f = tagged_aux
        aux_i, aux_f = jax.device_get((aux_i, aux_f))
        done = []
        for s in range(self.slots):
            rid = self._slot_req[s]
            if rid < 0 or self._slot_gen[s] > aux_n or not aux_i[s, -1]:
                continue
            row = {
                "tokens": aux_i[s, :-2],
                "sum_logprobs": aux_f[s, 0],
                "no_speech_probs": aux_f[s, 1],
            }
            done.append((rid, self._finalize_row(row)))
            self._slot_req[s] = -1
        return done

    def _dispatch_step(self):
        import jax.numpy as jnp

        # queued work: short chunks + end the chunk on the first finish,
        # so freed slots refill promptly. Empty queue: long drain chunks
        # (chunk length is a runtime arg — no retrace either way).
        queued = bool(self._queue)
        tokens = self.chunk if queued else self.drain_chunk
        if self.draft_model is not None:  # iters counts spec rounds
            iters = max(1, -(-tokens // (self.draft_len + 1)))
        else:
            iters = tokens
        stop = self.stop_on_finish and queued
        kw = {"params_d": self._prepped_d} if self.draft_model is not None else {}
        self._state, aux_i, aux_f = self._programs["step"](
            self._prep(), self._state, jnp.asarray(iters, jnp.int32),
            jnp.asarray(stop), **kw
        )
        self._poll_n += 1
        return (self._poll_n - 1, aux_i, aux_f)

    def warmup(self) -> None:
        """Compile/load every program ahead of traffic: the stepper alone
        is a ~5 s cold persistent-cache load through the remote tunnel
        (docs/performance.md) — paid here instead of on the first poll.
        Covers prep, every prefill bucket (1, 2, 4, ... slots), splice,
        and one throwaway stepper dispatch (the stepper donates its
        state, so it runs on a scratch state, not the live one)."""
        import jax.numpy as jnp

        self._ensure_state()
        self._prep()
        k = 1
        while True:
            silence = [(np.zeros(16000, np.float32), 1)] * k
            rows = self._prefill_many(silence)
            if k == 1:  # one splice warm-up (drop-scatter at out-of-range)
                self._state = self._programs["splice"](
                    self._state, rows, jnp.full((rows["lens"].shape[0],),
                                                self.slots, jnp.int32)
                )
            if k >= self.slots:
                break
            k = min(2 * k, self.slots)
        scratch = self._programs["empty_state"](self.slots)
        kw = {"params_d": self._prepped_d} if self.draft_model is not None else {}
        self._programs["step"](
            self._prep(), scratch, jnp.asarray(1, jnp.int32),
            jnp.asarray(False), **kw
        )

    def poll(self) -> List[tuple]:
        """Advance all slots one chunk; returns [(request_id, result)]
        for requests that finished. Empty list while work remains in
        flight; call again (or see :meth:`pending`).

        With ``pipeline=True`` the harvest lags one chunk: poll k
        dispatches step k, then fetches step k-1's results while the
        chip is busy — the device round trip hides behind compute
        (completed slots idle for one extra chunk before refilling)."""
        self._ensure_state()
        self._fill_idle_slots()
        if all(r < 0 for r in self._slot_req):
            if self._pending_aux is not None:  # drain the pipelined tail
                done = self._harvest(self._pending_aux)
                self._pending_aux = None
                return done
            return []
        aux = self._dispatch_step()
        if self.pipeline:
            prev, self._pending_aux = self._pending_aux, aux
            return self._harvest(prev) if prev is not None else []
        done = self._harvest(aux)
        self._fill_idle_slots()
        return done

    def run_queued(self, pool_cap: Optional[int] = None,
                   sort_admission: bool = True) -> List[tuple]:
        """Drain the current queue with DEVICE-SIDE refill (offline /
        throughput mode): prefill up to ``pool_cap`` queued requests into
        a device-resident pool (ONE bucketed dispatch), then run ONE
        compiled program that steps the slots and splices refills from
        the pool *inside* its decode loop — zero host round trips between
        chunks, zero idle chunk tails. Returns [(request_id, result)].

        This is the high-throughput complement to the incremental
        :meth:`poll` loop (which trades some throughput for streaming
        results and mid-flight submission). ``pool_cap`` bounds device
        memory: a pool row holds the request's full prefilled KV state
        (dominated by the audio cross-attention slabs — ~55 MB/request
        at small, ~245 MB at large-v2), so cap the pool at flagship
        scale. Requests already in flight in polled slots are untouched
        (this runs on a fresh slot state).

        ``sort_admission=True`` (default) admits longest-token-budget
        requests first (LPT order): a long row admitted last extends the
        drain tail once the pool is empty, idling the other slots.
        Measured 1.11x on the decode phase for 16-96-token traffic
        (tools/cb_residual.py, r5). Per-request outputs are unchanged
        (rows decode independently); only device scheduling moves.
        Budget-less requests (max_tokens=None) carry the full budget and
        are admitted first."""
        import jax

        self._ensure_state()
        done: List[tuple] = []
        kw = {}
        if self.draft_model is not None:
            self._prep()
            kw["params_d"] = self._prepped_d
        while self._queue:
            take = len(self._queue) if pool_cap is None else min(
                int(pool_cap), len(self._queue))
            reqs = [self._queue.pop(0) for _ in range(take)]
            if sort_admission:
                full = self._task.max_len  # None budget => full budget
                reqs.sort(
                    key=lambda r: full if r[2] is None else int(r[2]),
                    reverse=True,
                )
            pool = self._prefill_many([(w, mt) for _, w, mt in reqs])
            state = self._programs["empty_state"](self.slots)
            out_tok, _, out_lp, out_nsp = self._programs["run_pooled"](
                self._prep(), pool, state, np.int32(take), **kw
            )
            out_tok, out_lp, out_nsp = jax.device_get((out_tok, out_lp, out_nsp))
            for j, (rid, _, _) in enumerate(reqs):
                row = {
                    "tokens": out_tok[j],
                    "sum_logprobs": out_lp[j],
                    "no_speech_probs": out_nsp[j],
                }
                done.append((rid, self._finalize_row(row)))
        return done

    def transcribe_segments(
        self, waveforms: Sequence[np.ndarray],
        max_tokens: Optional[Sequence[int]] = None,
        pooled: bool = False, pool_cap: Optional[int] = None,
    ) -> List[DecodingResult]:
        """Decode <=30 s waveforms with continuous slot refill; returns
        results in input order. ``max_tokens`` optionally caps each
        request's generated tokens (serving APIs expose per-request
        output budgets; also the honest way to benchmark variable-length
        traffic with random-init weights). ``pooled=True`` routes through
        :meth:`run_queued` (device-side refill, highest throughput)."""
        if not waveforms:
            return []
        ids = [
            self.submit(w, max_tokens[i] if max_tokens else None)
            for i, w in enumerate(waveforms)
        ]
        if pooled:
            by_id = dict(self.run_queued(pool_cap=pool_cap))
        else:
            by_id = {}
            while self.pending:
                for rid, res in self.poll():
                    by_id[rid] = res
        return [by_id[rid] for rid in ids]

    def _finalize_row(self, row) -> DecodingResult:
        tokenizer = self._task.tokenizer
        t = np.asarray(row["tokens"])
        sb = self._task.sample_begin
        eots = np.nonzero(t[sb:] == tokenizer.eot)[0]
        end = sb + (eots[0] if len(eots) else len(t))
        toks = t[sb:end].tolist()
        text = tokenizer.decode(toks).strip()
        lp = float(row["sum_logprobs"])
        return DecodingResult(
            audio_features=None,
            language=self.options.language,
            tokens=toks,
            text=text,
            avg_logprob=lp / (len(toks) + 1),
            no_speech_prob=float(row["no_speech_probs"]),
            temperature=0.0,
            compression_ratio=_compression_ratio(text),
        )
