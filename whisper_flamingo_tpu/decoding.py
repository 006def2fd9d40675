"""Decoding engine: jitted, fixed-shape greedy / best-of-N / beam search.

Rebuild of the reference decode stack (`/root/reference/whisper/decoding.py`)
as a single compiled XLA program per configuration:

- ``DecodingOptions`` / ``DecodingResult`` keep the reference fields
  (`decoding.py:80-127`).
- The sampling loop (`decoding.py:688-718`) becomes a
  ``lax.while_loop`` whose carry holds the token buffer, the preallocated
  KV cache, cumulative log-probs, and the finished-beam bookkeeping. One
  decoder step per token (incremental KV cache) — restoring the caching
  the reference fork disabled (`decoding.py:155-164`).
- The beam search (`decoding.py:305-408`), which the reference drives
  through Python dicts, is re-derived as pure array ops: per-beam
  ``top_k(beam+1)`` candidate expansion, a global sort per audio, rank
  masks selecting the top ``beam_size`` unfinished continuations, a
  fixed-capacity finished buffer implementing the patience rule
  (arXiv 2204.05424), and a batched gather that reorders the KV cache.
- The logit filters (`decoding.py:427-509`) — suppress-blank,
  suppress-tokens, and the timestamp rules — are vectorized masks over
  the whole (batch, vocab) logits array; no per-row Python.

Only final text extraction (BPE decode, length-penalty ranking over at
most ``beam*patience`` candidates) runs on host.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import cached_property, lru_cache
from typing import TYPE_CHECKING, Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .audio import CHUNK_LENGTH
from .models.whisper import (
    decoder_apply,
    encoder_apply,
    init_cache,
    prepare_decode_params,
)
from .tokenizer import Tokenizer, get_tokenizer
from .utils import compression_ratio

if TYPE_CHECKING:
    from .models.whisper import Whisper

NEG_INF = float("-inf")


@lru_cache(maxsize=None)
def _make_encode_program(dims, dtype):
    """Cached jitted encoder forward (one XLA program per dims/dtype)."""
    return jax.jit(
        lambda params, mel: encoder_apply(params, dims, mel, dtype=dtype)
    )


@lru_cache(maxsize=None)
def _make_lang_id_program(dims, dtype):
    """Cached jitted single-token decoder forward for language ID.

    The language-token gather, argmax, and softmax all happen on device:
    only an (n_audio, ~100) probability matrix crosses the host link, not
    the (n_audio, 51865) full-vocab softmax — through a high-latency
    device tunnel that is the difference between ~6 KB and ~1.6 MB per
    call. Masking non-language tokens to -inf then softmaxing the full
    vocab (reference decoding.py:49-55) is mathematically identical to
    softmaxing the gathered language logits, so parity holds exactly.
    """

    def fwd(params, features, sot_token, lang_ids):
        x = jnp.full((features.shape[0], 1), sot_token, dtype=jnp.int32)
        logits, _ = decoder_apply(params, dims, x, features, dtype=dtype)
        lang_logits = logits[:, 0, :][:, lang_ids].astype(jnp.float32)
        tokens = jnp.take(lang_ids, jnp.argmax(lang_logits, axis=-1))
        return tokens, jax.nn.softmax(lang_logits, axis=-1)

    return jax.jit(fwd, static_argnums=(2,))


@dataclass(frozen=True)
class DecodingOptions:
    """Parity: reference decoding.py:80-114 (same fields and defaults,
    plus ``fp16``-analogous ``bf16`` for TPU compute dtype and an rng seed
    for temperature sampling)."""

    task: str = "transcribe"
    language: Optional[str] = None

    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None

    length_penalty: Optional[float] = None

    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None

    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True

    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    fp16: bool = True  # on TPU this selects bfloat16 compute
    seed: int = 0

    # quantize the kept prompt length to powers of two so long-form
    # transcription with prompt chaining reuses a bounded set of compiled
    # programs (a fresh prompt length would otherwise recompile the decode
    # program every window). Off by default for exact reference parity;
    # transcribe() turns it on.
    bucket_prompt_lengths: bool = False

    # "int8" stores every operand the incremental decode loop re-reads
    # per token (decoder projection/MLP weights, lm head, audio and
    # conditioning K/V slabs) as int8 with per-channel/per-head scales.
    # The loop is HBM-bytes-bound (tools/int8_probe.py), so halving the
    # bytes speeds decode up at a small, bounded numeric cost (symmetric
    # per-channel quantization; logits typically within ~1%). "int8kv"
    # additionally stores the decode *self* cache int8 with
    # per-(token, head) scales — the beam-mode lever: the many-row beam
    # step is dominated by the self-cache reads and the physical beam
    # reorder, both bytes-bound (measured beam-15: small +16%, large-v2
    # +26% over bf16; greedy should use "int8", which keeps the fused
    # decode-attn kernel). Opt-in serving modes — None (default) keeps
    # exact reference parity.
    quantize: Optional[str] = None

    # When True, each DecodingResult carries a host-side numpy copy of its
    # (n_audio_ctx, n_audio_state) encoder features; by default the field
    # is None. The reference returned the live tensor
    # (decoding.py:117-127), but on a 16 GB chip a serving loop that
    # retains results would pin ~7.7 MB of HBM per large-v2 result — the
    # explicit opt-in (with a host copy, never a device buffer) makes
    # result retention always HBM-safe.
    return_audio_features: bool = False


@dataclass(frozen=True)
class DecodingResult:
    """Parity: reference decoding.py:117-127.

    ``audio_features`` is None unless
    ``DecodingOptions.return_audio_features`` is set, in which case it is
    a host numpy array (never a device buffer — results are safe to
    retain indefinitely in serving loops without accumulating HBM)."""

    audio_features: Optional[np.ndarray]
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


# ---------------------------------------------------------------------------
# Language identification (parity: reference decoding.py:18-77)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _device_lang_ids(tokens: Tuple[int, ...]) -> jax.Array:
    """Device-resident language-token ids — long-form transcribe calls
    detect_language once per file; don't re-upload the same constant
    over the high-latency device link each time."""
    return jnp.asarray(tokens, jnp.int32)


def detect_language(
    model: "Whisper", mel, tokenizer: Optional[Tokenizer] = None
):
    """Return (language_tokens (n_audio,), language_probs list-of-dicts)."""
    if tokenizer is None:
        tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages)
    if tokenizer.language is None or tokenizer.language_token not in tokenizer.sot_sequence:
        raise ValueError("This model doesn't have language tokens so it can't perform lang id")

    mel = jnp.asarray(mel)
    single = mel.ndim == 2
    if single:
        mel = mel[None]

    if mel.shape[-2:] != (model.dims.n_audio_ctx, model.dims.n_audio_state):
        mel = _make_encode_program(model.dims, model.dtype)(model.params, mel)

    n_audio = mel.shape[0]
    lang_ids = _device_lang_ids(tuple(tokenizer.all_language_tokens))
    language_tokens, language_token_probs = jax.device_get(
        _make_lang_id_program(model.dims, model.dtype)(
            model.params, mel, tokenizer.sot, lang_ids
        )
    )
    language_probs = [
        {
            c: float(language_token_probs[i, j])
            for j, c in enumerate(tokenizer.all_language_codes)
        }
        for i in range(n_audio)
    ]
    if single:
        return language_tokens[0], language_probs[0]
    return language_tokens, language_probs


# ---------------------------------------------------------------------------
# Vectorized logit filters (parity: reference decoding.py:427-509)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _FilterConfig:
    sample_begin: int
    eot: int
    blank_tokens: Tuple[int, ...]
    suppress_tokens: Tuple[int, ...]
    timestamp_begin: Optional[int]
    no_timestamps: Optional[int]
    max_initial_timestamp_index: Optional[int]
    apply_blank: bool
    apply_suppress: bool
    apply_timestamps: bool


def _apply_filters(cfg: _FilterConfig, logits, tokens, cur_len):
    """All filters as masks over logits (N, V); tokens (N, L).

    ``cur_len`` is a scalar (plain greedy/beam: all rows at the same
    length) or an (N,) vector (speculative decoding: rows and verify
    positions advance independently) — every rule below is written
    against the per-row broadcast so both shapes take the same path."""
    n, v = logits.shape
    cur_len = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32), (n,))
    is_begin = cur_len == cfg.sample_begin  # (N,)

    if cfg.apply_suppress and cfg.suppress_tokens:
        sup = np.zeros((v,), np.float32)
        sup[list(cfg.suppress_tokens)] = NEG_INF
        logits = logits + jnp.asarray(sup)[None, :]

    if cfg.apply_blank and cfg.blank_tokens:
        blank = np.zeros((v,), np.float32)
        blank[list(cfg.blank_tokens)] = NEG_INF
        logits = jnp.where(
            is_begin[:, None], logits + jnp.asarray(blank)[None, :], logits
        )

    if cfg.apply_timestamps:
        ts_begin = cfg.timestamp_begin
        col = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)

        # suppress <|notimestamps|> (handled by without_timestamps)
        logits = jnp.where(col == cfg.no_timestamps, NEG_INF, logits)

        last = jnp.take_along_axis(
            tokens, jnp.maximum(cur_len - 1, 0)[:, None], axis=1
        )[:, 0]
        penult = jnp.take_along_axis(
            tokens, jnp.maximum(cur_len - 2, 0)[:, None], axis=1
        )[:, 0]
        n_sampled = cur_len - cfg.sample_begin
        last_was_ts = (n_sampled >= 1) & (last >= ts_begin)
        penult_was_ts = (n_sampled < 2) | (penult >= ts_begin)

        # timestamps appear in pairs, except directly before EOT
        mask_a = last_was_ts & penult_was_ts  # next must be non-timestamp
        mask_b = last_was_ts & ~penult_was_ts  # next cannot be text
        logits = jnp.where(
            mask_a[:, None] & (col >= ts_begin), NEG_INF, logits
        )
        logits = jnp.where(mask_b[:, None] & (col < cfg.eot), NEG_INF, logits)

        # timestamps must be monotonic; segments must have nonzero length.
        # The rules above guarantee sampled timestamps are non-decreasing,
        # so the masked max equals the reference's "last timestamp".
        pos = jax.lax.broadcasted_iota(jnp.int32, tokens.shape, 1)
        sampled = (pos >= cfg.sample_begin) & (pos < cur_len[:, None])
        is_ts = sampled & (tokens >= ts_begin)
        have_ts = jnp.any(is_ts, axis=1)
        ts_max = jnp.max(jnp.where(is_ts, tokens, -1), axis=1)
        ts_limit = jnp.where(mask_b, ts_max, ts_max + 1)
        logits = jnp.where(
            have_ts[:, None] & (col >= ts_begin) & (col < ts_limit[:, None]),
            NEG_INF,
            logits,
        )

        # at the very beginning: timestamps only, capped at max_initial
        logits = jnp.where(is_begin[:, None] & (col < ts_begin), NEG_INF, logits)
        if cfg.max_initial_timestamp_index is not None:
            last_allowed = ts_begin + cfg.max_initial_timestamp_index
            logits = jnp.where(is_begin[:, None] & (col > last_allowed), NEG_INF, logits)

        # if the total timestamp probability beats any text token, force one
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ts_logprob = jax.nn.logsumexp(logprobs[:, ts_begin:], axis=-1)
        max_text = jnp.max(logprobs[:, :ts_begin], axis=-1)
        force_ts = ts_logprob > max_text
        logits = jnp.where(force_ts[:, None] & (col < ts_begin), NEG_INF, logits)

    return logits


# ---------------------------------------------------------------------------
# Decoding task
# ---------------------------------------------------------------------------

class DecodingTask:
    """Precomputes static decode configuration and runs the jitted loop.

    Parity target: reference ``DecodingTask`` (decoding.py:512-798) —
    same option verification, initial-token construction (prompt/prefix
    splicing, decoding.py:591-617), suppress list (decoding.py:619-646),
    and result assembly.
    """

    def __init__(self, model: "Whisper", options: DecodingOptions):
        self.model = model

        language = options.language or "en"
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=options.task,
        )
        self.tokenizer = tokenizer
        self.options = self._verify_options(options)

        self.n_group: int = options.beam_size or options.best_of or 1
        self.n_ctx: int = model.dims.n_text_ctx
        self.sample_len: int = options.sample_len or model.dims.n_text_ctx // 2

        self.sot_sequence = tokenizer.sot_sequence
        if self.options.without_timestamps:
            self.sot_sequence = tokenizer.sot_sequence_including_notimestamps

        self.initial_tokens: Tuple[int, ...] = self._get_initial_tokens()
        self.sample_begin: int = len(self.initial_tokens)
        self.sot_index: int = self.initial_tokens.index(tokenizer.sot)
        self.max_len: int = min(self.n_ctx, self.sample_begin + self.sample_len)

        self.beam_size = options.beam_size
        self.patience = options.patience or 1.0
        self.max_candidates = (
            round(self.beam_size * self.patience) if self.beam_size else self.n_group
        )
        if self.beam_size:
            assert self.max_candidates > 0, (
                f"Invalid beam size ({self.beam_size}) or patience ({options.patience})"
            )

        max_initial_timestamp_index = None
        if not options.without_timestamps and options.max_initial_timestamp:
            precision = CHUNK_LENGTH / model.dims.n_audio_ctx  # usually 0.02 s
            max_initial_timestamp_index = round(options.max_initial_timestamp / precision)

        self.filter_cfg = _FilterConfig(
            sample_begin=self.sample_begin,
            eot=tokenizer.eot,
            blank_tokens=tuple(tokenizer.encode(" ") + [tokenizer.eot]),
            suppress_tokens=self._get_suppress_tokens(),
            timestamp_begin=tokenizer.timestamp_begin,
            no_timestamps=tokenizer.no_timestamps,
            max_initial_timestamp_index=max_initial_timestamp_index,
            apply_blank=self.options.suppress_blank,
            apply_suppress=bool(self.options.suppress_tokens),
            apply_timestamps=not self.options.without_timestamps,
        )
        self.compute_dtype = jnp.bfloat16 if options.fp16 else jnp.float32
        self._device_init: Dict[int, jax.Array] = {}

    @cached_property
    def _device_rng(self):
        # the decode rng depends only on options.seed (a fresh
        # PRNGKey(seed) per run is the same key) — build it once
        return jax.random.PRNGKey(self.options.seed)

    # -- option/token plumbing (host) -------------------------------------

    def _verify_options(self, options: DecodingOptions) -> DecodingOptions:
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0:
            if options.best_of is not None:
                raise ValueError("best_of with greedy sampling (T=0) is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.length_penalty is not None and not (0 <= options.length_penalty <= 1):
            raise ValueError("length_penalty (alpha) should be a value between 0 and 1")
        if options.quantize not in (None, "int8", "int8kv"):
            raise ValueError(
                "quantize must be None, 'int8' or 'int8kv', "
                f"got {options.quantize!r}"
            )
        if options.quantize == "int8kv" and options.beam_size is None:
            # measured greedy regression (docs/performance.md): the int8
            # self cache disables the fused decode-attn kernel, and the
            # greedy step isn't self-cache-bound — int8kv only pays off
            # for the many-row beam step
            import warnings

            warnings.warn(
                "quantize='int8kv' without beam_size: int8kv is the "
                "beam-mode serving variant and measures SLOWER than "
                "'int8' for greedy decoding (docs/performance.md)",
                stacklevel=3,
            )
        return options

    def _get_initial_tokens(self) -> Tuple[int, ...]:
        tokens = list(self.sot_sequence)

        if prefix := self.options.prefix:
            prefix_tokens = (
                self.tokenizer.encode(" " + prefix.strip())
                if isinstance(prefix, str)
                else prefix
            )
            if self.sample_len is not None:
                max_prefix_len = self.n_ctx // 2 - self.sample_len
                prefix_tokens = prefix_tokens[-max_prefix_len:]
            tokens = tokens + prefix_tokens

        if prompt := self.options.prompt:
            prompt_tokens = (
                self.tokenizer.encode(" " + prompt.strip())
                if isinstance(prompt, str)
                else prompt
            )
            prompt_tokens = list(prompt_tokens)[-(self.n_ctx // 2 - 1):]
            if self.options.bucket_prompt_lengths and prompt_tokens:
                # keep the newest floor-to-power-of-2 tokens: bounds the
                # set of compiled prefill shapes to ~log2(n_ctx) variants
                keep = 1 << (len(prompt_tokens).bit_length() - 1)
                prompt_tokens = prompt_tokens[-keep:]
            tokens = [self.tokenizer.sot_prev] + prompt_tokens + tokens
        return tuple(tokens)

    def _get_suppress_tokens(self) -> Tuple[int, ...]:
        suppress_tokens = self.options.suppress_tokens
        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]

        if suppress_tokens is None:
            suppress_tokens = []
        else:
            suppress_tokens = list(suppress_tokens)
        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            suppress_tokens.extend(self.tokenizer.non_speech_tokens)

        suppress_tokens.extend(
            [
                self.tokenizer.transcribe,
                self.tokenizer.translate,
                self.tokenizer.sot,
                self.tokenizer.sot_prev,
                self.tokenizer.sot_lm,
            ]
        )
        if self.tokenizer.no_speech is not None:
            suppress_tokens.append(self.tokenizer.no_speech)
        return tuple(sorted(set(suppress_tokens)))

    # -- device programs ---------------------------------------------------

    @cached_property
    def _compiled_xt(self):
        return _make_decode_program(
            self.model.dims,
            self.filter_cfg,
            self.n_group,
            self.tokenizer.eot,
            self.max_len,
            self.options.temperature,
            self.beam_size is not None,
            self.max_candidates,
            self.compute_dtype,
            self.tokenizer.no_speech,
            self.sot_index,
            True,
            getattr(self.model.extras, "sequential_gated_x_attn", False),
            quantize=self.options.quantize,
        )

    @cached_property
    def _compiled(self):
        return _make_decode_program(
            self.model.dims,
            self.filter_cfg,
            self.n_group,
            self.tokenizer.eot,
            self.max_len,
            self.options.temperature,
            self.beam_size is not None,
            self.max_candidates,
            self.compute_dtype,
            self.tokenizer.no_speech,
            self.sot_index,
            quantize=self.options.quantize,
        )




    def _host_features(self, audio_features, n_audio):
        """Per-result encoder features under the retention policy: a host
        numpy copy when opted in, else None (device buffers are never
        attached to results — see DecodingOptions.return_audio_features)."""
        if self.options.return_audio_features:
            host = np.asarray(jax.device_get(audio_features))
            return [host[i] for i in range(n_audio)]
        return [None] * n_audio

    # -- host-side finalize ------------------------------------------------

    def _finalize(self, out) -> Tuple[List[List[np.ndarray]], List[List[float]]]:
        """Collect candidate sequences per audio (parity: decoding.py:299-302,
        388-408)."""
        G = self.n_group
        eot = self.tokenizer.eot
        tokens = np.asarray(out["tokens"])
        sum_logprobs = np.asarray(out["sum_logprobs"])
        n_batch = tokens.shape[0]
        B = n_batch // G

        if self.beam_size is None:
            # greedy/best-of: every group member is a candidate
            grouped = tokens.reshape(B, G, -1)
            lps = sum_logprobs.reshape(B, G)
            return (
                [[grouped[i, j] for j in range(G)] for i in range(B)],
                [list(map(float, lps[i])) for i in range(B)],
            )

        fin_tokens = np.asarray(out["fin_tokens"])  # (B, C, L)
        fin_scores = np.asarray(out["fin_scores"])
        fin_count = np.asarray(out["fin_count"])
        grouped = tokens.reshape(B, G, -1)
        lps = sum_logprobs.reshape(B, G)

        all_tokens, all_scores = [], []
        for i in range(B):
            seqs = [fin_tokens[i, c] for c in range(int(fin_count[i]))]
            scores = [float(fin_scores[i, c]) for c in range(int(fin_count[i]))]
            if len(seqs) < self.beam_size:
                for j in np.argsort(lps[i])[::-1]:
                    seq = np.concatenate([grouped[i, j], [eot]])
                    seqs.append(seq)
                    scores.append(float(lps[i, j]))
                    if len(seqs) >= self.beam_size:
                        break
            all_tokens.append(seqs)
            all_scores.append(scores)
        return all_tokens, all_scores

    def _rank(self, tokens: List[List[np.ndarray]], sum_logprobs: List[List[float]]):
        """GNMT length-penalty ranking (parity: decoding.py:194-217)."""
        alpha = self.options.length_penalty

        def scores(logprobs, lengths):
            result = []
            for logprob, length in zip(logprobs, lengths):
                penalty = length if alpha is None else ((5 + length) / 6) ** alpha
                result.append(logprob / penalty)
            return result

        lengths = [[len(t) for t in s] for s in tokens]
        return [int(np.argmax(scores(p, l))) for p, l in zip(sum_logprobs, lengths)]

    # -- public API --------------------------------------------------------

    def run(self, mel, xt=None) -> List[DecodingResult]:
        """``xt``: optional conditioning streams (n_langs, B, S, D) for the
        gated cross-attention decoder (translated-text or video features;
        AV contract parity: reference decoding.py:648-672 threads x_v the
        same way)."""
        tokenizer = self.tokenizer
        mel = jnp.asarray(mel)
        n_audio = mel.shape[0]

        if mel.shape[-2:] == (self.model.dims.n_audio_ctx, self.model.dims.n_audio_state):
            audio_features = mel.astype(self.compute_dtype)
        else:
            audio_features = _make_encode_program(
                self.model.dims, self.compute_dtype
            )(self.model.params, mel)

        init = np.tile(np.asarray(self.initial_tokens, np.int32), (n_audio, 1))

        # language detection, overwriting the language token (decoding.py:674-686)
        languages = [self.options.language] * n_audio
        language_probs: List[Optional[dict]] = [None] * n_audio
        if self.options.language is None or self.options.task == "lang_id":
            lang_tokens, language_probs = detect_language(
                self.model, audio_features, tokenizer
            )
            languages = [max(p, key=p.get) for p in np.atleast_1d(language_probs)]
            if self.options.language is None:
                init[:, self.sot_index + 1] = np.asarray(lang_tokens).reshape(-1)
        if self.options.task == "lang_id":
            af = self._host_features(audio_features, n_audio)
            return [
                DecodingResult(
                    audio_features=af[i],
                    language=languages[i],
                    language_probs=language_probs[i],
                )
                for i in range(n_audio)
            ]

        # features/prompts/conditioning go in UN-repeated (batch B); the
        # compiled program expands only the divergent per-beam state
        G = self.n_group
        if self.options.language is not None:
            # fixed language: the initial tokens depend only on n_audio —
            # keep them device-resident across calls. Each host->device
            # upload is a full round-trip on high-latency device links
            # (CLAUDE.md: ~30 MB/s tunnel), so serving loops shouldn't
            # pay it per batch.
            init_rep = self._device_init.get(n_audio)
            if init_rep is None:
                init_rep = jnp.asarray(init)
                self._device_init[n_audio] = init_rep
        else:
            init_rep = jnp.asarray(init)
        rng = self._device_rng

        if xt is not None:
            out = self._compiled_xt(
                self.model.params, audio_features, init_rep, rng, jnp.asarray(xt)
            )
        else:
            out = self._compiled(self.model.params, audio_features, init_rep, rng)

        # one batched device->host transfer (per-field np.asarray would pay
        # a round-trip each; device links can be high-latency)
        out = jax.device_get(out)

        no_speech_probs = np.asarray(out["no_speech_probs"])[::G]
        cand_tokens, cand_scores = self._finalize(out)

        # slice between sample_begin and EOT
        sliced: List[List[np.ndarray]] = []
        for seqs in cand_tokens:
            rows = []
            for t in seqs:
                t = np.asarray(t)
                eots = np.nonzero(t[self.sample_begin:] == tokenizer.eot)[0]
                end = self.sample_begin + (eots[0] if len(eots) else len(t))
                rows.append(t[self.sample_begin:end])
            sliced.append(rows)

        selected = self._rank(sliced, cand_scores)
        final_tokens: List[List[int]] = [
            sliced[i][selected[i]].tolist() for i in range(n_audio)
        ]
        texts = [tokenizer.decode(t).strip() for t in final_tokens]
        final_scores = [cand_scores[i][selected[i]] for i in range(n_audio)]
        avg_logprobs = [
            lp / (len(t) + 1) for t, lp in zip(final_tokens, final_scores)
        ]

        af = self._host_features(audio_features, n_audio)
        return [
            DecodingResult(
                audio_features=af[i],
                language=languages[i],
                tokens=final_tokens[i],
                text=texts[i],
                avg_logprob=float(avg_logprobs[i]),
                no_speech_prob=float(no_speech_probs[i]),
                temperature=self.options.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(n_audio)
        ]


def _beam_topk(logprobs, k: int):
    """Per-beam candidate shortlist (module-level so the decomposition
    probe `tools/decode_probe.py` can ablate the top-k's cost)."""
    return jax.lax.top_k(logprobs, k)


# Beam cache-reorder lowering. The profiler trace (r3, beam-15 x b8)
# showed the straightforward row gather makes XLA lay the whole carried
# (L, B*G, T, D) cache out BATCH-MINOR (rows on the lane axis): the
# gather then lowers to chunked pad/maximum ops AND the stack gets
# layout-copied twice per step for the attention reads — ~2.5 ms/step
# of the 8.2 ms beam step. "matmul" expresses the same permutation as a
# one-hot (rows, rows) contraction: a streaming MXU op with natural
# layouts on both sides, bit-exact (each output row is one value plus
# zeros). Flag kept for the A/B (tools/beam_reorder_ab.py).
REORDER = "matmul"
# Fuse the reorder into decoder_apply's layer scan (row_perm): the scan
# restacks every self-cache slab each step anyway, so permuting the
# layer slice in-scan deletes the standalone full-cache read+write pass
# (0.97 ms/step at small beam-15 x b8, ~its bytes floor — the largest
# single item left in the r3 beam retrace). Bit-exact same contraction.
# Module-level for the on-chip A/B (tools/beam_reorder_ab.py).
FUSE_REORDER = True


def _reorder_beam_cache(cache, src_global):
    """Physically reorder the self K/V slabs to the surviving beams'
    source rows (reference semantics: decoding.py:173-180
    ``rearrange_kv_cache``). Module-level so the decomposition probe can
    patch it; the audio cross-attention K/V is beam-shared and never
    reordered."""
    self_keys = [k for k in ("k", "v", "k_s", "v_s") if k in cache]
    if REORDER == "matmul":
        rows = cache["k"].shape[1]

        def perm(slab):
            # int8 slabs (quantize="int8kv"): contract in int8 with an
            # int32 accumulator (MXU-native), cast back — still bit-exact
            # (each output row is one int8 value plus zeros)
            acc = jnp.int32 if slab.dtype == jnp.int8 else slab.dtype
            onehot = jax.nn.one_hot(src_global, rows, dtype=slab.dtype, axis=-1)
            out = jnp.einsum(
                "gs,ls...->lg...", onehot, slab, preferred_element_type=acc
            )
            return out.astype(slab.dtype)

        return dict(cache, **{k: perm(cache[k]) for k in self_keys})
    return dict(cache, **{k: cache[k][:, src_global] for k in self_keys})


def compiled_program_stats() -> Dict[str, int]:
    """Count of DISTINCT compiled programs built in this process, per
    builder (= lru-cache misses; hits reuse an existing executable).

    On this image a fresh decode-program compile is 1-5 min through the
    remote tunnel, so long-form transcription budgets compiles explicitly:
    prompt lengths are bucketed to powers of two
    (``DecodingOptions.bucket_prompt_lengths``) and each (temperature,
    prompt-bucket) pair compiles at most once per process. See
    docs/performance.md "Compile-time management" for the expected
    counts; tests/test_transcribe.py asserts the bound.
    """
    from .speculative import _make_spec_program
    from .timing import _alignment_program

    return {
        "decode_programs": _make_decode_program.cache_info().misses,
        "encode_programs": _make_encode_program.cache_info().misses,
        "lang_id_programs": _make_lang_id_program.cache_info().misses,
        "alignment_programs": _alignment_program.cache_info().misses,
        "speculative_programs": _make_spec_program.cache_info().misses,
    }


def decode(
    model: "Whisper",
    mel,
    options: DecodingOptions = DecodingOptions(),
    xt=None,
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30-second mel segment(s). Parity: reference decoding.py:801-838.

    ``xt`` optionally supplies gated-x-attn conditioning streams
    (n_langs, B, S, D) — translated-text embeddings or video features."""
    mel = jnp.asarray(mel)
    single = mel.ndim == 2
    if single:
        mel = mel[None]
        if xt is not None:
            xt = jnp.asarray(xt)
            if xt.ndim == 3:  # (n_langs, S, D) -> add the batch axis
                xt = xt[:, None]
    if kwargs:
        options = replace(options, **kwargs)
    result = DecodingTask(model, options).run(mel, xt=xt)
    return result[0] if single else result



@lru_cache(maxsize=None)
def _make_decode_program(
    dims,
    cfg: _FilterConfig,
    G: int,
    eot: int,
    max_len: int,
    temperature: float,
    use_beam: bool,
    C: int,
    dtype,
    no_speech,
    sot_index: int,
    use_xt: bool = False,
    sequential_xt: bool = False,
    quantize=None,
):
    """Build (and cache) the jitted end-to-end decode program for one
    static decode configuration. With ``use_xt`` the program takes an
    extra conditioning-stream operand consumed by gated x-attn.
    ``quantize`` is the DecodingOptions.quantize mode: "int8" stores the
    loop-resident weights and static K/V slabs int8 (see models.whisper
    .quantize_decode_params); "int8kv" additionally stores the decode
    *self* cache int8 with per-token scales — the beam-mode variant,
    where the self-cache reads + physical beam reorder dominate the
    step and are bytes-bound (docs/performance.md)."""
    quantize_self = quantize == "int8kv"

    def prefill_and_loop(params, audio_features, init_tokens, rng, xt=None):
        n_audio = init_tokens.shape[0]  # B (un-repeated)
        n_batch = n_audio * G  # B * G
        init_len = init_tokens.shape[1]

        # one-time param transform (dtype cast / QKV fusion / optional
        # int8 quantization), shared with the speculative program builder
        params = prepare_decode_params(params, dtype, bool(quantize))

        # audio/conditioning K/V and the prefill run at batch B: prompts
        # are identical across beams, and cross-attention K/V is shared
        # per audio (the grouped attention reads it once per audio, not
        # per beam — for beam 15 large this is a ~15x HBM cut)
        cache = init_cache(
            params, dims, audio_features,
            xt=xt if use_xt else None, max_len=max_len, dtype=dtype,
            quantize=bool(quantize), quantize_self=quantize_self,
        )
        logits, cache = decoder_apply(
            params, dims, init_tokens, cache=cache, offset=0, dtype=dtype,
            sequential_xt=sequential_xt,
        )
        no_speech_probs = jax.nn.softmax(
            logits[:, sot_index].astype(jnp.float32), axis=-1
        )[:, no_speech] if no_speech is not None else jnp.full((n_audio,), jnp.nan)
        no_speech_probs = jnp.repeat(no_speech_probs, G, axis=0)

        # expand only the divergent state to B*G: self K/V and tokens
        cache = dict(
            cache,
            k=jnp.repeat(cache["k"], G, axis=1),
            v=jnp.repeat(cache["v"], G, axis=1),
            **(
                dict(
                    k_s=jnp.repeat(cache["k_s"], G, axis=1),
                    v_s=jnp.repeat(cache["v_s"], G, axis=1),
                )
                if quantize_self else {}
            ),
        )
        logits = jnp.repeat(logits[:, -1:], G, axis=0)
        init_tokens = jnp.repeat(init_tokens, G, axis=0)

        tokens = jnp.full((n_batch, max_len + 1), eot, dtype=jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, init_tokens.astype(jnp.int32), (0, 0))

        state = {
            "tokens": tokens,
            "cur_len": jnp.asarray(init_len, jnp.int32),
            "sum_logprobs": (
                jnp.tile(
                    jnp.asarray([0.0] + [NEG_INF] * (G - 1), jnp.float32),
                    n_batch // G,
                )
                if use_beam
                else jnp.zeros((n_batch,), jnp.float32)
            ),
            "finished": jnp.zeros((n_batch,), bool),
            "cache": cache,
            "last_logits": logits[:, -1].astype(jnp.float32),
            "rng": rng,
            "completed": jnp.asarray(False),
        }
        if use_beam:
            B = n_batch // G
            state["fin_tokens"] = jnp.full((B, C, max_len + 1), eot, jnp.int32)
            state["fin_scores"] = jnp.full((B, C), NEG_INF, jnp.float32)
            state["fin_count"] = jnp.zeros((B,), jnp.int32)

        def cond(state):
            return (~state["completed"]) & (state["cur_len"] < max_len)

        def greedy_body(state):
            logits = _apply_filters(
                cfg, state["last_logits"], state["tokens"], state["cur_len"]
            )
            rng, sub = jax.random.split(state["rng"])
            if temperature == 0:
                next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                next_tokens = jax.random.categorical(
                    sub, logits / temperature, axis=-1
                ).astype(jnp.int32)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            current = jnp.take_along_axis(
                logprobs, next_tokens[:, None], axis=1
            )[:, 0]
            sum_logprobs = state["sum_logprobs"] + current * (
                ~state["finished"]
            )
            next_tokens = jnp.where(state["finished"], eot, next_tokens)
            tokens = jax.lax.dynamic_update_slice(
                state["tokens"], next_tokens[:, None], (0, state["cur_len"])
            )
            finished = state["finished"] | (next_tokens == eot)
            cur_len = state["cur_len"] + 1

            new_logits, cache = decoder_apply(
                params,
                dims,
                jax.lax.dynamic_slice(
                    tokens, (0, cur_len - 1), (n_batch, 1)
                ),
                cache=state["cache"],
                offset=cur_len - 1,
                dtype=dtype,
                sequential_xt=sequential_xt,
            )
            return dict(
                state,
                tokens=tokens,
                cur_len=cur_len,
                sum_logprobs=sum_logprobs,
                finished=finished,
                cache=cache,
                last_logits=new_logits[:, -1].astype(jnp.float32),
                rng=rng,
                completed=jnp.all(finished),
            )

        def beam_body(state):
            B = n_batch // G
            K = G + 1
            N = G * K
            logits = _apply_filters(
                cfg, state["last_logits"], state["tokens"], state["cur_len"]
            )
            logprobs = jax.nn.log_softmax(logits, axis=-1)  # (B*G, V)
            top_vals, top_idx = _beam_topk(logprobs, K)  # (B*G, K)
            cand_scores = (state["sum_logprobs"][:, None] + top_vals).reshape(B, N)
            cand_tokens = top_idx.reshape(B, N)

            sort_idx = jnp.argsort(-cand_scores, axis=1)  # (B, N) desc
            s_scores = jnp.take_along_axis(cand_scores, sort_idx, axis=1)
            s_tokens = jnp.take_along_axis(cand_tokens, sort_idx, axis=1)
            s_is_eot = s_tokens == eot
            # exclusive running count of non-EOT candidates seen so far
            nonterm_rank = jnp.cumsum(~s_is_eot, axis=1) - (~s_is_eot)

            # -- select the top G unfinished continuations --
            order_key = jnp.where(
                s_is_eot,
                N + jax.lax.broadcasted_iota(jnp.int32, (B, N), 1),
                nonterm_rank,
            )
            beam_pos = jnp.argsort(order_key, axis=1)[:, :G]  # sorted positions
            sel_sorted = beam_pos  # positions into the sorted axis
            sel_flat = jnp.take_along_axis(sort_idx, sel_sorted, axis=1)  # (B, G)
            sel_scores = jnp.take_along_axis(s_scores, sel_sorted, axis=1)
            sel_token = jnp.take_along_axis(s_tokens, sel_sorted, axis=1)
            src_beam = sel_flat // K  # (B, G), within-audio beam index
            src_global = (
                jax.lax.broadcasted_iota(jnp.int32, (B, G), 0) * G + src_beam
            ).reshape(-1)

            tokens = state["tokens"][src_global]
            tokens = jax.lax.dynamic_update_slice(
                tokens,
                sel_token.reshape(-1, 1).astype(jnp.int32),
                (0, state["cur_len"]),
            )
            sum_logprobs = sel_scores.reshape(-1)
            if FUSE_REORDER:
                # defer the self-cache reorder into decoder_apply's layer
                # scan (models/whisper.py row_perm): the scan restacks
                # every slab anyway, so the permutation rides the restack
                # instead of paying its own full-cache read+write pass
                cache, row_perm = state["cache"], src_global
            else:
                cache = _reorder_beam_cache(state["cache"], src_global)
                row_perm = None

            # -- newly finished sequences -> fixed-capacity buffer --
            eligible = s_is_eot & (nonterm_rank < G)
            # candidate rows (with EOT written) in sorted order
            elig_rank = jnp.cumsum(eligible, axis=1) - eligible  # exclusive
            n_elig = jnp.sum(eligible, axis=1)  # (B,)
            # compact eligible entries to the front, in score order
            elig_key = jnp.where(
                eligible,
                elig_rank,
                N + jax.lax.broadcasted_iota(jnp.int32, (B, N), 1),
            )
            elig_pos = jnp.argsort(elig_key, axis=1)  # (B, N)
            elig_flat = jnp.take_along_axis(sort_idx, elig_pos, axis=1)
            elig_scores = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (B, N), 1) < n_elig[:, None],
                jnp.take_along_axis(s_scores, elig_pos, axis=1),
                NEG_INF,
            )
            slot = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
            take_src = slot - state["fin_count"][:, None]
            valid = (take_src >= 0) & (take_src < n_elig[:, None])
            take_clip = jnp.clip(take_src, 0, N - 1)
            new_scores = jnp.where(
                valid,
                jnp.take_along_axis(elig_scores, take_clip, axis=1),
                state["fin_scores"],
            )
            src_flat_for_slot = jnp.take_along_axis(elig_flat, take_clip, axis=1)
            src_beam_fin = src_flat_for_slot // K  # (B, C)
            fin_rows = state["tokens"].reshape(B, G, -1)[
                jax.lax.broadcasted_iota(jnp.int32, (B, C), 0), src_beam_fin
            ]  # (B, C, L)
            fin_rows = jax.lax.dynamic_update_slice(
                fin_rows,
                jnp.full((B, C, 1), eot, jnp.int32),
                (0, 0, state["cur_len"]),
            )
            new_fin_tokens = jnp.where(
                valid[:, :, None], fin_rows, state["fin_tokens"]
            )
            new_count = jnp.minimum(state["fin_count"] + n_elig, C)

            cur_len = state["cur_len"] + 1
            completed = jnp.all(new_count >= C)

            new_logits, cache = decoder_apply(
                params,
                dims,
                jax.lax.dynamic_slice(tokens, (0, cur_len - 1), (n_batch, 1)),
                cache=cache,
                offset=cur_len - 1,
                dtype=dtype,
                sequential_xt=sequential_xt,
                row_perm=row_perm,
            )
            return dict(
                state,
                tokens=tokens,
                cur_len=cur_len,
                sum_logprobs=sum_logprobs,
                cache=cache,
                last_logits=new_logits[:, -1].astype(jnp.float32),
                fin_tokens=new_fin_tokens,
                fin_scores=new_scores,
                fin_count=new_count,
                completed=completed,
            )

        body = beam_body if use_beam else greedy_body
        state = jax.lax.while_loop(cond, body, state)

        out = {
            "tokens": state["tokens"],
            "sum_logprobs": state["sum_logprobs"],
            "no_speech_probs": no_speech_probs,
            "cur_len": state["cur_len"],
        }
        if use_beam:
            out.update(
                fin_tokens=state["fin_tokens"],
                fin_scores=state["fin_scores"],
                fin_count=state["fin_count"],
            )
        return out

    return jax.jit(prefill_and_loop)
