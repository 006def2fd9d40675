"""Word-level timestamp alignment via cross-attention DTW.

Rebuild of reference `/root/reference/whisper/timing.py:154-385`:

- :func:`find_alignment`: one teacher-forced forward that *returns* the
  per-layer cross-attention scores (no forward hooks — the functional
  model exposes them, `models/whisper.py decoder_apply(return_cross_qk)`),
  head-filtered by the model's alignment heads, softmaxed, z-normalized
  over the token axis, median-filtered, then DTW'd (`ops/dtw.py`
  wavefront) into word boundaries;
- :func:`merge_punctuations` and :func:`add_word_timestamps` with the
  reference's sentence/segment boundary duration hacks intact.

Provenance note: the alignment computation is a redesign (one fused
jitted program per token bucket instead of hooks + eager host math);
``merge_punctuations`` / ``add_word_timestamps`` are near-verbatim ports
— the boundary hacks (punctuation gluing, anomalous-duration clamps,
segment-edge snapping) ARE the word-timestamp output spec, so they are
retained as spec logic rather than re-derived, pinned by
tests/test_timing.py.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from functools import lru_cache
from typing import TYPE_CHECKING, List

import jax
import jax.numpy as jnp
import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from .models.whisper import decoder_apply, encoder_apply
from .ops.dtw import dtw
from .ops.median import median_filter
from .tokenizer import Tokenizer

if TYPE_CHECKING:
    from .models.whisper import Whisper


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


def _token_bucket(n: int) -> int:
    """Round the token count up to a bucket so the alignment program
    compiles once per bucket, not once per segment length."""
    return max(32, -(-n // 32) * 32)


@lru_cache(maxsize=None)
def _alignment_program(dims, dtype, tp, n_sot, eot_cut, medfilt_width, n_sel):
    """One jitted program for the whole alignment computation.

    The first cut ran only the forward on device and did the head
    gather / softmax / z-norm / median filter as eager jnp ops — through
    a remote-dispatch tunnel that is ~10 extra program launches per
    segment, plus a (T, 50k) fp32 logits transfer (~6 MB at ~30 MB/s).
    Everything now happens inside one program and only the
    (tp,)-probabilities and (tp, Ta) cost matrix come back (<1 MB).

    Shapes are static: tokens are padded to the ``tp`` bucket and the
    true counts come in as traced scalars. Parity with the reference's
    slice-then-filter order (timing.py:185-210) is kept by masked
    softmax over the real ``num_frames//2`` columns, masked z-norm
    moments over the real token rows, and reflecting the real time
    region into the padded columns before the median filter (so the
    filter sees exactly the reflect-padding the reference applies at the
    segment boundary).
    """

    def fwd(params, mel, tokens, n_tokens, nfh, qk_scale, head_l, head_h):
        feats = encoder_apply(params, dims, mel, dtype=dtype)
        logits, qks = decoder_apply(
            params, dims, tokens, feats, dtype=dtype, return_cross_qk=True
        )
        # per-token probabilities (reference timing.py:178-183): row i at
        # position n_sot+i predicts tokens[n_sot+1+i]
        rows = logits[0, n_sot:, :eot_cut].astype(jnp.float32)
        probs = jax.nn.softmax(rows, axis=-1)
        targets = jnp.roll(tokens[0], -(n_sot + 1))[: tp - n_sot]
        text_probs = jnp.take_along_axis(probs, targets[:, None], axis=1)[:, 0]

        # alignment-head weights (n_sel, tp, Ta)
        w = qks[head_l, 0, head_h].astype(jnp.float32)
        ta = w.shape[-1]
        col = jnp.arange(ta, dtype=jnp.int32)
        w = jnp.where(col[None, None, :] < nfh, w * qk_scale, -jnp.inf)
        w = jax.nn.softmax(w, axis=-1)
        # Reflect the real region into the padded zone so the median
        # filter's boundary behavior matches filtering the sliced
        # (..., nfh) array. The gather runs over ta + pad_width columns:
        # when nfh is within pad_width of ta (e.g. a 2998-frame final
        # segment), the real columns' windows would otherwise spill into
        # the filter's own edge padding of the full-width array and see
        # values the reference never does.
        pad_w = medfilt_width // 2
        colx = jnp.arange(ta + pad_w, dtype=jnp.int32)
        ridx = jnp.where(colx < nfh, colx, jnp.maximum(2 * nfh - 2 - colx, 0))
        w = jnp.take(w, ridx, axis=-1)
        # masked z-norm over the real token rows (biased std, parity
        # with the reference's unbiased=False)
        rmask = (jnp.arange(tp, dtype=jnp.int32) < n_tokens)[None, :, None]
        cnt = n_tokens.astype(jnp.float32)
        mean = jnp.sum(jnp.where(rmask, w, 0.0), axis=-2, keepdims=True) / cnt
        var = jnp.sum(
            jnp.where(rmask, (w - mean) ** 2, 0.0), axis=-2, keepdims=True
        ) / cnt
        w = (w - mean) / jnp.sqrt(var)
        # reference small-input passthrough (ops/median.py, timing.py:29):
        # a sliced (..., nfh) array with nfh <= pad_width is returned
        # unfiltered, so select the unfiltered values in that regime
        w = jnp.where(nfh <= pad_w, w, median_filter(w, medfilt_width))
        return text_probs, jnp.mean(w, axis=0)

    return jax.jit(fwd)


def find_alignment(
    model: "Whisper",
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel,
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    """Parity: reference timing.py:163-240."""
    if len(text_tokens) == 0:
        return []

    tokens = np.array(
        [
            *tokenizer.sot_sequence,
            tokenizer.no_timestamps,
            *text_tokens,
            tokenizer.eot,
        ],
        dtype=np.int32,
    )

    mel = jnp.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]

    n_tok = len(tokens)
    n_sot = len(tokenizer.sot_sequence)
    tp = _token_bucket(n_tok)
    tokens_p = np.pad(tokens, (0, tp - n_tok), constant_values=tokenizer.eot)
    heads = np.argwhere(model.get_alignment_heads())  # (n_sel, 2) [layer, head]
    program = _alignment_program(
        model.dims, model.dtype, tp, n_sot, int(tokenizer.eot),
        medfilt_width, len(heads),
    )
    text_probs, matrix = jax.device_get(program(
        model.params, mel, jnp.asarray(tokens_p[None]),
        np.int32(n_tok), np.int32(num_frames // 2), np.float32(qk_scale),
        jnp.asarray(heads[:, 0]), jnp.asarray(heads[:, 1]),
    ))
    text_token_probs = np.asarray(text_probs)[: len(text_tokens)].tolist()

    matrix = np.asarray(matrix)[n_sot : n_tok - 1, : num_frames // 2]
    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(
        list(text_tokens) + [tokenizer.eot]
    )
    if len(word_tokens) <= 1:
        return []
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        np.mean(text_token_probs[i:j])
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, tokens_, float(start), float(end), float(probability))
        for word, tokens_, start, end, probability in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    """Parity: reference timing.py:243-274."""
    # merge prepended punctuations
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous.word.startswith(" ") and previous.word.strip() in prepended:
            following.word = previous.word + following.word
            following.tokens = previous.tokens + following.tokens
            previous.word = ""
            previous.tokens = []
        else:
            j = i
        i -= 1

    # merge appended punctuations
    i = 0
    j = 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous.word.endswith(" ") and following.word in appended:
            previous.word = previous.word + following.word
            previous.tokens = previous.tokens + following.tokens
            following.word = ""
            following.tokens = []
        else:
            i = j
        j += 1


def add_word_timestamps(
    *,
    segments: List[dict],
    model: "Whisper",
    tokenizer: Tokenizer,
    mel,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float,
    **kwargs,
):
    """Parity: reference timing.py:277-385 (including the median-duration
    truncation hacks at sentence and segment boundaries)."""
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]

    text_tokens = list(itertools.chain.from_iterable(text_tokens_per_segment))
    alignment = find_alignment(model, tokenizer, text_tokens, mel, num_frames, **kwargs)
    word_durations = np.array([t.end - t.start for t in alignment])
    word_durations = word_durations[word_durations.nonzero()]
    median_duration = np.median(word_durations) if len(word_durations) > 0 else 0.0
    max_duration = median_duration * 2

    # truncate long words at sentence boundaries
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, seg_text_tokens in zip(segments, text_tokens_per_segment):
        saved_tokens = 0
        words = []

        while word_index < len(alignment) and saved_tokens < len(seg_text_tokens):
            timing = alignment[word_index]
            if timing.word:
                words.append(
                    dict(
                        word=timing.word,
                        start=round(time_offset + timing.start, 2),
                        end=round(time_offset + timing.end, 2),
                        probability=timing.probability,
                    )
                )
            saved_tokens += len(timing.tokens)
            word_index += 1

        # truncate long words at segment boundaries
        if len(words) > 0:
            if words[0]["end"] - last_speech_timestamp > median_duration * 4 and (
                words[0]["end"] - words[0]["start"] > max_duration
                or (
                    len(words) > 1
                    and words[1]["end"] - words[0]["start"] > max_duration * 2
                )
            ):
                if len(words) > 1 and words[1]["end"] - words[1]["start"] > max_duration:
                    boundary = max(words[1]["end"] / 2, words[1]["end"] - max_duration)
                    words[0]["end"] = words[1]["start"] = boundary
                words[0]["start"] = max(0, words[0]["end"] - max_duration)

            # prefer the segment-level start/end when words run long
            if (
                segment["start"] < words[0]["end"]
                and segment["start"] - 0.5 > words[0]["start"]
            ):
                words[0]["start"] = max(
                    0, min(words[0]["end"] - median_duration, segment["start"])
                )
            else:
                segment["start"] = words[0]["start"]

            if (
                segment["end"] > words[-1]["start"]
                and segment["end"] + 0.5 < words[-1]["end"]
            ):
                words[-1]["end"] = max(
                    words[-1]["start"] + median_duration, segment["end"]
                )
            else:
                segment["end"] = words[-1]["end"]

            last_speech_timestamp = segment["end"]

        segment["words"] = words
