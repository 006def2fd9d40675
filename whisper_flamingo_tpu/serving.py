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
from typing import List, Sequence

import numpy as np

from .audio import N_SAMPLES, load_audio, log_mel_spectrogram, pad_or_trim
from .decoding import DecodingOptions, DecodingResult, DecodingTask


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
