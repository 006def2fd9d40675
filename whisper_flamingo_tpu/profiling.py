"""Profiling and step-timing utilities.

The reference had no systematic tracing (SURVEY.md §5.1 — an unused fvcore
FLOPs import was the whole story). Here profiling is first-class:

- :class:`StepTimer` — rolling wall-clock/throughput stats for train or
  decode loops (tokens/s, audio-seconds/s, step time percentiles);
- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory;
- :func:`model_flops` — analytic FLOPs for a Whisper forward (encoder +
  teacher-forced decoder), the fvcore-FLOPs-count equivalent;
- :func:`mfu` — model FLOPs utilization against a per-chip peak.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .models.dims import ModelDimensions

# bf16 peak FLOPs per chip for common TPU generations
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


@dataclass
class StepTimer:
    """Rolling step timing; call ``tick(n_tokens=..., n_audio_sec=...)``."""

    window: int = 100
    _times: List[float] = field(default_factory=list)
    _tokens: List[int] = field(default_factory=list)
    _audio: List[float] = field(default_factory=list)
    _last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, n_tokens: int = 0, n_audio_sec: float = 0.0) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._tokens.append(n_tokens)
            self._audio.append(n_audio_sec)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._tokens.pop(0)
                self._audio.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        times = np.asarray(self._times)
        total = float(times.sum())
        out = {
            "step_time_mean": float(times.mean()),
            "step_time_p50": float(np.percentile(times, 50)),
            "step_time_p99": float(np.percentile(times, 99)),
        }
        if sum(self._tokens):
            out["tokens_per_sec"] = sum(self._tokens) / total
        if sum(self._audio):
            out["rtf"] = sum(self._audio) / total
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wf_trace", host_only: bool = False):
    """jax.profiler trace context (open the dir in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def model_flops(
    dims: ModelDimensions,
    batch: int,
    mel_frames: int = 3000,
    text_len: int = 128,
    n_xt_streams: int = 0,
    xt_len: int = 0,
) -> float:
    """Analytic forward FLOPs (multiply+add = 2 FLOPs) for one batch."""
    Ta = min(mel_frames // 2, dims.n_audio_ctx)
    D, L = dims.n_audio_state, dims.n_audio_layer
    Dt, Lt, T = dims.n_text_state, dims.n_text_layer, text_len

    conv = 2 * mel_frames * 3 * dims.n_mels * D + 2 * Ta * 3 * D * D
    enc_layer = (
        4 * 2 * Ta * D * D  # qkv + out projections
        + 2 * 2 * Ta * Ta * D  # attention matmuls
        + 2 * 2 * Ta * D * 4 * D  # mlp
    )
    encoder = conv + L * enc_layer

    dec_layer = (
        4 * 2 * T * Dt * Dt
        + 2 * 2 * T * T * Dt
        + 2 * 2 * Dt * Dt * Ta  # cross k/v (amortized per fwd)
        + 2 * 2 * T * Dt * Dt  # cross q/out
        + 2 * 2 * T * Ta * Dt  # cross attention matmuls
        + 2 * 2 * T * Dt * 4 * Dt
        + n_xt_streams * (
            4 * 2 * T * Dt * Dt + 2 * 2 * T * xt_len * Dt + 2 * 2 * T * Dt * 4 * Dt
        )
    )
    logits = 2 * T * Dt * dims.n_vocab
    decoder = Lt * dec_layer + logits
    return float(batch * (encoder + decoder))


def mfu(flops_per_sec: float, chip: str = "v5e") -> float:
    return flops_per_sec / TPU_PEAK_FLOPS[chip]


def timeit_device(fn, *args, iters: int = 10) -> float:
    """Steady-state seconds/call for a jitted callable on the device.

    One warm-up call (absorbs compile), then ``iters`` async dispatches
    synced ONCE by materializing the first output leaf with
    ``np.asarray`` — ``jax.block_until_ready`` is unreliable through the
    tunneled TPU backend. Outputs must be small (scalars): a large
    output puts its device->host transfer inside the timed window
    (an (8,1500,768) feature tensor costs ~60 ms/iter at the ~30 MB/s
    tunnel — the round-1 microbench trap, docs/performance.md).
    """
    import time

    import jax
    import numpy as np

    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters
