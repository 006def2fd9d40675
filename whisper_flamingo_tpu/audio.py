"""Audio frontend: waveform IO, padding, and the log-Mel spectrogram.

TPU-native rebuild of the reference audio frontend
(`/root/reference/whisper/audio.py:13-161`). Behavioral parity targets:

- constants (`audio.py:13-23`): 16 kHz, N_FFT=400, HOP=160, 30 s chunk
  -> 3000 mel frames, 750 video frames @ 25 fps.
- ``log_mel_spectrogram`` (`audio.py:111-161`): hann STFT -> power ->
  mel filterbank -> log10 -> clamp at (max - 8) -> (x + 4) / 4, including
  the fork-added "already a spectrogram" passthrough when any dim == 80.
- ``pad_or_trim`` (`audio.py:66-89`).
- ``load_audio`` (`audio.py:26-63`) used an ffmpeg subprocess; here we read
  PCM WAV natively (stdlib) and only shell out to ffmpeg when available.

Design differences (TPU-first):

- The STFT is expressed as two real matmuls against windowed DFT basis
  matrices so the whole frontend (framing -> DFT -> mel projection) runs on
  the MXU as three large batched GEMMs inside one XLA program; there is no
  FFT butterfly, no host round-trip, and the op is fully batchable/jittable.
- The mel filterbank is *generated* (Slaney-style, the librosa formula the
  reference's packaged `mel_filters.npz` was exported from,
  `audio.py:92-108`) instead of shipping a binary blob.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
import wave
from functools import lru_cache, partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

# hard-coded audio hyperparameters (parity: reference audio.py:13-23)
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000 samples in a 30-second chunk
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 frames in a mel spectrogram input
N_VIDEO_FRAMES = CHUNK_LENGTH * 25  # 750 video frames in 30 s (25 fps)

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # initial convs have stride 2
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 10 ms per audio frame
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN  # 20 ms per audio token


def load_audio(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Read an audio file as a mono float32 waveform at ``sr``.

    PCM WAV files are decoded natively; other formats fall back to the
    ffmpeg CLI when present (the reference's only decode path,
    `audio.py:26-63`).
    """
    if file.lower().endswith(".wav"):
        try:
            return _load_wav(file, sr)
        except (wave.Error, struct.error):
            pass  # not a plain PCM wav; try ffmpeg below
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {file!r}: not a PCM WAV and ffmpeg is unavailable"
        )
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0", "-i", file,
        "-f", "s16le", "-ac", "1", "-acodec", "pcm_s16le", "-ar", str(sr), "-",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"Failed to load audio: {e.stderr.decode()}") from e
    return np.frombuffer(out, np.int16).flatten().astype(np.float32) / 32768.0


def _load_wav(file: str, sr: int) -> np.ndarray:
    with wave.open(file, "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(frames, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise wave.Error(f"unsupported sample width: {width}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    if rate != sr:
        data = resample_linear(data, rate, sr)
    return data


def resample_linear(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Linear-interpolation resampler (host-side, used only for file IO)."""
    if orig_sr == target_sr:
        return x
    duration = x.shape[0] / orig_sr
    n_out = int(round(duration * target_sr))
    t_out = np.arange(n_out) / target_sr
    t_in = np.arange(x.shape[0]) / orig_sr
    return np.interp(t_out, t_in, x).astype(np.float32)


def pad_or_trim(array, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad with zeros or trim to ``length`` along ``axis``.

    Parity: reference `audio.py:66-89` (numpy branch; works on jax arrays too).
    """
    xp = jnp if isinstance(array, jax.Array) else np
    if array.shape[axis] > length:
        array = xp.take(array, xp.arange(length), axis=axis)
    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = xp.pad(array, pad_widths)
    return array


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney formula; parity with librosa.filters.mel defaults,
# which produced the reference's packaged mel_filters.npz, audio.py:92-108)
# ---------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@lru_cache(maxsize=None)
def mel_filters_np(n_mels: int = 80, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1 + n_fft//2)."""
    assert n_mels in {80, 128}, f"Unsupported n_mels: {n_mels}"
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@lru_cache(maxsize=None)
def _stft_basis(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis matrices, each (n_fft, 1 + n_fft//2).

    The periodic hann window (torch.hann_window parity) is folded into the
    basis so the STFT is a single GEMM per (cos, sin) component.
    """
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    k = np.arange(1 + n_fft // 2, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(n, k) / n_fft
    cos_b = (window[:, None] * np.cos(phase)).astype(np.float32)
    sin_b = (window[:, None] * np.sin(phase)).astype(np.float32)
    return cos_b, sin_b


@lru_cache(maxsize=None)
def _stft_basis_split() -> tuple:
    """The windowed DFT bases split at hop boundaries, zero-padded to HOP
    multiples, so framing becomes reshapes instead of a gather:

    ``frames @ basis == sum_k chunk_k @ basis[k*HOP:(k+1)*HOP]`` where
    ``chunk_k = audio[k*HOP:].reshape(n_frames, HOP)``. N_FFT=400 spans
    2.5 hops; the third basis slice is zero-padded from 80 to 160 rows so
    no activation slicing is needed (the extra FLOPs are free on the MXU).
    """
    cos_b, sin_b = _stft_basis()
    n_chunks = -(-N_FFT // HOP_LENGTH)  # 3
    splits = []
    for k in range(n_chunks):
        lo, hi_ = k * HOP_LENGTH, min((k + 1) * HOP_LENGTH, N_FFT)
        c = np.zeros((HOP_LENGTH, cos_b.shape[1]), np.float32)
        s = np.zeros((HOP_LENGTH, sin_b.shape[1]), np.float32)
        c[: hi_ - lo] = cos_b[lo:hi_]
        s[: hi_ - lo] = sin_b[lo:hi_]
        splits.append((c, s))
    return tuple(splits)


@partial(jax.jit, static_argnames=("n_mels", "padding"))
def _log_mel_jax(audio: jax.Array, n_mels: int, padding: int) -> jax.Array:
    """Batched log-mel: (B, T) float32 -> (B, n_mels, T // HOP).

    TPU-first: the overlapping STFT framing is decomposed at hop
    boundaries into three contiguous reshapes, so the whole frontend is
    six fp32 GEMMs (3 x cos, 3 x sin) + one mel GEMM on the MXU — no
    (n_frames, N_FFT) frame tensor is ever materialized in HBM.
    """
    if padding > 0:
        audio = jnp.pad(audio, ((0, 0), (0, padding)))
    n_frames = audio.shape[-1] // HOP_LENGTH  # torch.stft center=True, last frame dropped
    half = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")

    hi = jax.lax.Precision.HIGHEST  # DFT needs more than bf16 mantissa
    b = audio.shape[0]
    re = jnp.zeros((b, n_frames, 1 + N_FFT // 2), jnp.float32)
    im = jnp.zeros_like(re)
    for k, (cos_k, sin_k) in enumerate(_stft_basis_split()):
        chunk = jax.lax.dynamic_slice_in_dim(
            x, k * HOP_LENGTH, n_frames * HOP_LENGTH, axis=1
        ).reshape(b, n_frames, HOP_LENGTH)
        re = re + jnp.einsum("btn,nk->btk", chunk, cos_k, precision=hi,
                             preferred_element_type=jnp.float32)
        im = im + jnp.einsum("btn,nk->btk", chunk, sin_k, precision=hi,
                             preferred_element_type=jnp.float32)
    power = re * re + im * im  # (B, n_frames, n_freqs)

    fb = jnp.asarray(mel_filters_np(n_mels))  # (n_mels, n_freqs)
    mel = jnp.einsum("btk,mk->bmt", power, fb, precision=hi,
                     preferred_element_type=jnp.float32)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_spectrogram(
    audio: Union[str, np.ndarray, jax.Array],
    n_mels: int = 80,
    padding: int = 0,
    device=None,  # accepted for API parity; placement is managed by JAX
):
    """Compute the log-Mel spectrogram of 16 kHz audio.

    Accepts a path, a 1-D waveform, or a batch of waveforms (B, T); returns
    (n_mels, T//160) or (B, n_mels, T//160). If the input already *is* a
    spectrogram (any dim == 80), it is returned unchanged — fork behavior
    at reference `audio.py:144`.
    """
    if isinstance(audio, str):
        audio = load_audio(audio)
    if 80 in np.shape(audio):  # fork passthrough: already a spectrogram
        return audio
    audio = jnp.asarray(audio, dtype=jnp.float32)
    single = audio.ndim == 1
    if single:
        audio = audio[None]
    # XLA TPU miscompile workaround (measured, v5e/axon): the fused
    # STFT program returns NaNs for batch sizes that are >8 and not a
    # multiple of 8 (b=9..15, 17, 20, 28... all-NaN or partial-NaN;
    # b<=8 and multiples of 8 are correct — the eager per-op chain is
    # fine at every size, so this is a fusion/tiling bug in the
    # backend, not in the math). Pad the batch up to a multiple of 8
    # with silent rows and slice back; the log clamp is per-row, so
    # padding rows cannot perturb real rows.
    # Scope of the bug class (tools/oddbatch_sweep.py, on-chip
    # 2026-08-20): the OTHER compiled programs are clean at odd
    # batches — greedy/beam decode token-identical, per-example train
    # losses equal with finite grads; the encoder deviates by only
    # 1-3 ulps of the compute dtype (reduction reassociation under a
    # different tiling, not a miscompile — f32 drops it to 1e-6). So
    # this guard stays local to the mel program.
    b = audio.shape[0]
    pad_rows = (-b) % 8 if b > 8 else 0
    if pad_rows:
        audio = jnp.concatenate(
            [audio, jnp.zeros((pad_rows, audio.shape[1]), audio.dtype)]
        )
    out = _log_mel_jax(audio, n_mels, padding)
    if pad_rows:
        out = out[:b]
    return out[0] if single else out
