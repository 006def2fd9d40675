"""SpecAugment: frequency and time masking restricted to real (unpadded)
audio frames.

Parity with reference `/root/reference/spec_augment.py:6-116` (ESPnet-
derived, time-warp removed): masks only touch ``[:audio_frames]`` rows,
widths drawn as ``randint(0, F)`` / ``randint(0, T)`` per mask with the
same degenerate-range skips. Presets: ``ls-double`` (2 freq + 2 time
masks, the reference's LibriSpeech-double) and ``ls-basic`` (1 + 1),
selected per dataset exactly as the scripts do
(`whisper_ft_librispeech.py:82-88`).

Two implementations:

- :func:`spec_augment_np` — host-side numpy, bit-compatible semantics
  with the reference for per-sample CPU pipelines.
- :func:`spec_augment_jax` — fully on-device, batched, jit/vmap-friendly
  (mask geometry drawn with ``jax.random``), for keeping augmentation
  inside the sharded input pipeline on TPU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

PRESETS = {
    "ls-double": dict(n_freq_mask=2, n_time_mask=2, max_freq_width=27, max_time_width=100),
    "ls-basic": dict(n_freq_mask=1, n_time_mask=1, max_freq_width=27, max_time_width=100),
}


def freq_mask_np(x, audio_frames, F=30, n_mask=2, replace_with_zero=True, rng=None):
    """x: (time, freq) numpy array; masks only the first ``audio_frames`` rows."""
    rng = rng or np.random.default_rng()
    cloned = x.copy()
    num_mel_channels = cloned.shape[1]
    fs = rng.integers(0, F, size=(n_mask, 2))
    for f, mask_end in fs:
        f_zero = int(rng.integers(0, num_mel_channels - f)) if num_mel_channels - f > 0 else 0
        if f_zero == f_zero + f:
            continue
        mask_end = int(mask_end) + f_zero
        fill = 0 if replace_with_zero else cloned.mean()
        cloned[:audio_frames, f_zero:mask_end] = fill
    return cloned


def time_mask_np(spec, audio_frames, T=40, n_mask=2, replace_with_zero=True, rng=None):
    rng = rng or np.random.default_rng()
    cloned = spec.copy()
    len_spectro = audio_frames
    ts = rng.integers(0, T, size=(n_mask, 2))
    for t, mask_end in ts:
        if len_spectro - t <= 0:
            continue
        t_zero = int(rng.integers(0, len_spectro - t))
        if t_zero == t_zero + t:
            continue
        mask_end = int(mask_end) + t_zero
        fill = 0 if replace_with_zero else cloned.mean()
        cloned[t_zero:mask_end] = fill
    return cloned


def spec_augment_np(
    x: np.ndarray,
    audio_frames: int,
    max_freq_width: int = 27,
    n_freq_mask: int = 2,
    max_time_width: int = 100,
    n_time_mask: int = 2,
    replace_with_zero: bool = True,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Host-side SpecAugment over (time, freq). Parity: spec_augment.py:68-116
    (time-warp removed there as well)."""
    assert x.ndim == 2
    rng = rng or np.random.default_rng()
    x = freq_mask_np(x, audio_frames, max_freq_width, n_freq_mask,
                     replace_with_zero=replace_with_zero, rng=rng)
    x = time_mask_np(x, audio_frames, max_time_width, n_time_mask,
                     replace_with_zero=replace_with_zero, rng=rng)
    return x


def spec_augment_jax(
    key: jax.Array,
    x: jax.Array,
    audio_frames: jax.Array,
    max_freq_width: int = 27,
    n_freq_mask: int = 2,
    max_time_width: int = 100,
    n_time_mask: int = 2,
) -> jax.Array:
    """On-device batched SpecAugment.

    x: (B, time, freq); audio_frames: (B,) true lengths. Zero-fill masks;
    fully shape-static so it fuses into the input pipeline under jit.

    Mask geometry mirrors the reference's (quirky) sampling exactly
    (reference spec_augment.py:21-66, same as the numpy path above): each
    mask draws a *pair* (w, mask_end); ``w`` only bounds the start
    position and gates the ``w == 0`` skip, while the masked width is
    ``mask_end`` — the second draw.
    """
    B, T, Fdim = x.shape

    def one(key, xi, frames):
        kf = jax.random.split(key, n_freq_mask + n_time_mask)
        t_pos = jax.lax.broadcasted_iota(jnp.int32, (T, Fdim), 0)
        f_pos = jax.lax.broadcasted_iota(jnp.int32, (T, Fdim), 1)
        mask = jnp.zeros((T, Fdim), bool)
        for i in range(n_freq_mask):
            k1, k2, k3 = jax.random.split(kf[i], 3)
            f = jax.random.randint(k1, (), 0, max_freq_width)
            mask_end = jax.random.randint(k2, (), 0, max_freq_width)
            f0 = jax.random.randint(k3, (), 0, jnp.maximum(Fdim - f, 1))
            mask |= (
                (f > 0)
                & (f_pos >= f0) & (f_pos < f0 + mask_end) & (t_pos < frames)
            )
        for i in range(n_time_mask):
            k1, k2, k3 = jax.random.split(kf[n_freq_mask + i], 3)
            t = jax.random.randint(k1, (), 0, max_time_width)
            mask_end = jax.random.randint(k2, (), 0, max_time_width)
            t0 = jax.random.randint(k3, (), 0, jnp.maximum(frames - t, 1))
            valid = (frames - t > 0) & (t > 0)
            mask |= valid & (t_pos >= t0) & (t_pos < t0 + mask_end)
        return jnp.where(mask, 0.0, xi)

    keys = jax.random.split(key, B)
    return jax.vmap(one)(keys, x, audio_frames)
