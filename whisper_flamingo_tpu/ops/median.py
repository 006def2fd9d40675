"""Median filter along the last axis.

Replacement for the reference's sort-based torch path and Triton
``median_kernel`` (`/root/reference/whisper/timing.py:19-54`,
`triton_ops.py:43-109`): reflect-pad, gather sliding windows, sort on
the VPU, take the middle — a single fused XLA program (the Triton
kernel's source-metaprogrammed bubble sort exists only because Triton
lacked a sort; XLA has one).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def median_filter(x, filter_width: int):
    """Median filter of odd width along the last axis (any leading dims).

    Parity: reference timing.py:19-54 including the small-input
    passthrough and reflect padding.
    """
    assert filter_width > 0 and filter_width % 2 == 1, (
        "`filter_width` should be an odd number"
    )
    x = jnp.asarray(x)
    pad_width = filter_width // 2
    if x.shape[-1] <= pad_width:
        return x

    padded = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad_width, pad_width)], mode="reflect"
    )
    n = x.shape[-1]
    idx = np.arange(n)[:, None] + np.arange(filter_width)[None, :]
    windows = padded[..., idx]  # (..., n, filter_width)
    return jnp.sort(windows, axis=-1)[..., pad_width]
