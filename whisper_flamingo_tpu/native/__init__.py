"""Native (C) host-side kernels with transparent numpy fallback.

``wf_native.c`` compiles on first import (cc -O3 -shared) into a per-user
cache directory and loads via ctypes — no Python.h / pybind dependency.
If no compiler is available the pure-Python implementations in
``metrics.py`` / ``data/noise.py`` / ``audio.py`` are used instead;
``AVAILABLE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "wf_native.c")
_LIB: Optional[ctypes.CDLL] = None
AVAILABLE = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    cc = os.environ.get("CC") or shutil.which("cc") or shutil.which("gcc")
    if cc is None or not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "whisper_flamingo_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"wf_native_{digest}.so")
    if not os.path.exists(lib_path):
        with tempfile.NamedTemporaryFile(suffix=".so", dir=cache_dir, delete=False) as tmp:
            tmp_path = tmp.name
        cmd = [cc, "-O3", "-shared", "-fPIC", "-o", tmp_path, _SRC, "-lm"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_path, lib_path)
        except (subprocess.CalledProcessError, OSError):
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.wf_mix_noise.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_double, f32p
    ]
    lib.wf_mix_noise.restype = ctypes.c_int
    lib.wf_resample_linear.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_double, f32p, ctypes.c_int64, ctypes.c_double
    ]
    lib.wf_resample_linear.restype = ctypes.c_int
    lib.wf_edit_distance.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.wf_edit_distance.restype = ctypes.c_int64
    return lib


_LIB = _build_and_load()
AVAILABLE = _LIB is not None


def mix_noise(clean: np.ndarray, noise: np.ndarray, snr_db: float) -> Optional[np.ndarray]:
    """RMS-matched SNR mix (int16-valued float output); None if unavailable."""
    if _LIB is None:
        return None
    clean = np.ascontiguousarray(clean, np.float32)
    noise = np.ascontiguousarray(noise, np.float32)
    out = np.empty_like(clean)
    rc = _LIB.wf_mix_noise(clean, clean.shape[0], noise, noise.shape[0],
                           float(snr_db), out)
    return out if rc == 0 else None


def resample_linear(x: np.ndarray, orig_sr: float, target_sr: float) -> Optional[np.ndarray]:
    if _LIB is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n_out = int(round(x.shape[0] / orig_sr * target_sr))
    out = np.empty((n_out,), np.float32)
    rc = _LIB.wf_resample_linear(x, x.shape[0], float(orig_sr), out, n_out,
                                 float(target_sr))
    return out if rc == 0 else None


def edit_distance(a: np.ndarray, b: np.ndarray) -> Optional[int]:
    if _LIB is None:
        return None
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    result = _LIB.wf_edit_distance(a, a.shape[0], b, b.shape[0])
    return int(result) if result >= 0 else None
