"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (the env vars must be set before jax
import)."""

import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image defaults to the axon TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize pre-imports jax with the axon TPU backend registered; the
# backend initializes lazily, so switching config here still takes effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent XLA compile cache: recompiles of identical programs (across
# in-process recipe smoke cells, and across suite runs) become disk hits.
# The dir is salted with this host's CPU feature set: XLA:CPU caches AOT
# *machine code* keyed without the full feature flags, and /tmp can
# outlive a fleet-VM migration — loading an executable compiled for a
# different microarchitecture logs `cpu_aot_loader ... could lead to
# execution errors such as SIGILL` and can crash the whole pytest
# process (observed as a faulthandler dump mid-suite).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = _f.read()
    _feats = next(
        (ln for ln in _cpu.splitlines() if ln.startswith("flags")), _cpu[:4096]
    )
except OSError:  # non-Linux fallback: per-boot salt is still safe
    import platform

    _feats = platform.processor() + platform.machine()
# sha256: hashlib.md5 raises on FIPS-enforcing builds, which would kill
# the whole session at conftest import
_salt = hashlib.sha256(_feats.encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/wf_cpu_jax_cache_{_salt}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec() on the stub works
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def import_reference_whisper():
    """Import the reference torch `whisper` package (read-only) for parity
    tests, stubbing out the GPU/JIT deps absent in this image."""
    if "whisper" in sys.modules and getattr(
        sys.modules["whisper"], "__file__", ""
    ).startswith(REFERENCE_ROOT):
        return sys.modules["whisper"]

    def _identity_jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    _stub_module("numba", jit=_identity_jit, njit=_identity_jit)
    _stub_module("triton")
    _stub_module("triton.language")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import whisper  # noqa: F401

    assert whisper.__file__.startswith(REFERENCE_ROOT)
    # drop the stubs again: transformers probes `triton` availability and
    # its torch path breaks if it finds the empty stub. The reference
    # modules keep the references they captured at import time.
    for name in ("numba", "triton", "triton.language"):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__spec__", None) is not None:
            if mod.__spec__.loader is None:  # our stub
                del sys.modules[name]
    return whisper
