"""Fill the one unmeasured cell of the conditioned-decode table: the
AV-shaped Whisper-Flamingo stream (S=448 frames, 1024-dim — the
AV-HuBERT-large embed size at the n_text_ctx cap) under the int8kv
serving mode, measured same-session against its bf16 row.

The BERT-dim (S=64, 768-d) conditioning row already has a measured
int8kv number in bench.py / docs/performance.md; this A/B closes the
"—" cell for the AV shape without growing the driver bench (every
bench row costs a 1-5 min cold remote compile against the driver's
timeout, and the S=448 bf16 row already established that the slab
*read* is not the per-step term).

Protocol identical to bench.py's flamingo rows (reference
README.md:113-117: beam 15; gated blocks model.py:110-215): small
model, b8, 64-token budget with EOT suppressed, gates opened to 1 so
the conditioning path executes every step.

Usage: python tools/flamingo_av_int8_ab.py [iters] [model]
(WF_BENCH_PLATFORM=cpu + model=tiny for a smoke run — same env knob as
bench.py; under this image also unset PALLAS_AXON_POOL_IPS, CLAUDE.md.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _decode_bench, _flamingo_model  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    platform = os.environ.get("WF_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch, sample_len = 8, 64
    dims = MODEL_DIMS[sys.argv[2] if len(sys.argv) > 2 else "small"]
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    model = _flamingo_model(dims, bert_dim=1024)
    xt_av = jnp.asarray(rng.standard_normal((1, batch, 448, 1024)), jnp.float32)

    bf16_rtf, _ = _decode_bench(model, mel, sample_len, 15, iters, eot, xt=xt_av)
    print(f"flamingo AV (S=448, 1024-d) beam15 bf16:   rtf={bf16_rtf:.1f}")
    kv_rtf, _ = _decode_bench(
        model, mel, sample_len, 15, iters, eot, "int8kv", xt=xt_av
    )
    print(f"flamingo AV (S=448, 1024-d) beam15 int8kv: rtf={kv_rtf:.1f}")
    print(f"int8kv vs bf16 (same session): {kv_rtf / bf16_rtf:.3f}x")


if __name__ == "__main__":
    main()
