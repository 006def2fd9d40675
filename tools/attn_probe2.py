"""Backend x remat sweep for the encoder train path (follow-up to
attn_probe.py, VERDICT r1 #4). attn_probe.py showed every flash tiling
is within noise (fwd 37.5 ms, fwd+grad 151.5 ms) and the isolated kernel
runs ~2.7 ms/layer vs ~0.3 ms MXU-bound — so this sweep asks whether the
XLA einsum path with remat (which avoids both the Pallas kernel AND the
O(T^2) residual save that OOMs without remat) beats flash end-to-end.

Usage: python tools/attn_probe2.py [model] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import encoder_apply, init_params

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch_size, 80, 3000)), jnp.float32)

    from whisper_flamingo_tpu.profiling import timeit_device as timeit

    for backend in ("flash", "xla"):
        for remat in (False, True, "dots"):
            def enc_loss(params, mel, backend=backend, remat=remat):
                return encoder_apply(
                    params, dims, mel, dtype=jnp.bfloat16,
                    backend=backend, remat=remat,
                ).astype(jnp.float32).mean()

            def grad_scalar(params, mel, enc_loss=enc_loss):
                g = jax.grad(enc_loss)(params, mel)
                return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                           for l in jax.tree.leaves(g))

            try:
                t_g = timeit(jax.jit(grad_scalar), params, mel)
                print(f"{backend:6s} remat={str(remat):6s} fwd+grad {t_g*1000:7.1f} ms",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                print(f"{backend:6s} remat={str(remat):6s} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
