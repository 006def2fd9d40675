"""Isolate the optimizer update cost on chip (r3: the train-step
decomposition attributes ~18 ms of the 161 ms small/b8 step to the
optimizer pass vs an ~8.5 ms HBM floor; this probe measures the optax
chain alone, with and without global-norm clip, and a hand-fused
variant, to decide whether a custom update is a real lever).

Usage: python tools/opt_probe.py [model]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import init_params
    from whisper_flamingo_tpu.training.optim import whisper_optimizer
    from whisper_flamingo_tpu.training.steps import TrainState

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"{model_name}: {n_params/1e6:.1f}M params")
    # fp32 grads shaped like params (what value_and_grad of the bf16-compute
    # loss produces for fp32 masters)
    grads = jax.jit(lambda p: jax.tree.map(lambda x: x * 1e-3, p))(params)
    jax.block_until_ready(grads)

    hbm_floor_ms = n_params * 4 * 8 / 819e9 * 1e3  # r grads+p+mu+nu, w p+mu+nu (+clip pass)
    print(f"HBM floor (8 fp32 passes @819GB/s): {hbm_floor_ms:.1f} ms")

    def timeit(fn, state, grads, iters=20):
        state2 = fn(state, grads)
        np.asarray(jax.tree.leaves(state2.params)[0][:1])
        # steady state: measure with fresh donation each iter
        t0 = time.perf_counter()
        s = state2
        for _ in range(iters):
            s = fn(s, grads)
        np.asarray(jax.tree.leaves(s.params)[0][:1])
        return (time.perf_counter() - t0) / iters * 1e3

    variants = []
    for label, max_gn in [("clip+adamw (prod)", 1.0), ("adamw, no clip", None)]:
        tx, _ = whisper_optimizer(
            params, 1e-5, total_steps=1000, max_grad_norm=max_gn
        )
        variants.append((label, tx))

    for label, tx in variants:
        p = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
        state = TrainState.create(p, tx)

        @jax.jit
        def upd(state, grads, tx=tx):
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            new_p = optax.apply_updates(state.params, updates)
            return TrainState(params=new_p, opt_state=opt_state, step=state.step + 1)

        upd_d = jax.jit(upd, donate_argnums=(0,))
        ms = timeit(upd_d, state, grads)
        print(f"{label:24s} {ms:8.2f} ms")
        state = upd_d = None

    # hand-fused AdamW: one pass, everything inline per leaf
    @jax.jit
    def fused(state, grads):
        mu, nu = state.opt_state
        count = state.step + 1
        lr = 1e-5
        b1, b2, eps, wd = 0.9, 0.999, 1e-8, 0.01
        gn = optax.global_norm(grads)
        scale = jnp.minimum(1.0, 1.0 / jnp.maximum(gn, 1e-12))

        def leaf(p, g, m, v):
            g = g * scale
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mh = m / (1 - b1**count)
            vh = v / (1 - b2**count)
            p = p - lr * (mh / (jnp.sqrt(vh) + eps) + wd * p)
            return p, m, v

        out = jax.tree.map(leaf, state.params, grads, mu, nu)
        p2 = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
        m2 = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
        v2 = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return TrainState(params=p2, opt_state=(m2, v2), step=count)

    p = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    mu = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))(p)
    nu = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))(p)
    state = TrainState(params=p, opt_state=(mu, nu), step=jnp.zeros([], jnp.int32))
    fused_d = jax.jit(fused, donate_argnums=(0,))
    ms = timeit(fused_d, state, grads)
    print(f"{'hand-fused clip+adamw':24s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
