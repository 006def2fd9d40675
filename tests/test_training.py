"""Training runtime: losses decrease, param-group freezing matches the
reference's optimizer filters, KD step runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.models.dims import MODEL_DIMS, ModelDimensions
from whisper_flamingo_tpu.models.whisper import ModelExtras, init_params
from whisper_flamingo_tpu.training.optim import (
    flamingo_trainable_mask,
    no_decay_mask,
    whisper_flamingo_optimizer,
    whisper_optimizer,
)
from whisper_flamingo_tpu.training.steps import (
    TrainState,
    ce_loss,
    make_ce_train_step,
    make_eval_step,
    make_kd_train_step,
)

TINY = ModelDimensions(
    n_mels=80, n_audio_ctx=50, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=2,
    n_text_state=64, n_text_layer=2,
)


def _batch(rng, b=2, t=8):
    mel = rng.standard_normal((b, 80, 100)).astype(np.float32)
    dec = rng.integers(0, 1000, size=(b, t)).astype(np.int32)
    labels = np.roll(dec, -1, axis=1).astype(np.int32)
    labels[:, -1] = 50257
    labels[:, -2:] = np.where(labels[:, -2:] == 0, -100, labels[:, -2:])
    return {"input_ids": mel, "dec_input_ids": dec, "labels": labels}


def test_ce_loss_masking():
    logits = jnp.zeros((1, 3, 10))
    labels = jnp.array([[1, -100, 2]])
    loss = ce_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)


def test_ce_train_step_decreases_loss():
    rng = np.random.default_rng(0)
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx, _ = whisper_optimizer(
        params, 1e-3, warmup_steps=0, total_steps=100
    )
    step = make_ce_train_step(TINY, tx, dtype=jnp.float32, remat=False)
    state = TrainState.create(params, tx)
    batch = _batch(rng)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_flamingo_step_only_updates_gated():
    rng = np.random.default_rng(1)
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=32)
    params = init_params(jax.random.PRNGKey(0), TINY, extras)
    tx, _ = whisper_flamingo_optimizer(params, 1e-3, total_steps=100)
    step = make_ce_train_step(
        TINY, tx, freeze_encoder=True, use_xt=True, dtype=jnp.float32,
        remat=False, donate=False,
    )
    state = TrainState.create(params, tx)
    batch = _batch(rng)
    batch["xt"] = rng.standard_normal((1, 2, 5, 32)).astype(np.float32)
    new_state, _ = step(state, batch)

    mask = flamingo_trainable_mask(params)
    flat_old = jax.tree_util.tree_leaves_with_path(params)
    new_map = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    mask_map = dict(jax.tree_util.tree_leaves_with_path(mask))
    changed_frozen, changed_gated = [], 0
    for path, old in flat_old:
        new = new_map[tuple(path)] if isinstance(path, tuple) else new_map[path]
        delta = float(jnp.abs(new - old).max())
        if mask_map[path]:
            changed_gated += delta > 0
        elif delta > 0:
            changed_frozen.append(jax.tree_util.keystr(path))
    assert not changed_frozen, f"frozen params changed: {changed_frozen[:5]}"
    assert changed_gated > 0


def test_no_decay_mask_structure():
    params = init_params(jax.random.PRNGKey(0), TINY)
    mask = no_decay_mask(params)
    assert mask["encoder"]["ln_post"]["scale"] is False
    assert mask["encoder"]["ln_post"]["bias"] is False
    assert mask["encoder"]["conv1"]["b"] is False
    assert mask["encoder"]["conv1"]["w"] is True
    assert mask["decoder"]["token_embedding"] is True


def test_kd_train_step_runs():
    rng = np.random.default_rng(2)
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=32)
    teacher = init_params(jax.random.PRNGKey(0), TINY, extras)
    student = init_params(jax.random.PRNGKey(1), TINY)
    tx, _ = whisper_optimizer(student, 1e-4, total_steps=100)
    step = make_kd_train_step(
        TINY, tx, alpha=0.8, beta=1.0, temperature=2.0,
        dtype=jnp.float32, remat=False,
    )
    state = TrainState.create(student, tx)
    batch = _batch(rng)
    batch["xt"] = rng.standard_normal((1, 2, 5, 32)).astype(np.float32)
    state, metrics = step(state, teacher, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["kd"]) >= 0


def test_adafactor_optimizer():
    """optimizer="adafactor": trains, and optimizer state is a small
    fraction of AdamW's 8 bytes/param (the knob that fits the flagship
    KD pair on one 16 GB chip — docs/performance.md)."""
    # state size: check at a real-model-sized leaf (adafactor only factors
    # dims >= 128, so TINY's matrices would not factor)
    big = {"mlp": {"w": jnp.zeros((1280, 5120))}}

    def state_bytes(tx):
        st = tx.init(big)
        return sum(
            l.nbytes for l in jax.tree.leaves(st) if hasattr(l, "nbytes")
        )

    tx_ab, _ = whisper_optimizer(big, 1e-3, total_steps=100, optimizer="adafactor")
    tx_wb, _ = whisper_optimizer(big, 1e-3, total_steps=100)
    n_param_bytes = sum(l.nbytes for l in jax.tree.leaves(big))
    assert state_bytes(tx_wb) >= 2 * n_param_bytes * 0.99  # mu + nu, fp32
    assert state_bytes(tx_ab) < 0.01 * n_param_bytes  # factored nu only

    # weight decay must be DECOUPLED AND lr-scheduled (AdamW semantics),
    # not optax.adafactor's flat per-step weight_decay_rate: with zero
    # gradient and warmup lr=0 the update must be exactly zero, and at
    # lr>0 it must equal -lr * wd * param.
    wd, lr = 0.01, 1e-3
    tx_d, sched = whisper_optimizer(
        big, lr, weight_decay=wd, warmup_steps=10, total_steps=100,
        optimizer="adafactor", max_grad_norm=None,
    )
    p0 = {"mlp": {"w": jnp.ones((1280, 5120))}}
    st = tx_d.init(p0)
    zero_g = jax.tree.map(jnp.zeros_like, p0)
    upd, st = tx_d.update(zero_g, st, p0)  # step 0: warmup lr == 0
    assert float(jnp.abs(upd["mlp"]["w"]).max()) == 0.0
    for i in range(1, 11):
        upd, st = tx_d.update(zero_g, st, p0)
    expected = -float(sched(10)) * wd  # param == 1.0
    np.testing.assert_allclose(
        np.asarray(upd["mlp"]["w"])[:2, :2], expected, rtol=1e-5
    )

    # composes with a frozen-subtree mask (multi_transform MaskedNode)
    pf = {"encoder": {"w": jnp.ones((4, 4))}, "decoder": {"w": jnp.ones((4, 4))}}
    fmask = {"encoder": {"w": False}, "decoder": {"w": True}}
    tx_f, _ = whisper_optimizer(
        pf, 1e-3, total_steps=10, trainable_mask=fmask, optimizer="adafactor"
    )
    stf = tx_f.init(pf)
    updf, _ = tx_f.update(jax.tree.map(jnp.ones_like, pf), stf, pf)
    assert float(jnp.abs(updf["encoder"]["w"]).max()) == 0.0
    assert float(jnp.abs(updf["decoder"]["w"]).max()) > 0.0

    params = init_params(jax.random.PRNGKey(0), TINY)
    tx_a, _ = whisper_optimizer(params, 1e-3, total_steps=100, optimizer="adafactor")
    step = make_ce_train_step(TINY, tx_a, dtype=jnp.float32, remat=False, donate=False)
    state = TrainState.create(params, tx_a)
    batch = _batch(np.random.default_rng(0))
    before = jax.tree.leaves(state.params)[0].copy()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(jax.tree.leaves(state.params)[0], before)

    with pytest.raises(ValueError):
        whisper_optimizer(params, 1e-3, optimizer="sgd")


def test_gradient_accumulation():
    """optax.MultiSteps: params change only every k micro-steps."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx, _ = whisper_optimizer(params, 1e-3, total_steps=100, accumulate_steps=2)
    step = make_ce_train_step(TINY, tx, dtype=jnp.float32, remat=False, donate=False)
    state = TrainState.create(params, tx)
    batch = _batch(np.random.default_rng(0))

    before = np.asarray(params["decoder"]["ln"]["scale"])
    state, _ = step(state, batch)  # micro-step 1: accumulate only
    mid = np.asarray(state.params["decoder"]["ln"]["scale"])
    np.testing.assert_allclose(mid, before)
    state, _ = step(state, batch)  # micro-step 2: apply
    after = np.asarray(state.params["decoder"]["ln"]["scale"])
    assert np.abs(after - before).max() > 0


def test_eval_step():
    params = init_params(jax.random.PRNGKey(0), TINY)
    step = make_eval_step(TINY)
    batch = _batch(np.random.default_rng(3))
    loss, preds = step(params, batch)
    assert preds.shape == batch["dec_input_ids"].shape
    assert np.isfinite(float(loss))


def test_cast_frozen_bf16_forward_bit_identical():
    """bf16 frozen masters must not change the bf16-compute forward at
    all: matmul/conv weights are cast at use anyway, and the fp32-consumed
    leaves (LayerNorm scale/bias, token/pos embeddings) are exempt from
    the cast."""
    import numpy as np

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import (
        decoder_apply,
        encoder_apply,
        init_params,
    )
    from whisper_flamingo_tpu.training.steps import cast_frozen_bf16

    dims = MODEL_DIMS["debug"]
    params = init_params(jax.random.PRNGKey(0), dims)
    frozen = jax.tree.map(lambda _: False, params)  # freeze everything
    cast = cast_frozen_bf16(params, frozen)

    # exemptions stayed fp32
    dec = cast["decoder"]
    assert dec["token_embedding"].dtype == jnp.float32
    assert dec["pos_embedding"].dtype == jnp.float32
    assert dec["ln"]["scale"].dtype == jnp.float32
    # matmul weights got halved
    assert dec["blocks"]["attn"]["q"]["w"].dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 1000, (1, 7)), jnp.int32)

    def fwd(p):
        feats = encoder_apply(p, dims, mel, dtype=jnp.bfloat16)
        logits, _ = decoder_apply(p, dims, toks, feats, dtype=jnp.bfloat16)
        return np.asarray(logits)

    np.testing.assert_array_equal(fwd(params), fwd(cast))


def test_kd_cross_size_teacher():
    """Distil-whisper-style pair: a LARGER gated teacher distills into a
    smaller plain student (shared vocab); feature sharing across unequal
    encoder widths is rejected loudly."""
    import dataclasses

    import pytest

    big = dataclasses.replace(
        TINY, n_audio_state=96, n_text_state=96, n_audio_head=3, n_text_head=3
    )
    rng = np.random.default_rng(3)
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=32)
    teacher = init_params(jax.random.PRNGKey(0), big, extras)
    student = init_params(jax.random.PRNGKey(1), TINY)
    tx, _ = whisper_optimizer(student, 1e-4, total_steps=100)
    step = make_kd_train_step(
        TINY, tx, teacher_dims=big, dtype=jnp.float32, remat=False,
    )
    state = TrainState.create(student, tx)
    batch = _batch(rng)
    batch["xt"] = rng.standard_normal((1, 2, 5, 32)).astype(np.float32)
    state, metrics = step(state, teacher, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["kd"]) >= 0

    with pytest.raises(ValueError, match="matching encoder widths"):
        make_kd_train_step(
            TINY, tx, teacher_dims=big,
            freeze_student_encoder=True, share_teacher_features=True,
        )


def test_flamingo_optimizer_adafactor():
    """whisper_flamingo_optimizer honors optimizer='adafactor' (the
    memory-bound gated large-v2 case the knob exists for): factored
    state, uniform decoupled decay, and the gated-only freeze intact."""
    import jax.numpy as jnp2

    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import ModelExtras, init_params
    from whisper_flamingo_tpu.training.optim import whisper_flamingo_optimizer

    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=64)
    params = init_params(
        jax.random.PRNGKey(0), MODEL_DIMS["debug"], extras
    )
    tx, _ = whisper_flamingo_optimizer(
        params, 1e-3, total_steps=10, optimizer="adafactor"
    )
    st = tx.init(params)
    n_param_bytes = sum(
        p.size * 4 for p in jax.tree.leaves(params)
    )
    st_bytes = sum(
        l.size * l.dtype.itemsize
        for l in jax.tree.leaves(st)
        if hasattr(l, "dtype")
    )
    assert st_bytes < 0.2 * n_param_bytes  # factored, not fp32 mu+nu
    g = jax.tree.map(jnp2.ones_like, params)
    upd, _ = tx.update(g, st, params)
    # frozen outside the gated group, live inside it
    enc_leaf = jax.tree.leaves(upd["encoder"])[0]
    assert float(jnp2.abs(enc_leaf).max()) == 0.0
    gated = upd["decoder"]["blocks"]["gated"]
    assert any(
        float(jnp2.abs(l).max()) > 0 for l in jax.tree.leaves(gated)
    )
