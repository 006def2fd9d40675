"""AV-HuBERT fairseq key mapping: a synthetic state dict with the fairseq
naming must land in the right pytree slots."""

import numpy as np
import pytest

from whisper_flamingo_tpu.models.avhubert import (
    VIDEO_ENCODER_CONFIGS,
    load_avhubert_torch,
)

VCFG = VIDEO_ENCODER_CONFIGS["debug"]


def _fake_fairseq_state(rng):
    D, L, F = VCFG.embed_dim, VCFG.n_layers, VCFG.ffn_dim
    state = {}
    for i in range(L):
        p = f"encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{p}.self_attn.{name}.weight"] = rng.standard_normal((D, D)).astype(np.float32)
            state[f"{p}.self_attn.{name}.bias"] = rng.standard_normal((D,)).astype(np.float32)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            state[f"{p}.{ln}.weight"] = rng.standard_normal((D,)).astype(np.float32)
            state[f"{p}.{ln}.bias"] = rng.standard_normal((D,)).astype(np.float32)
        state[f"{p}.fc1.weight"] = rng.standard_normal((F, D)).astype(np.float32)
        state[f"{p}.fc1.bias"] = rng.standard_normal((F,)).astype(np.float32)
        state[f"{p}.fc2.weight"] = rng.standard_normal((D, F)).astype(np.float32)
        state[f"{p}.fc2.bias"] = rng.standard_normal((D,)).astype(np.float32)
    state["encoder.pos_conv.0.weight"] = rng.standard_normal(
        (D, D // VCFG.conv_pos_groups, VCFG.conv_pos)
    ).astype(np.float32)
    state["encoder.pos_conv.0.bias"] = rng.standard_normal((D,)).astype(np.float32)
    state["encoder.layer_norm.weight"] = rng.standard_normal((D,)).astype(np.float32)
    state["encoder.layer_norm.bias"] = rng.standard_normal((D,)).astype(np.float32)
    state["feature_extractor_video.proj.weight"] = rng.standard_normal(
        (D, VCFG.frontend_dim)
    ).astype(np.float32)
    state["feature_extractor_video.proj.bias"] = rng.standard_normal((D,)).astype(np.float32)
    return state


def test_fairseq_key_mapping():
    rng = np.random.default_rng(0)
    state = _fake_fairseq_state(rng)
    params = load_avhubert_torch(state, VCFG)

    # q weights transpose into (L, D, D) stacks
    for i in range(VCFG.n_layers):
        np.testing.assert_allclose(
            np.asarray(params["blocks"]["q"]["w"][i]),
            state[f"encoder.layers.{i}.self_attn.q_proj.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(params["blocks"]["mlp"]["fc1"]["w"][i]),
            state[f"encoder.layers.{i}.fc1.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(params["blocks"]["attn_ln"]["scale"][i]),
            state[f"encoder.layers.{i}.self_attn_layer_norm.weight"],
        )
    np.testing.assert_allclose(
        np.asarray(params["proj"]["w"]),
        state["feature_extractor_video.proj.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["pos_conv"]["w"]),
        state["encoder.pos_conv.0.weight"].transpose(2, 1, 0),
    )
    ln_key = "ln_post" if VCFG.layer_norm_first else "ln_pre"
    np.testing.assert_allclose(
        np.asarray(params[ln_key]["scale"]), state["encoder.layer_norm.weight"]
    )

    # the imported encoder still runs
    import jax.numpy as jnp

    from whisper_flamingo_tpu.models.avhubert import video_encoder_apply

    frames = rng.standard_normal((1, 4, 48, 48)).astype(np.float32)
    out = video_encoder_apply(params, VCFG, jnp.asarray(frames))
    assert out.shape == (1, 4, VCFG.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
