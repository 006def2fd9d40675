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


def test_avsr_audio_trunk_key_mapping():
    """The avsr trunk's fairseq keys (feature_extractor_audio.proj, the
    top-level fused-feature layer_norm — distinct from encoder.layer_norm
    — and post_extract_proj) land in the right slots and the fused
    forward runs with either or both modalities."""
    import jax.numpy as jnp

    from whisper_flamingo_tpu.models.avhubert import avhubert_encoder_apply

    cfg = VIDEO_ENCODER_CONFIGS["debug-av"]
    rng = np.random.default_rng(1)
    D, A = cfg.embed_dim, cfg.audio_feat_dim
    state = _fake_fairseq_state(rng)
    state["feature_extractor_audio.proj.weight"] = rng.standard_normal((D, A)).astype(np.float32)
    state["feature_extractor_audio.proj.bias"] = rng.standard_normal((D,)).astype(np.float32)
    state["layer_norm.weight"] = rng.standard_normal((2 * D,)).astype(np.float32)
    state["layer_norm.bias"] = rng.standard_normal((2 * D,)).astype(np.float32)
    state["post_extract_proj.weight"] = rng.standard_normal((D, 2 * D)).astype(np.float32)
    state["post_extract_proj.bias"] = rng.standard_normal((D,)).astype(np.float32)

    params = load_avhubert_torch(state, cfg)
    np.testing.assert_allclose(
        np.asarray(params["proj_audio"]["w"]),
        state["feature_extractor_audio.proj.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["fuse_ln"]["scale"]), state["layer_norm.weight"]
    )
    np.testing.assert_allclose(
        np.asarray(params["post_proj"]["w"]), state["post_extract_proj.weight"].T
    )
    # fused LN is NOT the transformer's final LN
    assert params["fuse_ln"]["scale"].shape == (2 * D,)

    video = rng.standard_normal((1, 4, 48, 48)).astype(np.float32)
    fbank = rng.standard_normal((1, 4, A)).astype(np.float32)
    both = avhubert_encoder_apply(params, cfg, video=jnp.asarray(video), audio=jnp.asarray(fbank))
    v_only = avhubert_encoder_apply(params, cfg, video=jnp.asarray(video))
    a_only = avhubert_encoder_apply(params, cfg, audio=jnp.asarray(fbank))
    assert both.shape == v_only.shape == a_only.shape == (1, 4, D)
    # the audio stream genuinely participates in the fusion
    assert float(np.max(np.abs(np.asarray(both) - np.asarray(v_only)))) > 1e-6
    assert float(np.max(np.abs(np.asarray(both) - np.asarray(a_only)))) > 1e-6


def test_stacked_fbank_features():
    """1 s of 16 kHz audio -> 25 fps stacked 104-dim features (26 mels x
    4-frame stack), zero-padding the ragged tail group."""
    from whisper_flamingo_tpu.models.avhubert import stacked_fbank_features

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    feats = stacked_fbank_features(wav)
    assert feats.shape[1] == 104
    assert 24 <= feats.shape[0] <= 26  # ~25 fps
    assert np.isfinite(feats).all()
