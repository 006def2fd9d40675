"""Independent torch oracle for the AV-HuBERT video encoder (VERDICT r3 #1).

The reference consumed AV-HuBERT through an external fairseq checkout
(`/root/reference/README.md:47-59,130-154`; contract at
`/root/reference/whisper/model_all.py:303-331`), so no in-tree reference
exists for the transformer numerics. This file reimplements the fairseq
semantics minimally in torch — av_hubert's ``AVHubertModel.extract_finetune``
(SubModel feature extractors, concat fuse -> LayerNorm(2D) ->
post_extract_proj) plus fairseq wav2vec2's ``TransformerEncoder`` /
``TransformerSentenceEncoderLayer`` (weight-normed SamePad pos_conv with
even-kernel crop, exact GELU, pre-LN and post-LN layer layouts) — loads the
SAME synthetic fairseq state dict into both it and
``models/avhubert.load_avhubert_torch``, and requires agreement. The visual
frontend oracle is the reference's own torch ``ResEncoder``
(`/root/reference/whisper/resnet.py:131-173`).

This is the independent numeric oracle; the self-generated golden vectors in
tests/test_golden_import.py remain as a cross-session regression pin only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from whisper_flamingo_tpu.models.avhubert import (  # noqa: E402
    VideoEncoderConfig,
    avhubert_encoder_apply,
    load_avhubert_torch,
)

# small configs covering both real layer layouts; conv_pos=8 (even) keeps
# the SamePad crop live, groups=2 keeps the conv grouped like the real 16
PRE_LN = VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2, ffn_dim=128,
                            conv_pos=8, conv_pos_groups=2)
POST_LN = VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2, ffn_dim=128,
                             conv_pos=8, conv_pos_groups=2,
                             layer_norm_first=False)
PRE_LN_AVSR = VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2,
                                 ffn_dim=128, conv_pos=8, conv_pos_groups=2,
                                 audio_feat_dim=12)
POST_LN_AVSR = VideoEncoderConfig(embed_dim=64, n_layers=2, n_heads=2,
                                  ffn_dim=128, conv_pos=8, conv_pos_groups=2,
                                  layer_norm_first=False, audio_feat_dim=12)


def _synthetic_fairseq_state(cfg: VideoEncoderConfig, seed: int,
                             with_frontend: bool = False):
    """A fairseq-shaped state dict with the REAL checkpoint key layout:
    weight-normed pos_conv (weight_g/weight_v, not a plain weight) and
    feature_extractor_video.resnet.{frontend3D.*, trunk.*} frontend keys."""
    rng = np.random.default_rng(seed)
    D, L, FF = cfg.embed_dim, cfg.n_layers, cfg.ffn_dim

    def w(*shape, scale=None):
        scale = scale or 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ln_w(d):
        return (1.0 + 0.1 * rng.standard_normal(d)).astype(np.float32)

    def b(d, scale=0.05):
        return (rng.standard_normal(d) * scale).astype(np.float32)

    state = {}
    for i in range(L):
        p = f"encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{p}.self_attn.{name}.weight"] = w(D, D)
            state[f"{p}.self_attn.{name}.bias"] = b(D)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            state[f"{p}.{ln}.weight"] = ln_w(D)
            state[f"{p}.{ln}.bias"] = b(D)
        state[f"{p}.fc1.weight"] = w(FF, D)
        state[f"{p}.fc1.bias"] = b(FF)
        state[f"{p}.fc2.weight"] = w(D, FF)
        state[f"{p}.fc2.bias"] = b(D)
    # weight-normed grouped conv, fairseq dim=2: g is (1, 1, K)
    state["encoder.pos_conv.0.weight_v"] = w(
        D, D // cfg.conv_pos_groups, cfg.conv_pos, scale=0.1
    )
    state["encoder.pos_conv.0.weight_g"] = (
        0.5 + rng.random((1, 1, cfg.conv_pos))
    ).astype(np.float32)
    state["encoder.pos_conv.0.bias"] = b(D)
    state["encoder.layer_norm.weight"] = ln_w(D)
    state["encoder.layer_norm.bias"] = b(D)
    state["feature_extractor_video.proj.weight"] = w(D, 512)
    state["feature_extractor_video.proj.bias"] = b(D)
    if cfg.audio_feat_dim is not None:
        A = cfg.audio_feat_dim
        state["feature_extractor_audio.proj.weight"] = w(D, A)
        state["feature_extractor_audio.proj.bias"] = b(D)
        state["layer_norm.weight"] = ln_w(2 * D)
        state["layer_norm.bias"] = b(2 * D)
        state["post_extract_proj.weight"] = w(D, 2 * D)
        state["post_extract_proj.bias"] = b(D)
    frontend = None
    if with_frontend:
        from conftest import import_reference_whisper

        whisper = import_reference_whisper()
        torch.manual_seed(seed)
        frontend = whisper.resnet.ResEncoder(relu_type="prelu", weights=None)
        frontend.eval()
        with torch.no_grad():
            for m in frontend.modules():
                if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        for k, v in frontend.state_dict().items():
            state[f"feature_extractor_video.resnet.{k}"] = (
                v.numpy().astype(np.float32)
            )
    return state, frontend


def _oracle_forward(state, cfg: VideoEncoderConfig, video=None, audio=None,
                    frontend=None):
    """fairseq-semantics forward in torch, straight from the fairseq
    sources' structure (av_hubert hubert.py extract_finetune + wav2vec2
    TransformerEncoder.extract_features + TransformerSentenceEncoderLayer),
    reading the raw state dict — no shared code with models/avhubert.py."""
    W = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in state.items()}
    D, H = cfg.embed_dim, cfg.n_heads
    dh = D // H

    def lin(p, y):
        return F.linear(y, W[f"{p}.weight"], W[f"{p}.bias"])

    with torch.no_grad():
        # -- SubModel feature extractors (hubert.py): resnet -> proj over
        # the transposed time-major features; audio SubModel has no resnet
        vfeat = None
        if video is not None:
            assert frontend is not None
            res = frontend(torch.from_numpy(video)[:, None])  # (B, 512, T)
            vfeat = lin("feature_extractor_video.proj", res.permute(0, 2, 1))
        if cfg.audio_feat_dim is None:
            x = vfeat
        else:
            afeat = None
            if audio is not None:
                afeat = lin("feature_extractor_audio.proj",
                            torch.from_numpy(audio))
            if vfeat is None:
                vfeat = torch.zeros_like(afeat)
            if afeat is None:
                afeat = torch.zeros_like(vfeat)
            # modality_fuse == 'concat': cat([audio, video]) on the feature
            # axis, then the TOP-LEVEL layer_norm over 2D, then
            # post_extract_proj (2D -> D)
            x = torch.cat([afeat, vfeat], dim=-1)
            x = F.layer_norm(x, (2 * D,), W["layer_norm.weight"],
                             W["layer_norm.bias"])
            x = lin("post_extract_proj", x)

        # -- TransformerEncoder.extract_features: weight-normed grouped
        # pos_conv -> SamePad (crop one for even kernels) -> exact GELU,
        # residual add; post-LN models LN before the layers
        wv = W["encoder.pos_conv.0.weight_v"]
        wg = W["encoder.pos_conv.0.weight_g"]
        conv_w = torch._weight_norm(wv, wg, 2)
        pc = F.conv1d(x.transpose(1, 2), conv_w, W["encoder.pos_conv.0.bias"],
                      padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
        if cfg.conv_pos % 2 == 0:
            pc = pc[:, :, :-1]
        x = x + F.gelu(pc.transpose(1, 2))
        if not cfg.layer_norm_first:
            x = F.layer_norm(x, (D,), W["encoder.layer_norm.weight"],
                             W["encoder.layer_norm.bias"])

        # -- TransformerSentenceEncoderLayer stack
        for i in range(cfg.n_layers):
            p = f"encoder.layers.{i}"

            def attn(y, p=p):
                B, T, _ = y.shape
                q = lin(f"{p}.self_attn.q_proj", y) * dh ** -0.5
                k = lin(f"{p}.self_attn.k_proj", y)
                v = lin(f"{p}.self_attn.v_proj", y)

                def split(z):
                    return z.view(B, T, H, dh).transpose(1, 2)

                a = torch.softmax(
                    split(q) @ split(k).transpose(-1, -2), dim=-1
                ) @ split(v)
                return lin(f"{p}.self_attn.out_proj",
                           a.transpose(1, 2).reshape(B, T, D))

            def lnf(name, y, p=p):
                return F.layer_norm(y, (D,), W[f"{p}.{name}.weight"],
                                    W[f"{p}.{name}.bias"])

            def mlp(y, p=p):
                return lin(f"{p}.fc2", F.gelu(lin(f"{p}.fc1", y)))

            if cfg.layer_norm_first:
                x = x + attn(lnf("self_attn_layer_norm", x))
                x = x + mlp(lnf("final_layer_norm", x))
            else:
                x = lnf("self_attn_layer_norm", x + attn(x))
                x = lnf("final_layer_norm", x + mlp(x))

        if cfg.layer_norm_first:
            x = F.layer_norm(x, (D,), W["encoder.layer_norm.weight"],
                             W["encoder.layer_norm.bias"])
    return x.numpy()


@pytest.mark.parametrize("cfg,seed", [(PRE_LN_AVSR, 0), (POST_LN_AVSR, 1)])
def test_transformer_oracle_parity_audio_trunk(cfg, seed):
    """Strict (1e-4) parity on the fuse + pos_conv + transformer stack,
    driven through the avsr audio trunk (a pure linear frontend, so the
    comparison isolates the transformer semantics): pre-LN AND post-LN."""
    state, _ = _synthetic_fairseq_state(cfg, seed)
    params = load_avhubert_torch(state, cfg)
    rng = np.random.default_rng(seed + 10)
    audio = rng.standard_normal((2, 9, cfg.audio_feat_dim)).astype(np.float32)
    want = _oracle_forward(state, cfg, audio=audio)
    got = np.asarray(avhubert_encoder_apply(params, cfg, audio=jnp.asarray(audio)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg,seed", [(PRE_LN, 2), (POST_LN, 3)])
def test_video_path_oracle_parity(cfg, seed):
    """Full video path — reference torch ResEncoder frontend + proj +
    pos_conv + transformer — against the oracle, both layer layouts.
    Tolerance reflects the conv/BN frontend (same as the frontend parity
    test in test_av.py); the transformer-only tests above pin 1e-4."""
    state, frontend = _synthetic_fairseq_state(cfg, seed, with_frontend=True)
    params = load_avhubert_torch(state, cfg)
    rng = np.random.default_rng(seed + 20)
    video = rng.standard_normal((1, 5, 48, 48)).astype(np.float32)
    want = _oracle_forward(state, cfg, video=video, frontend=frontend)
    got = np.asarray(avhubert_encoder_apply(params, cfg, video=jnp.asarray(video)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


def test_avsr_both_streams_oracle_parity():
    """avsr with BOTH streams live: video through the ResNet frontend plus
    stacked-fbank audio, concat fuse -> LN(2D) -> Linear, pre-LN stack."""
    cfg = PRE_LN_AVSR
    state, frontend = _synthetic_fairseq_state(cfg, 4, with_frontend=True)
    params = load_avhubert_torch(state, cfg)
    rng = np.random.default_rng(30)
    video = rng.standard_normal((1, 5, 48, 48)).astype(np.float32)
    audio = rng.standard_normal((1, 5, cfg.audio_feat_dim)).astype(np.float32)
    want = _oracle_forward(state, cfg, video=video, audio=audio,
                           frontend=frontend)
    got = np.asarray(avhubert_encoder_apply(
        params, cfg, video=jnp.asarray(video), audio=jnp.asarray(audio)
    ))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)
    # and the one-missing-modality zero-fill rule agrees too
    want_a = _oracle_forward(state, cfg, audio=audio)
    got_a = np.asarray(avhubert_encoder_apply(params, cfg, audio=jnp.asarray(audio)))
    np.testing.assert_allclose(got_a, want_a, atol=1e-4, rtol=1e-4)


def test_weight_norm_pos_conv_reconstruction():
    """The loader recomposes fairseq's weight-normed pos_conv exactly as
    torch does (w = v * g / ||v||, norms over all dims except dim 2)."""
    cfg = PRE_LN
    state, _ = _synthetic_fairseq_state(cfg, 5)
    params = load_avhubert_torch(state, cfg)
    want = torch._weight_norm(
        torch.from_numpy(state["encoder.pos_conv.0.weight_v"]),
        torch.from_numpy(state["encoder.pos_conv.0.weight_g"]), 2
    ).numpy()
    got = np.asarray(params["pos_conv"]["w"]).transpose(2, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_real_ckpt_resnet_key_layout():
    """Real checkpoints key the trunk as
    feature_extractor_video.resnet.trunk.layer* — the loader must strip
    the trunk prefix for the frontend importer (it used to KeyError)."""
    cfg = PRE_LN
    state, frontend = _synthetic_fairseq_state(cfg, 6, with_frontend=True)
    assert any(k.startswith("feature_extractor_video.resnet.trunk.layer1")
               for k in state)
    params = load_avhubert_torch(state, cfg)
    # frontend weights actually landed (not random init): conv3d matches
    np.testing.assert_allclose(
        np.asarray(params["frontend"]["conv3d"]["w"]),
        state["feature_extractor_video.resnet.frontend3D.0.weight"]
        .transpose(2, 3, 4, 1, 0),
    )
