"""Audio-visual path: visual frontend, video encoder, AV fusion, AV decode,
and conditioned (xt) decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.decoding import DecodingOptions, decode
from whisper_flamingo_tpu.models.avhubert import (
    VIDEO_ENCODER_CONFIGS,
    AVWhisper,
    init_video_encoder,
    video_encoder_apply,
)
from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.visual import (
    init_visual_frontend,
    load_visual_frontend_torch,
    visual_frontend_apply,
)
from whisper_flamingo_tpu.models.whisper import ModelExtras, Whisper, init_params

VCFG = VIDEO_ENCODER_CONFIGS["debug"]


def test_visual_frontend_shapes():
    params = init_visual_frontend(jax.random.PRNGKey(0))
    frames = np.random.default_rng(0).standard_normal((2, 6, 88, 88)).astype(np.float32)
    out = visual_frontend_apply(params, jnp.asarray(frames))
    assert out.shape == (2, 6, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_visual_frontend_torch_parity():
    """Our functional frontend must match the reference torch ResEncoder."""
    torch = pytest.importorskip("torch")
    from conftest import import_reference_whisper

    whisper = import_reference_whisper()
    torch.manual_seed(0)
    ref = whisper.resnet.ResEncoder(relu_type="prelu", weights=None)
    ref.eval()
    # randomize BN running stats so inference-mode parity is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    state = {}
    state.update({f"frontend3D.{k}": v for k, v in ref.frontend3D.state_dict().items()})
    state.update(ref.trunk.state_dict())
    params = load_visual_frontend_torch(state)

    frames = np.random.default_rng(1).standard_normal((1, 4, 48, 48)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(frames[:, None]))  # (B, 512, T)
    expected = expected.permute(0, 2, 1).numpy()
    ours = np.asarray(visual_frontend_apply(params, jnp.asarray(frames)))
    np.testing.assert_allclose(ours, expected, atol=2e-3, rtol=1e-2)


def test_video_encoder_shapes():
    params = init_video_encoder(jax.random.PRNGKey(0), VCFG)
    frames = np.random.default_rng(0).standard_normal((2, 5, 48, 48)).astype(np.float32)
    out = video_encoder_apply(params, VCFG, jnp.asarray(frames))
    assert out.shape == (2, 5, VCFG.embed_dim)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def av_model():
    dims = MODEL_DIMS["debug"]
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=VCFG.embed_dim)
    whisper = Whisper(
        dims=dims, params=init_params(jax.random.PRNGKey(0), dims, extras),
        extras=extras,
    )
    return AVWhisper(
        whisper=whisper,
        video_params=init_video_encoder(jax.random.PRNGKey(1), VCFG),
        video_cfg=VCFG,
    )


def test_av_encode_modality_masks(av_model):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    video = rng.standard_normal((1, 8, 48, 48)).astype(np.float32)

    a_full, v_full = av_model.encode(mel, video)
    assert v_full.shape == (1, 8, VCFG.embed_dim)
    a_only, v_only = av_model.encode(mel, video, test_a=True)
    assert float(jnp.abs(v_only).max()) == 0.0  # video dropped
    np.testing.assert_allclose(np.asarray(a_only), np.asarray(a_full), atol=1e-6)
    a_v, v_v = av_model.encode(mel, video, test_v=True)
    assert float(jnp.abs(a_v).max()) == 0.0  # audio dropped
    assert float(jnp.abs(v_v).max()) > 0.0


def test_av_decode_runs(av_model):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    video = rng.standard_normal((1, 8, 48, 48)).astype(np.float32)
    res = av_model.decode(
        mel,
        DecodingOptions(language="en", fp16=False, sample_len=6, without_timestamps=True),
        video=video,
    )
    assert len(res) == 1 and isinstance(res[0].text, str)


def test_xt_decode_changes_output_when_gates_open(av_model):
    """Conditioning must be inert at gate=0 and active once gates open
    (the zero-init Flamingo property end to end)."""
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    xt = rng.standard_normal((1, 1, 7, VCFG.embed_dim)).astype(np.float32)
    opts = DecodingOptions(language="en", fp16=False, sample_len=6, without_timestamps=True)

    base = decode(av_model.whisper, mel, opts)
    cond = decode(av_model.whisper, mel, opts, xt=xt)
    assert cond[0].tokens == base[0].tokens  # gates are tanh(0) = 0

    import jax

    opened = jax.tree.map(lambda x: x, av_model.whisper.params)
    g = opened["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.full_like(g["langs"]["attn_gate"], 2.0)
    g["ff_gate"] = jnp.full_like(g["ff_gate"], 2.0)
    opened_model = Whisper(
        dims=av_model.whisper.dims, params=opened, extras=av_model.whisper.extras
    )
    cond_open = decode(opened_model, mel, opts, xt=xt)
    base_open = decode(opened_model, mel, opts)
    assert cond_open[0].tokens != base_open[0].tokens


def test_av_decode_test_v_matches_training_drop(av_model):
    """decode(test_v=True) must condition on zeroed encoder *features* —
    the same conditioning the training step's modality dropout produces
    (training/steps.py zeroes features) — not a zeroed mel, which still
    yields nonzero features through conv biases + posemb + LN."""
    from whisper_flamingo_tpu.models.whisper import encoder_apply

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    video = rng.standard_normal((1, 8, 48, 48)).astype(np.float32)
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=6, without_timestamps=True
    )
    d = av_model.dims

    # a zeroed mel does NOT produce zero features: the two definitions
    # really differ (this is the skew the fix removes)
    zero_mel_feats = encoder_apply(
        av_model.whisper.params, d, jnp.zeros((1, 80, 3000), jnp.float32)
    )
    assert float(jnp.abs(zero_mel_feats).max()) > 0.0

    got = av_model.decode(mel, opts, video=video, test_v=True)

    vf = video_encoder_apply(
        av_model.video_params, av_model.video_cfg, jnp.asarray(video),
        dtype=av_model.whisper.dtype,
    )
    zero_feats = jnp.zeros((1, d.n_audio_ctx, d.n_audio_state), jnp.float32)
    expected = decode(av_model.whisper, zero_feats, opts, xt=vf[None])
    assert got[0].tokens == expected[0].tokens

    # and the training-side definition agrees: encode(test_v=True) hands
    # the decoder exactly these zero features
    a_v, _ = av_model.encode(mel, video, test_v=True)
    np.testing.assert_array_equal(np.asarray(a_v), np.asarray(zero_feats))


def test_avsr_decode_with_audio_trunk():
    """The avsr contract end to end: AVWhisper with an audio+video
    AV-HuBERT trunk conditions the decode on the fused stream; test_a
    keeps audio-only AV-HuBERT conditioning (reference README.md:130-154
    --modalities asr/vsr/avsr protocol)."""
    from whisper_flamingo_tpu.models.avhubert import stacked_fbank_features

    vcfg = VIDEO_ENCODER_CONFIGS["debug-av"]
    dims = MODEL_DIMS["debug"]
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=vcfg.embed_dim)
    whisper = Whisper(
        dims=dims, params=init_params(jax.random.PRNGKey(0), dims, extras),
        extras=extras,
    )
    av = AVWhisper(
        whisper=whisper,
        video_params=init_video_encoder(jax.random.PRNGKey(1), vcfg),
        video_cfg=vcfg,
    )

    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    video = rng.standard_normal((1, 8, 48, 48)).astype(np.float32)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    fbank = stacked_fbank_features(wav)[None, :8, : vcfg.audio_feat_dim]
    # debug-av uses a tiny audio_feat_dim; slice the fbank accordingly
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=5, without_timestamps=True
    )

    res_av = av.decode(mel, opts, video=video, audio=fbank)
    assert len(res_av) == 1 and isinstance(res_av[0].text, str)

    # audio-only AV-HuBERT conditioning (asr-input mode): select by
    # omitting the video input
    res_a = av.decode(mel, opts, audio=fbank)
    assert len(res_a) == 1 and isinstance(res_a[0].text, str)

    # test_a zeroes the conditioning stream but keeps it present —
    # identical to training's drop_video definition
    _, cond_dropped = av.encode(mel, video, fbank, test_a=True)
    assert cond_dropped is not None
    assert float(jnp.abs(cond_dropped).max()) == 0.0

    # both-modality conditioning differs from video-only
    _, cond_both = av.encode(mel, video, fbank)
    _, cond_v = av.encode(mel, video)
    assert float(np.max(np.abs(np.asarray(cond_both) - np.asarray(cond_v)))) > 1e-6


def test_av_train_step_with_fbank():
    """make_av_train_step consumes the avsr fbank stream when present."""
    import jax.numpy as jnp2

    from whisper_flamingo_tpu.training.optim import whisper_optimizer
    from whisper_flamingo_tpu.training.steps import TrainState, make_av_train_step

    vcfg = VIDEO_ENCODER_CONFIGS["debug-av"]
    dims = MODEL_DIMS["debug"]
    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=vcfg.embed_dim)
    params = init_params(jax.random.PRNGKey(0), dims, extras)
    vparams = init_video_encoder(jax.random.PRNGKey(1), vcfg)
    tx, _ = whisper_optimizer(params, 1e-4, total_steps=4)
    step = make_av_train_step(
        dims, vcfg, tx, dtype=jnp2.float32, remat=False
    )
    rng = np.random.default_rng(5)
    batch = {
        "input_ids": rng.standard_normal((2, 80, 100)).astype(np.float32),
        "dec_input_ids": rng.integers(0, 100, (2, 8)).astype(np.int32),
        "labels": rng.integers(0, 100, (2, 8)).astype(np.int32),
        "video": rng.standard_normal((2, 6, 48, 48)).astype(np.float32),
        "fbank": rng.standard_normal((2, 6, vcfg.audio_feat_dim)).astype(np.float32),
    }
    state = TrainState.create(params, tx)
    state, metrics = step(state, vparams, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_mixed_modality_rows_mask_stream_features():
    """Mixed-modality batches: a row missing a stream must contribute
    ZERO features for that stream pre-fusion (AV-HuBERT's own modality
    dropout point), and a row with no modality at all must produce zero
    conditioning — the zero-padded frontend input alone yields
    conv-bias/LN junk, which would otherwise bias gated x-attn."""
    from whisper_flamingo_tpu.models.avhubert import (
        avhubert_encoder_apply,
        init_video_encoder,
    )
    from whisper_flamingo_tpu.training.steps import _apply_av_encoder

    vcfg = VIDEO_ENCODER_CONFIGS["debug-av"]
    vparams = init_video_encoder(jax.random.PRNGKey(1), vcfg)
    # real checkpoints have nonzero BN shifts; the init's are zero, which
    # would make the frontend's all-zero-input output accidentally zero
    # and hide the junk this test pins
    vparams["frontend"]["bn3d"]["bias"] = (
        vparams["frontend"]["bn3d"]["bias"] + 0.5
    )
    rng = np.random.default_rng(7)
    # row 0: both streams; row 1: fbank only (video zero-padded);
    # row 2: no modality at all (both zero-padded)
    video = rng.standard_normal((3, 6, 48, 48)).astype(np.float32)
    fbank = rng.standard_normal((3, 6, vcfg.audio_feat_dim)).astype(np.float32)
    video[1:] = 0.0
    fbank[2] = 0.0
    batch = {
        "video": jnp.asarray(video),
        "fbank": jnp.asarray(fbank),
        "video_lens": jnp.asarray([6, 0, 0], np.int32),
        "fbank_lens": jnp.asarray([6, 6, 0], np.int32),
    }
    out = _apply_av_encoder(
        avhubert_encoder_apply, vparams, vcfg, batch, jnp.float32
    )
    # no-modality row: conditioning exactly zero
    assert float(jnp.abs(out[2]).max()) == 0.0
    # fbank-only row: identical to an audio-only encode of that row
    # (the masked video stream contributes true zeros, not frontend junk)
    a_only = avhubert_encoder_apply(
        vparams, vcfg, audio=jnp.asarray(fbank[1:2])
    )
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(a_only[0]), atol=1e-5
    )
    # ...and WITHOUT the masks the same row is junk, not the audio-only
    # encode (regression: this was the pre-fix behavior)
    unmasked = avhubert_encoder_apply(
        vparams, vcfg, video=batch["video"], audio=batch["fbank"]
    )
    assert float(np.abs(np.asarray(unmasked[1]) - np.asarray(a_only[0])).max()) > 1e-3


def test_asr_decode_test_a_threads_zero_stream(av_model):
    """`--modalities asr` (test_a with NO video/fbank loaded) must decode
    with a present-but-ZERO conditioning stream — the distribution
    training's drop_video produces — not with the stream absent
    (reference decoding.py:648-672 threads x_v there too). With opened
    gates the two differ through the gated blocks' bias terms; and a
    length-1 zero stream must equal a zeroed full-length stream (gated
    x-attn over identical frames is frame-count independent)."""
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=6, without_timestamps=True
    )

    import jax as _jax

    opened = _jax.tree.map(lambda x: x, av_model.whisper.params)
    g = opened["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.full_like(g["langs"]["attn_gate"], 2.0)
    g["ff_gate"] = jnp.full_like(g["ff_gate"], 2.0)
    opened_model = Whisper(
        dims=av_model.whisper.dims, params=opened, extras=av_model.whisper.extras
    )
    from whisper_flamingo_tpu.models.avhubert import AVWhisper

    av_open = AVWhisper(
        whisper=opened_model,
        video_params=av_model.video_params,
        video_cfg=av_model.video_cfg,
    )

    got = av_open.decode(mel, opts, test_a=True)  # asr protocol: no video
    zero_full = jnp.zeros((1, 9, VCFG.embed_dim), jnp.float32)
    expected = decode(opened_model, mel, opts, xt=zero_full[None])
    assert got[0].tokens == expected[0].tokens

    # the absent-stream decode is a DIFFERENT distribution once gates
    # open (the gated blocks' bias terms) — the skew this fix removes.
    # The shift is small at random init, so compare logprobs, not tokens.
    absent = decode(opened_model, mel, opts)
    assert abs(absent[0].avg_logprob - got[0].avg_logprob) > 1e-4
