"""Numerical parity of the JAX model against the reference torch model
(random weights, debug dims), exercising the checkpoint key mapping in both
directions."""

import numpy as np
import pytest

from conftest import import_reference_whisper

from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.whisper import (
    ModelExtras,
    decoder_apply,
    encoder_apply,
    init_cache,
)
from whisper_flamingo_tpu.training.checkpoints import (
    load_torch_state,
    to_torch_state_dict,
)

DIMS = MODEL_DIMS["debug"]


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(0)
    return torch


def _ref_model(torch, add_gated_x_attn=0, num_langs=0, bert_dim=96):
    whisper = import_reference_whisper()
    ref_dims = whisper.ModelDimensions(**DIMS.to_dict())
    model = whisper.model.Whisper(
        ref_dims,
        dropout_rate=0.0,
        add_adapter=False,
        adapter_dim=256,
        add_gated_x_attn=add_gated_x_attn,
        bert_dim=bert_dim,
        num_langs=num_langs,
    )
    model.eval()
    # randomize the (uninitialized) decoder positional embedding and gates
    with torch.no_grad():
        model.decoder.positional_embedding.normal_(0, 0.02)
        for name, p in model.named_parameters():
            if "gate" in name:
                p.normal_(0, 0.5)
            elif "ln" in name and name.endswith("weight"):
                p.normal_(1.0, 0.1)  # perturb LN scales so identity defaults
            elif "ln" in name and name.endswith("bias"):
                p.normal_(0.0, 0.05)  # can't mask key-mapping bugs
    return model


def _import_params(torch, model, **extra):
    extras = ModelExtras(**extra)
    return load_torch_state(model.state_dict(), DIMS, extras)


def test_encoder_parity(torch):
    model = _ref_model(torch)
    params = _import_params(torch, model)

    mel = np.random.default_rng(0).standard_normal((2, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        expected = model.encoder(torch.from_numpy(mel)).numpy()
    ours = np.asarray(encoder_apply(params, DIMS, mel))
    assert ours.shape == expected.shape == (2, 1500, 64)
    np.testing.assert_allclose(ours, expected, atol=2e-4, rtol=1e-3)


def test_decoder_parity(torch):
    model = _ref_model(torch)
    params = _import_params(torch, model)

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, DIMS.n_vocab, size=(2, 12)).astype(np.int64)

    with torch.no_grad():
        expected = model.decoder(
            torch.from_numpy(tokens), torch.from_numpy(feats)
        ).numpy()
    ours, _ = decoder_apply(params, DIMS, tokens, feats)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=3e-4, rtol=1e-3)


def test_decoder_gated_x_attn_parity(torch):
    model = _ref_model(torch, add_gated_x_attn=1, num_langs=2, bert_dim=96)
    params = _import_params(
        torch, model, add_gated_x_attn=1, num_langs=2, bert_dim=96
    )

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, DIMS.n_vocab, size=(2, 9)).astype(np.int64)
    xt = rng.standard_normal((2, 2, 7, 96)).astype(np.float32)  # (langs, B, S, bert)

    with torch.no_grad():
        expected = model.decoder(
            torch.from_numpy(tokens),
            torch.from_numpy(feats),
            xt_list=[torch.from_numpy(xt[0]), torch.from_numpy(xt[1])],
        ).numpy()
    ours, _ = decoder_apply(params, DIMS, tokens, feats, xt=xt)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=3e-4, rtol=1e-3)


def test_incremental_cache_matches_full(torch):
    """Prefill + stepwise decode must equal the teacher-forced forward."""
    model = _ref_model(torch)
    params = _import_params(torch, model)

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, DIMS.n_vocab, size=(2, 10)).astype(np.int64)

    full, _ = decoder_apply(params, DIMS, tokens, feats)

    cache = init_cache(params, DIMS, feats, max_len=16)
    pre, cache = decoder_apply(params, DIMS, tokens[:, :4], cache=cache, offset=0)
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(full[:, :4]), atol=2e-4, rtol=1e-3
    )
    for i in range(4, 10):
        step, cache = decoder_apply(
            params, DIMS, tokens[:, i : i + 1], cache=cache, offset=i
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, i]), atol=3e-4, rtol=1e-3
        )


def test_state_dict_round_trip(torch):
    model = _ref_model(torch, add_gated_x_attn=1, num_langs=2, bert_dim=96)
    params = _import_params(
        torch, model, add_gated_x_attn=1, num_langs=2, bert_dim=96
    )
    exported = to_torch_state_dict(params, DIMS)
    ref_state = {k: v.numpy() for k, v in model.state_dict().items()}
    for k, v in ref_state.items():
        if "positional_embedding" in k and k.startswith("encoder"):
            continue  # recomputed sinusoids
        if k.endswith("mask"):
            continue  # buffer
        assert k in exported, f"missing {k}"
        np.testing.assert_allclose(exported[k], v, atol=1e-6, err_msg=k)
