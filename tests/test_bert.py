"""Text conditioner: offline random-init Flax BERT + precomputed store."""

import numpy as np
import pytest

from whisper_flamingo_tpu.models.bert import (
    HFBertConditioner,
    PrecomputedConditioner,
)


@pytest.fixture(scope="module")
def conditioner():
    return HFBertConditioner(pretrained=False, max_length=64, pad_multiple=8)


def test_bert_conditioner_shapes(conditioner):
    out = conditioner.encode(["hello world", "a longer sentence for testing"])
    assert out.ndim == 3 and out.shape[0] == 2
    assert out.shape[2] == conditioner.dim
    assert out.shape[1] % 8 == 0  # shape-bucketed padding
    assert np.isfinite(out).all()


def test_bert_conditioner_multi(conditioner):
    multi = conditioner.encode_multi([
        ["bonjour", "monde entier"],
        ["hallo", "ganze welt hier"],
    ])
    assert multi.shape[0] == 2 and multi.shape[1] == 2
    assert multi.shape[3] == conditioner.dim


def test_bert_deterministic(conditioner):
    a = conditioner.encode(["same text"])
    b = conditioner.encode(["same text"])
    np.testing.assert_allclose(a, b)


def test_precomputed_conditioner():
    rng = np.random.default_rng(0)
    texts = ["foo bar", "baz"]
    store = {
        PrecomputedConditioner.key(t): rng.standard_normal((5 + i, 16)).astype(np.float32)
        for i, t in enumerate(texts)
    }
    cond = PrecomputedConditioner(store, dim=16)
    out = cond.encode(texts)
    assert out.shape == (2, 6, 16)
    np.testing.assert_allclose(out[0, :5], store[PrecomputedConditioner.key(texts[0])])
    assert (out[0, 5] == 0).all()  # padded
