"""Legacy variant components: sequential fusion, ResNet1D, reprogramming,
AdaKWS keyword spotting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.legacy import (
    adakws_apply,
    init_adakws,
    init_reprogramming,
    init_resnet1d,
    reprogramming_apply,
    resnet1d_apply,
)
from whisper_flamingo_tpu.models.whisper import ModelExtras, decoder_apply, init_params

DIMS = MODEL_DIMS["debug"]


def test_sequential_vs_parallel_fusion_differ():
    extras = ModelExtras(add_gated_x_attn=1, num_langs=2, bert_dim=64)
    params = init_params(jax.random.PRNGKey(0), DIMS, extras)
    # open the gates so fusion order matters
    g = params["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.full_like(g["langs"]["attn_gate"], 1.0)
    g["ff_gate"] = jnp.full_like(g["ff_gate"], 1.0)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 1500, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (1, 6)).astype(np.int32)
    xt = rng.standard_normal((2, 1, 5, 64)).astype(np.float32)

    par, _ = decoder_apply(params, DIMS, tokens, feats, xt=xt)
    seq, _ = decoder_apply(params, DIMS, tokens, feats, xt=xt, sequential_xt=True)
    assert not np.allclose(np.asarray(par), np.asarray(seq), atol=1e-4)

    # with a single stream the two orders coincide
    par1, _ = decoder_apply(params, DIMS, tokens, feats, xt=xt[:1])
    seq1, _ = decoder_apply(params, DIMS, tokens, feats, xt=xt[:1], sequential_xt=True)
    np.testing.assert_allclose(np.asarray(par1), np.asarray(seq1), atol=1e-5)


def test_resnet1d_torch_parity():
    torch = pytest.importorskip("torch")
    from conftest import import_reference_whisper

    import_reference_whisper()
    import importlib

    # model_all imports torch BertModel at module top; the torch modeling
    # path is broken in this image (Flax path works), so short-circuit the
    # lazy attributes — the ResNet1D under test doesn't use BERT.
    import transformers

    for attr in ("BertModel", "BertTokenizer"):
        setattr(transformers, attr, object)
    model_all = importlib.import_module("whisper.model_all")
    torch.manual_seed(0)
    ref = model_all.ResNet1D(input_dim=32, hidden_dim=48, num_layers=2)
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    params = init_resnet1d(jax.random.PRNGKey(0), 32, 48, 2)
    state = ref.state_dict()
    for i in range(2):
        blk = params["layers"][i]
        blk["conv1"]["w"] = jnp.asarray(
            state[f"layers.{i}.0.weight"].numpy().transpose(2, 1, 0))
        blk["conv1"]["b"] = jnp.asarray(state[f"layers.{i}.0.bias"].numpy())
        blk["bn1"] = {
            "scale": jnp.asarray(state[f"layers.{i}.1.weight"].numpy()),
            "bias": jnp.asarray(state[f"layers.{i}.1.bias"].numpy()),
            "mean": jnp.asarray(state[f"layers.{i}.1.running_mean"].numpy()),
            "var": jnp.asarray(state[f"layers.{i}.1.running_var"].numpy()),
        }
        blk["conv2"]["w"] = jnp.asarray(
            state[f"layers.{i}.3.weight"].numpy().transpose(2, 1, 0))
        blk["conv2"]["b"] = jnp.asarray(state[f"layers.{i}.3.bias"].numpy())
        blk["bn2"] = {
            "scale": jnp.asarray(state[f"layers.{i}.4.weight"].numpy()),
            "bias": jnp.asarray(state[f"layers.{i}.4.bias"].numpy()),
            "mean": jnp.asarray(state[f"layers.{i}.4.running_mean"].numpy()),
            "var": jnp.asarray(state[f"layers.{i}.4.running_var"].numpy()),
        }

    x = np.random.default_rng(1).standard_normal((2, 7, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(resnet1d_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-3)


def test_reprogramming_shapes():
    params = init_reprogramming(jax.random.PRNGKey(0), d_model=32, n_heads=4, d_llm=48)
    rng = np.random.default_rng(0)
    target = rng.standard_normal((2, 5, 32)).astype(np.float32)
    # _m1: shared source
    src = rng.standard_normal((11, 48)).astype(np.float32)
    out1 = reprogramming_apply(params, jnp.asarray(target), jnp.asarray(src),
                               jnp.asarray(src), n_heads=4)
    assert out1.shape == (2, 5, 48)
    # _m2: batched source
    src_b = rng.standard_normal((2, 11, 48)).astype(np.float32)
    out2 = reprogramming_apply(params, jnp.asarray(target), jnp.asarray(src_b),
                               jnp.asarray(src_b), n_heads=4)
    assert out2.shape == (2, 5, 48)


def test_adakws_keyword_spotting():
    params = init_adakws(jax.random.PRNGKey(0), vocab_size=64, d_model=32,
                         embed_dim=16, hidden_dim=24, dim_ff=48)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 10, 32)).astype(np.float32)
    keywords = rng.integers(0, 64, (2, 3, 6)).astype(np.int32)
    logits = adakws_apply(params, jnp.asarray(audio), jnp.asarray(keywords))
    assert logits.shape == (2, 3, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_sequential_fusion_cache_consistency():
    """Cached incremental decode must equal the full forward under the
    sequential fusion order too."""
    import jax.numpy as jnp

    from whisper_flamingo_tpu.models.whisper import init_cache

    extras = ModelExtras(
        add_gated_x_attn=1, num_langs=2, bert_dim=64, sequential_gated_x_attn=True
    )
    params = init_params(jax.random.PRNGKey(0), DIMS, extras)
    g = params["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.full_like(g["langs"]["attn_gate"], 1.0)
    g["ff_gate"] = jnp.full_like(g["ff_gate"], 1.0)

    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((1, 1500, 64)).astype(np.float32))
    tokens = rng.integers(0, 1000, (1, 6)).astype(np.int32)
    xt = jnp.asarray(rng.standard_normal((2, 1, 5, 64)).astype(np.float32))

    full, _ = decoder_apply(params, DIMS, tokens, feats, xt=xt, sequential_xt=True)

    cache = init_cache(params, DIMS, feats, xt=xt, max_len=8)
    pre, cache = decoder_apply(
        params, DIMS, tokens[:, :3], cache=cache, offset=0, sequential_xt=True
    )
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(full[:, :3]), atol=2e-4, rtol=1e-3
    )
    for i in range(3, 6):
        step, cache = decoder_apply(
            params, DIMS, tokens[:, i : i + 1], cache=cache, offset=i,
            sequential_xt=True,
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, i]), atol=3e-4, rtol=1e-3
        )


def test_sequential_fusion_through_compiled_decode():
    """The COMPILED decode program must honor sequential_gated_x_attn on
    every incremental step, not only at prefill: greedy tokens from
    DecodingTask must equal an explicit teacher-forced argmax loop run
    with decoder_apply(..., sequential_xt=True). (Regression: the loop
    bodies once dropped the flag, silently decoding parallel-fusion.)"""
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.whisper import Whisper
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    extras = ModelExtras(
        add_gated_x_attn=1, num_langs=2, bert_dim=64, sequential_gated_x_attn=True
    )
    params = init_params(jax.random.PRNGKey(1), DIMS, extras)
    g = params["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.full_like(g["langs"]["attn_gate"], 1.0)
    g["ff_gate"] = jnp.full_like(g["ff_gate"], 1.0)
    model = Whisper(dims=DIMS, params=params, extras=extras)

    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((1, 1500, 64)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal((2, 1, 5, 64)).astype(np.float32))

    sample_len = 6
    task = DecodingTask(
        model,
        DecodingOptions(
            language="en", without_timestamps=True, fp16=False,
            sample_len=sample_len, suppress_blank=False, suppress_tokens=None,
        ),
    )
    got = task.run(feats, xt=xt)[0].tokens

    # explicit greedy: teacher-force the argmax continuation step by step
    tok = get_tokenizer(True, language="en", task="transcribe")
    seq = list(task.initial_tokens)
    for _ in range(sample_len):
        logits, _ = decoder_apply(
            params, DIMS, jnp.asarray([seq], jnp.int32), feats, xt=xt,
            sequential_xt=True,
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == tok.eot:
            break
        seq.append(nxt)
    expected = seq[len(task.initial_tokens):]
    assert got == expected
