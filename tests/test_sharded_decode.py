"""Decoding under a data-parallel mesh: the compiled decode program must
run with batch-sharded inputs and replicated (or TP-sharded) params."""

import jax
import jax.numpy as jnp
import numpy as np

from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.whisper import Whisper, init_params
from whisper_flamingo_tpu.parallel.mesh import make_mesh, shard_params

DIMS = MODEL_DIMS["debug"]


def test_dp_tp_sharded_decode_matches_single_device():
    """Decode with tensor-parallel params (DP=4 x TP=2) is token-identical."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = init_params(jax.random.PRNGKey(0), DIMS)
    model = Whisper(dims=DIMS, params=params)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.3
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True
    )
    base = DecodingTask(model, opts).run(mel)

    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        sharded = Whisper(dims=DIMS, params=shard_params(params, mesh))
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
        got = DecodingTask(sharded, opts).run(mel_s)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens


def test_tp_decode_large_v2_proportions():
    """TP decode at large-v2-proportioned dims (VERDICT r1 #9).

    Real head count (20) and MLP width (5120) under TP=4, with the real
    odd 51865-token vocab — exercising the rules where divisibility
    actually bites: qkv splits 20 heads into 5/shard, fc1 splits 5120
    into 1280/shard, and the vocab axis (51865 % 4 != 0) must fall back
    to replication (`parallel/mesh.py:90-96`) without changing tokens.
    Layers and contexts are shrunk so the 1-CPU suite stays in budget;
    every per-layer tensor has the flagship's exact feature shapes
    (reference flagship eval: `/root/reference/README.md:96-101`).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_flamingo_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=96, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_head=20,
        n_text_state=1280, n_text_layer=2,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    model = Whisper(dims=dims, params=params)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 2 * dims.n_audio_ctx)).astype(np.float32) * 0.3
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=4, without_timestamps=True
    )
    base = DecodingTask(model, opts).run(mel)

    mesh = make_mesh(2, 4)
    with jax.set_mesh(mesh):
        sharded_params = shard_params(params, mesh)
        # The TP rules must have actually sharded the hot tensors: the
        # stacked qkv weights (n_layer, 1280, 1280) split their output
        # features, while the odd-vocab embedding falls back replicated.
        q_w = sharded_params["decoder"]["blocks"]["attn"]["q"]["w"]
        assert q_w.sharding.spec[-1] == "model", q_w.sharding.spec
        fc1_w = sharded_params["decoder"]["blocks"]["mlp"]["fc1"]["w"]
        assert fc1_w.sharding.spec[-1] == "model", fc1_w.sharding.spec
        emb = sharded_params["decoder"]["token_embedding"]
        assert all(a is None for a in emb.sharding.spec), emb.sharding.spec

        sharded = Whisper(dims=dims, params=sharded_params)
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
        got = DecodingTask(sharded, opts).run(mel_s)
    for b, g in zip(base, got):
        assert g.tokens == b.tokens
        assert abs(g.avg_logprob - b.avg_logprob) < 1e-3


def test_dp_sharded_decode_matches_single_device():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    model = Whisper(dims=DIMS, params=params)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((8, 80, 3000)).astype(np.float32) * 0.3
    opts = DecodingOptions(
        language="en", fp16=False, sample_len=8, without_timestamps=True
    )

    base = DecodingTask(model, opts).run(mel)

    mesh = make_mesh(8, 1)
    with jax.set_mesh(mesh):
        sharded = Whisper(dims=DIMS, params=shard_params(params, mesh))
        from jax.sharding import NamedSharding, PartitionSpec as P

        mel_sharded = jax.device_put(mel, NamedSharding(mesh, P("data")))
        got = DecodingTask(sharded, opts).run(mel_sharded)

    for b, g in zip(base, got):
        assert g.tokens == b.tokens
        assert abs(g.avg_logprob - b.avg_logprob) < 1e-3
