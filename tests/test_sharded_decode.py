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
