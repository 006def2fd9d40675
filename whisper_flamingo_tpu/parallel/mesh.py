"""Device mesh construction and GSPMD sharding rules.

TPU-native replacement for the reference's NCCL/Lightning DDP layer
(`/root/reference/whisper_ft_librispeech.py:362-378`, SURVEY.md §5.8):
a ``Mesh(('data', 'model'))`` where

- the ``data`` axis shards the batch (DP: gradient psum rides ICI, the
  collective XLA inserts for the mean over the sharded batch);
- the optional ``model`` axis tensor-parallel-shards the transformer:
  attention q/k/v projections and MLP fc1 split their *output* features
  (head-parallel), out-proj and fc2 split their *input* features (one
  all-reduce per block, the Megatron layout), and the tied token
  embedding splits the vocab so the fp32 logits matmul is sharded.

All rules are PartitionSpecs over the stacked-layer parameter pytree;
``pjit``/GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} mesh does not match {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _pspec_for(path_str: str, ndim: int) -> P:
    """TP sharding rule for one parameter leaf (stacked layer axis first
    where present)."""
    none = (None,) * (ndim - 1)

    # attention / gated-attention projections: qkv shard out, out-proj shard in
    if "/attn/q/" in path_str or "/attn/k/" in path_str or "/attn/v/" in path_str:
        if path_str.endswith("/w"):
            return P(*none[: ndim - 1], MODEL_AXIS)  # (..., in, out): shard out
        return P(*none[: ndim - 1], MODEL_AXIS)  # bias (..., out)
    if "/attn/out/" in path_str:
        if path_str.endswith("/w"):
            return P(*none[: ndim - 2], MODEL_AXIS, None)  # (..., in, out): shard in
        return P(*((None,) * ndim))  # out bias replicated (added post all-reduce)

    # MLP: fc1 shard out, fc2 shard in (Megatron layout); same for gated ff
    if "/fc1/" in path_str:
        return P(*none[: ndim - 1], MODEL_AXIS)
    if "/fc2/" in path_str:
        if path_str.endswith("/w"):
            return P(*none[: ndim - 2], MODEL_AXIS, None)
        return P(*((None,) * ndim))

    # tied embedding: shard the vocab axis
    if path_str.endswith("token_embedding"):
        return P(MODEL_AXIS, None)

    return P(*((None,) * ndim))


def param_pspecs(params, mesh: Optional[Mesh] = None) -> Any:
    """PartitionSpec pytree matching ``params`` (TP rules above).

    When ``mesh`` is given, any axis whose size doesn't divide evenly by
    its mesh axis falls back to replication (e.g. the odd 51865-token
    vocab under model-parallel size 2).
    """

    def rule(path, leaf):
        path_str = "/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        spec = _pspec_for(path_str, np.ndim(leaf))
        if mesh is not None:
            fixed = []
            for dim, axis in zip(np.shape(leaf), tuple(spec)):
                if axis is not None and dim % mesh.shape[axis] != 0:
                    axis = None
                fixed.append(axis)
            spec = P(*fixed)
        return spec

    return jax.tree_util.tree_map_with_path(rule, params)


def param_shardings(params, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(params, mesh)
    )


# Batch fields whose batch axis is NOT leading. ``xt`` (text-conditioner
# states, models/bert.py:encode_multi) is (n_langs, B, S, D): sharding its
# leading axis over data would split n_langs (usually 1) and fail on
# non-divisibility.
BATCH_AXES = {"xt": 1}


def batch_axis(key: str) -> int:
    """Which axis of batch field ``key`` is the batch axis."""
    return BATCH_AXES.get(key, 0)


def batch_pspec(batch) -> Any:
    """Shard every array's batch axis over the data axis (leading for most
    fields; see :data:`BATCH_AXES` for the exceptions)."""

    def spec(key, x):
        axis = batch_axis(key)
        if np.ndim(x) <= axis:
            return P()
        return P(*([None] * axis + [DATA_AXIS]))

    if isinstance(batch, dict):
        return {k: spec(k, v) for k, v in batch.items()}
    return jax.tree.map(
        lambda x: P(DATA_AXIS) if np.ndim(x) >= 1 else P(), batch
    )


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), batch_pspec(batch)
    )
    return jax.device_put(batch, shardings)
