"""Tensor-parallel sharding for the Prithvi ViT (Megatron-style TP).

The reference has no model parallelism of any kind (SURVEY.md §2.5) — at
Prithvi scale (100M-600M params) pure DP suffices for throughput. TP is
offered beyond parity for latency-bound serving and for headroom on the
600M variant: the transformer's two matmul pairs are sharded
column-then-row over a ``model`` mesh axis (qkv/fc1 split their OUTPUT
features; proj/fc2 split their INPUT features), so each pair needs one
all-reduce, inserted automatically by GSPMD. Everything else (patch
embed, norms, decoder head) is replicated.

Usage::

    mesh = make_mesh_2d(tp=2)                  # (data, model) axes
    params = tp_place(params, mesh)            # shard per TP rules
    opt_state = place_state_like_params(opt_state, params, mesh)

The jitted train/eval steps then inherit these shardings from their
inputs; no step-code changes are needed. Config surface: ``tpu.tp=N``
(see ``train/trainer.py``).

The qkv kernel is stored head-structured (D, 3, H, Dh) — a pure reshape
of the torch fused layout (models/prithvi.py ``QKVProj``) — so its model-
axis shard lands on the HEAD dim. The head sharding then propagates
through the q/k/v slice, softmax, and the (B, L, H·Dh) merge into the
row-parallel output projection with no resharding at all: GSPMD's only
collectives are the two Megatron all-reduces (after attn proj and fc2).
Round 2 stored qkv flattened (D, 3·H·Dh); the misaligned shard forced
"involuntary full rematerialization" of the attention tensors on every
block's backward — the round-3 layout eliminates those (verified by
grepping the dryrun's GSPMD log; tests/model_tests/test_parallel.py).
Requires ``tp`` to divide ``num_heads`` (3 of the flat dim never splits).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instageo_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# Param-path suffixes → PartitionSpec. Column-parallel layers shard the
# output-feature dim (and their bias); row-parallel layers shard the
# input-feature dim and keep bias replicated (it is added once, after
# the all-reduce). The qkv projection is column-parallel on its HEAD dim
# (kernel (D, 3, H, Dh), bias (3, H, Dh) — see module docstring).
_COLUMN_KERNELS = ("mlp/fc1/kernel",)
_COLUMN_BIASES = ("mlp/fc1/bias",)
_ROW_KERNELS = ("attn/proj/kernel", "mlp/fc2/kernel")
_QKV_KERNELS = ("attn/qkv/kernel",)
_QKV_BIASES = ("attn/qkv/bias",)


def make_mesh_2d(tp: int, num_devices: Optional[int] = None) -> Mesh:
    """(data, model) mesh: ``model`` is the fast (ICI-adjacent) axis.

    Adjacent device ids sit on the same ICI link on TPU slices, so the
    per-layer TP all-reduces ride the fastest axis; DP gradient reduction
    crosses the slower one once per step.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} must divide device count {n}")
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def has_model_axis(mesh: Mesh) -> bool:
    return (MODEL_AXIS in mesh.axis_names
            and int(mesh.shape[MODEL_AXIS]) > 1)


def _path_str(path: Tuple) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def tp_spec_for_path(path: Tuple) -> P:
    """TP PartitionSpec for one param path (replicated by default)."""
    p = _path_str(path)
    if p.endswith(_COLUMN_KERNELS):
        return P(None, MODEL_AXIS)
    if p.endswith(_COLUMN_BIASES):
        return P(MODEL_AXIS)
    if p.endswith(_ROW_KERNELS):
        return P(MODEL_AXIS, None)
    if p.endswith(_QKV_KERNELS):
        return P(None, None, MODEL_AXIS, None)
    if p.endswith(_QKV_BIASES):
        return P(None, MODEL_AXIS, None)
    return P()


def tp_specs(params: Any) -> Any:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: tp_spec_for_path(path), params)


def tp_place(params: Any, mesh: Mesh) -> Any:
    """Device-put params with the TP sharding rules."""
    specs = tp_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def place_state_like_params(state: Any, params: Any, mesh: Mesh,
                            zero1: bool = False, specs: Any = None) -> Any:
    """Place an optimizer state: param-shaped subtrees get the params'
    specs (AdamW moments mirror the params tree), everything else is
    replicated. ``specs`` defaults to the TP rules; pass
    ``fsdp_specs(params, mesh)`` to mirror a ZeRO-3 placement instead
    (parallel/fsdp.py). With ``zero1``, moments the specs leave
    replicated are additionally sharded on dim 0 over the data axis
    (ZeRO-1), composing both memory savings. Non-mirroring states (e.g.
    masked/frozen trees) fall back to full replication — correct, just
    not memory-sharded.
    """
    if specs is None:
        specs = tp_specs(params)
    pdef = jax.tree.structure(params)
    n_data = int(mesh.shape[DATA_AXIS])

    def moment_spec(x, s: P) -> P:
        from instageo_tpu.parallel.mesh import zero1_shardable

        if zero1 and s == P() and zero1_shardable(x, n_data):
            return P(DATA_AXIS)
        return s

    def is_param_tree(node: Any) -> bool:
        try:
            return jax.tree.structure(node) == pdef
        except Exception:
            return False

    def place(node: Any) -> Any:
        if is_param_tree(node):
            return jax.tree.map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(mesh, moment_spec(x, s))),
                node, specs)
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), node)

    return jax.tree_util.tree_map(place, state, is_leaf=is_param_tree)
