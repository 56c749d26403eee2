"""Device mesh and sharding helpers (GSPMD data-parallel training).

The reference trains on a single accelerator with no distribution strategy
(SURVEY.md §2.5); the TPU rebuild scales data-parallel over the ICI mesh via
``jax.sharding``: the batch is sharded over a ``data`` axis, parameters and
optimizer state are replicated (Prithvi ≤ 600M params fits per-chip), and
XLA inserts the gradient all-reduce. For multi-host pods, call
``jax.distributed.initialize()`` before building the mesh; batches are fed
per-host via ``host_local_array_to_global_array``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


# Below this many ELEMENTS a leaf stays replicated under ZeRO-1/FSDP:
# the gather/scatter set-up cost exceeds the memory saved. One constant,
# shared by zero1_place, tp.place_state_like_params, and fsdp.
MIN_SHARD_ELEMS = 1 << 16


def zero1_shardable(x: Any, n_data: int) -> bool:
    """ZeRO-1 predicate: dim 0 divisible by the data-axis size and big
    enough to be worth sharding (shared by mesh/tp/fsdp placements)."""
    return (getattr(x, "ndim", 0) >= 1 and x.shape[0] % n_data == 0
            and x.size >= MIN_SHARD_ELEMS)


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1D data-parallel mesh over the fastest (ICI-adjacent) device order.

    The axis is always named ``data`` — every sharding helper (and
    multihost.py) addresses it by that name."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_from_config(tpu_cfg: Any) -> Mesh:
    """Build the mesh from config: ``tpu.mesh`` (``auto`` or int device
    count), ``tpu.tp`` (tensor-parallel degree; >1 builds a 2D
    (data, model) mesh — ``parallel/tp.py``), and ``tpu.pp``
    (pipeline-parallel stages; >1 builds a 2D (data, pipe) mesh —
    ``parallel/pp.py``)."""
    spec = None
    tp = pp = 1
    if tpu_cfg:
        spec = tpu_cfg.get("mesh", "auto")
        tp = int(tpu_cfg.get("tp", 1))
        pp = int(tpu_cfg.get("pp", 1))
    num = None if spec in (None, "auto") else int(spec)
    if tp > 1 and pp > 1:
        raise ValueError("tpu.tp and tpu.pp are mutually exclusive")
    if tp > 1:
        from instageo_tpu.parallel.tp import make_mesh_2d

        return make_mesh_2d(tp, num)
    if pp > 1:
        from instageo_tpu.parallel.pp import make_mesh_pp

        return make_mesh_pp(pp, num)
    return make_mesh(num)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _single_device(mesh: Mesh) -> bool:
    """On a 1-device mesh, sharding annotations buy nothing and some PJRT
    plugins execute sharded-committed arrays through a dramatically slower
    path (~180x measured on the axon relay); use plain placement there."""
    return int(mesh.devices.size) == 1


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded.

    Batch sizes must be divisible by the mesh size; callers pad partial
    batches with ignore-labeled samples (static shapes; masked metrics make
    the padding free).
    """
    if _single_device(mesh):
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x)), batch)
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(k, B, ...)`` stacks: batch (second) axis over the
    data mesh, leading (scan/micro) axis unsharded. Used both for staging
    multi-step scan inputs and for the in-step grad-accumulation reshape
    (train/trainer.py)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put ``(k, B, ...)`` step-stacked arrays, sharding the BATCH
    (second) axis over the data mesh; the leading axis is the scan axis of
    a multi-step training call and stays unsharded."""
    if _single_device(mesh):
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x)), batch)
    sharding = stacked_batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    if _single_device(mesh):
        return jax.tree.map(jax.device_put, tree)
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def zero1_place(tree: Any, mesh: Mesh) -> Any:
    """ZeRO-1-style placement: shard large leaves' dim 0 over the data axis.

    For the 600M Prithvi variant the AdamW moments dominate memory; sharding
    them over the mesh (and letting GSPMD insert the gathers around the
    update) trades a little ICI traffic for 1/N optimizer memory. Leaves
    whose first dim isn't divisible by the mesh (or that are small) stay
    replicated.
    """
    n = int(mesh.devices.size)
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    def place(x):
        arr = np.asarray(x) if not hasattr(x, "shape") else x
        if zero1_shardable(arr, n):
            return jax.device_put(x, sharded)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def pad_batch(arrays: Sequence[np.ndarray], batch_size: int,
              label_fill: float = -100, repeat_inputs: bool = False) -> tuple:
    """Pad (inputs, labels) leading dim to ``batch_size``; labels get fill.

    ``repeat_inputs`` pads the INPUT rows by cycling real samples instead
    of zeros: padded labels are ignore-filled either way (loss/metrics
    masked), but all-zero images would enter train-mode BatchNorm batch
    statistics and skew them toward zero on every partial tail batch —
    repeated real samples keep the statistics on-distribution.

    Returns (padded_inputs, padded_labels, n_real).
    """
    x, y = arrays
    n = x.shape[0]
    if n == batch_size:
        return x, y, n
    pad_n = batch_size - n
    if repeat_inputs and n > 0:
        idx = np.arange(pad_n) % n
        x_fill = x[idx]
    else:
        x_fill = np.zeros((pad_n,) + x.shape[1:], x.dtype)
    x_pad = np.concatenate([x, x_fill], axis=0)
    y_pad = np.concatenate(
        [y, np.full((pad_n,) + y.shape[1:], label_fill, y.dtype)], axis=0
    )
    return x_pad, y_pad, n
