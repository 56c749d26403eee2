"""Fully-sharded data parallelism (ZeRO-3 parameter sharding).

The reference trains single-accelerator with replicated weights
(SURVEY.md §2.5); ``tpu.zero1`` already shards the optimizer moments.
FSDP goes one step further for the 600M-scale variants: the PARAMETERS
themselves are sharded over the ``data`` mesh axis, so per-chip memory
for params + moments + master copies drops to 1/N. GSPMD inserts an
all-gather where each kernel is consumed in the forward/backward and —
because the trainer pins gradients to the params' shardings
(train/trainer.py) — a reduce-scatter for the gradients, which is
exactly the ZeRO-3 communication schedule. On a v5e ICI mesh the
all-gathers overlap with the preceding layer's compute (XLA's
collective scheduler), so the cost is memory-bandwidth-shaped, not
latency-shaped.

Spec rule: each leaf is sharded on its LARGEST dim divisible by the
data-axis size (largest dim → least per-shard padding pressure and the
most even split); leaves under 64K ELEMENTS (256 KiB at f32 — the same
element threshold ``zero1_place`` uses) or with no divisible dim stay
replicated — gathering a LayerNorm scale saves nothing and costs a
collective. The rule is shape-driven, not name-driven, so it covers
every model family the registry ships without a per-model table.

Config surface: ``tpu.fsdp: true`` (composes with ``tpu.steps_per_call``
scans and ``tpu.zero1``; mutually exclusive with ``tpu.tp`` — TP already
shards the large kernels on the model axis, and `place_state_like_params`
mirrors those).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instageo_tpu.parallel.mesh import DATA_AXIS

# Shared with zero1_place / place_state_like_params (parallel/mesh.py):
# below this many ELEMENTS (not bytes) a leaf stays replicated — the
# all-gather set-up cost exceeds the memory saved.
from instageo_tpu.parallel.mesh import MIN_SHARD_ELEMS as MIN_SHARD_SIZE


def fsdp_spec_for(x: Any, n_data: int) -> P:
    """PartitionSpec for one leaf: largest dim divisible by ``n_data``."""
    shape = tuple(getattr(x, "shape", ()))
    size = int(getattr(x, "size", 0))
    if not shape or size < MIN_SHARD_SIZE:
        return P()
    for d in sorted(range(len(shape)), key=lambda d: (-shape[d], d)):
        if shape[d] % n_data == 0:
            return P(*([None] * d + [DATA_AXIS]))
    return P()


def fsdp_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree matching ``params`` under the FSDP rule."""
    n = int(mesh.shape[DATA_AXIS])
    return jax.tree.map(lambda x: fsdp_spec_for(x, n), params)


def fsdp_place(params: Any, mesh: Mesh) -> Any:
    """Device-put ``params`` with each leaf sharded per the FSDP rule."""
    specs = fsdp_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
