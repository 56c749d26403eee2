"""Multi-host (TPU pod) utilities.

The reference has no distributed training at all (SURVEY.md §2.5); this
module is the framework's multi-host entry: initialize the jax distributed
runtime, assemble global arrays from per-host batch shards, and aggregate
metrics across processes. Single-process calls are no-ops, so the same
training code runs on one chip, one host (v5e-8), or a pod.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)

_initialized = False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the distributed runtime when running multi-process.

    On Cloud TPU pods the arguments auto-detect from the metadata server;
    single-process runs skip initialization entirely. Idempotent: a second
    call is a no-op (``jax.process_count()`` cannot be used as the guard —
    it reads 1 until AFTER initialize, so it can never gate the first call).
    """
    global _initialized
    if _initialized:
        return
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
        else:
            jax.distributed.initialize()
        _initialized = True
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    except RuntimeError as e:
        if "already" in str(e).lower():
            _initialized = True
            return
        log.info("Single-process run (distributed init skipped: %s)", e)
    except Exception as e:
        log.info("Single-process run (distributed init skipped: %s)", e)


def host_local_to_global(batch: Any, mesh) -> Any:
    """Per-host batch shards -> one global sharded array per leaf.

    Each host feeds its local slice of the global batch; under a
    data-parallel mesh spanning all hosts this assembles the global array
    without gathering data onto any single host.
    """
    if jax.process_count() == 1:
        from instageo_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh)
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, P("data"))


def aggregate_metrics(tree: Any) -> Any:
    """Sum metric accumulators across processes (replaces the reference's
    per-step .cpu() metric sync — SURVEY.md §5)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree)
    # Host-side epoch finalize: sum in float64 so the confusion matrix's
    # (hi, lo) f32 words — exact integers up to ~2^48 — don't re-round
    # when the per-process high words are added.
    return jax.tree.map(
        lambda x: np.sum(np.asarray(x, np.float64), axis=0)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else np.sum(x, axis=0), gathered)
