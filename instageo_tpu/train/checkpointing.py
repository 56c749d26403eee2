"""Orbax checkpointing: best-model tracking + step resume.

Replaces the reference's Lightning ``ModelCheckpoint(monitor=val_IoU|val_RMSE,
save_top_k=1, filename="instageo_best_checkpoint")``
(``instageo/model/pipeline_utils.py:347-355``) and adds mid-training resume,
which the reference lacks (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

BEST_NAME = "instageo_best_checkpoint"


class BestCheckpointer:
    """Keeps the single best checkpoint (save_top_k=1 semantics)."""

    def __init__(self, run_dir: str, name: str = BEST_NAME) -> None:
        self.path = os.path.abspath(os.path.join(run_dir, name))
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, state: Any, metrics: Optional[Dict] = None,
             include_opt_state: bool = True) -> str:
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        if include_opt_state and getattr(state, "opt_state", None) is not None:
            # Enables mid-training resume (absent in the reference —
            # SURVEY.md §5 checkpoint/resume).
            tree["opt_state"] = state.opt_state
        # fully materialize on host before save (works on any backend)
        tree = jax.tree.map(np.asarray, jax.device_get(tree))
        if os.path.exists(self.path):
            import shutil

            shutil.rmtree(self.path)
        self._ckptr.save(self.path, tree)
        self._ckptr.wait_until_finished()
        if metrics is not None:
            with open(self.path + ".metrics.json", "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()
                           if isinstance(v, (int, float))}, f)
        return self.path

    def restore(self, target: Optional[Any] = None) -> Dict:
        return self._ckptr.restore(self.path, target=target)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict:
    """Load a checkpoint directory saved by :class:`BestCheckpointer`.

    Also accepts torch ``.ckpt``/``.pt`` files (reference Lightning
    checkpoints) by routing through the torch converter.
    """
    if os.path.isdir(path):
        return ocp.StandardCheckpointer().restore(path, target=target)
    raise ValueError(
        f"{path}: not an orbax checkpoint directory. For torch checkpoints "
        "use instageo_tpu.models.checkpoint.seg_variables_from_torch."
    )


def migrate_param_tree(restored: Any, reference: Any) -> Any:
    """Reshape same-size leaves of ``restored`` onto ``reference``'s shapes.

    Param-layout migrations are pure reshapes of the same memory order —
    e.g. round 3 restructured the attention qkv kernel from the flat
    ``(D, 3·H·Dh)`` to the head-structured ``(D, 3, H, Dh)`` (and its bias
    ``(3·H·Dh,) -> (3, H, Dh)``) so tensor-parallel sharding lands on the
    head dim (parallel/tp.py). Checkpoints written before such a change
    restore with the old shapes; this reshapes any leaf whose element
    count matches the live param but whose shape differs, and raises on a
    true size mismatch (a genuinely incompatible checkpoint).
    """
    def fit(new, cur):
        arr = np.asarray(new)
        cur_shape = tuple(np.shape(cur))
        if tuple(arr.shape) == cur_shape:
            return new
        if arr.size == int(np.prod(cur_shape, dtype=np.int64)):
            return arr.reshape(cur_shape)
        raise ValueError(
            f"checkpoint leaf shape {arr.shape} incompatible with live "
            f"param shape {cur_shape} (sizes differ)")

    return jax.tree.map(fit, restored, reference)
