"""Serialized serving artifacts via ``jax.export`` (StableHLO).

Beyond the reference's serving surface: its Ray server re-instantiates
the torch model from Python code plus a checkpoint on every deployment
(``instageo/model/model_server.py:48-154``), and its registry ships
directories of checkpoints (``registry/model_registry_sync.sh``). Here
the jitted serving forward is additionally exportable as a versioned,
self-describing StableHLO artifact: the *program* (preprocessing-free
predict: model apply -> argmax/softmax/regression head) serializes to a
few hundred KB of portable bytes that reload and execute WITHOUT the
model's Python code — weights stay in the ordinary checkpoint and are
passed as an argument, so the artifact is small and one artifact serves
every fine-tune of the same architecture.

TPU-native reasoning: ``jax.export`` captures the lowered StableHLO with
shape polymorphism over the batch dimension, so one artifact serves the
dynamic micro-batcher's power-of-two buckets (``serve/batching.py``)
without re-tracing, and a CPU-built artifact runs on TPU (multi-platform
lowering) — build artifacts in CI, run them on the fleet.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

ARTIFACT_VERSION = 1
_DEFAULT_PLATFORMS = ("cpu", "tpu")


def _predict_fn(model: Any, is_reg_task: bool, probabilities: bool
                ) -> Callable:
    """The serving forward on (variables, x) — same math as
    ``serve/infer.py:make_predict_fn`` but with the weights as an
    argument so they are not baked into the artifact as constants."""

    def predict(variables: Dict, x: jnp.ndarray) -> jnp.ndarray:
        logits = model.apply(variables, x, train=False, channels_last=True)
        if is_reg_task:
            return logits[..., 0].astype(jnp.float32)
        if probabilities:
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    return predict


def export_predict(
    model: Any,
    variables: Dict,
    path: str,
    *,
    num_bands: int,
    img_size: int,
    temporal_dim: int = 1,
    is_reg_task: bool = False,
    probabilities: bool = False,
    batch_size: Optional[int] = None,
    platforms: Sequence[str] = _DEFAULT_PLATFORMS,
) -> str:
    """Serialize the jitted serving forward to ``path`` (+ ``path.json``).

    ``batch_size=None`` exports with a symbolic batch dimension (any
    batch executes from the one artifact); pass an int to pin it (some
    ops reject polymorphism). The metadata sidecar records the input
    spec so ``load_predict`` callers can validate feeds.
    """
    predict = _predict_fn(model, is_reg_task, probabilities)
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    x_spec = jax.ShapeDtypeStruct((b, num_bands, temporal_dim, img_size,
                                   img_size), jnp.float32)
    def _spec(a):
        # Read the dtype WITHOUT materializing on device: host numpy
        # weights (fresh checkpoint loads) would otherwise be transferred
        # through the ~10-25 MB/s TPU relay just to be inspected.
        dt = getattr(a, "dtype", None)
        if dt is None:
            dt = np.asarray(a).dtype
        return jax.ShapeDtypeStruct(jnp.shape(a), dt)

    var_spec = jax.tree.map(_spec, variables)
    exported = jax_export.export(jax.jit(predict),
                                 platforms=tuple(platforms))(var_spec, x_spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "input_shape": [None if batch_size is None else int(b),
                        num_bands, temporal_dim, img_size, img_size],
        "input_dtype": "float32",
        "output": ("regression" if is_reg_task
                   else "probabilities" if probabilities else "class_ids"),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_predict(path: str) -> Tuple[Callable, Dict]:
    """Reload an exported artifact: ``(predict(variables, x), metadata)``.

    Needs no model code — the returned callable executes the serialized
    StableHLO through XLA on whatever backend is live (the artifact must
    have been exported for it; see the metadata's ``platforms``)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta: Dict = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)

    def predict(variables: Dict, x: Any) -> np.ndarray:
        return np.asarray(exported.call(variables, jnp.asarray(x)))

    return predict, meta
