"""Optimizer construction: AdamW + cosine warm restarts + weight clipping.

Reference semantics (``instageo/model/base.py:103-133``): AdamW(lr, wd),
optional ``CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=0)``
stepped per epoch, per-step parameter clamping to ``weight_clip_range``,
and frozen-backbone support (encoder params excluded from updates).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def cosine_warm_restarts(base_lr: float, steps_per_epoch: int, t_0: int = 10,
                         t_mult: int = 2, eta_min: float = 0.0):
    """optax schedule equivalent to torch CosineAnnealingWarmRestarts.

    torch steps the scheduler once per epoch (Lightning default); we map the
    global step to a fractional epoch so behaviour matches when sampled at
    epoch boundaries, with smooth intra-epoch annealing as a bonus.
    """

    def schedule(step):
        epoch = step / max(1, steps_per_epoch)
        if t_mult == 1:
            t_cur = epoch % t_0
            t_i = t_0
        else:
            # Closed form: find restart cycle n with sum_{i<n} t_0·t_mult^i <= epoch.
            n = jnp.floor(
                jnp.log1p((t_mult - 1.0) * epoch / t_0) / math.log(t_mult)
            )
            cycle_start = t_0 * (jnp.power(float(t_mult), n) - 1.0) / (t_mult - 1.0)
            t_i = t_0 * jnp.power(float(t_mult), n)
            t_cur = epoch - cycle_start
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return schedule


def clip_params(params: Any, clip_range: Optional[Sequence[float]]) -> Any:
    """Clamp every parameter to [min, max] (reference base.py:103-113)."""
    if clip_range is None:
        return params
    lo, hi = clip_range
    return jax.tree.map(lambda p: jnp.clip(p, lo, hi), params)


def _freeze_mask(params: Any, frozen_prefix: str) -> Any:
    """Pytree of bools: True where the parameter should be trained."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        return not (keys and keys[0] == frozen_prefix)

    leaves = {jax.tree_util.keystr(p): trainable(p) for p, _ in flat}

    def mask_fn(path, _):
        return leaves[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    params: Any,
    learning_rate: float,
    weight_decay: float = 1e-2,
    scheduler: bool = False,
    steps_per_epoch: int = 1,
    freeze_backbone: bool = False,
    frozen_prefix: str = "prithvi_encoder",
) -> optax.GradientTransformation:
    """AdamW with optional warm-restart schedule and frozen encoder."""
    lr = (
        cosine_warm_restarts(learning_rate, steps_per_epoch)
        if scheduler
        else learning_rate
    )
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if freeze_backbone:
        mask = _freeze_mask(params, frozen_prefix)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, mask)),
            optax.masked(tx, mask),
        )
    return tx
