"""Pallas fused attention for the Prithvi ViT.

Sequence lengths in this model family are short (≤ ~1.1k tokens: T·(224/p)²
+ 1 — SURVEY.md §5), so K/V for one (batch, head) fit entirely in VMEM and
the kernel is a single-pass fused softmax-attention: per grid cell it loads
one query block plus the full K/V, runs the scores/softmax/PV matmuls on
the MXU without materializing the (L, L) attention matrix in HBM, and
writes one output block. Numerically stable (row-max subtraction), f32
accumulation, padding masked with -inf.

Falls back to the XLA einsum path off-TPU (and under ``interpret=True`` for
CPU tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    """One query block vs the full K/V of one (batch·head)."""
    q = q_ref[0].astype(jnp.float32)  # (BLOCK_Q, D)
    k = k_ref[0].astype(jnp.float32)  # (L_pad, D)
    v = v_ref[0].astype(jnp.float32)  # (L_pad, D)

    scores = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BLOCK_Q, L_pad)

    # Mask padded keys.
    l_pad = scores.shape[-1]
    if l_pad != seq_len:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(key_ids < seq_len, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (out / denom).astype(o_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q/k/v: (B, L, H, D) -> (B, L, H, D)."""
    b, l, h, d = q.shape
    scale = 1.0 / math.sqrt(d)

    l_pad = _ceil_to(l, BLOCK_Q)
    d_pad = _ceil_to(d, 128)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
        return jnp.pad(x, ((0, 0), (0, l_pad - l), (0, d_pad - d)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    grid = (b * h, l_pad // BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, seq_len=l),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_pad), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :l, :d].reshape(b, h, l, d).transpose(0, 2, 1, 3)
    return out


def attention_reference(q, k, v):
    """XLA reference path (same math, materialized attention)."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    attn = jnp.einsum("blhd,bmhd->bhlm", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", attn, v)
