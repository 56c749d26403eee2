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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                 seq_len: int):
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
    # Row logsumexp, the only residual the backward needs beyond q/k/v/o.
    # Kept (BLOCK_Q, 1): TPU block shapes need the last two dims (8k, 128m)
    # or equal to the array's, so lse is (B·H, L_pad, 1).
    lse_ref[0] = m + jnp.log(denom)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, seq_len: int):
    """Flash-attention backward: one query block; dk/dv accumulate across
    the (minor) query-block grid dimension — their output block index is
    constant in it, so the partial sums stay resident in VMEM."""
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)     # (BLOCK_Q, D)
    k = k_ref[0].astype(jnp.float32)     # (L_pad, D)
    v = v_ref[0].astype(jnp.float32)     # (L_pad, D)
    o = o_ref[0].astype(jnp.float32)     # (BLOCK_Q, D)
    do = do_ref[0].astype(jnp.float32)   # (BLOCK_Q, D)
    lse = lse_ref[0].astype(jnp.float32)  # (BLOCK_Q, 1)

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BLOCK_Q, L_pad)
    l_pad = s.shape[-1]
    if l_pad != seq_len:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < seq_len, s, -jnp.inf)
    p = jnp.exp(s - lse)                 # exact softmax probs (rows of P)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta)                # (BLOCK_Q, L_pad)

    dq_ref[0] = (scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(dq_ref.dtype)

    dk_part = scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv_part = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_part.astype(dk_ref.dtype)
        dv_ref[0] = dv_part.astype(dv_ref.dtype)

    @pl.when(i > 0)
    def _accum():
        dk_ref[0] += dk_part.astype(dk_ref.dtype)
        dv_ref[0] += dv_part.astype(dv_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _prep(x, b, h, l, d, l_pad, d_pad):
    x = x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
    return jnp.pad(x, ((0, 0), (0, l_pad - l), (0, d_pad - d)))


def _unprep(x, b, h, l, d):
    return x[:, :l, :d].reshape(b, h, l, d).transpose(0, 2, 1, 3)


def _flash_fwd_impl(q, k, v, interpret):
    b, l, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    l_pad = _ceil_to(l, BLOCK_Q)
    d_pad = _ceil_to(d, 128)
    qp = _prep(q, b, h, l, d, l_pad, d_pad)
    kp = _prep(k, b, h, l, d, l_pad, d_pad)
    vp = _prep(v, b, h, l, d, l_pad, d_pad)

    grid = (b * h, l_pad // BLOCK_Q)
    qblock = pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, i: (bh, i, 0),
                          memory_space=pltpu.VMEM)
    kvblock = pl.BlockSpec((1, l_pad, d_pad), lambda bh, i: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, seq_len=l),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, l_pad, 1), jnp.float32),
        ],
        grid=grid,
        in_specs=[qblock, kvblock, kvblock],
        out_specs=[
            qblock,
            pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out, lse, (qp, kp, vp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q/k/v: (B, L, H, D) -> (B, L, H, D).

    Differentiable: the backward is the flash-attention recomputation
    kernel below (round-3 addition — round 2's kernel was inference-only
    and training forwards silently fell back to XLA)."""
    b, l, h, d = q.shape
    out, _, _ = _flash_fwd_impl(q, k, v, interpret)
    return _unprep(out, b, h, l, d)


def _flash_fwd(q, k, v, interpret):
    b, l, h, d = q.shape
    out, lse, (qp, kp, vp) = _flash_fwd_impl(q, k, v, interpret)
    return _unprep(out, b, h, l, d), (qp, kp, vp, out, lse, (b, l, h, d))


def _flash_bwd(interpret, residuals, g):
    qp, kp, vp, out, lse, (b, l, h, d) = residuals
    scale = 1.0 / math.sqrt(d)
    l_pad = _ceil_to(l, BLOCK_Q)
    d_pad = _ceil_to(d, 128)
    gp = _prep(g, b, h, l, d, l_pad, d_pad)  # zero-padded rows: no dk/dv leak

    grid = (b * h, l_pad // BLOCK_Q)
    qblock = pl.BlockSpec((1, BLOCK_Q, d_pad), lambda bh, i: (bh, i, 0),
                          memory_space=pltpu.VMEM)
    kvblock = pl.BlockSpec((1, l_pad, d_pad), lambda bh, i: (bh, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, seq_len=l),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, l_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, l_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, l_pad, d_pad), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            qblock, kvblock, kvblock, qblock, qblock,
            pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[qblock, kvblock, kvblock],
        interpret=interpret,
    )(qp, kp, vp, out, gp, lse)

    dtype = g.dtype
    return (_unprep(dq, b, h, l, d).astype(dtype),
            _unprep(dk, b, h, l, d).astype(dtype),
            _unprep(dv, b, h, l, d).astype(dtype))


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def attention_reference(q, k, v):
    """XLA reference path (same math, materialized attention)."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    attn = jnp.einsum("blhd,bmhd->bhlm", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", attn, v)
