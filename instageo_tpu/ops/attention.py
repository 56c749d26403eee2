"""Pallas fused attention for the Prithvi ViT.

Sequence lengths in this model family are short (≤ ~1.1k tokens: T·(224/p)²
+ 1 — SURVEY.md §5), so the whole L×L attention of one (batch, head) pair
fits in VMEM and the kernel is a single-pass fused softmax-attention with
NO sequence blocking: per grid cell it processes ``group`` (batch·head)
pairs end-to-end — scores, numerically stable softmax (row-max
subtraction, f32 statistics), and the PV matmul — without materializing
the (L, L) attention matrix in HBM.

Three measured design rules (v5e-1, PERF.md "Flash kernel revisited"):

1. **No HBM padding.** Blocks are ``(group, L, D)`` with L and D equal to
   the array dims — legal TPU block shapes (trailing two dims equal to the
   array's), padded only in VMEM registers by Mosaic. The round-2/3 kernel
   padded L→256 and D 64→128 in HBM, tripling its memory traffic; the pads
   alone cost more than the XLA path's whole attention at b=128.
2. **Matmuls in the input dtype** with f32 accumulation
   (``preferred_element_type``): bf16 inputs take the MXU's native rate
   instead of the multi-pass f32 lowering an up-front ``astype`` forces.
3. **``group`` pairs per grid cell** (static Python loop): one pair is
   only ~17 MFLOP at L=197/Dh=64, so a 1-pair grid is
   iteration-overhead-bound (~1.9 µs/cell measured vs ~0.6 µs compute);
   grouping amortizes it.

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


def _group_for(bh: int, l: int) -> int:
    """(batch·head) pairs per grid cell: largest divisor of B·H within the
    VMEM budget. Block bytes scale with L (the f32 score scratch with L²),
    so longer sequences cap the group lower."""
    cap = 8 if l <= 384 else (4 if l <= 768 else 2)
    for g in (8, 6, 4, 3, 2):
        if g <= cap and bh % g == 0:
            return g
    return 1


def _group_heads(h: int, l: int, d: int):
    """Heads per grid cell for the (B, H//g) grid of the merged-output
    kernel: largest divisor of H within the same VMEM budget whose
    merged block width ``g·d`` is 128-lane aligned.

    The alignment constraint is Mosaic's, not a tuning choice: the
    merged-output block is (1, L, g·d) inside a (B, L, H·d) array, and
    the TPU lowering requires the last block dim be a multiple of 128
    (or the full array dim — only ``g == h``, usually past the VMEM
    cap). Dh=64 variants always compose (2·64=128); Dh=80 (the 600M
    family) only composes at g=8, so for L>384 (cap<8) there is NO legal
    grouping — returns None and callers fall back to the heads-first
    kernel, whose blocks end at (L, d) = full array dims (verified on
    v5e: g=4/d=80 is a Mosaic compile error, g=8/d=80 runs)."""
    cap = 8 if l <= 384 else (4 if l <= 768 else 2)
    for g in (8, 6, 4, 3, 2, 1):
        if g <= cap and h % g == 0 and (g * d) % 128 == 0:
            return g
    return None


def _merged_grouping(h: int, l: int, d: int):
    """Like ``_group_heads`` but also admits ``g == h`` (merged block =
    the FULL trailing array dim ``h·d``, which Mosaic always allows
    regardless of 128-alignment) when it fits the VMEM cap. Covers small
    test/probe shapes (e.g. H=2/Dh=80 → block width 160 = full dim)."""
    g = _group_heads(h, l, d)
    if g is not None:
        return g
    cap = 8 if l <= 384 else (4 if l <= 768 else 2)
    return h if h <= cap else None


_QBLOCK_SCRATCH_BUDGET = 12 * 1024 * 1024


def _qblock_plan(h: int, l: int, d: int):
    """Grouping + q-row blocking for merged-output shapes with NO legal
    full-L grouping (``_merged_grouping`` is None — Dh=80 at L>384).

    The full-L kernel's VMEM cap is the f32 (L, L) score scratch per
    (batch·head) pair; probing g=8 at L=513 on v5e confirmed Mosaic does
    NOT reuse it across the unrolled group loop (compile OOM). Blocking
    the q rows shrinks the scratch to (Bq, L) per pair while k/v stay
    whole in VMEM, so the 128-lane-aligned g (8·80 = 640 lanes) becomes
    affordable: single-pass softmax per row block, no online rescaling.
    Returns (g, bq, nq) with nq·bq >= l (q rows zero-padded to nq·bq by
    the wrapper; the pad never pollutes dk/dv because the padded
    cotangent rows are zero), or None if no 128-aligned g divides h.

    VMEM model (backward-bound, validated on v5e): ~4 live (Bq, L)
    f32-row-equivalent buffers per unrolled pair (s, p, dp + the bf16
    ds/pq pair) — Mosaic does NOT share them across the static group
    loop — plus the two persistent f32 (g, L, Dh) dk/dv accumulators.
    The first model that omitted the accumulators OOM'd the 16 MB
    scoped limit at L=769 (20.5 MB requested)."""
    for g in (8, 6, 4, 3, 2):
        if h % g == 0 and (g * d) % 128 == 0:
            break
    else:
        return None
    acc_bytes = 2 * g * l * d * 4
    avail = _QBLOCK_SCRATCH_BUDGET - acc_bytes
    row_bytes = 4 * g * l * 4
    max_bq = (avail // row_bytes) // 8 * 8
    if max_bq < 8:
        return None  # accumulators alone blow VMEM at this (g, L, Dh)
    if max_bq >= l:
        return None  # full-L block fits; _merged_grouping handles it
    nq = -(-l // max_bq)
    bq = -(-(-(-l // nq)) // 8) * 8  # ceil(l/nq) rounded up to sublanes
    if bq > max_bq:  # sublane rounding overshot the budget: unbalance
        bq = max_bq
        nq = -(-l // bq)
    return g, bq, nq


def pallas_trainable(h: int, l: int, d: int) -> bool:
    """Whether the flash BACKWARD kernels compile for this shape.

    The backward's per-pair live set is dominated by the (L, L)
    intermediates — s/p/dp in f32 plus the bf16 ds/pq pair, ~16·L²
    bytes — which must fit v5e's 16 MB scoped VMEM (Mosaic reuses the
    set across the unrolled group loop, so the bound is per-pair, not
    per-group). Measured on v5e: L=785 (Dh=64 T=4) compiles and wins,
    L=1025 (600M T=4) is a compile-time VMEM OOM in every kernel
    variant including g-minimal and q-blocked
    (benchmarks/probe_attention_qblock.py). The model gate routes
    untrainable shapes to XLA when ``deterministic=False``; forward-only
    (inference) pallas still runs there and wins (2.93 vs 4.29 ms at
    L=1025 b=16)."""
    del h, d  # the L² terms dominate; head dim only scales the blocks
    return l * l * 16 <= 15 * 1024 * 1024


def blo_supported(h: int, l: int, d: int) -> bool:
    """Whether the MERGED-OUTPUT kernel has a legal grouping for this
    (num_heads, seq_len, head_dim) — see ``_group_heads`` /
    ``_merged_grouping``. When False, ``flash_attention_blo`` still
    works: it dispatches to ``flash_attention_bhld`` and pays one HBM
    transpose to produce the merged layout (the round-3c configuration —
    correct everywhere, slower than the zero-transpose merged kernel).
    Round-5 TPU probes showed the fallback still beats XLA at its only
    dispatch shapes (Dh=80, L>=513: 0.77x forward-only, 0.648x fwd+bwd
    at b=64 — PERF.md "Attention auto policy"), so the ``attn_impl=auto``
    policy no longer consults this; it remains exported for tests and
    support-matrix introspection."""
    return _merged_grouping(h, l, d) is not None


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                 group: int):
    """Fused attention for ``group`` (batch·head) pairs (module docstring)."""
    for g in range(group):
        q = q_ref[g]  # (L, D), input dtype
        k = k_ref[g]  # (L, D)
        v = v_ref[g]  # (L, D)

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L) f32

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = (out / denom).astype(o_ref.dtype)
        # Row logsumexp: the only residual the backward needs beyond
        # q/k/v/o. (L, 1) per pair — the trailing block dims equal the
        # array's, which TPU block shapes allow.
        lse_ref[g] = m + jnp.log(denom)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, group: int):
    """Flash-attention backward, one full-L cell per (batch·head) group:
    recomputes the probabilities from the lse residual, then the four
    grad matmuls — no cross-cell accumulation (the grid is 1D over
    (batch·head) groups, each owning its whole sequence)."""
    for g in range(group):
        q = q_ref[g]    # (L, D), input dtype
        k = k_ref[g]    # (L, D)
        v = v_ref[g]    # (L, D)
        o = o_ref[g]    # (L, D)
        do = do_ref[g]  # (L, D)
        lse = lse_ref[g].astype(jnp.float32)  # (L, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L) f32
        p = jnp.exp(s - lse)             # exact softmax probs (rows of P)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)  # (L, L)
        pq = p.astype(q.dtype)

        dq_ref[g] = (scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
        dk_ref[g] = (scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dk_ref.dtype)
        dv_ref[g] = jax.lax.dot_general(
            pq, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _attn_kernel_blo(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                     group: int, head_dim: int):
    """Fused attention writing the output in MERGED-HEADS layout.

    q/k/v blocks: (1, group, L, Dh) heads-first; the output block is
    (1, L, group·Dh) — head g's columns land at [g·Dh, (g+1)·Dh), i.e.
    exactly the (B, L, H·Dh) layout the output projection matmul
    consumes. This kills the (B,H,L,D)->(B,L,H,D) transpose that ate the
    round-3c kernel's full-step win (PERF.md "Flash kernel revisited"):
    the merge is a static column offset in the epilogue, free in VMEM.
    """
    outs = []
    for g in range(group):
        q = q_ref[0, g]  # (L, Dh), input dtype
        k = k_ref[0, g]
        v = v_ref[0, g]

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L) f32

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((out / denom).astype(o_ref.dtype))
        lse_ref[0, g] = m + jnp.log(denom)
    # One full-width aligned store (the per-head concat is an in-register
    # lane relayout) instead of `group` sub-tile column writes at
    # 64-lane offsets.
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _attn_bwd_kernel_blo(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                         dq_ref, dk_ref, dv_ref, *, scale: float,
                         group: int, head_dim: int):
    """Backward for the merged-output layout: o/do arrive as
    (1, L, group·Dh) column blocks (the residual layout the loss's
    backward produces — no transpose), q/k/v and the grads stay
    heads-first (1, group, L, Dh)."""
    # Full-width aligned loads once; the per-head views below are
    # in-register lane slices.
    o_full = o_ref[0]    # (L, group·Dh)
    do_full = do_ref[0]
    for g in range(group):
        q = q_ref[0, g]    # (L, Dh), input dtype
        k = k_ref[0, g]
        v = v_ref[0, g]
        o = jax.lax.slice_in_dim(o_full, g * head_dim,
                                 (g + 1) * head_dim, axis=1)
        do = jax.lax.slice_in_dim(do_full, g * head_dim,
                                  (g + 1) * head_dim, axis=1)
        lse = lse_ref[0, g].astype(jnp.float32)  # (L, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L) f32
        p = jnp.exp(s - lse)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)  # (L, L)
        pq = p.astype(q.dtype)

        dq_ref[0, g] = (scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
        dk_ref[0, g] = (scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dk_ref.dtype)
        dv_ref[0, g] = jax.lax.dot_general(
            pq, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _flash_fwd_blo(q, k, v, interpret):
    """Forward: q/k/v (B, H, L, Dh) -> out (B, L, H·Dh) + lse residual."""
    b, h, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    g = _merged_grouping(h, l, d)
    if g is None:
        raise ValueError(
            f"_flash_fwd_blo: no legal head grouping for H={h}, L={l}, "
            f"Dh={d} (merged block width g·Dh must be 128-lane aligned "
            f"or the full H·Dh dim) — flash_attention_blo dispatches such "
            f"shapes to flash_attention_bhld + transpose instead")
    grid = (b, h // g)
    qkv_spec = pl.BlockSpec((1, g, l, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel_blo, scale=scale, group=g,
                          head_dim=d),
        out_shape=[
            jax.ShapeDtypeStruct((b, l, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, h, l, 1), jnp.float32),
        ],
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_specs=[
            pl.BlockSpec((1, l, g * d), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, l, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_blo_merged(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Merged-output kernel core (requires a legal grouping —
    ``blo_supported``); the public entry is ``flash_attention_blo``."""
    out, _ = _flash_fwd_blo(q, k, v, interpret)
    return out


def _flash_blo_fwd(q, k, v, interpret):
    out, lse = _flash_fwd_blo(q, k, v, interpret)
    return out, (q, k, v, out, lse)


def _flash_blo_bwd(interpret, residuals, do):
    q, k, v, out, lse = residuals
    b, h, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    g = _merged_grouping(h, l, d)  # same grouping the forward validated
    grid = (b, h // g)
    qkv_spec = pl.BlockSpec((1, g, l, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, l, g * d), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_blo, scale=scale, group=g,
                          head_dim=d),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, l, d), do.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), do.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), do.dtype),
        ],
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec, o_spec, o_spec,
            pl.BlockSpec((1, g, l, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        interpret=interpret,
    )(q, k, v, out, do, lse)
    return dq, dk, dv


_flash_blo_merged.defvjp(_flash_blo_fwd, _flash_blo_bwd)


def _attn_bwd_kernel_bloq(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                          dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                          scale: float, group: int, head_dim: int, nq: int):
    """Backward for the Q-BLOCKED merged-output layout.

    Grid is (B, H//g, nq) with the q-row block index innermost, so for a
    fixed (batch, head-group) cell the nq steps run back-to-back: dk/dv
    are summed over q-blocks in persistent f32 VMEM scratch (zeroed at
    the first block, flushed to the bf16 output block at the last —
    single rounding, matching the full-L kernel's grad precision) while
    dq is per-block local. Padded q rows contribute exactly zero to
    dk/dv because the wrapper zero-pads the incoming cotangent rows
    (ds = p·(0 − 0) = 0), so no in-kernel masking is needed."""
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    o_full = o_ref[0]    # (Bq, group·Dh)
    do_full = do_ref[0]
    for g in range(group):
        q = q_ref[0, g]    # (Bq, Dh), input dtype
        k = k_ref[0, g]    # (L, Dh)
        v = v_ref[0, g]
        o = jax.lax.slice_in_dim(o_full, g * head_dim,
                                 (g + 1) * head_dim, axis=1)
        do = jax.lax.slice_in_dim(do_full, g * head_dim,
                                  (g + 1) * head_dim, axis=1)
        lse = lse_ref[0, g].astype(jnp.float32)  # (Bq, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (Bq, L) f32
        p = jnp.exp(s - lse)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)  # (Bq, L)
        pq = p.astype(q.dtype)

        dq_ref[0, g] = (scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
        dk_acc[g] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv_acc[g] += jax.lax.dot_general(
            pq, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(r == nq - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_fwd_bloq(q, k, v, interpret):
    """Q-blocked forward: q (B, H, L_pad, Dh) [rows zero-padded by the
    caller], k/v (B, H, L, Dh) -> out (B, L_pad, H·Dh) + lse. Reuses
    ``_attn_kernel_blo`` — the kernel body is row-count agnostic."""
    b, h, l_pad, d = q.shape
    l = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    g, bq, nq = _qblock_plan(h, l, d)
    assert nq * bq == l_pad, (nq, bq, l_pad)
    grid = (b, h // g, nq)
    q_spec = pl.BlockSpec((1, g, bq, d), lambda i, j, r: (i, j, r, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, g, l, d), lambda i, j, r: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel_blo, scale=scale, group=g,
                          head_dim=d),
        out_shape=[
            jax.ShapeDtypeStruct((b, l_pad, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, h, l_pad, 1), jnp.float32),
        ],
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[
            pl.BlockSpec((1, bq, g * d), lambda i, j, r: (i, r, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, bq, 1), lambda i, j, r: (i, j, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _pad_q_rows(x, l_pad):
    return jnp.pad(x, ((0, 0), (0, 0), (0, l_pad - x.shape[2]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_bloq(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Q-blocked merged-output kernel: the zero-HBM-transpose layout for
    shapes whose full-L merged grouping is VMEM-illegal (Dh=80, L>384).
    q/k/v (B, H, L, Dh) -> (B, L, H·Dh).

    Measured NEGATIVE on v5e (round 5): loses to the bhld+transpose
    fallback at every shape where both compile (L=513 b=64: 10.1 vs
    9.0 ms fwd+bwd, 5.7 vs 4.1 fwd; L=769/1025 fwd likewise), and its
    backward still VMEM-OOMs at L>=769 — small q-row blocks re-pay k/v
    DMA waits and under-fill the MXU more than one transpose pair
    costs. NOT dispatched by ``flash_attention_blo``; kept (tested,
    interpret-mode CI) as the starting point if a future backend lifts
    the scoped-VMEM limit. Probe: benchmarks/probe_attention_qblock.py;
    PERF.md "Q-blocked merged kernel: negative"."""
    b, h, l, d = q.shape
    g, bq, nq = _qblock_plan(h, l, d)
    out, _ = _flash_fwd_bloq(_pad_q_rows(q, nq * bq), k, v, interpret)
    return out[:, :l]


def _flash_bloq_fwd(q, k, v, interpret):
    b, h, l, d = q.shape
    g, bq, nq = _qblock_plan(h, l, d)
    qp = _pad_q_rows(q, nq * bq)
    out, lse = _flash_fwd_bloq(qp, k, v, interpret)
    return out[:, :l], (qp, k, v, out, lse)


def _flash_bloq_bwd(interpret, residuals, do):
    qp, k, v, out, lse = residuals
    b, h, l_pad, d = qp.shape
    l = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    g, bq, nq = _qblock_plan(h, l, d)
    # Zero-padded cotangent rows make the padded q rows inert in dk/dv.
    dop = jnp.pad(do, ((0, 0), (0, l_pad - l), (0, 0)))
    grid = (b, h // g, nq)
    q_spec = pl.BlockSpec((1, g, bq, d), lambda i, j, r: (i, j, r, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, g, l, d), lambda i, j, r: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, bq, g * d), lambda i, j, r: (i, r, j),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_bloq, scale=scale, group=g,
                          head_dim=d, nq=nq),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, l_pad, d), do.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), do.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), do.dtype),
        ],
        grid=grid,
        in_specs=[
            q_spec, kv_spec, kv_spec, o_spec, o_spec,
            pl.BlockSpec((1, g, bq, 1), lambda i, j, r: (i, j, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[q_spec, kv_spec, kv_spec],
        scratch_shapes=[
            pltpu.VMEM((g, l, d), jnp.float32),
            pltpu.VMEM((g, l, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, k, v, out, dop, lse)
    return dq[:, :, :l], dk, dv


_flash_bloq.defvjp(_flash_bloq_fwd, _flash_bloq_bwd)


def flash_attention_blo(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention, heads-first in, MERGED-HEADS out:
    q/k/v (B, H, L, Dh) -> (B, L, H·Dh). Differentiable; works for EVERY
    (H, L, Dh) — shape support only selects which kernel runs:

    - ``blo_supported``: the merged-output kernel — the qkv projection
      einsum emits heads-first for free (``QKVProj heads_first=True``)
      and the output lands in the exact layout the output projection's
      (H·Dh, D) matmul contracts over, so neither the forward nor the
      backward touches an HBM transpose anywhere in the attention chain
      (round-4 fix for the round-3c finding that one residual transpose
      + its backward twin ate the kernel-level win; PERF.md).
    - otherwise (Dh=80 at L>384 — the 600M family multi-temporal, where
      no merged block width is 128-lane aligned): the heads-first kernel
      ``flash_attention_bhld`` plus ONE HBM transpose to the merged
      layout (its backward pays the twin transpose). Correct everywhere,
      and still faster than XLA at its dispatch shapes — round-5 v5e
      probes: 0.77x forward-only, 0.648x fwd+bwd at b=64/L=513
      (transposes included; PERF.md "Attention auto policy").
    """
    b, h, l, d = q.shape
    if _merged_grouping(h, l, d) is not None:
        return _flash_blo_merged(q, k, v, interpret)
    # NOT the q-blocked kernel (_flash_bloq): measured SLOWER than this
    # transpose fallback at every shape where both compile (L=513 b=64:
    # 10.1 vs 9.0 ms fwd+bwd, 5.7 vs 4.1 fwd; L=769/1025 fwd likewise —
    # benchmarks/probe_attention_qblock.py, PERF.md "Q-blocked merged
    # kernel: negative"). Small q-row blocks re-stream k/v DMA waits and
    # under-fill the MXU more than one HBM transpose pair costs.
    out = flash_attention_bhld(q, k, v, interpret)  # (B, H, L, Dh)
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _prep(x, b, h, l, d):
    """(B, L, H, D) -> (B·H, L, D). A transpose, no padding (docstring §1)."""
    return x.transpose(0, 2, 1, 3).reshape(b * h, l, d)


def _unprep(x, b, h, l, d):
    return x.reshape(b, h, l, d).transpose(0, 2, 1, 3)


def _flash_fwd_flat(qf, kf, vf, interpret):
    """Forward on the flat (B·H, L, D) layout."""
    bh, l, d = qf.shape
    scale = 1.0 / math.sqrt(d)
    g = _group_for(bh, l)
    grid = (bh // g,)
    block = pl.BlockSpec((g, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, group=g),
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, l, 1), jnp.float32),
        ],
        grid=grid,
        in_specs=[block, block, block],
        out_specs=[
            block,
            pl.BlockSpec((g, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out, lse


def _flash_bwd_flat(qf, kf, vf, out, lse, gf, interpret):
    """Backward on the flat (B·H, L, D) layout; grads in ``gf.dtype``."""
    bh, l, d = qf.shape
    scale = 1.0 / math.sqrt(d)
    grp = _group_for(bh, l)
    grid = (bh // grp,)
    block = pl.BlockSpec((grp, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    # Grads are written in the input dtype (bf16 in production): halving
    # the write+readback traffic of the old f32 outputs measured faster,
    # and the XLA einsum backward also produces bf16 grads there.
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, group=grp),
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, d), gf.dtype),
            jax.ShapeDtypeStruct((bh, l, d), gf.dtype),
            jax.ShapeDtypeStruct((bh, l, d), gf.dtype),
        ],
        grid=grid,
        in_specs=[
            block, block, block, block, block,
            pl.BlockSpec((grp, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[block, block, block],
        interpret=interpret,
    )(qf, kf, vf, out, gf, lse)


def _flash_fwd_impl(q, k, v, interpret):
    b, l, h, d = q.shape
    qp = _prep(q, b, h, l, d)
    kp = _prep(k, b, h, l, d)
    vp = _prep(v, b, h, l, d)
    out, lse = _flash_fwd_flat(qp, kp, vp, interpret)
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
    kernel above (round-3 addition — round 2's kernel was inference-only
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
    gp = _prep(g, b, h, l, d)
    dq, dk, dv = _flash_bwd_flat(qp, kp, vp, out, lse, gp, interpret)
    return (_unprep(dq, b, h, l, d), _unprep(dk, b, h, l, d),
            _unprep(dv, b, h, l, d))


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_bhld(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention on the heads-first layout:
    q/k/v (B, H, L, D) -> (B, H, L, D).

    The layout the kernel wants is exactly the qkv projection's einsum
    output layout (``models/prithvi.py QKVProj`` with ``heads_first``), so
    this entry involves ZERO HBM transposes — the (B, H, L, D) ->
    (B·H, L, D) flattening is a free view. The (B, L, H, D) entry above
    pays 4 transposes fwd + 4 bwd; at b=128 those were most of its gap to
    the XLA path (PERF.md "Flash kernel revisited")."""
    b, h, l, d = q.shape
    out, _ = _flash_fwd_flat(q.reshape(b * h, l, d), k.reshape(b * h, l, d),
                             v.reshape(b * h, l, d), interpret)
    return out.reshape(b, h, l, d)


def _flash_bhld_fwd(q, k, v, interpret):
    b, h, l, d = q.shape
    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    out, lse = _flash_fwd_flat(qf, kf, vf, interpret)
    return out.reshape(b, h, l, d), (qf, kf, vf, out, lse, (b, h, l, d))


def _flash_bhld_bwd(interpret, residuals, g):
    qf, kf, vf, out, lse, (b, h, l, d) = residuals
    gf = g.reshape(b * h, l, d)
    dq, dk, dv = _flash_bwd_flat(qf, kf, vf, out, lse, gf, interpret)
    shape = (b, h, l, d)
    return (dq.reshape(shape), dk.reshape(shape), dv.reshape(shape))


flash_attention_bhld.defvjp(_flash_bhld_fwd, _flash_bhld_bwd)


def attention_reference(q, k, v):
    """XLA reference path (same math, materialized attention)."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    attn = jnp.einsum("blhd,bmhd->bhlm", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", attn, v)
