"""Fused TPU dropout: in-kernel PRNG + mask apply in one VMEM pass.

The seg-head decoder applies dropout to five full-resolution activations
(~443M elements per b=64 step). Stock ``nn.Dropout`` lowers to a
random-bits op whose output round-trips HBM before the compare/select;
the decoder dissection (PERF.md round 3) measured that pipeline at ~40 ms
of the decoder's ~82 ms relay-free fwd+bwd cost under threefry and
~16 ms under the rbg PRNG. This kernel generates the bits with the
core-local PRNG (``pltpu.prng_seed``/``prng_random_bits``) and applies
the mask in the same VMEM tile — the bits never touch HBM. The keep mask
is emitted as a bool residual so the backward is one pure-XLA
``where(mask, g/keep_prob, 0)`` with no recompute.

Numerics: drop probability is ``round(p·2^32)/2^32`` (exact to 2^-32);
kept values scale by ``1/(1-p)`` like torch/flax. The stream is the
TPU PRNG's — dropout streams never matched torch bit-for-bit anyway
(convergence parity is metric-level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512          # flattened minor dim (multiple of the 128-lane VPU)
ROWS_PER_BLOCK = 2048


def _dropout_kernel(seed_ref, x_ref, out_ref, mask_ref, *, threshold, scale):
    # Per-block seed: blocks cover disjoint elements, so per-block streams
    # compose into one deterministic global mask for a given seed.
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    _mask_and_scale(bits, x_ref, out_ref, mask_ref, threshold, scale)


def _dropout_kernel_interpret(seed_ref, x_ref, out_ref, mask_ref, *,
                              threshold, scale):
    # Interpreter twin for off-TPU tests: pltpu.prng_* has no CPU lowering,
    # so derive the block's bits from jax.random instead (different stream,
    # same semantics — tests assert statistical/structural properties).
    key = jax.random.fold_in(jax.random.PRNGKey(seed_ref[0]),
                             pl.program_id(0))
    bits = jax.random.bits(key, x_ref.shape, jnp.uint32)
    _mask_and_scale(bits, x_ref, out_ref, mask_ref, threshold, scale)


def _mask_and_scale(bits, x_ref, out_ref, mask_ref, threshold, scale):
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    out_ref[:] = jnp.where(
        keep, x_ref[:].astype(jnp.float32) * scale, 0.0).astype(out_ref.dtype)
    mask_ref[:] = keep


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float
                  ) -> jnp.ndarray:
    """Dropout(x) with TPU-kernel mask generation. ``seed``: int32 scalar."""
    out, _ = _fused_dropout_fwd_impl(x, seed, rate)
    return out


def _fused_dropout_fwd_impl(x, seed, rate):
    if not 0.0 <= rate < 1.0:
        # rate == 1 would divide the scale by zero, and a rate rounding
        # to 2^32 would overflow the uint32 threshold below; callers
        # (TPUDropout) handle the rate>=1 zero-output case themselves.
        raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
    orig_shape = x.shape
    m = x.size // LANES
    x2 = x.reshape(m, LANES)
    rows = min(ROWS_PER_BLOCK, m)
    threshold = min(int(round(rate * (1 << 32))), (1 << 32) - 1)
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _dropout_kernel_interpret if interpret else _dropout_kernel,
        threshold=threshold, scale=1.0 / (1.0 - rate))
    out, mask = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, rows),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, LANES), x.dtype),
            jax.ShapeDtypeStruct((m, LANES), jnp.bool_),
        ],
        # Kernel-path tests run off-TPU via the Pallas interpreter.
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x2)
    return out.reshape(orig_shape), mask


def _fused_dropout_fwd(x, seed, rate):
    out, mask = _fused_dropout_fwd_impl(x, seed, rate)
    return out, mask


def _fused_dropout_bwd(rate, mask, g):
    shape, dtype = g.shape, g.dtype  # out mirrors x exactly
    g2 = g.reshape(mask.shape).astype(jnp.float32)
    gx = jnp.where(mask, g2 * (1.0 / (1.0 - rate)), 0.0)
    return gx.reshape(shape).astype(dtype), None


fused_dropout.defvjp(_fused_dropout_fwd, _fused_dropout_bwd)


def supports_fused_dropout(x: jnp.ndarray) -> bool:
    """The kernel path applies on TPU backends for 512-divisible sizes."""
    return (jax.default_backend() == "tpu" and x.size % LANES == 0
            and x.size // LANES >= 8)
