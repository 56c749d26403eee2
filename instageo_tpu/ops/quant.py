"""Dynamic int8 (W8A8) matmuls for inference serving.

TPU v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (394 vs 197
TOPS), and the encoder's four dense families (qkv / attn-proj / mlp
fc1 / fc2) carry ~92% of the inference FLOPs. This module provides the
quantized form of those matmuls, opt-in via ``tpu.quant=int8``:

- **Weights**: symmetric per-output-channel int8 (scale = max|w|/127
  per column). Quantized inside the jitted forward — a single
  elementwise pass over each kernel, negligible next to the activation
  traffic at serving batch sizes; the params stay f32, so checkpoints,
  export, and the torch round-trip are untouched.
- **Activations**: dynamic symmetric per-token int8 along the
  contraction axis (scale = max|x|/127 per row) — no calibration pass,
  no quantization state to persist.
- **Accumulation**: int32 on the MXU (``preferred_element_type``),
  rescaled in f32 by the outer product of the two scale vectors, bias
  added in f32.

Inference-only: ``jnp.round`` has a zero gradient, so a quantized
training graph would silently train nothing — the trainer rejects
``tpu.quant != none`` at its training entry points
(``Trainer._reject_quant_training``; eval/infer/serving of a quantized
model go through the same Trainer unimpeded).

The reference has no quantized path (pure f32 torch —
``instageo/model/model.py``); this is a beyond-parity serving lever.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-8


def quantize_symmetric(x: jnp.ndarray, axis: int = -1
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization along ``axis``.

    Returns ``(q, scale)`` with ``q`` int8 in [-127, 127] and ``scale``
    f32 shaped like ``x`` with ``axis`` reduced to 1, such that
    ``q * scale ≈ x``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """``x @ kernel (+ bias)`` with dynamic W8A8 int8 quantization.

    ``x`` is ``(..., D)``, ``kernel`` ``(D, N)`` (f32 params); the
    contraction runs int8×int8→int32 on the MXU and the result is
    rescaled to ``dtype``.
    """
    xq, xs = quantize_symmetric(x, axis=-1)           # (..., D), (..., 1)
    wq, ws = quantize_symmetric(kernel, axis=0)       # (D, N), (1, N)
    acc = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * ws           # broadcast rescale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with a dynamic-int8 forward.

    The param tree (``kernel`` (D, N) / ``bias`` (N,), f32, same
    initializers) is identical to ``nn.Dense(features, use_bias=True,
    param_dtype=f32)`` — a checkpoint trained with the plain layer loads
    into the quantized one unchanged, and vice versa.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return int8_matmul(x, kernel, bias, self.dtype)
