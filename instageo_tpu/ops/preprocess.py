"""Fused device-side input preprocessing.

The reference normalizes every chip on the host in float32 before transfer
(``instageo/model/dataloader.py:495-524``); at >5k chips/s that costs more
host CPU than the decode itself and doubles the transfer size (f32 vs
uint16). This op moves the work onto the accelerator: chips cross the PCIe
boundary raw (uint16/int16), and one fused XLA kernel does band select →
constant multiply → per-band normalize → (C, T, H, W) layout → compute
dtype, fusing straight into the model's patch-embed matmul.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("temporal_size", "bands", "constant_multiplier",
                     "out_dtype", "img_size"),
)
def preprocess_chips(
    raw: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    temporal_size: int = 1,
    bands: Optional[Sequence[int]] = None,
    constant_multiplier: float = 1.0,
    out_dtype: jnp.dtype = jnp.float32,
    img_size: Optional[int] = None,
) -> jnp.ndarray:
    """(B, T·C_raw, H, W) raw ints -> normalized (B, C, T, H, W).

    ``mean``/``std`` are per-band (C,) arrays; band selection indexes the
    flattened T·C axis like the reference's ``bands`` config. When chips on
    disk are larger than the model input (e.g. chip_size=256 vs
    img_size=224 — the reference crops in the loader,
    dataloader.py:58-77), ``img_size`` center-crops deterministically.
    """
    x = raw
    if bands is not None:
        x = x[:, list(bands)]
    if img_size is not None and (x.shape[-2] != img_size
                                 or x.shape[-1] != img_size):
        if x.shape[-2] < img_size or x.shape[-1] < img_size:
            raise ValueError(
                f"chips {x.shape[-2]}x{x.shape[-1]} smaller than "
                f"img_size {img_size}")
        off_h = (x.shape[-2] - img_size) // 2
        off_w = (x.shape[-1] - img_size) // 2
        x = x[..., off_h:off_h + img_size, off_w:off_w + img_size]
    b, tc, h, w = x.shape
    c = tc // temporal_size
    x = x.astype(jnp.float32) * constant_multiplier
    x = x.reshape(b, temporal_size, c, h, w)
    x = (x - mean[None, None, :, None, None]) / std[None, None, :, None, None]
    return x.transpose(0, 2, 1, 3, 4).astype(out_dtype)


def make_fused_predict_fn(model, variables, mean, std, *,
                          temporal_size: int = 1,
                          bands: Optional[Sequence[int]] = None,
                          constant_multiplier: float = 1.0,
                          is_reg_task: bool = False,
                          img_size: Optional[int] = None):
    """One jitted call: raw uint16 chips -> predictions.

    Preprocess + forward + argmax fuse into a single XLA program, so the
    normalize never materializes in HBM as a separate pass.

    ``variables`` are passed to the jitted function as ARGUMENTS, not
    captured in the closure: closed-over arrays become jaxpr constants
    embedded in the program, which bloats the executable by the full
    parameter size (~400 MB for Prithvi-100M) and — on remote-compile
    backends like the axon relay — overflows the compile-request body
    (HTTP 413, round-5 hardware finding). As args they ship once as
    device buffers.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    bands_t = tuple(bands) if bands is not None else None

    @jax.jit
    def _predict(variables, raw):
        x = preprocess_chips(raw, mean, std, temporal_size=temporal_size,
                             bands=bands_t,
                             constant_multiplier=constant_multiplier,
                             img_size=img_size)
        # channels_last: NHWC logits (no NCHW transpose; end-to-end
        # neutral, see models/seg.py); class dim at axis=-1.
        logits = model.apply(variables, x, train=False, channels_last=True)
        if is_reg_task:
            return logits[..., 0].astype(jnp.float32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    def predict(raw):
        return _predict(variables, raw)

    # Exposed for the CI pin that params stay ARGUMENTS of the jitted
    # program (tests/serve_tests/test_fused_predict_consts.py).
    predict._jitted = _predict
    predict._variables = variables
    return predict
