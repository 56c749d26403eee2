"""Prithvi segmentation/regression model (encoder + upscaling decoder).

TPU-native re-implementation of the reference ``PrithviSeg``
(``instageo/model/model.py:292-419``): the Prithvi ViT encoder followed by
four upscaling blocks (transposed conv ×2 → dropout → conv → batch norm →
ReLU) that halve the channel count per stage, and a final 1×1 conv to the
class logits. Regression is the same network with ``num_classes=1``.

Design notes (TPU-first):
* all convolutions run channels-last (NHWC) — the preferred TPU layout —
  with a single NCHW transpose at the public API boundary for reference
  parity;
* the transposed conv is expressed as ``lax.conv_general_dilated`` with
  input dilation, which XLA lowers to an MXU matmul over the upsampled
  grid; torch ``ConvTranspose2d(k=3, s=2, p=1, output_padding=1)``
  semantics are reproduced exactly (verified against torch in tests);
* batch-norm statistics are computed over the *global* batch under pjit —
  with a data-sharded batch, XLA inserts the cross-replica reductions
  automatically, fixing the reference's per-device-BN blind spot
  (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from instageo_tpu.models.prithvi import PrithviViT
from instageo_tpu.models.registry import (
    PRITHVI_ARCHS,
    SEG_HEAD_KERNEL_SIZES,
    get_arch,
)

# torch's default conv init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch ConvTranspose2d computes fan_in from weight.size(1) — its OUT
# channel dim (weights are (in, out, kh, kw)) — so the matching flax mode
# for our HWIO kernels is fan_OUT (= k*k*out).
_convt_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_out", "uniform")


def _torch_bias_init(fan_in: int):
    """torch conv/convT bias init: U(±1/sqrt(fan_in)) (not flax's zeros)."""
    bound = 1.0 / (float(fan_in) ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TPUDropout(nn.Module):
    """Dropout with a fused TPU kernel path (ops/dropout.py).

    ``impl=pallas`` generates the mask with the core-local PRNG inside
    one VMEM pass (ops/dropout.py). MEASURED SLOWER in the full train
    step (517.8 vs 373.8 ms at b=128 — PERF.md round 3): the pallas_call
    is a fusion barrier, so the ConvT output and the mask round-trip HBM
    that XLA's fused rbg dropout never touches. Default is therefore the
    XLA path with rbg keys (tpu.rng_impl); the kernel stays for
    kernel-level use and future fused-stage work. Same semantics either
    way: drop rate ``p``, kept values scaled by 1/(1-p).

    ``impl=bits8``/``bits16`` thresholds RAW generator words instead of
    the bernoulli f32-uniform compare: one uint32 word is bitcast into
    4 (resp. 2) lanes, so the PRNG generates 4x (2x) fewer bits per mask
    — mask generation is ~12 ms of the 282 ms b=128 train step even on
    the rbg generator (PERF.md trace). The keep probability quantizes to
    the nearest 1/256 (bits8: 0.9 -> 0.8984) or 1/65536 (bits16:
    0.9 -> 0.899994); kept values are rescaled by the QUANTIZED keep
    probability, so the expectation stays exactly unbiased.

    ``impl``: xla (default) | bits16 | bits8 | pallas.
    """

    rate: float
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            # nn.Dropout semantics: rate 1 zeroes everything (the scaled
            # paths below would divide by a zero keep probability).
            return jnp.zeros_like(x)
        if self.impl in ("bits8", "bits16"):
            lanes, udtype = ((4, jnp.uint8) if self.impl == "bits8"
                             else (2, jnp.uint16))
            if x.size % lanes == 0:
                levels = 1 << (8 * (4 // lanes))
                # Clamp into [1, levels-1]: q == levels would wrap the
                # uint threshold to 0 and drop everything (rate 1/512 at
                # bits8 would otherwise round keep to 256/256), and q == 0
                # (rate > 1 - 0.5/levels) would put 0/0 = NaN into the
                # backward pass of the where-over-division.
                q = min(max(round((1.0 - self.rate) * levels), 1),
                        levels - 1)
                keep_q = q / levels
                key = self.make_rng("dropout")
                words = jax.random.bits(key, (x.size // lanes,), jnp.uint32)
                bits = jax.lax.bitcast_convert_type(
                    words, udtype).reshape(x.shape)
                mask = bits < udtype(q)  # P(keep) = q / levels
                return jnp.where(mask, x / jnp.asarray(keep_q, x.dtype),
                                 jnp.zeros((), x.dtype))
            return nn.Dropout(self.rate, deterministic=False)(x)
        from instageo_tpu.ops.dropout import (fused_dropout,
                                              supports_fused_dropout)

        if self.impl != "pallas" or not supports_fused_dropout(x):
            return nn.Dropout(self.rate, deterministic=False)(x)
        key = self.make_rng("dropout")
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(key, (), jnp.uint32), jnp.int32)
        return fused_dropout(x, seed, float(self.rate))


class ConvTranspose2dTorch(nn.Module):
    """2D transposed conv with torch ``ConvTranspose2d`` semantics (NHWC).

    Implemented as a correlation over the input-dilated signal:
    ``out = (in - 1)·stride - 2·padding + kernel + output_padding``.
    The kernel parameter is stored in HWIO correlation layout; the torch
    checkpoint converter flips/permutes torch's (I, O, kh, kw) weights into
    this layout (see models/checkpoint.py).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", _convt_init, (k, k, in_features, self.features),
            jnp.float32
        )
        bias = self.param("bias", _torch_bias_init(k * k * self.features),
                          (self.features,), jnp.float32)
        pad = (k - 1 - p, k - 1 - p + op)
        # No preferred_element_type here: a widened output dtype breaks the
        # conv gradient under bf16 training (mixed-dtype backward conv); the
        # MXU accumulates bf16 convs in f32 internally regardless.
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y + bias).astype(self.dtype)


class UpscalingBlock(nn.Module):
    """One decoder stage: ConvT(×2) → Dropout → Conv(k, p=1) → BN → ReLU.

    Matches reference ``upscaling_block`` (model.py:349-378) including the
    fixed padding=1 (so k=5/7 shrink the map, as in Prithvi-600 variants).
    """

    features: int
    conv_kernel: int = 3
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    dropout_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvTranspose2dTorch(self.features, dtype=self.dtype, name="convt")(x)
        x = TPUDropout(self.dropout_rate, impl=self.dropout_impl)(
            x, deterministic=not train)
        x = nn.Conv(
            self.features,
            (self.conv_kernel, self.conv_kernel),
            padding=1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_conv_init,
            bias_init=_torch_bias_init(
                self.conv_kernel * self.conv_kernel * self.features),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


class PrithviSeg(nn.Module):
    """Segmentation head over the Prithvi encoder (reference model.py:292-419).

    ``__call__`` takes ``(B, C, T, H, W)`` imagery and returns logits
    ``(B, num_classes, H_out, W_out)``. For kernel sizes 3 the output matches
    the input resolution; Prithvi-600's (5,5,5,7) kernels shrink it exactly
    as the reference does.
    """

    variant: str = "prithvi_eo_v1_100"
    num_classes: int = 2
    temporal_step: int = 1
    image_size: int = 224
    in_chans: int = 6
    depth: int = -1
    embed_dims: Optional[Tuple[int, ...]] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    # Test-only: run pallas attention kernels in interpret mode so the
    # pallas branch is exercisable on the CPU mesh (models/prithvi.py
    # Attention.attn_interpret).
    attn_interpret: bool = False
    remat: bool = False
    gelu: str = "exact"
    dropout_impl: str = "xla"
    # Dynamic int8 (W8A8) encoder matmuls (tpu.quant, ops/quant.py):
    # inference-only serving knob; the decoder head stays bf16 (its convs
    # are lane-bound, not MXU-rate-bound — PERF.md "Fast segmentation
    # head"). Param tree is unchanged, so checkpoints are interchangeable
    # between the quantized and plain forms.
    quant: str = "none"
    # Decoder-head implementation (model.head_impl):
    #   "torch" — the reference's 4-stage halving head (above), exact
    #             torch parity incl. checkpoint layout (default);
    #   "fast"  — TPU lane-filling head: 3 upscaling stages with a
    #             128-channel floor (the torch head's ≤96-channel stages
    #             pad to the MXU's 128 lanes at ~29% MFU — PERF.md
    #             "Ceiling analysis"), 1×1 classifier at half
    #             resolution, bilinear resize of the LOGITS to the input
    #             resolution. Legal because the reference re-initializes
    #             the head from scratch per task (model.py:292-419);
    #             opt-in because its params don't map onto torch
    #             checkpoints (scopes are fast_* so a cross-impl resume
    #             fails loudly instead of silently mismatching).
    head_impl: str = "torch"
    # Tensor-parallel mesh (clone(tp_mesh=...) when tpu.tp>1): activates
    # the attention sharding constraints in models/prithvi.py.
    tp_mesh: Optional[Any] = None
    # Transformer-block param layout: loop (default, torch-checkpoint
    # layout) | scan (stacked params, lax.scan over layers) | pipeline
    # (stacked + GPipe over the ``pipe`` axis of pp_mesh — parallel/pp.py;
    # degrades to scan without a mesh). See models/prithvi.py.
    block_layout: str = "loop"
    pp_mesh: Optional[Any] = None
    pp_microbatches: int = 4
    # Megatron sequence parallelism (tpu.sp, needs tp>1): token-shard the
    # inter-block residual stream over the model axis (prithvi.py Block.sp).
    sp: bool = False

    def setup(self) -> None:
        arch = get_arch(
            self.variant,
            in_chans=self.in_chans,
            num_frames=self.temporal_step,
            img_size=self.image_size,
            depth=self.depth,
        )
        self.arch = arch
        self.prithvi_encoder = PrithviViT(
            img_size=arch.img_size,
            patch_size=tuple(arch.patch_size),
            num_frames=arch.num_frames,
            in_chans=arch.in_chans,
            embed_dim=arch.embed_dim,
            depth=arch.depth,
            num_heads=arch.num_heads,
            mlp_ratio=arch.mlp_ratio,
            coords_encoding=tuple(arch.coords_encoding),
            coords_scale_learn=arch.coords_scale_learn,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            attn_interpret=self.attn_interpret,
            remat=self.remat,
            gelu=self.gelu,
            quant=self.quant,
            tp_mesh=self.tp_mesh,
            block_layout=self.block_layout,
            pp_mesh=self.pp_mesh,
            pp_microbatches=self.pp_microbatches,
            sp=self.sp,
        )
        if self.embed_dims is not None:
            dims = tuple(self.embed_dims)
        else:
            # embed_dims[i] = D·T / 2^i (reference model.py:380-383).
            dims = tuple(
                (arch.embed_dim * self.temporal_step) // (2**i) for i in range(5)
            )
        self._head_dims = dims
        if self.head_impl == "fast":
            base = dims[0]
            fdims = [base] + [max(base // (2 ** (i + 1)), 128)
                              for i in range(3)]
            self._fast_dims = tuple(fdims)
            self.up_blocks = [
                UpscalingBlock(
                    fdims[i + 1], conv_kernel=3, dtype=self.dtype,
                    dropout_impl=self.dropout_impl, name=f"fast_up_{i}"
                )
                for i in range(3)
            ]
            head_in = fdims[3]
            head_name = "fast_head_conv"
        elif self.head_impl == "torch":
            kernels = SEG_HEAD_KERNEL_SIZES[self.variant]
            self.up_blocks = [
                UpscalingBlock(
                    dims[i + 1], conv_kernel=kernels[i], dtype=self.dtype,
                    dropout_impl=self.dropout_impl, name=f"up_{i}"
                )
                for i in range(4)
            ]
            head_in = dims[4]
            head_name = "head_conv"
        else:
            raise ValueError(
                f"head_impl={self.head_impl!r} — expected torch | fast")
        self.head_dropout = TPUDropout(0.1, impl=self.dropout_impl)
        self.head_conv = nn.Conv(
            self.num_classes,
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_conv_init,
            bias_init=_torch_bias_init(head_in),  # 1x1 conv: fan_in = C_in
            name=head_name,
        )

    def __call__(
        self,
        img: jnp.ndarray,
        train: bool = False,
        return_features: bool = False,
        temporal_coords: Optional[jnp.ndarray] = None,
        location_coords: Optional[jnp.ndarray] = None,
        channels_last: bool = False,
    ) -> Any:
        tokens = self.prithvi_encoder(
            img, temporal_coords=temporal_coords,
            location_coords=location_coords, deterministic=not train,
        )
        feats = tokens[:, 1:, :]  # drop cls token
        b, l, d = feats.shape
        t = self.temporal_step
        side = int((l // t) ** 0.5)
        # Token order is (t, h, w); the reference reshape (model.py:406-413)
        # produces NCHW channels ordered d-major, t-minor (c = d·T + t). In
        # NHWC: (B, T, s, s, D) -> (B, s, s, D, T) -> (B, s, s, D·T).
        x = feats.reshape(b, t, side, side, d)
        x = x.transpose(0, 2, 3, 4, 1).reshape(b, side, side, d * t)
        x = x.astype(self.dtype)

        feature_map = x
        for block in self.up_blocks:
            x = block(x, train=train)
        x = self.head_dropout(x, deterministic=not train)
        logits = self.head_conv(x)
        if self.head_impl == "fast":
            # Classifier ran at half resolution; bilinear-resize the
            # C-channel LOGITS (cheap — num_classes channels) to the
            # input resolution. f32 before the resize: bf16 logit
            # interpolation costs measurable mIoU near decision borders.
            h_out, w_out = img.shape[-2:]
            logits = jax.image.resize(
                logits.astype(jnp.float32),
                (logits.shape[0], h_out, w_out, logits.shape[-1]),
                method="bilinear")

        if channels_last:
            # Serving-side option: return NHWC logits directly (consumers
            # use axis=-1). The trace bills the NCHW transpose ~10 ms at
            # b=512 but XLA overlaps it — end-to-end A/B was flat
            # (PERF.md); kept because serving consumers don't need NCHW.
            if return_features:
                return logits.astype(jnp.float32), feature_map.astype(jnp.float32)
            return logits.astype(jnp.float32)
        logits = logits.astype(jnp.float32).transpose(0, 3, 1, 2)  # NHWC -> NCHW
        if return_features:
            features_nchw = feature_map.astype(jnp.float32).transpose(0, 3, 1, 2)
            return logits, features_nchw
        return logits


def create_prithvi_seg(
    variant: str = "prithvi_eo_v1_100",
    *,
    num_classes: int = 2,
    temporal_step: int = 1,
    image_size: int = 224,
    num_bands: int = 6,
    depth: int = -1,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    attn_interpret: bool = False,
    remat: bool = False,
    gelu: str = "exact",
    dropout_impl: str = "xla",
    head_impl: str = "torch",
    quant: str = "none",
    tp_mesh: Optional[Any] = None,
    block_layout: str = "loop",
    pp_mesh: Optional[Any] = None,
    pp_microbatches: int = 4,
    sp: bool = False,
) -> PrithviSeg:
    """Factory mirroring the reference ``PrithviSeg(...)`` constructor surface."""
    if variant not in PRITHVI_ARCHS:
        raise KeyError(f"Unknown variant {variant!r}")
    return PrithviSeg(
        variant=variant,
        num_classes=num_classes,
        temporal_step=temporal_step,
        image_size=image_size,
        in_chans=num_bands,
        depth=depth,
        dtype=dtype,
        attn_impl=attn_impl,
        attn_interpret=attn_interpret,
        remat=remat,
        gelu=gelu,
        dropout_impl=dropout_impl,
        head_impl=head_impl,
        quant=quant,
        tp_mesh=tp_mesh,
        block_layout=block_layout,
        pp_mesh=pp_mesh,
        pp_microbatches=pp_microbatches,
        sp=sp,
    )
