"""Decoder dissection bench: where do the seg-head's milliseconds go?

PERF.md r2: the ConvTranspose decoder takes ~43% of fwd+bwd for ~14% of
the FLOPs (encoder-only fwd+bwd 98 ms vs full 171 ms at b=64). Before
writing a Pallas kernel, this bench isolates the decoder (input: the
(B, 14, 14, 768) token map) and A/Bs targeted ablations to attribute the
time: MXU lane underfill (≤48-channel convs) vs f32 BatchNorm traffic vs
dropout RNG vs XLA fusion breaks.

Variants (each timed fwd-only and fwd+bwd, train mode):
  current      exact UpscalingBlock stack (ConvT -> Dropout -> Conv -> BN(f32) -> ReLU)
  nodrop       dropout removed (isolates RNG mask generation cost)
  nobn         BN removed (isolates the f32 norm + stats reductions)
  bnbf16       BN computed in bf16 (isolates the f32 cast traffic)
  nchw         same math, NCHW dimension numbers (layout probe)
  head_only    everything after the 4 up-blocks (head dropout + 1x1 conv)

Run on the real TPU:  timeout 900 python benchmarks/bench_decoder.py [b]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax import lax

sys.path.insert(0, ".")

from instageo_tpu.models.seg import ConvTranspose2dTorch, UpscalingBlock, _conv_init
from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)

DIMS = (768, 384, 192, 96, 48)
NUM_CLASSES = 2


class DecoderVariant(nn.Module):
    variant: str = "current"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        use_bn = self.variant not in ("nobn",)
        bn_dtype = jnp.bfloat16 if self.variant == "bnbf16" else jnp.float32
        drop = 0.0 if self.variant == "nodrop" else 0.1
        for i in range(4):
            feats = DIMS[i + 1]
            x = ConvTranspose2dTorch(feats, dtype=self.dtype,
                                     name=f"convt_{i}")(x)
            x = nn.Dropout(drop, deterministic=not train)(x)
            x = nn.Conv(feats, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=_conv_init,
                        name=f"conv_{i}")(x)
            if use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=bn_dtype,
                                 name=f"bn_{i}")(x)
            x = nn.relu(x).astype(self.dtype)
        x = nn.Dropout(drop, deterministic=not train)(x)
        return nn.Conv(NUM_CLASSES, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="head")(x)


class DecoderNCHW(nn.Module):
    """Same math as `current` but every conv runs NCHW/OIHW."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        x = x.transpose(0, 3, 1, 2)  # NHWC -> NCHW once
        for i in range(4):
            cout = DIMS[i + 1]
            cin = x.shape[1]
            kt = self.param(f"convt_{i}_k", _conv_init, (3, 3, cin, cout),
                            jnp.float32)
            bt = self.param(f"convt_{i}_b", nn.initializers.zeros, (cout,),
                            jnp.float32)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kt.transpose(3, 2, 0, 1).astype(self.dtype),
                window_strides=(1, 1), padding=((1, 2), (1, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = y + bt.astype(self.dtype)[None, :, None, None]
            x = nn.Dropout(0.1, deterministic=not train)(x)
            kc = self.param(f"conv_{i}_k", _conv_init, (3, 3, cout, cout),
                            jnp.float32)
            bc = self.param(f"conv_{i}_b", nn.initializers.zeros, (cout,),
                            jnp.float32)
            y = lax.conv_general_dilated(
                x, kc.transpose(3, 2, 0, 1).astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = y + bc.astype(self.dtype)[None, :, None, None]
            # BN over (B, H, W) in f32, as the NHWC path does.
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(0, 2, 3), keepdims=True)
            var = xf.var(axis=(0, 2, 3), keepdims=True)
            scale = self.param(f"bn_{i}_s", nn.initializers.ones, (cout,),
                               jnp.float32)[None, :, None, None]
            bias = self.param(f"bn_{i}_bi", nn.initializers.zeros, (cout,),
                              jnp.float32)[None, :, None, None]
            x = nn.relu((xf - mean) * lax.rsqrt(var + 1e-5) * scale + bias
                        ).astype(self.dtype)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        kh = self.param("head_k", _conv_init, (1, 1, DIMS[4], NUM_CLASSES),
                        jnp.float32)
        y = lax.conv_general_dilated(
            x, kh.transpose(3, 2, 0, 1).astype(self.dtype),
            window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.transpose(0, 2, 3, 1)


def time_fn(fn, *args, iters=6):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def bench_variant(name, batch):
    base = name.split("+")[0]
    if base == "nchw":
        model = DecoderNCHW()
    else:
        model = DecoderVariant(variant=base)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 14, 14, 768)).astype(np.float32)).astype(jnp.bfloat16)
    variables = model.init({"params": rng}, x, train=False)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    # "rbg" variants use the TPU-native RngBitGenerator PRNG for the
    # dropout mask instead of software threefry (the `nodrop` ablation
    # showed mask generation dominates the decoder's cost).
    def _key():
        return (jax.random.key(0, impl="rbg") if name.endswith("+rbg")
                else jax.random.PRNGKey(0))

    @jax.jit
    def fwd(params, x, salt):
        out = model.apply({"params": params, **extra}, x + salt, train=True,
                          rngs={"dropout": _key()},
                          mutable=list(extra.keys()))[0]
        return out.astype(jnp.float32).sum()

    @jax.jit
    def fwdbwd(params, x, salt):
        def loss(p, x):
            out = model.apply({"params": p, **extra}, x + salt, train=True,
                              rngs={"dropout": _key()},
                              mutable=list(extra.keys()))[0]
            return (out.astype(jnp.float32) ** 2).mean()

        l, grads = jax.value_and_grad(loss)(params, x)
        return l + sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))

    salt = jnp.zeros((), jnp.bfloat16)
    r = {"fwd_ms": time_fn(fwd, params, x, salt),
         "fwdbwd_ms": time_fn(fwdbwd, params, x, salt)}
    try:
        r["fwdbwd_gflops"] = round(float(
            (fwdbwd.lower(params, x, salt).cost_analysis() or {}).get(
                "flops", 0)) / 1e9, 1)
    except Exception:
        pass
    return r


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2 else
                ["current", "nodrop", "nobn", "bnbf16", "nchw"])
    out = {"batch": batch, "device": str(jax.devices()[0].device_kind)}
    for v in variants:
        out[v] = bench_variant(v, batch)
        print(json.dumps({v: out[v]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
