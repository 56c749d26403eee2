"""Real-TPU smoke: fused uint16 serving path x pallas forward at T=3.

The round-5 auto policy sends deterministic forwards at L>=512 to the
pallas kernel (0.73x XLA at serving batches, PERF.md "Attention auto
policy"), which means multi-temporal chip inference through
``make_fused_predict_fn`` (ops/preprocess.py — uint16 decode/normalize
/forward in ONE jitted program) now composes with the flash kernel.
This smoke runs that exact composition on hardware for Prithvi-100M
T=3 (L=589) and checks the predictions against the XLA-attention
forward on the same params.
"""

import time

import jax
import numpy as np

from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)


def main():
    import jax.numpy as jnp

    from instageo_tpu.models.seg import create_prithvi_seg
    from instageo_tpu.ops.preprocess import make_fused_predict_fn

    rng = np.random.default_rng(0)
    raw = rng.integers(1, 10000, size=(32, 18, 224, 224)).astype(np.uint16)
    mean = [5000.0] * 6   # per-band, applied per timestep
    std = [3000.0] * 6

    preds = {}
    for impl in ("auto", "xla"):
        model = create_prithvi_seg(
            "prithvi_eo_v1_100", num_classes=2, temporal_step=3,
            image_size=224, num_bands=6, dtype=jnp.bfloat16, attn_impl=impl)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 6, 3, 224, 224), jnp.float32))
        predict = make_fused_predict_fn(model, variables, mean=mean,
                                        std=std, temporal_size=3)
        t0 = time.perf_counter()
        out = np.asarray(predict(raw))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(predict(raw))
        steady_s = time.perf_counter() - t0
        preds[impl] = out
        print(f"{impl}: preds {out.shape} {out.dtype}, "
              f"compile+first {compile_s:.1f}s, steady {steady_s*1e3:.0f}ms",
              flush=True)

    agree = float((preds["auto"] == preds["xla"]).mean())
    print(f"argmax agreement auto-vs-xla: {agree:.4f}", flush=True)
    assert agree > 0.99, agree  # bf16 attention reorder flips only ties
    print("OK", flush=True)


if __name__ == "__main__":
    main()
