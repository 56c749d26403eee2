"""Benchmark suite: one JSON line per metric.

Covers the perf-relevant paths beyond the headline number in bench.py:
training step throughput, eval throughput, attention kernel A/B, device
chip-math throughput, and native decode throughput.

    python benchmarks/bench_suite.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync_chips_per_sec(fn, n_chips: int, iters: int) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return n_chips * iters / (time.perf_counter() - t0)


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def bench_train_step(quick: bool) -> None:
    import jax
    import jax.numpy as jnp

    from instageo_tpu.configs.config import load_config
    from instageo_tpu.parallel.mesh import make_mesh
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    on_tpu = jax.devices()[0].platform == "tpu"
    batch = 32 if on_tpu else 8
    size = 224 if on_tpu else 32
    name = "prithvi_eo_v1_100" if on_tpu else "prithvi_eo_tiny"
    cfg = load_config("config", overrides={
        "dataloader.img_size": size,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": name,
        "model.load_pretrained_weights": False,
        "train.batch_size": batch, "train.ignore_index": -1,
    })
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 6, 1, size, size)).astype(np.float32)
    y = rng.integers(0, 2, size=(batch, size, size)).astype(np.int32)
    iters = 3 if quick else 8

    # Device-resident stepping: the input pipeline overlaps transfer in real
    # training; here we measure the step itself.
    from instageo_tpu.train.trainer import EpochMetrics

    xd, yd = trainer._shard(x, y)
    metrics = EpochMetrics.empty(2)
    state = trainer.state
    state, metrics = trainer._train_step(state, xd, yd, jax.random.PRNGKey(0),
                                         metrics)  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = trainer._train_step(state, xd, yd,
                                             jax.random.PRNGKey(i), metrics)
    float(jax.device_get(metrics.loss_sum))  # hard sync
    v = batch * iters / (time.perf_counter() - t0)
    emit("prithvi_train_step_throughput", v,
         f"chips/sec ({name}, bf16, b={batch}, device-resident)")


def bench_attention(quick: bool) -> None:
    import jax
    import jax.numpy as jnp

    from instageo_tpu.ops.attention import attention_reference, flash_attention

    if jax.devices()[0].platform != "tpu":
        return
    rng = np.random.default_rng(0)
    shape = (32, 197, 12, 64)
    q = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    iters = 3 if quick else 10
    for name, fn in (("pallas", jax.jit(lambda a, b, c: flash_attention(a, b, c))),
                     ("xla", jax.jit(attention_reference))):
        def run(fn=fn):
            float(fn(q, k, v).astype(jnp.float32).sum())

        run()
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        emit(f"attention_{name}", (time.perf_counter() - t0) / iters * 1e3,
             "ms/call (b32 l197 h12 d64)")


def bench_chip_ops(quick: bool) -> None:
    import jax.numpy as jnp

    from instageo_tpu.ops.chip_ops import process_tile_chips

    import jax

    rng = np.random.default_rng(0)
    side = 1830 if quick else 3660  # quick mode quarters the HBM transfer
    # Pre-place the tile in HBM: it is loaded once and chipped many times
    # in the real pipeline; jnp.asarray inside the op is then a no-op.
    tile = jax.device_put(
        rng.integers(1, 10000, size=(18, side, side)).astype(np.uint16))
    masks = jax.device_put(
        rng.integers(0, 64, size=(3, side, side)).astype(np.int32))
    n_chips = (side // 256) ** 2
    xs, ys = np.meshgrid(np.arange(side // 256), np.arange(side // 256))
    coords = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)
    pts = rng.integers(0, side - 76, size=(512, 2))
    labels = rng.integers(0, 2, 512).astype(np.float32)
    owner = rng.integers(0, n_chips, 512)

    def run():
        process_tile_chips(tile, masks, coords, pts, labels, owner,
                           chip_size=256, no_data_value=0,
                           mask_types=["cloud"], masking_strategy="any",
                           window_size=1)

    iters = 1 if quick else 3
    v = _sync_chips_per_sec(run, n_chips, iters)
    emit("chip_math_throughput", v, f"chips/sec (HLS tile {side}^2, 18 bands)")


def bench_native_decode(quick: bool) -> None:
    import tempfile

    from instageo_tpu import native
    from instageo_tpu.data.geotiff import write_geotiff

    if not native.available():
        return
    rng = np.random.default_rng(0)
    n = 16 if quick else 64
    paths = []
    for i in range(n):
        arr = rng.integers(0, 10000, (6, 224, 224)).astype(np.uint16)
        p = tempfile.mktemp(suffix=".tif")
        write_geotiff(p, arr, compress="deflate")
        paths.append(p)
    native.read_batch_native(paths, (6, 224, 224), np.uint16)  # warm cache
    t0 = time.perf_counter()
    native.read_batch_native(paths, (6, 224, 224), np.uint16)
    emit("native_decode_throughput", n / (time.perf_counter() - t0),
         "chips/sec (6-band 224^2 deflate)")


def bench_host_ingest(quick: bool) -> None:
    """End-to-end host ingestion: files → decoded chips → augmented,
    normalized, collated training batches (VERDICT r3 #8).

    This is the REAL trained-from-files input path — the same
    InstaGeoDataset → process_and_augment → threaded prefetch loader
    that mode=train builds (run.py) — timed over a full pass on disk
    chips, so it includes GeoTIFF decode (native C++ when built), band
    rules, augmentation, normalization, and batch collation. The emitted
    extras put the number against the two device cadences that matter:

    * training: the measured v5e-1 train step consumes 599.9 chips/s at
      b=128/k=8 (PERF.md round 4) — `cores_to_saturate_train` is how
      many of THESE host cores keep one chip fed;
    * serving: the 5k chips/s BASELINE.json target (v5e-8)
      → `cores_to_saturate_serve`.

    Host-only by design: the chip→HBM transfer is measured separately
    (bench.py feeds device-resident batches; on this relay-attached box
    transfer is link-bound and would only measure the tunnel,
    CLAUDE.md). Linear core scaling is assumed when extrapolating —
    decode/augment are embarrassingly parallel across chips.
    """
    import shutil
    import tempfile

    import pandas as pd

    from instageo_tpu.configs.config import load_config
    from instageo_tpu.data.dataloader import create_dataloader
    from instageo_tpu.train.run import _make_dataset, _train_preprocess

    TRAIN_CADENCE = 599.9   # chips/s, v5e-1 b=128 k=8 (PERF.md round 4)
    SERVE_TARGET = 5000.0   # chips/s, BASELINE.json v5e-8 target

    n = 64 if quick else 256
    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        rng = np.random.default_rng(0)
        rows = []
        for i in range(n):
            arr = rng.integers(1, 10000, size=(6, 224, 224)).astype(np.uint16)
            lab = rng.integers(0, 2, size=(1, 224, 224)).astype(np.int16)
            from instageo_tpu.data.geotiff import write_geotiff

            write_geotiff(os.path.join(root, f"chip_{i}.tif"), arr,
                          compress="deflate", nodata=0)
            write_geotiff(os.path.join(root, f"seg_{i}.tif"), lab,
                          compress="deflate", nodata=-1)
            rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_{i}.tif"})
        csv = os.path.join(root, "train.csv")
        pd.DataFrame(rows).to_csv(csv, index=False)

        cfg = load_config("config", overrides={
            "root_dir": root,
            "dataloader.img_size": 224,
            "dataloader.bands": [0, 1, 2, 3, 4, 5],
            "dataloader.mean": [5000.0] * 6, "dataloader.std": [3000.0] * 6,
            "dataloader.no_data_value": 0,
            "train.ignore_index": -1,
        })
        ds = _make_dataset(csv, cfg, _train_preprocess(cfg))
        loader = create_dataloader(ds, batch_size=32, shuffle=True,
                                   num_workers=1)

        def one_pass() -> int:
            seen = 0
            for x, _y in loader:
                seen += int(np.asarray(x).shape[0])
            return seen

        one_pass()  # warm: decoder dylib load, cv2 init, page cache
        t0 = time.perf_counter()
        seen = one_pass()
        v = seen / (time.perf_counter() - t0)
        ncores = os.cpu_count() or 1
        emit("host_ingest_throughput", v,
             "chips/sec (files->decode->augment->collate, train path)",
             per_core=round(v / max(1, ncores), 2) if ncores > 1 else round(v, 2),
             cores_to_saturate_train=round(TRAIN_CADENCE / v, 2),
             cores_to_saturate_serve=round(SERVE_TARGET / v, 2),
             host_cores=ncores, n_chips=seen)

        # Epoch>=2 path with the decoded-chip cache (dataloader.cache_dir):
        # warm pass populates the .npy entries, timed pass reads them —
        # the steady-state multi-epoch training ingest rate.
        cfg2 = load_config("config", overrides={
            "root_dir": root,
            "dataloader.img_size": 224,
            "dataloader.bands": [0, 1, 2, 3, 4, 5],
            "dataloader.mean": [5000.0] * 6, "dataloader.std": [3000.0] * 6,
            "dataloader.no_data_value": 0,
            "dataloader.cache_dir": os.path.join(root, "_chip_cache"),
            "train.ignore_index": -1,
        })
        ds2 = _make_dataset(csv, cfg2, _train_preprocess(cfg2))
        loader = create_dataloader(ds2, batch_size=32, shuffle=True,
                                   num_workers=1)

        def one_pass2() -> int:
            seen = 0
            for x, _y in loader:
                seen += int(np.asarray(x).shape[0])
            return seen

        one_pass2()  # populate the cache
        t0 = time.perf_counter()
        seen = one_pass2()
        vc = seen / (time.perf_counter() - t0)
        emit("host_ingest_throughput_cached", vc,
             "chips/sec (npy chip cache warm, epoch>=2 train path)",
             speedup_vs_decode=round(vc / v, 2),
             cores_to_saturate_train=round(TRAIN_CADENCE / vc, 2),
             cores_to_saturate_serve=round(SERVE_TARGET / vc, 2),
             host_cores=ncores, n_chips=seen)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_granule(quick: bool) -> None:
    """Granule-scale streaming inference: whole tile -> stitched pred.

    The serving-scale metric: an HLS granule (3660² on TPU; scaled down
    on CPU) streamed through device-side chip extraction + fused
    preprocess + forward + on-device stitch (serve/granule.py), no chip
    files. Reported as effective chips/s over the grid the tile induces.
    """
    import jax

    from instageo_tpu.configs.config import load_config
    from instageo_tpu.serve.granule import granule_inference
    from instageo_tpu.train.factory import create_model

    on_tpu = jax.devices()[0].platform == "tpu"
    tile_hw = (1830 if quick else 3660) if on_tpu else 96
    chip = 224 if on_tpu else 32
    name = "prithvi_eo_v1_100" if on_tpu else "prithvi_eo_tiny"
    cfg = load_config("config", overrides={
        "dataloader.img_size": chip,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": name,
        "model.load_pretrained_weights": False,
    })
    model, variables = create_model(cfg)
    rng = np.random.default_rng(0)
    tile = rng.integers(1, 10000, size=(6, tile_hw, tile_hw)).astype(np.uint16)

    # Warm (compile), then measure.
    granule_inference(tile, model, variables, mean=[5000.0] * 6,
                      std=[3000.0] * 6, chip_size=chip,
                      batch_size=32 if on_tpu else 4)
    t0 = time.perf_counter()
    pred, _ = granule_inference(tile, model, variables, mean=[5000.0] * 6,
                                std=[3000.0] * 6, chip_size=chip,
                                batch_size=32 if on_tpu else 4)
    dt = time.perf_counter() - t0
    import math

    n_chips = math.ceil(tile_hw / chip) ** 2
    assert pred.shape == (tile_hw, tile_hw)
    emit("granule_stream_throughput", n_chips / dt,
         f"chips/sec ({name}, {tile_hw}^2 tile -> stitched pred, "
         f"chip={chip})", tile_s=round(dt, 2))


def bench_e2e_pipeline(quick: bool) -> None:
    """Composed loader→device steady state (VERDICT r4 #5): the SAME
    harness as ``BENCH_MODE=e2e`` (bench.bench_e2e — files → decoded-chip
    cache → worker loader → Trainer.run_train_epoch with async-dispatch
    overlap), at CI size on CPU / real size on TPU. Reports the pipeline
    efficiency (e2e vs HBM-resident cadence); on the relay-attached dev
    box the TPU number is link-bound and flagged ``relay_bound``."""
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    on_tpu = jax.devices()[0].platform == "tpu"
    r = bench.bench_e2e(
        "tpu" if on_tpu else "cpu",
        batch=32 if on_tpu else 4,
        n_chips=(128 if not quick else 64) if on_tpu else 8,
        epochs=1 if quick else 2,
        model_name="prithvi_eo_v1_100" if on_tpu else "prithvi_eo_tiny",
        num_workers=1, mode="thread")
    emit("e2e_train_pipeline_throughput", r["e2e_chips_per_sec"],
         "chips/sec (files->cache->loader->train step, composed)",
         pipeline_efficiency=round(r["pipeline_efficiency"], 3),
         hbm_chips_per_sec=round(r["hbm_chips_per_sec"], 2),
         relay_bound=r["relay_bound"], batch=r["batch"],
         n_chips=r["n_chips"])


def main() -> None:
    quick = "--quick" in sys.argv
    bench_native_decode(quick)
    bench_host_ingest(quick)
    bench_chip_ops(quick)
    bench_attention(quick)
    bench_train_step(quick)
    bench_granule(quick)
    bench_e2e_pipeline(quick)


if __name__ == "__main__":
    main()
