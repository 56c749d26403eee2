"""Real-TPU smoke: 600M family at T=2 under ``attn_impl=auto``
(VERDICT r4 "Next round" #1 done-criterion).

Round 4's regression: Prithvi-V2-600 (16 heads, Dh=80) at T>=2 (L=513+)
crashed at TRACE time on a single TPU under auto/pallas — no legal
merged-output grouping and no fallback. This probe runs ONE train step
and one inference forward of the full 600M encoder geometry at T=2
under auto (round-5 policy: training -> pallas via the bhld+transpose
fallback, measured faster than XLA at that shape — PERF.md "Attention
auto policy") and a T=1 train step (auto -> merged pallas kernel, g=8),
plus a direct compile of the bhld fallback dispatch at the T=2 shape.

Tiny batch and scan block layout keep relay transfer and compile time
sane; correctness (finite loss) is the bar, not throughput.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)


def run_600m(t_dim: int, remat: bool = False) -> None:
    from instageo_tpu.configs.config import load_config
    from instageo_tpu.parallel.mesh import make_mesh
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    cfg = load_config("config", overrides={
        "dataloader.img_size": 224,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "dataloader.temporal_dim": t_dim,
        "model.model_name": "prithvi_eo_v2_600",
        "model.load_pretrained_weights": False,
        "train.batch_size": 2,
        "train.ignore_index": -1,
        "tpu.precision": "bf16",
        "tpu.attn_impl": "auto",
        "tpu.block_layout": "scan",  # O(1) compile in depth (32 blocks)
        "tpu.steps_per_call": 1,
        # T=4 (L=1025) needs per-block remat even at b=2 on one chip:
        # 32 scan-stacked blocks of L=1025 residuals are ~18 GB without
        # it (measured HBM OOM, 17.82 vs 15.75 G).
        "tpu.remat": remat,
    })
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(1))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, t_dim, 224, 224)).astype(np.float32)
    y = rng.integers(0, 2, size=(2, 224, 224)).astype(np.int32)

    t0 = time.perf_counter()
    m = trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 2)
    assert np.isfinite(m["train_loss"]), m
    t_train = time.perf_counter() - t0
    ev = trainer.run_eval_epoch(iter([(x, y)]), 2, "val")
    assert np.isfinite(ev["val_loss"]), ev
    print(f"600M T={t_dim} auto OK: train_loss={m['train_loss']:.4f} "
          f"({t_train:.1f}s incl compile), val_loss={ev['val_loss']:.4f}",
          flush=True)


def run_fallback_kernel() -> None:
    """bhld+transpose dispatch at the exact 600M T=2 attention shape."""
    from instageo_tpu.ops.attention import (
        attention_reference,
        blo_supported,
        flash_attention_blo,
    )

    b, h, l, d = 2, 16, 513, 80
    assert not blo_supported(h, l, d)
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
               for _ in range(3))
    out = jax.jit(flash_attention_blo)(q, k, v)
    ref = attention_reference(*(t.transpose(0, 2, 1, 3) for t in (q, k, v)))
    ref = jnp.reshape(ref, (b, l, h * d))
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - ref.astype(jnp.float32))))
    print(f"bhld fallback (16 heads, Dh=80, L=513): max|diff|={diff:.4f}",
          flush=True)
    assert diff < 0.1  # bf16 softmax-attention tolerance

    # Full-dim merged block (g == h, width not 128-aligned but equal to
    # the whole H*Dh dim — Mosaic's other legality case): compile+run.
    b2, h2, l2, d2 = 4, 2, 128, 80
    assert blo_supported(h2, l2, d2)
    q2, k2, v2 = (jnp.asarray(rng.normal(size=(b2, h2, l2, d2)),
                              jnp.bfloat16) for _ in range(3))
    out2 = jax.jit(flash_attention_blo)(q2, k2, v2)
    ref2 = attention_reference(*(t.transpose(0, 2, 1, 3)
                                 for t in (q2, k2, v2)))
    diff2 = float(jnp.max(jnp.abs(
        out2.astype(jnp.float32)
        - jnp.reshape(ref2, (b2, l2, h2 * d2)).astype(jnp.float32))))
    print(f"full-dim merged block (H=2, Dh=80): max|diff|={diff2:.4f}",
          flush=True)
    assert diff2 < 0.1


if __name__ == "__main__":
    import sys

    if "--t4" in sys.argv:
        # Round-5b gate check: T=4 (L=1025) training must compile via
        # the pallas_trainable -> XLA route (the flash backward cannot);
        # eval still dispatches the pallas forward (auto, L>=512).
        run_600m(t_dim=4, remat=True)
    else:
        run_fallback_kernel()
        run_600m(t_dim=2)  # the round-4 crash shape: auto -> bhld fallback
        run_600m(t_dim=1)  # auto -> merged pallas (g=8)
    print("OK", flush=True)
