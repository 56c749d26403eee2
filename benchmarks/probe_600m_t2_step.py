"""Real-TPU full-step A/B: 600M T=2 training, pallas fallback vs XLA.

The round-5 policy routes 600M T>=2 training to the bhld+transpose
fallback on kernel-level numbers (0.648x XLA fwd+bwd at L=513). This
probe measures the COMPOSED train step (grad + AdamW + metrics,
Trainer path, steps_per_call scan) at the single-chip-feasible batch
so the claim is a step-level row, not a kernel extrapolation.

Memory findings first (all measured HBM OOMs on the way here):
grad_accum is no help at 600M single-chip T=2 — the f32 grad
accumulator alone is 2.4 GB, so even micro-batch 2 accumulated blows
15.75 GB (18.97 G). The feasible single-chip geometry is b=2
UN-accumulated (the 32-block residual stack fits). There the arms
differ structurally: XLA attention saves per-block (B, H, L, L)
attention matrices as residuals (f32[32,2,16,513,513] = 1.27 GB + a
bf16 twin at micro-batch 2) while the flash kernel's residual is the
(B, H, L, 1) lse — so the XLA arm may still need per-block remat to
fit; the probe tries no-remat first and falls back. Steady-state min
over 3 timed calls after a warm call, scalar-fetch sync (CLAUDE.md
timing rules).
"""

import json
import time

import jax
import numpy as np

from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)

BATCH = 2
K = 2


def run(attn_impl: str, remat: bool) -> dict:
    from instageo_tpu.configs.config import load_config
    from instageo_tpu.parallel.mesh import make_mesh
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    cfg = load_config("config", overrides={
        "dataloader.img_size": 224,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "dataloader.temporal_dim": 2,
        "model.model_name": "prithvi_eo_v2_600",
        "model.head_impl": "fast",
        "model.load_pretrained_weights": False,
        "train.batch_size": BATCH,
        "train.ignore_index": -1,
        "tpu.precision": "bf16",
        "tpu.attn_impl": attn_impl,
        "tpu.block_layout": "scan",
        "tpu.steps_per_call": K,
        "tpu.remat": remat,
    })
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(1))
    rng = np.random.default_rng(0)
    batches = [(rng.normal(size=(BATCH, 6, 2, 224, 224)).astype(np.float32),
                rng.integers(0, 2, size=(BATCH, 224, 224)).astype(np.int32))
               for _ in range(K)]

    def epoch(seed):
        m = trainer.run_train_epoch(iter(batches), jax.random.PRNGKey(seed),
                                    BATCH)
        assert np.isfinite(m["train_loss"]), m
        return m

    epoch(0)  # compile + warm
    ts = []
    for s in range(3):
        t0 = time.perf_counter()
        epoch(s + 1)
        ts.append((time.perf_counter() - t0) / K)
    sec = min(ts)
    return {"attn_impl": attn_impl, "remat": remat,
            "step_ms": round(sec * 1e3, 1),
            "chips_per_sec": round(BATCH / sec, 1)}


if __name__ == "__main__":
    import gc

    try:
        xla_row = run("xla", False)
        xla_failed = False
    except Exception:
        xla_failed = True
    # Retry OUTSIDE the except block: the live exception's traceback
    # frames pin the failed arm's 7.2 GB train state, and two states
    # don't fit — the first retry attempt OOMed at runtime this way.
    gc.collect()
    if xla_failed:
        xla_row = run("xla", True)  # remat: XLA's only fitting mode
    gc.collect()
    rows = [xla_row, run("pallas", False)]
    speedup = rows[0]["step_ms"] / rows[1]["step_ms"]
    print(json.dumps({"rows": rows, "pallas_speedup": round(speedup, 3)}),
          flush=True)
