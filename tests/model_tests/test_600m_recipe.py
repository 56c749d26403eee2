"""The blessed 600M v5e-8 recipe (VERDICT r3 #10): the shipped
``--config-name=prithvi600_v5e8`` preset must produce the measured-best
parallel layout on an 8-device mesh — asserted here on the CPU mesh with
the REAL 600M architecture (only the image size and batch are shrunk so
one step fits a CI box; the sharding layout is shape-independent).

Recipe provenance: PERF.md "Variant scaling" (grad_accum=2 beats remat
262.8 vs 270.8 ms/step on one v5e chip) + "FSDP / ZeRO-3".
"""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import mesh_from_config


def test_prithvi600_v5e8_recipe_values():
    """The preset's knobs are exactly the measured-best settings."""
    cfg = load_config("prithvi600_v5e8")
    assert cfg.model.model_name == "prithvi_eo_v2_600"
    assert int(cfg.train.grad_accum) == 2
    assert not bool(cfg.tpu.remat)          # accum REPLACES remat
    assert bool(cfg.tpu.fsdp) and bool(cfg.tpu.zero1)
    assert int(cfg.tpu.steps_per_call) == 4
    assert int(cfg.train.batch_size) == 128  # global = 16/chip on v5e-8
    assert cfg.dataloader.img_size % 14 == 0  # V2 patch size


def test_prithvi600_v5e8_dryrun_8dev():
    """Build the real 600M model from the preset on the 8-device mesh,
    assert the FSDP/ZeRO-1 placement, and run one accumulated train
    step (b=16 global, img=56 — same layout rules, CI-sized tensors)."""
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import EpochMetrics, Trainer

    cfg = load_config("prithvi600_v5e8", overrides={
        # CI shrink: 2 of the 32 blocks (model.depth, the reference's
        # own truncation knob), img 56, batch 16 — embed width, head,
        # and every parallel knob stay the real recipe. The 600M head's
        # k=5/7 shrinking convs emit 16·(img/14) − 32 pixels, which
        # equals the input only at img=224 (registry.py note); at the
        # CI size 56 the head emits 32×32, so the labels below are
        # shaped to the head grid (the trainer is resolution-agnostic —
        # loss/metrics follow the logits grid).
        "model.depth": 2,
        "dataloader.img_size": 56,
        "train.batch_size": 16,
        "model.load_pretrained_weights": False,
        # One jitted call per step keeps the CI compile tractable; the
        # k=4 scan path itself is covered by test_trainer_scan.py.
        "tpu.steps_per_call": 1,
    })
    mesh = mesh_from_config(cfg.get("tpu"))
    assert int(mesh.devices.size) == 8 and mesh.axis_names == ("data",)

    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=mesh)
    assert trainer.grad_accum == 2

    params = trainer.state.params
    blocks = params["prithvi_encoder"]
    # FSDP: the transformer matmuls are dim-sharded over the data axis.
    fc1 = blocks["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.shape == (1280, 5120)        # really the 600M arch
    assert fc1.sharding.spec == P(None, "data"), fc1.sharding.spec
    qkv = blocks["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.shape == (1280, 3, 16, 80)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 6, 1, 56, 56)).astype(np.float32)
    y = rng.integers(0, 2, size=(16, 32, 32)).astype(np.int32)
    trainer.state, metrics = trainer._train_step(
        trainer.state, *trainer._prepare(x, y, 16),
        jax.random.PRNGKey(0), EpochMetrics.empty(2))
    loss = float(jax.device_get(metrics.loss_sum)) / 16.0
    assert np.isfinite(loss), loss
    assert int(jax.device_get(trainer.state.step)) == 1

    # ZeRO-1: optimizer moments follow the param sharding (sharded, not
    # replicated — the recipe's whole point at 600M scale). The opt
    # state materializes lazily on the first step, so assert after it.
    sharded = [x for x in jax.tree.leaves(trainer.state.opt_state)
               if hasattr(x, "sharding") and x.ndim >= 2
               and x.sharding.spec == P(None, "data")]
    assert sharded, "no FSDP-sharded optimizer moments found"
