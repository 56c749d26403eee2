"""Sharding tests: DP mesh, zero-1 placement, multihost no-op paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch,
    shard_batch,
    zero1_place,
)
from instageo_tpu.parallel.multihost import (
    aggregate_metrics,
    host_local_to_global,
    initialize_multihost,
)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    x = np.zeros((16, 3), np.float32)
    arr = shard_batch(x, mesh)
    spec = arr.sharding.spec
    assert spec == P("data")


def test_pad_batch():
    x = np.ones((5, 2), np.float32)
    y = np.ones((5,), np.int32)
    xp, yp, n = pad_batch((x, y), 8, label_fill=-1)
    assert xp.shape == (8, 2) and yp.shape == (8,)
    assert n == 5
    assert (yp[5:] == -1).all()
    assert (xp[5:] == 0).all()


def test_zero1_place_shards_big_leaves():
    mesh = make_mesh()
    big = jnp.zeros((64, 2048))  # divisible, big
    small = jnp.zeros((3,))
    odd = jnp.zeros((65, 2048))  # not divisible
    placed = zero1_place({"big": big, "small": small, "odd": odd}, mesh)
    assert placed["big"].sharding.spec == P("data")
    assert placed["small"].sharding.spec == P()
    assert placed["odd"].sharding.spec == P()


def test_zero1_training_step_runs():
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32", "tpu.zero1": True,
    })
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)
    m = trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 8)
    assert np.isfinite(m["train_loss"])


def test_fsdp_spec_rule():
    from instageo_tpu.parallel.fsdp import fsdp_place

    mesh = make_mesh()  # 8 devices
    params = {
        "big0": jnp.zeros((64, 2048)),      # dim 1 largest & divisible
        "qkv": jnp.zeros((3, 3, 256, 128)),  # largest divisible dim = 2
        "small": jnp.zeros((3,)),            # under threshold
        "odd": jnp.zeros((257, 509)),        # big, no divisible dim
    }
    placed = fsdp_place(params, mesh)
    assert placed["big0"].sharding.spec == P(None, "data")
    assert placed["qkv"].sharding.spec == P(None, None, "data")
    assert placed["small"].sharding.spec == P()
    assert placed["odd"].sharding.spec == P()


def test_fsdp_training_matches_dp():
    """ZeRO-3 param sharding is a layout change, not a numerics change:
    the loss trajectory must match pure DP. Composes with zero1 + the
    k-step scanned path."""
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    overrides = {
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32",
    }
    rng = np.random.default_rng(7)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)

    losses = {}
    for name, extra in [("dp", {}),
                        ("fsdp", {"tpu.fsdp": True, "tpu.zero1": True,
                                  "tpu.steps_per_call": 2})]:
        cfg = load_config("config", overrides={**overrides, **extra})
        model, variables = create_model(cfg)
        trainer = Trainer(cfg, model, variables, mesh=make_mesh())
        if name == "fsdp":
            # Params must actually be dim-sharded over the data axis.
            fc1 = trainer.state.params["prithvi_encoder"]["blocks_0"][
                "mlp"]["fc1"]["kernel"]
            assert fc1.sharding.spec == P(None, "data"), fc1.sharding.spec
        m = trainer.run_train_epoch(iter([(x, y), (x, y)]),
                                    jax.random.PRNGKey(0), 8)
        losses[name] = m["train_loss"]
        assert int(jax.device_get(trainer.state.step)) == 2
    np.testing.assert_allclose(losses["dp"], losses["fsdp"], rtol=1e-4)


def test_multihost_single_process_paths():
    initialize_multihost()  # no-op single process
    mesh = make_mesh()
    g = host_local_to_global(np.zeros((8, 2), np.float32), mesh)
    assert g.sharding.spec == P("data")
    tree = {"cm": jnp.ones((2, 2))}
    out = aggregate_metrics(tree)
    np.testing.assert_array_equal(np.asarray(out["cm"]), np.ones((2, 2)))


def test_tp_specs_rules():
    from instageo_tpu.parallel.tp import make_mesh_2d, tp_place

    mesh = make_mesh_2d(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params = {"blocks_0": {
        "attn": {"qkv": {"kernel": jnp.zeros((8, 3, 2, 4)),
                         "bias": jnp.zeros((3, 2, 4))},
                 "proj": {"kernel": jnp.zeros((8, 8)),
                          "bias": jnp.zeros((8,))}},
        "mlp": {"fc1": {"kernel": jnp.zeros((8, 32)),
                        "bias": jnp.zeros((32,))},
                "fc2": {"kernel": jnp.zeros((32, 8)),
                        "bias": jnp.zeros((8,))}},
        "norm1": {"scale": jnp.zeros((8,))},
    }}
    placed = tp_place(params, mesh)
    b = placed["blocks_0"]
    # qkv is head-structured (D, 3, H, Dh): the model shard sits on HEADS.
    assert b["attn"]["qkv"]["kernel"].sharding.spec == P(
        None, None, "model", None)
    assert b["attn"]["qkv"]["bias"].sharding.spec == P(None, "model", None)
    assert b["attn"]["proj"]["kernel"].sharding.spec == P("model", None)
    assert b["attn"]["proj"]["bias"].sharding.spec == P()
    assert b["mlp"]["fc1"]["kernel"].sharding.spec == P(None, "model")
    assert b["mlp"]["fc2"]["kernel"].sharding.spec == P("model", None)
    assert b["norm1"]["scale"].sharding.spec == P()


def test_tp_training_matches_dp():
    """TP(2)xDP(4) training must produce the same numbers as pure DP —
    the sharding is a layout change, not a numerics change."""
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    overrides = {
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32",
    }
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)

    from instageo_tpu.train.trainer import EpochMetrics

    losses = {}
    for name, extra in [("dp", {}), ("tp", {"tpu.tp": 2, "tpu.zero1": True})]:
        cfg = load_config("config", overrides={**overrides, **extra})
        from instageo_tpu.parallel.mesh import mesh_from_config

        model, variables = create_model(cfg)
        trainer = Trainer(cfg, model, variables,
                          mesh=mesh_from_config(cfg.get("tpu")))
        if name == "tp":
            # TP must actually be active: transformer matmuls sharded.
            qkv = trainer.state.params["prithvi_encoder"]["blocks_0"]["attn"][
                "qkv"]["kernel"]
            assert qkv.sharding.spec == P(None, None, "model", None)
        step_losses = []
        for step in range(3):
            trainer.state, metrics = trainer._train_step(
                trainer.state, *trainer._prepare(x, y, 8),
                jax.random.PRNGKey(step), EpochMetrics.empty(2))
            step_losses.append(float(metrics.loss_sum))
        losses[name] = step_losses

    # The loss at step k depends on every prior update: trajectory
    # equality is the functional-parity check. (Raw params are NOT
    # compared — Adam turns eps-scale f32 reduction-order differences on
    # near-zero grads into ±lr update flips.)
    np.testing.assert_allclose(losses["dp"], losses["tp"], rtol=1e-4)


def test_tp_with_scanned_steps():
    """tpu.tp=2 composes with the k-step scanned train path (shardings
    thread through the lax.scan carry)."""
    from instageo_tpu.parallel.mesh import mesh_from_config
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32", "tpu.tp": 2, "tpu.zero1": True,
        "tpu.steps_per_call": 2,
    })
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables,
                      mesh=mesh_from_config(cfg.get("tpu")))
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)
    # Two batches -> one full k=2 scan group actually executes.
    m = trainer.run_train_epoch(iter([(x, y), (x, y)]),
                                jax.random.PRNGKey(0), 8)
    assert np.isfinite(m["train_loss"])
    assert int(jax.device_get(trainer.state.step)) == 2


def test_sp_trajectory_matches_tp():
    """tpu.sp (Megatron sequence parallelism) is a layout change only:
    the tp2+sp loss trajectory tracks plain tp2 (and hence DP)."""
    from instageo_tpu.parallel.mesh import mesh_from_config
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import EpochMetrics, Trainer

    overrides = {
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32",
    }
    rng = np.random.default_rng(7)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)

    losses = {}
    for name, extra in [("tp", {"tpu.tp": 2}),
                        ("tp_sp", {"tpu.tp": 2, "tpu.sp": True})]:
        cfg = load_config("config", overrides={**overrides, **extra})
        model, variables = create_model(cfg)
        if name == "tp_sp":
            assert model.sp is True
        trainer = Trainer(cfg, model, variables,
                          mesh=mesh_from_config(cfg.get("tpu")))
        step_losses = []
        for step in range(3):
            trainer.state, metrics = trainer._train_step(
                trainer.state, *trainer._prepare(x, y, 8),
                jax.random.PRNGKey(step), EpochMetrics.empty(2))
            step_losses.append(float(metrics.loss_sum))
        losses[name] = step_losses
    np.testing.assert_allclose(losses["tp"], losses["tp_sp"], rtol=1e-4)


def test_factory_rejects_sp_without_tp():
    from instageo_tpu.train.factory import build_model

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "model.model_name": "prithvi_eo_tiny",
        "tpu.sp": True,
    })
    with pytest.raises(ValueError, match="requires tpu.tp"):
        build_model(cfg)
