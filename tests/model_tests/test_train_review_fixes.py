"""Train-layer review fixes: lazy optimizer state, wired resume with
best_metric, stats ignore_index, and teacher placement under sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import make_mesh
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import Trainer


def _cfg(**extra):
    return load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32", **extra,
    })


def _data(b=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(b, 32, 32)).astype(np.int32)
    return x, y


def test_optimizer_state_is_lazy_for_eval_only_use():
    """Eval-only Trainers (mode=eval, the serving engine) must not pay
    2x-params HBM for AdamW moments they never read."""
    cfg = _cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables)
    assert trainer.state.opt_state is None
    x, y = _data()
    m = trainer.run_eval_epoch(iter([(x, y)]), 8, "val")
    assert np.isfinite(m["val_loss"])
    assert trainer.state.opt_state is None  # still no moments
    # First train use builds them.
    m = trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 8)
    assert np.isfinite(m["train_loss"])
    assert trainer.state.opt_state is not None


def test_resume_restores_step_optimizer_and_best_metric(tmp_path):
    """resume_from semantics: step count, optimizer moments, and
    best_metric all continue (a params-only warm start would restart the
    LR schedule and let the first worse epoch overwrite the best ckpt)."""
    from instageo_tpu.train.checkpointing import BestCheckpointer

    cfg = _cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables)
    x, y = _data()
    trainer.run_train_epoch(iter([(x, y), (x, y)]), jax.random.PRNGKey(0), 8)
    ckpt = BestCheckpointer(str(tmp_path))
    path = ckpt.save(trainer.state, metrics={"val_IoU": 0.73})
    ckpt._ckptr.wait_until_finished()

    model2, variables2 = create_model(cfg)
    t2 = Trainer(cfg, model2, variables2)
    t2.restore(path)
    assert int(jax.device_get(t2.state.step)) == 2
    assert t2.best_metric == pytest.approx(0.73)
    # Optimizer moments actually restored (non-zero after 2 steps).
    mom = jax.tree.leaves(t2.state.opt_state)
    assert any(float(jnp.abs(m).sum()) > 0 for m in mom
               if hasattr(m, "ndim") and m.ndim > 0)
    # And training continues from there.
    t2.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(1), 8)
    assert int(jax.device_get(t2.state.step)) == 3


def test_compute_stats_respects_ignore_index():
    from instageo_tpu.train.stats import compute_stats

    x = np.zeros((4, 6, 1, 8, 8), np.float32)
    y = np.zeros((4, 8, 8), np.int64)
    y[:, :4] = 1
    y[:, :, :2] = -100  # configured ignore sentinel
    mean, std, weights = compute_stats(iter([(x, y)]), ignore_index=-100)
    assert weights is not None and len(weights) == 2
    # Weights computed over real classes only: counts 0/1 are 24 px each
    # per sample -> equal weights.
    assert weights[0] == pytest.approx(weights[1])


def test_teacher_placement_mirrors_student_under_fsdp():
    cfg = _cfg(**{"tpu.fsdp": True, "train.distillation": True})
    model, variables = create_model(cfg)
    t_model, t_vars = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(8),
                      teacher=(t_model, t_vars))
    from jax.sharding import PartitionSpec as P

    fc1 = trainer._teacher_vars["params"]["prithvi_encoder"]["blocks_0"][
        "mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "data")  # sharded like the student
    x, y = _data(b=16, seed=3)
    m = trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 16)
    assert np.isfinite(m["train_loss"])
