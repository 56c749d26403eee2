"""tpu.steps_per_call: scanned multi-step training matches single-step.

The multi-step path chains k optimizer steps inside one jitted lax.scan
call (amortizing per-dispatch overhead); it must be numerically the same
training run — same RNG folding per global step, same optimizer/metric
updates, including the tail group that doesn't fill k.
"""

import numpy as np
import pytest

import jax

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import make_mesh
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import Trainer


def _cfg(**over):
    overrides = {
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8,
        "train.ignore_index": -1,
        "train.learning_rate": 1e-3,
        "tpu.precision": "f32",
    }
    overrides.update(over)
    return load_config("config", overrides=overrides)


def _data(n_batches, bs=8, size=32, seed=3):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        x = rng.normal(scale=0.5, size=(bs, 6, 1, size, size)).astype(np.float32)
        y = rng.integers(0, 2, size=(bs, size, size)).astype(np.int32)
        batches.append((x, y))
    return batches


def _run(steps_per_call, n_batches):
    cfg = _cfg(**{"tpu.steps_per_call": steps_per_call})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    metrics = trainer.run_train_epoch(iter(_data(n_batches)),
                                      jax.random.PRNGKey(7), 8)
    params = jax.device_get(trainer.state.params)
    step = int(jax.device_get(trainer.state.step))
    return metrics, params, step


@pytest.mark.parametrize("n_batches", [8, 6])  # 6: tail group of 2 at k=4
def test_scan_matches_single_step(n_batches):
    m1, p1, s1 = _run(1, n_batches)
    mk, pk, sk = _run(4, n_batches)
    assert s1 == sk == n_batches
    assert m1["train_loss"] == pytest.approx(mk["train_loss"], rel=1e-5)
    # Scan-vs-sequential fusion reassociates floats; AdamW amplifies the
    # drift over the epoch (observed ≤ 2.5e-4 absolute on params, small
    # argmax flips in the CM). Wiring bugs this test exists to catch —
    # wrong batch/RNG order, missed tail group, unthreaded state — are
    # orders of magnitude larger, so assert between the two scales.
    assert m1["train_IoU"] == pytest.approx(mk["train_IoU"], rel=2e-2)
    flat1 = jax.tree_util.tree_leaves(p1)
    flatk = jax.tree_util.tree_leaves(pk)
    for a, b in zip(flat1, flatk):
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=2e-3)


@pytest.mark.parametrize("n_batches", [8, 6])
def test_eval_scan_matches_single_step(n_batches):
    # Same trained-from-init params in both trainers; eval is stateless so
    # the only differences can be float reassociation.
    data = _data(n_batches)
    results = []
    for k in (1, 4):
        cfg = _cfg(**{"tpu.steps_per_call": k})
        model, variables = create_model(cfg)
        trainer = Trainer(cfg, model, variables, mesh=make_mesh())
        results.append(trainer.run_eval_epoch(iter(data), 8, "test"))
    m1, mk = results
    assert m1["test_loss"] == pytest.approx(mk["test_loss"], rel=1e-5)
    assert m1["test_IoU"] == pytest.approx(mk["test_IoU"], rel=2e-2)
    assert m1["test_roc_auc"] == pytest.approx(mk["test_roc_auc"], rel=1e-3)


def test_eval_scan_collect_outputs_falls_back():
    # Regression plot collection needs per-batch logits; the scanned path
    # must defer to the single-step path there.
    cfg = _cfg(**{"tpu.steps_per_call": 4, "is_reg_task": True,
                  "model.num_classes": 1, "model.plot_reg_results": True})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    rng = np.random.default_rng(0)
    data = [(rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32),
             rng.uniform(0, 5, size=(8, 32, 32)).astype(np.float32))
            for _ in range(2)]
    out = trainer.run_eval_epoch(iter(data), 8, "val", collect_outputs=True)
    assert "_preds" in out and len(out["_preds"]) > 0


def test_scan_group_smaller_than_epoch():
    # k larger than the number of batches: everything goes through the
    # single-step tail path.
    m, _p, s = _run(1, 3)
    cfg = _cfg(**{"tpu.steps_per_call": 8})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    mk = trainer.run_train_epoch(iter(_data(3)), jax.random.PRNGKey(7), 8)
    assert int(jax.device_get(trainer.state.step)) == 3
    assert m["train_loss"] == pytest.approx(mk["train_loss"], rel=1e-5)
