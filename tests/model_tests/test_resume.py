"""Mid-training resume: checkpoint carries optimizer state."""

import numpy as np

import jax

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import make_mesh
from instageo_tpu.train.checkpointing import BestCheckpointer
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import Trainer


def _cfg():
    return load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "train.num_epochs": 1, "tpu.precision": "f32",
    })


def _data(n=8):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(n, 32, 32)).astype(np.int32)
    return x, y


def test_resume_restores_step_params_and_opt_state(tmp_path):
    cfg = _cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    x, y = _data()
    trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 8)
    ckpt = BestCheckpointer(str(tmp_path))
    ckpt.save(trainer.state)
    params_after = jax.tree.map(np.asarray,
                                jax.device_get(trainer.state.params))
    opt_after = jax.tree.map(np.asarray,
                             jax.device_get(trainer.state.opt_state))
    step_after = int(jax.device_get(trainer.state.step))

    # New trainer, fresh init -> restore -> state matches.
    model2, variables2 = create_model(cfg, seed=99)
    trainer2 = Trainer(cfg, model2, variables2, mesh=make_mesh())
    trainer2.restore(ckpt.path)
    assert int(jax.device_get(trainer2.state.step)) == step_after
    for a, b in zip(jax.tree.leaves(params_after),
                    jax.tree.leaves(jax.device_get(trainer2.state.params))):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(opt_after),
                    jax.tree.leaves(jax.device_get(trainer2.state.opt_state))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # And training continues from the restored state without error.
    m = trainer2.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(1), 8)
    assert np.isfinite(m["train_loss"])
    assert int(jax.device_get(trainer2.state.step)) == step_after + 1


def test_eval_load_ignores_opt_state(tmp_path):
    """factory.create_model(checkpoint_path=...) works on resume checkpoints."""
    cfg = _cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    x, y = _data()
    trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 8)
    ckpt = BestCheckpointer(str(tmp_path))
    ckpt.save(trainer.state)

    cfg2 = _cfg()
    cfg2["checkpoint_path"] = ckpt.path
    model2, vars2 = create_model(cfg2)
    for a, b in zip(jax.tree.leaves(jax.device_get(trainer.state.params)),
                    jax.tree.leaves(vars2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
