"""train.grad_accum: micro-batched gradients inside one jitted step."""

import numpy as np

import jax
import jax.numpy as jnp

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import make_mesh
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import EpochMetrics, Trainer


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


def test_grad_accum_matches_manual_microbatch_oracle():
    """grad_accum=2 grads must equal the hand-rolled semantics: grads of
    each half (threading BatchNorm stats), averaged. (Grads, not post-Adam
    params, are compared — Adam turns eps-scale reduction-order noise on
    near-zero grads into ±lr sign flips, see test_tp_training_matches_dp.)
    """
    cfg = _cfg(**{"train.grad_accum": 2})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables)

    x, y = _data()
    rng = jax.random.PRNGKey(3)
    state0_params = jax.device_get(trainer.state.params)
    state0_bs = jax.device_get(trainer.state.batch_stats)

    xb, yb = trainer._prepare(x, y, 8)
    epoch_rng = trainer._epoch_rng(rng)
    step_rng = jax.random.fold_in(epoch_rng, 0)
    got_grads, got_mut, metrics = trainer._accum_grads(
        trainer.state, xb, yb, step_rng, EpochMetrics.empty(2))
    assert int(metrics.batches) == 2  # metrics saw both micro-batches

    # And the full jitted step must execute (one optimizer update).
    trainer.state, step_metrics = trainer._train_step(
        trainer.state, xb, yb, step_rng, EpochMetrics.empty(2))
    assert int(jax.device_get(trainer.state.step)) == 1
    assert np.isfinite(float(step_metrics.loss_sum))

    # Oracle: same math, spelled out.
    def loss_fn(params, bs, xm, ym, r):
        out, mut = model.apply(
            {"params": params, "batch_stats": bs}, xm, train=True,
            rngs={"dropout": r}, mutable=["batch_stats"])
        from instageo_tpu.train.losses import masked_cross_entropy

        return masked_cross_entropy(out, ym, -1, [1.0, 1.0]), mut

    bs = state0_bs
    gsum = None
    wsum = 0.0
    mb = xb.shape[0] // 2  # _prepare pads to grad_accum * mesh multiple
    for i in range(2):
        r = jax.random.fold_in(step_rng, i)
        xm, ym = xb[mb * i:mb * (i + 1)], yb[mb * i:mb * (i + 1)]
        (_, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state0_params, bs, xm, ym, r)
        bs = mut["batch_stats"]
        # Micro grads weight by valid-pixel count (every loss normalizes
        # by it), so the result equals the FULL-batch gradient even when
        # _prepare's padding fills a whole micro with ignore labels.
        w = float(np.asarray(jax.device_get(ym != -1)).sum())
        wsum += w
        wg = jax.tree.map(lambda g: g * w, grads)
        gsum = wg if gsum is None else jax.tree.map(jnp.add, gsum, wg)
    expect_grads = jax.tree.map(lambda g: g / max(wsum, 1.0), gsum)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7),
        jax.device_get(got_grads), jax.device_get(expect_grads))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        jax.device_get(got_mut["batch_stats"]), jax.device_get(bs))


def test_grad_accum_composes_with_mesh_scan_fsdp():
    """grad_accum=2 under the 8-device mesh + ZeRO-3 + k=2 scanned steps."""
    cfg = _cfg(**{"train.grad_accum": 2, "train.batch_size": 16,
                  "tpu.fsdp": True, "tpu.steps_per_call": 2})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(8))
    x, y = _data(b=16, seed=5)
    m = trainer.run_train_epoch(iter([(x, y), (x, y)]),
                                jax.random.PRNGKey(0), 16)
    assert np.isfinite(m["train_loss"])
    assert int(jax.device_get(trainer.state.step)) == 2


def test_grad_accum_pads_batch_to_micro_divisibility():
    """Partial TRAIN batches pad to a multiple of grad_accum * mesh size;
    eval batches only to the mesh size (no accumulation there)."""
    cfg = _cfg(**{"train.grad_accum": 4})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(8))
    x, y = _data(b=5, seed=1)
    xp, yp = trainer._prepare_host(x, y, 5)
    assert xp.shape[0] % (4 * 8) == 0
    xe, ye = trainer._prepare_host(x, y, 5, accum=1)
    assert xe.shape[0] == 8  # eval: mesh multiple only
    m = trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 5)
    assert np.isfinite(m["train_loss"])


def test_grad_accum_padding_does_not_dilute_gradients():
    """An all-ignore micro-batch must contribute NOTHING: micro grads are
    weighted by valid-pixel count, so grads equal the real micro's grads
    exactly (an equal 1/a average would halve them) and the reported
    loss is the real micro's loss."""
    cfg = _cfg(**{"train.grad_accum": 2})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(1))

    x, y = _data(b=8, seed=2)
    y[4:] = -1  # second micro-batch is 100% ignore-labeled padding
    xd = jnp.asarray(x)
    yd = jnp.asarray(y)
    step_rng = jax.random.fold_in(trainer._epoch_rng(jax.random.PRNGKey(0)), 0)
    grads, mut, metrics = trainer._accum_grads(
        trainer.state, xd, yd, step_rng, EpochMetrics.empty(2))

    # Oracle: the real micro alone, same rng fold as micro 0.
    loss0, _, _, g0 = trainer._micro_grads(
        trainer.state.params, trainer.state.batch_stats,
        xd[:4], yd[:4], jax.random.fold_in(step_rng, 0))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7),
        jax.device_get(grads), jax.device_get(g0))
    # Epoch-mean loss (loss_sum / batches) is the real micro's loss.
    np.testing.assert_allclose(
        float(metrics.loss_sum) / float(metrics.batches), float(loss0),
        rtol=1e-6)


def test_grad_accum_composes_with_tp():
    """grad_accum under a 2D (data, model) tensor-parallel mesh."""
    from instageo_tpu.parallel.mesh import mesh_from_config

    cfg = _cfg(**{"train.grad_accum": 2, "train.batch_size": 8,
                  "tpu.tp": 2, "tpu.zero1": True})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables,
                      mesh=mesh_from_config(cfg.get("tpu")))
    x, y = _data(b=8, seed=9)
    m = trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 8)
    assert np.isfinite(m["train_loss"])
    assert int(jax.device_get(trainer.state.step)) == 1
