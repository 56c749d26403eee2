"""Optimizer/schedule parity vs torch."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from instageo_tpu.train.optim import clip_params, cosine_warm_restarts


def test_cosine_warm_restarts_matches_torch_at_epoch_boundaries():
    base_lr = 1e-3
    sched = cosine_warm_restarts(base_lr, steps_per_epoch=1, t_0=10, t_mult=2)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2, eta_min=0)

    for epoch in range(40):
        ours = float(sched(jnp.asarray(epoch)))
        ref = tsched.get_last_lr()[0]
        assert ours == pytest.approx(ref, rel=1e-5, abs=1e-9), f"epoch {epoch}"
        opt.step()
        tsched.step()


def test_cosine_warm_restarts_tmult1():
    sched = cosine_warm_restarts(1.0, steps_per_epoch=1, t_0=5, t_mult=1)
    vals = [float(sched(jnp.asarray(e))) for e in range(11)]
    assert vals[0] == pytest.approx(1.0)
    assert vals[5] == pytest.approx(1.0)  # restart
    assert vals[10] == pytest.approx(1.0)


def test_clip_params():
    tree = {"a": jnp.asarray([-5.0, 0.2, 5.0]), "b": {"c": jnp.asarray([0.0])}}
    out = clip_params(tree, [-1.0, 1.0])
    np.testing.assert_allclose(out["a"], [-1.0, 0.2, 1.0])
    assert clip_params(tree, None) is tree
