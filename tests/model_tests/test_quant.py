"""Dynamic int8 (W8A8) serving path (ops/quant.py, tpu.quant).

Validates the quantized matmul numerics, the param-tree compatibility
with the plain layers (checkpoints interchangeable), the end-to-end
closeness of the quantized encoder, and the inference-only guards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from instageo_tpu.configs.config import load_config
from instageo_tpu.models.seg import create_prithvi_seg
from instageo_tpu.ops.quant import QuantDense, int8_matmul, quantize_symmetric
from instageo_tpu.parallel.mesh import make_mesh
from instageo_tpu.train.factory import build_model, create_model
from instageo_tpu.train.trainer import Trainer


def test_quantize_symmetric_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32) * 3.0)
    q, scale = quantize_symmetric(x, axis=-1)
    assert q.dtype == jnp.int8
    assert scale.shape == (16, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(x))
    # Round-to-nearest: error <= scale/2 elementwise.
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()


def test_quantize_symmetric_zero_row_is_safe():
    x = jnp.zeros((4, 8), jnp.float32)
    q, scale = quantize_symmetric(x)
    assert np.isfinite(np.asarray(scale)).all()
    np.testing.assert_array_equal(np.asarray(q), 0)


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 48)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    got = np.asarray(int8_matmul(x, w, b))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_matmul_batched_rank3():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 10, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    got = np.asarray(int8_matmul(x, w, None))
    ref = np.einsum("bld,dn->bln", np.asarray(x), np.asarray(w))
    assert got.shape == (4, 10, 16)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_quant_dense_param_tree_matches_dense():
    """A checkpoint trained with nn.Dense loads into QuantDense unchanged."""
    x = jnp.ones((2, 12))
    plain = nn.Dense(7, use_bias=True, param_dtype=jnp.float32)
    quant = QuantDense(7)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vq = quant.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(vp) == jax.tree.structure(vq)
    for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vq)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # Cross-apply: plain params through the quant layer ≈ plain output.
    ref = np.asarray(plain.apply(vp, x))
    got = np.asarray(quant.apply(vp, x))
    assert np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-6) < 0.02


def test_seg_forward_quant_close_and_params_shared():
    """Tiny PrithviSeg: quant=int8 reuses the same variables and stays
    close to the f32 forward."""
    kw = dict(num_classes=3, temporal_step=1, image_size=32, num_bands=6)
    model = create_prithvi_seg("prithvi_eo_tiny", **kw)
    model_q = create_prithvi_seg("prithvi_eo_tiny", quant="int8", **kw)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 6, 1, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # Identical param trees: the quantized model consumes the plain one's.
    vq = model_q.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(variables) == jax.tree.structure(vq)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(model_q.apply(variables, x, train=False))
    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.1, rel
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.99, cos


def _cfg(**over):
    overrides = {
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8,
        "tpu.precision": "f32",
    }
    overrides.update(over)
    return load_config("config", overrides=overrides)


def test_factory_threads_and_validates_quant():
    model = build_model(_cfg(**{"tpu.quant": "int8"}))
    assert model.quant == "int8"
    with pytest.raises(ValueError, match="tpu.quant"):
        build_model(_cfg(**{"tpu.quant": "int4"}))


def test_trainer_rejects_quant_training_but_allows_eval():
    """The guard fires at TRAIN time, not construction: mode=eval and
    ModelServer.evaluate build a Trainer around the quantized model —
    that's the knob's intended path (trainer._reject_quant_training)."""
    cfg = _cfg(**{"tpu.quant": "int8"})
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh())
    rng = np.random.default_rng(7)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)
    with pytest.raises(ValueError, match="inference-only"):
        trainer.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0), 8)
    with pytest.raises(ValueError, match="inference-only"):
        trainer.fit(lambda: iter([(x, y)]), lambda: iter([(x, y)]))
    # Eval of the quantized model goes through.
    metrics = trainer.run_eval_epoch(iter([(x, y)]), 8, "val")
    assert np.isfinite(metrics["val_loss"])
