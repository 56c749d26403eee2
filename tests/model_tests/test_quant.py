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


def test_quant_eval_and_inference_cli_cycle(tmp_path):
    """The knob's full intended path at the CLI surface: train WITHOUT
    quant (the guard forbids otherwise — also pinned here), then serve
    the SAME checkpoint through mode=eval and mode=chip_inference with
    tpu.quant=int8. Params are f32 either way (ops/quant.py), so no
    checkpoint surgery is involved."""
    import pandas as pd

    from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
    from instageo_tpu.train.run import main as run_main

    root = tmp_path / "chips"
    root.mkdir()
    rng = np.random.default_rng(5)
    rows = []
    for i in range(8):
        arr = rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16)
        sign = rng.choice([0, 1], size=(2, 2))
        lab = np.repeat(np.repeat(sign, 16, axis=0), 16, axis=1).astype(np.int16)
        arr[0] = np.where(lab > 0, 8000, 1000)
        tr = Affine.from_origin(499980 + i * 960, 4100040, 30, 30)
        write_geotiff(str(root / f"chip_{i}.tif"), arr, transform=tr,
                      crs=32633, nodata=0)
        write_geotiff(str(root / f"seg_map_{i}.tif"), lab[None], transform=tr,
                      crs=32633, nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_map_{i}.tif"})
    pd.DataFrame(rows).to_csv(root / "train.csv", index=False)

    def overrides(run_dir):
        return [
            f"root_dir={root}",
            f"train_filepath={root / 'train.csv'}",
            f"valid_filepath={root / 'train.csv'}",
            f"test_filepath={root / 'train.csv'}",
            f"run_dir={run_dir}",
            "model.model_name=prithvi_eo_tiny",
            "model.load_pretrained_weights=False",
            "dataloader.img_size=32",
            "dataloader.bands=[0,1,2,3,4,5]",
            "dataloader.no_data_value=0",
            "dataloader.mean=[5000,5000,5000,5000,5000,5000]",
            "dataloader.std=[3000,3000,3000,3000,3000,3000]",
            "train.ignore_index=-1",
            "train.batch_size=8",
            "train.num_epochs=2",
            "train.learning_rate=0.002",
            "test.img_size=32", "test.crop_size=32", "test.stride=32",
            "tpu.precision=f32",
        ]

    # mode=train with the knob set fails fast at the CLI surface.
    with pytest.raises(ValueError, match="inference-only"):
        run_main(["mode=train", "tpu.quant=int8"]
                 + overrides(tmp_path / "rejected"))

    run_dir = tmp_path / "run"
    run_main(["mode=train"] + overrides(run_dir))
    ckpt = run_dir / "instageo_best_checkpoint"
    assert ckpt.exists()

    plain = run_main(["mode=eval", f"checkpoint_path={ckpt}"]
                     + overrides(tmp_path / "eval_plain"))
    quant = run_main(["mode=eval", f"checkpoint_path={ckpt}",
                      "tpu.quant=int8"]
                     + overrides(tmp_path / "eval_quant"))
    assert np.isfinite(quant["test_loss"])
    # int8 rescale error moves metrics a little, not qualitatively.
    assert abs(quant["test_Acc"] - plain["test_Acc"]) < 0.1

    n = run_main(["mode=chip_inference", f"checkpoint_path={ckpt}",
                  "tpu.quant=int8"]
                 + overrides(tmp_path / "infer_quant"))
    assert n == 8
    preds = sorted((root / "predictions").glob("prediction_*.tif"))
    assert len(preds) == 8
    with GeoTiffReader(str(preds[0])) as r:
        assert r.dtypes[0] == "int8" and r.count == 1
