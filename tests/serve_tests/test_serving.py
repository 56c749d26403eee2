"""Serving-layer tests: registry, model server, evaluation pipeline."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from instageo_tpu.configs.config import load_config
from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.serve.pipeline import EvaluationPipeline
from instageo_tpu.serve.registry import ModelRegistry


@pytest.fixture(scope="module")
def trained_world(tmp_path_factory):
    """Chips on disk + a trained tiny checkpoint (via the train CLI)."""
    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        arr = rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16)
        lab = rng.integers(0, 2, size=(32, 32)).astype(np.int16)
        tr = Affine.from_origin(499980 + i * 960, 4100040, 30, 30)
        write_geotiff(str(root / f"chip_{i}.tif"), arr, transform=tr, crs=32633,
                      nodata=0)
        write_geotiff(str(root / f"seg_map_{i}.tif"), lab[None], transform=tr,
                      crs=32633, nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_map_{i}.tif"})
    pd.DataFrame(rows).to_csv(root / "data.csv", index=False)

    from instageo_tpu.train.run import main as run_main

    run_dir = root / "run"
    run_main([
        "mode=train",
        f"root_dir={root}", f"train_filepath={root / 'data.csv'}",
        f"valid_filepath={root / 'data.csv'}", f"run_dir={run_dir}",
        "model.model_name=prithvi_eo_tiny", "model.load_pretrained_weights=False",
        "dataloader.img_size=32", "dataloader.bands=[0,1,2,3,4,5]",
        "dataloader.mean=[5000,5000,5000,5000,5000,5000]",
        "dataloader.std=[3000,3000,3000,3000,3000,3000]",
        "dataloader.no_data_value=0",
        "train.ignore_index=-1", "train.batch_size=4", "train.num_epochs=1",
        "test.img_size=32", "test.crop_size=32", "test.stride=32",
        "tpu.precision=f32",
    ])
    return root, run_dir / "instageo_best_checkpoint"


def _serving_cfg(root, ckpt):
    return load_config("config", overrides={
        "root_dir": str(root),
        "test_filepath": str(root / "data.csv"),
        "checkpoint_path": str(ckpt),
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "dataloader.mean": [5000.0] * 6,
        "dataloader.std": [3000.0] * 6,
        "dataloader.no_data_value": 0,
        "train.ignore_index": -1,
        "train.batch_size": 4,
        "test.img_size": 32, "test.crop_size": 32, "test.stride": 32,
        "tpu.precision": "f32",
    })


def test_pipeline_validation_errors(trained_world):
    root, ckpt = trained_world
    cfg = _serving_cfg(root, ckpt)
    cfg["checkpoint_path"] = None
    with pytest.raises(ValueError, match="Missing required"):
        EvaluationPipeline(cfg)
    cfg["checkpoint_path"] = "/nonexistent"
    with pytest.raises(FileNotFoundError):
        EvaluationPipeline(cfg)


def test_pipeline_evaluate_and_chip_inference(trained_world, tmp_path):
    root, ckpt = trained_world
    pipe = EvaluationPipeline(_serving_cfg(root, ckpt))
    metrics = pipe.evaluate()
    assert "test_IoU" in metrics and "inference_time" in metrics

    out = pipe.chip_inference(str(tmp_path / "preds"))
    assert out["num_chips"] == 4
    preds = sorted((tmp_path / "preds").glob("prediction_*.tif"))
    assert len(preds) == 4
    with GeoTiffReader(str(preds[0])) as r:
        assert r.count == 1 and r.dtypes[0] == "int8"

    health = pipe.server.health_check()
    assert health["status"] == "healthy"
    assert health["requests_served"] == 2
    info = pipe.server.get_device_info()
    assert info["num_devices"] == 8  # CPU mesh in tests
    pipe.cleanup()
    assert pipe.server is None


def test_model_registry(tmp_path):
    registry_yaml = {
        "models": {
            "flood_mapping": {
                "name": "Flood Mapping",
                "description": "Sen1Floods11 fine-tune",
                "data_source": "HLS",
                "chip_size": 224,
                "num_steps": 1,
                "default_size": "base",
                "sizes": {
                    "base": {"model_name": "prithvi_eo_v1_100"},
                    "large": {"model_name": "prithvi_eo_v2_300"},
                },
            }
        }
    }
    reg_path = tmp_path / "models_registry.yaml"
    with open(reg_path, "w") as f:
        yaml.safe_dump(registry_yaml, f)

    models_path = tmp_path / "models"
    cfg_dir = models_path / "flood_mapping" / "base" / ".hydra"
    os.makedirs(cfg_dir)
    with open(cfg_dir / "config.yaml", "w") as f:
        yaml.safe_dump({"model": {"model_name": "prithvi_eo_v1_100"},
                        "train": {"batch_size": 16}}, f)

    reg = ModelRegistry(str(reg_path), str(models_path))
    models = reg.get_available_models()
    assert len(models) == 1 and models[0]["model_key"] == "flood_mapping"

    meta = reg.get_model_metadata_for_size("flood_mapping")
    assert meta["size"] == "base"
    assert meta["model_name"] == "prithvi_eo_v1_100"
    meta_l = reg.get_model_metadata_for_size("flood_mapping", "large")
    assert meta_l["model_name"] == "prithvi_eo_v2_300"

    cfg = reg.get_model_config("flood_mapping", "base")
    assert cfg.train.batch_size == 16

    with pytest.raises(KeyError):
        reg.get_model_metadata("nope")


def test_missing_checkpoint_raises_at_lookup(tmp_path, monkeypatch):
    """get_checkpoint_path fails fast with an actionable error instead of
    returning a nonexistent path (review fix)."""
    import pytest

    from instageo_tpu.serve.registry import ModelRegistry

    monkeypatch.setenv("MODELS_PATH", str(tmp_path))
    reg = ModelRegistry(models_path=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="flood_mapping"):
        reg.get_checkpoint_path("flood_mapping", "base")


def test_tp_serving_matches_replicated(trained_world, tmp_path):
    """tpu.tp=2 serving produces the same predictions as replicated
    serving (TP is a layout change, not a numerics change)."""
    from jax.sharding import PartitionSpec as P

    root, ckpt = trained_world

    outs = {}
    for name, tp in [("rep", 1), ("tp", 2)]:
        cfg = _serving_cfg(root, ckpt)
        if tp > 1:
            cfg["tpu"]["tp"] = tp
        pipe = EvaluationPipeline(cfg)
        out_dir = tmp_path / f"preds_{name}"
        pipe.chip_inference(str(out_dir))
        if tp > 1:
            qkv = pipe.server.variables["params"]["prithvi_encoder"][
                "blocks_0"]["attn"]["qkv"]["kernel"]
            assert qkv.sharding.spec == P(None, None, "model", None)
        outs[name] = {
            p.name: GeoTiffReader(str(p)).read()
            for p in sorted(out_dir.glob("prediction_*.tif"))
        }
        pipe.cleanup()

    assert outs["rep"].keys() == outs["tp"].keys() and len(outs["rep"]) == 4
    for k in outs["rep"]:
        np.testing.assert_array_equal(outs["rep"][k], outs["tp"][k])


def test_run_cli_export_mode(trained_world, tmp_path):
    """mode=export writes a reloadable StableHLO artifact from the
    trained checkpoint (serve/export.py via the run CLI)."""
    from instageo_tpu.serve.export import load_predict
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.run import main as run_main

    root, ckpt = trained_world
    out = tmp_path / "flood.stablehlo"
    path = run_main([
        "mode=export",
        f"root_dir={root}", f"checkpoint_path={ckpt}",
        f"export.path={out}",
        "model.model_name=prithvi_eo_tiny",
        "model.load_pretrained_weights=False",
        "dataloader.img_size=32", "dataloader.bands=[0,1,2,3,4,5]",
        "tpu.precision=f32",
    ])
    assert path == str(out) and out.exists()

    predict, meta = load_predict(path)
    assert meta["input_shape"] == [None, 6, 1, 32, 32]
    cfg = _serving_cfg(root, ckpt)
    _, variables = create_model(cfg)
    x = np.random.default_rng(0).normal(
        size=(2, 6, 1, 32, 32)).astype(np.float32)
    preds = predict(variables, x)
    assert preds.shape == (2, 32, 32) and preds.dtype == np.int8


def test_save_prediction_anchors_center_crop(tmp_path):
    """A prediction smaller than its source chip (img_size < chip_size,
    center crop) is georeferenced at the CROP's origin, not the chip's."""
    from instageo_tpu.serve.infer import save_prediction

    tr = Affine.from_origin(500000, 4100000, 30, 30)
    chip = np.zeros((6, 64, 64), np.uint16)
    src = tmp_path / "chip_x.tif"
    write_geotiff(str(src), chip, transform=tr, crs=32633)

    out = save_prediction(np.ones((32, 32), np.int8), str(src),
                          str(tmp_path))
    with GeoTiffReader(out) as r:
        t = r.transform
        # 16-px center-crop offset in both axes.
        assert (t.c, t.f) == (500000 + 16 * 30, 4100000 - 16 * 30)
        assert (t.a, t.e) == (tr.a, tr.e)

    # Same-size predictions keep the chip's transform untouched.
    (tmp_path / "full").mkdir()
    out = save_prediction(np.ones((64, 64), np.int8), str(src),
                          str(tmp_path / "full"))
    with GeoTiffReader(out) as r:
        assert (r.transform.c, r.transform.f) == (tr.c, tr.f)


def test_online_batcher_reconfigure_and_close(trained_world):
    """Changed knobs rebuild the batcher; close() stops its worker thread
    (a live thread roots the model weights)."""
    from instageo_tpu.serve.server import ModelServer

    root, ckpt = trained_world
    server = ModelServer(_serving_cfg(root, ckpt))
    b1 = server.online_batcher(max_batch=4, max_wait_ms=1)
    assert b1.max_batch == 4
    b2 = server.online_batcher(max_batch=8, max_wait_ms=1)
    assert b2.max_batch == 8 and b2 is not b1
    assert b1._closed.is_set()
    assert server.online_batcher(max_batch=8, max_wait_ms=1) is b2
    server.close()
    assert b2._closed.is_set()


def test_save_prediction_ungeoreferenced_crop(tmp_path):
    """A source chip without a geotransform + a center-crop prediction
    writes an ungeoreferenced raster instead of crashing on None math."""
    from instageo_tpu.serve.infer import save_prediction

    src = str(tmp_path / "chip_7.tif")
    write_geotiff(src, np.zeros((1, 32, 32), np.int16))  # no transform/crs
    out = save_prediction(np.ones((16, 16), np.int8), src, str(tmp_path))
    with GeoTiffReader(out) as r:
        assert (r.width, r.height) == (16, 16)
    assert os.path.basename(out) == "prediction_7.tif"


def test_loader_chip_inference_pads_tail_batch(tmp_path, trained_world):
    """The loader path pads partial tail batches to the compiled shape
    (a new traced shape means a fresh remote compile — minutes)."""
    import jax.numpy as jnp

    from instageo_tpu.serve import infer as infer_mod
    from instageo_tpu.train.factory import create_model

    root, ckpt = trained_world
    model, variables = create_model(_serving_cfg(root, ckpt))

    shapes = []
    real_make = infer_mod.make_predict_fn

    def spying_make(*a, **kw):
        fn = real_make(*a, **kw)

        def wrapped(x):
            shapes.append(tuple(x.shape))
            return fn(x)
        return wrapped

    rng = np.random.default_rng(0)

    def loader():
        for nb in (4, 2):  # full batch, then a partial tail
            x = rng.normal(size=(nb, 6, 1, 32, 32)).astype(np.float32)
            files = [str(tmp_path / f"chip_{i}.tif") for i in range(nb)]
            for f in files:
                write_geotiff(f, np.zeros((6, 32, 32), np.int16))
            yield x, files, None

    old = infer_mod.make_predict_fn
    infer_mod.make_predict_fn = spying_make
    try:
        n, _ = infer_mod.chip_inference(loader(), str(tmp_path / "out"),
                                        model, variables)
    finally:
        infer_mod.make_predict_fn = old
    assert n == 6
    # Both calls saw the SAME compiled batch shape.
    assert shapes == [(4, 6, 1, 32, 32), (4, 6, 1, 32, 32)]


def test_quant_server_evaluate_and_agree_with_plain(trained_world):
    """tpu.quant=int8 through the serving stack: ModelServer.evaluate
    (which builds a Trainer — the guard must not fire outside training)
    works, and the quantized pipeline's metrics stay within int8 rescale
    tolerance of the plain server on the same checkpoint."""
    root, ckpt = trained_world

    plain = EvaluationPipeline(_serving_cfg(root, ckpt))
    ref = plain.evaluate()
    plain.cleanup()

    qcfg = _serving_cfg(root, ckpt)
    qcfg["tpu"]["quant"] = "int8"
    quant = EvaluationPipeline(qcfg)
    got = quant.evaluate()
    assert quant.server.model.quant == "int8"
    quant.cleanup()

    assert np.isfinite(got["test_loss"])
    assert abs(got["test_Acc"] - ref["test_Acc"]) < 0.1
