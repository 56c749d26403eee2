"""StableHLO serving-artifact tests (serve/export.py)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from instageo_tpu.models.seg import create_prithvi_seg
from instageo_tpu.serve.export import export_predict, load_predict
from instageo_tpu.serve.infer import make_predict_fn


def _model():
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=3,
                               image_size=32, num_bands=6)
    x0 = np.zeros((1, 6, 1, 32, 32), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    return model, variables


def test_export_roundtrip_matches_live_predict(tmp_path):
    model, variables = _model()
    path = str(tmp_path / "predict.stablehlo")
    export_predict(model, variables, path, num_bands=6, img_size=32,
                   platforms=("cpu",))

    predict, meta = load_predict(path)
    assert meta["input_shape"] == [None, 6, 1, 32, 32]
    assert meta["output"] == "class_ids"

    rng = np.random.default_rng(0)
    live = make_predict_fn(model, variables)
    # Symbolic batch: the one artifact serves multiple batch sizes.
    for b in (1, 4):
        x = rng.normal(size=(b, 6, 1, 32, 32)).astype(np.float32)
        got = predict(variables, x)
        assert got.shape == (b, 32, 32)
        np.testing.assert_array_equal(got, np.asarray(live(jnp.asarray(x))))


def test_export_probabilities_and_pinned_batch(tmp_path):
    model, variables = _model()
    path = str(tmp_path / "probs.stablehlo")
    export_predict(model, variables, path, num_bands=6, img_size=32,
                   probabilities=True, batch_size=2, platforms=("cpu",))
    predict, meta = load_predict(path)
    assert meta["input_shape"][0] == 2
    x = np.zeros((2, 6, 1, 32, 32), np.float32)
    probs = predict(variables, x)
    assert probs.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # Pinned-batch artifacts reject other batch sizes loudly.
    with pytest.raises(Exception):
        predict(variables, np.zeros((3, 6, 1, 32, 32), np.float32))


def test_model_server_export_artifact_tp_sharded(tmp_path):
    """A tp>1 server must export an UNSHARDED artifact: its live model
    clone carries mesh sharding constraints and its weights are
    TP-sharded, which would bake an N-device mesh into the advertised
    portable single-device artifact (round-3 advisor finding)."""
    from instageo_tpu.configs.config import load_config
    from instageo_tpu.parallel.tp import make_mesh_2d, tp_place
    from instageo_tpu.serve.server import ModelServer
    from instageo_tpu.train.factory import create_model

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "tpu.precision": "f32",
        "tpu.tp": 2,
    })
    server = ModelServer.__new__(ModelServer)  # skip checkpoint loading
    server.cfg = cfg
    model, variables = create_model(cfg)
    server.mesh = make_mesh_2d(tp=2)
    from instageo_tpu.parallel.mesh import replicate_tree

    server.model = model.clone(tp_mesh=server.mesh)
    server.variables = {
        **{k: replicate_tree(v, server.mesh)
           for k, v in variables.items() if k != "params"},
        "params": tp_place(variables["params"], server.mesh),
    }

    path = server.export_artifact(str(tmp_path / "tp.stablehlo"))
    predict, meta = load_predict(path)
    x = np.zeros((2, 6, 1, 32, 32), np.float32)
    # The artifact must run against plain HOST weights (no mesh baked in).
    host_vars = jax.device_get(variables)
    got = predict(host_vars, x)
    assert got.shape == (2, 32, 32)


def test_model_server_export_artifact(tmp_path):
    from instageo_tpu.configs.config import load_config
    from instageo_tpu.serve.server import ModelServer
    from instageo_tpu.train.factory import create_model

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "tpu.precision": "f32",
    })
    server = ModelServer.__new__(ModelServer)  # skip checkpoint loading
    server.cfg = cfg
    server.model, server.variables = create_model(cfg)

    path = server.export_artifact(str(tmp_path / "server.stablehlo"))
    predict, meta = load_predict(path)
    assert meta["input_shape"] == [None, 6, 1, 32, 32]
    x = np.zeros((2, 6, 1, 32, 32), np.float32)
    assert predict(server.variables, x).shape == (2, 32, 32)


def test_export_artifact_is_code_free_and_small(tmp_path):
    """The artifact carries the program, not the weights: it stays small
    and the SAME artifact serves re-trained variables."""
    model, variables = _model()
    path = str(tmp_path / "predict.stablehlo")
    export_predict(model, variables, path, num_bands=6, img_size=32,
                   platforms=("cpu",))
    import os
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert os.path.getsize(path) < 4 * n_params  # no baked-in weights

    predict, _ = load_predict(path)
    # Different weights, same artifact.
    variables2 = jax.tree.map(lambda a: a + 0.01, variables)
    x = np.random.default_rng(1).normal(
        size=(2, 6, 1, 32, 32)).astype(np.float32)
    live2 = make_predict_fn(model, variables2)
    np.testing.assert_array_equal(
        predict(variables2, x), np.asarray(live2(jnp.asarray(x))))


def test_export_quant_model_roundtrip(tmp_path):
    """A tpu.quant=int8 model exports (int8 dot serializes to StableHLO)
    and the artifact reproduces the live quantized predictions."""
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=3,
                               image_size=32, num_bands=6, quant="int8")
    x0 = np.zeros((1, 6, 1, 32, 32), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    path = str(tmp_path / "quant.stablehlo")
    export_predict(model, variables, path, num_bands=6, img_size=32,
                   platforms=("cpu",))
    predict, _ = load_predict(path)
    x = np.random.default_rng(1).normal(size=(2, 6, 1, 32, 32)).astype(np.float32)
    live = make_predict_fn(model, variables)
    np.testing.assert_array_equal(predict(variables, x),
                                  np.asarray(live(jnp.asarray(x))))
