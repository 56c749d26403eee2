"""Pipeline-parallelism tests (parallel/pp.py + stacked block layouts).

Run on the 8-device virtual CPU mesh (conftest). Beyond-parity capability:
the reference trains single-accelerator (SURVEY.md §2.5); PP scales the
encoder past one chip's HBM with a GPipe schedule over a ``pipe`` mesh axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from instageo_tpu.configs.config import load_config
from instageo_tpu.models.prithvi import (
    PrithviViT,
    stack_block_params,
    unstack_block_params,
)
from instageo_tpu.parallel.mesh import make_mesh, mesh_from_config
from instageo_tpu.parallel.pp import (
    has_pipe_axis,
    make_mesh_pp,
    pipeline_blocks,
    pp_place,
    pp_specs,
)

ENC_KW = dict(img_size=32, patch_size=(1, 8, 8), num_frames=1, in_chans=3,
              embed_dim=32, depth=4, num_heads=2, mlp_ratio=2.0,
              dtype=jnp.float32)


@pytest.fixture(scope="module")
def loop_model_and_out():
    x = np.random.default_rng(0).normal(size=(8, 3, 1, 32, 32)).astype(
        np.float32)
    model = PrithviViT(**ENC_KW)
    variables = jax.tree.map(np.asarray,
                             model.init(jax.random.PRNGKey(0), x))
    out = np.asarray(model.apply(variables, x))
    return model, variables, x, out


def test_stack_unstack_roundtrip(loop_model_and_out):
    _, variables, _, _ = loop_model_and_out
    stacked = stack_block_params(variables["params"], ENC_KW["depth"])
    assert "blocks" in stacked and "blocks_0" not in stacked
    lead = jax.tree.leaves(stacked["blocks"])[0].shape[0]
    assert lead == ENC_KW["depth"]
    rt = unstack_block_params(stacked)
    jax.tree.map(np.testing.assert_array_equal,
                 rt, variables["params"])


def test_scan_layout_matches_loop(loop_model_and_out):
    _, variables, x, out = loop_model_and_out
    stacked = stack_block_params(variables["params"], ENC_KW["depth"])
    scan_model = PrithviViT(**ENC_KW, block_layout="scan")
    out_scan = scan_model.apply({"params": stacked}, x)
    np.testing.assert_allclose(out_scan, out, rtol=2e-5, atol=2e-5)


def test_scan_layout_init_shape():
    x = jnp.zeros((1, 3, 1, 32, 32), jnp.float32)
    scan_model = PrithviViT(**ENC_KW, block_layout="scan")
    v = scan_model.init(jax.random.PRNGKey(1), x)
    assert "blocks" in v["params"]
    for leaf in jax.tree.leaves(v["params"]["blocks"]):
        assert leaf.shape[0] == ENC_KW["depth"]


def test_pipeline_forward_matches_loop(loop_model_and_out):
    _, variables, x, out = loop_model_and_out
    stacked = stack_block_params(variables["params"], ENC_KW["depth"])
    mesh = make_mesh_pp(4)
    pp_model = PrithviViT(**ENC_KW, block_layout="pipeline", pp_mesh=mesh,
                          pp_microbatches=2)
    out_pp = pp_model.apply({"params": stacked}, x)
    np.testing.assert_allclose(out_pp, out, rtol=2e-5, atol=2e-5)


def test_pipeline_without_mesh_degrades_to_scan(loop_model_and_out):
    _, variables, x, out = loop_model_and_out
    stacked = stack_block_params(variables["params"], ENC_KW["depth"])
    pp_model = PrithviViT(**ENC_KW, block_layout="pipeline")  # no mesh
    out_pp = pp_model.apply({"params": stacked}, x)
    np.testing.assert_allclose(out_pp, out, rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_loop(loop_model_and_out):
    model, variables, x, out = loop_model_and_out
    stacked = stack_block_params(variables["params"], ENC_KW["depth"])
    mesh = make_mesh_pp(4)
    pp_model = PrithviViT(**ENC_KW, block_layout="pipeline", pp_mesh=mesh,
                          pp_microbatches=2)

    def loss_pp(p):
        return jnp.mean(pp_model.apply({"params": p}, x) ** 2)

    def loss_loop(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_loop = stack_block_params(jax.grad(loss_loop)(variables["params"]),
                                ENC_KW["depth"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6),
        g_pp, g_loop)


def test_pipeline_blocks_validates():
    mesh = make_mesh_pp(4)
    stacked = {"w": jnp.zeros((6, 3, 3))}  # depth 6 not divisible by 4
    with pytest.raises(ValueError, match="divisible"):
        pipeline_blocks(stacked, jnp.zeros((8, 4, 3)), lambda p, x: x,
                        mesh=mesh, microbatches=2)
    with pytest.raises(ValueError, match="pipe"):
        pipeline_blocks({"w": jnp.zeros((4, 3, 3))}, jnp.zeros((8, 4, 3)),
                        lambda p, x: x, mesh=make_mesh(8), microbatches=2)


def test_pp_specs_and_place():
    mesh = make_mesh_pp(4)
    params = {
        "prithvi_encoder": {
            "blocks": {"attn": {"kernel": jnp.zeros((4, 8, 8))}},
            "norm": {"scale": jnp.zeros((8,))},
        },
        "head_conv": {"kernel": jnp.zeros((1, 1, 8, 2))},
    }
    specs = pp_specs(params)
    assert specs["prithvi_encoder"]["blocks"]["attn"]["kernel"] == P("pipe")
    assert specs["prithvi_encoder"]["norm"]["scale"] == P()
    assert specs["head_conv"]["kernel"] == P()
    placed = pp_place(params, mesh)
    assert placed["prithvi_encoder"]["blocks"]["attn"][
        "kernel"].sharding.spec == P("pipe")


def test_mesh_from_config_pp():
    mesh = mesh_from_config({"pp": 4})
    assert has_pipe_axis(mesh)
    assert dict(mesh.shape) == {"data": 2, "pipe": 4}
    with pytest.raises(ValueError, match="mutually exclusive"):
        mesh_from_config({"pp": 2, "tp": 2})


def test_trainer_pp_matches_dp_trajectory():
    """Full Trainer: 3 AdamW steps under pp=4×dp=2 track plain 8-way DP."""
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    base = {
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 16,
        "train.ignore_index": -1,
        "tpu.precision": "f32",
    }
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(16, 32, 32)).astype(np.int32)

    cfg0 = load_config("config", overrides=base)
    m0, v0 = create_model(cfg0)
    v0 = jax.tree.map(np.asarray, v0)  # host copies (trainers donate)
    depth = sum(1 for k in v0["params"]["prithvi_encoder"]
                if k.startswith("blocks_"))
    p1 = dict(v0["params"])
    p1["prithvi_encoder"] = stack_block_params(
        v0["params"]["prithvi_encoder"], depth)
    v1 = {"params": jax.tree.map(np.asarray, p1),
          **{k: v for k, v in v0.items() if k != "params"}}

    t0 = Trainer(cfg0, m0, v0, mesh=make_mesh(8))
    losses0 = [t0.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0),
                                  16)["train_loss"] for _ in range(3)]

    cfg1 = load_config("config",
                       overrides={**base, "tpu.pp": 4,
                                  "tpu.pp_microbatches": 2})
    m1, _ = create_model(cfg1)
    assert m1.block_layout == "pipeline"  # tpu.pp implies it
    t1 = Trainer(cfg1, m1, v1, mesh=mesh_from_config(cfg1.get("tpu")))
    # Stacked blocks sharded over pipe; moments will mirror via pp_specs.
    blk_leaf = jax.tree.leaves(
        t1.state.params["prithvi_encoder"]["blocks"])[0]
    assert blk_leaf.sharding.spec == P("pipe")
    losses1 = [t1.run_train_epoch(iter([(x, y)]), jax.random.PRNGKey(0),
                                  16)["train_loss"] for _ in range(3)]
    np.testing.assert_allclose(losses0, losses1, rtol=2e-4)


def test_factory_rejects_pp_with_tp():
    from instageo_tpu.train.factory import build_model

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "model.model_name": "prithvi_eo_tiny",
        "tpu.pp": 2, "tpu.tp": 2,
    })
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_model(cfg)


def test_factory_stacks_loaded_checkpoint(tmp_path, loop_model_and_out):
    """A loop-layout torch checkpoint loads into a scan-layout model."""
    from instageo_tpu.train.factory import _match_block_layout

    _, variables, _, _ = loop_model_and_out

    class FakeModel:
        block_layout = "scan"

    converted = _match_block_layout({"params": {
        "prithvi_encoder": dict(variables["params"])}}, FakeModel())
    assert "blocks" in converted["params"]["prithvi_encoder"]
    back = _match_block_layout(
        converted, type("M", (), {"block_layout": "loop"})())
    jax.tree.map(
        np.testing.assert_array_equal,
        back["params"]["prithvi_encoder"], variables["params"])
