"""Tests for the round-3 self-review fixes (see git log): eval-scan HBM
re-clamp, legacy qkv checkpoint migration, knob validation, channels_last
+ return_features, and the rbg re-key entropy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instageo_tpu.configs.config import load_config
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import Trainer


def _tiny_cfg(**extra):
    return load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": [0, 1, 2, 3, 4, 5],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": 8, "train.ignore_index": -1,
        "tpu.precision": "f32", **extra,
    })


def test_k_for_reclamps_auto_steps_for_large_eval_batches():
    """steps_per_call=auto sized k from train.batch_size; an eval caller
    passing a much larger batch must not stage k of THOSE (HBM blowup)."""
    cfg = _tiny_cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables)
    # Simulate the TPU-side auto resolution (CPU resolves auto to 1).
    trainer._auto_spc = True
    trainer.steps_per_call = 8
    assert trainer._k_for(8) == 8
    # 512 MB / (batch * 6 bands * 32^2 px * 4 B) -> re-clamped down.
    huge = (512 << 20) // trainer._sample_bytes  # k*batch would be 8x cap
    assert trainer._k_for(huge) == 1
    # An explicitly configured k is honored as-is.
    trainer._auto_spc = False
    assert trainer._k_for(huge) == 8


def test_migrate_param_tree_reshapes_legacy_qkv():
    from instageo_tpu.train.checkpointing import migrate_param_tree

    d, h, dh = 8, 2, 4
    legacy = {"attn": {"qkv": {"kernel": np.arange(d * 3 * h * dh,
                                                   dtype=np.float32)
                               .reshape(d, 3 * h * dh),
                               "bias": np.zeros(3 * h * dh, np.float32)}}}
    live = {"attn": {"qkv": {"kernel": np.zeros((d, 3, h, dh), np.float32),
                             "bias": np.zeros((3, h, dh), np.float32)}}}
    out = migrate_param_tree(legacy, live)
    k = out["attn"]["qkv"]["kernel"]
    assert k.shape == (d, 3, h, dh)
    # Pure reshape: same memory order.
    np.testing.assert_array_equal(
        k.reshape(d, -1), legacy["attn"]["qkv"]["kernel"])
    with pytest.raises(ValueError, match="incompatible"):
        migrate_param_tree({"x": np.zeros(3)}, {"x": np.zeros(4)})


def test_load_finetuned_migrates_legacy_checkpoint(tmp_path):
    """An orbax checkpoint written with the pre-round-3 flat qkv layout
    loads into the current head-structured model."""
    import orbax.checkpoint as ocp

    from instageo_tpu.train.factory import load_finetuned

    cfg = _tiny_cfg()
    model, variables = create_model(cfg)

    def flatten_qkv(path, x):
        p = "/".join(getattr(k, "key", str(k)) for k in path)
        if p.endswith("attn/qkv/kernel"):
            return np.asarray(x).reshape(x.shape[0], -1)
        if p.endswith("attn/qkv/bias"):
            return np.asarray(x).reshape(-1)
        return np.asarray(x)

    legacy_params = jax.tree_util.tree_map_with_path(
        flatten_qkv, variables["params"])
    ckpt = tmp_path / "legacy_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), {"step": np.int32(0), "params": legacy_params,
                           "batch_stats": variables.get("batch_stats", {})})
    ckptr.wait_until_finished()

    restored = load_finetuned(str(ckpt), model, cfg, variables)
    qkv = restored["params"]["prithvi_encoder"]["blocks_0"]["attn"]["qkv"]
    expect = variables["params"]["prithvi_encoder"]["blocks_0"]["attn"]["qkv"]
    assert qkv["kernel"].shape == expect["kernel"].shape
    np.testing.assert_allclose(np.asarray(qkv["kernel"]),
                               np.asarray(expect["kernel"]))
    # And the model can run a forward with the restored tree.
    x = jnp.zeros((1, 6, 1, 32, 32), jnp.float32)
    out = model.apply({"params": restored["params"],
                       "batch_stats": restored["batch_stats"]},
                      x, train=False)
    assert out.shape[0] == 1


def test_trainer_restore_migrates_legacy_checkpoint(tmp_path):
    """trainer.restore on a legacy-layout checkpoint migrates params and
    re-initializes the optimizer state instead of crashing."""
    import orbax.checkpoint as ocp

    cfg = _tiny_cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables)

    def flatten_qkv(path, x):
        p = "/".join(getattr(k, "key", str(k)) for k in path)
        x = np.asarray(jax.device_get(x))
        if p.endswith("attn/qkv/kernel"):
            return x.reshape(x.shape[0], -1) + 1.0  # distinguishable
        if p.endswith("attn/qkv/bias"):
            return x.reshape(-1)
        return x

    legacy_params = jax.tree_util.tree_map_with_path(
        flatten_qkv, jax.device_get(trainer.state.params))
    ckpt = tmp_path / "legacy_resume"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), {"step": np.int32(5), "params": legacy_params,
                           "batch_stats": jax.device_get(
                               trainer.state.batch_stats)})
    ckptr.wait_until_finished()

    trainer.restore(str(ckpt))
    assert int(jax.device_get(trainer.state.step)) == 5
    qkv = trainer.state.params["prithvi_encoder"]["blocks_0"]["attn"]["qkv"]
    init_qkv = variables["params"]["prithvi_encoder"]["blocks_0"]["attn"]["qkv"]
    assert qkv["kernel"].shape == init_qkv["kernel"].shape
    np.testing.assert_allclose(
        np.asarray(jax.device_get(qkv["kernel"])),
        np.asarray(jax.device_get(init_qkv["kernel"])) + 1.0)


def test_factory_rejects_bad_knobs():
    with pytest.raises(ValueError, match="tpu.gelu"):
        create_model(_tiny_cfg(**{"tpu.gelu": "tahn"}))
    with pytest.raises(ValueError, match="tpu.attn_impl"):
        create_model(_tiny_cfg(**{"tpu.attn_impl": "palas"}))


def test_channels_last_with_return_features():
    cfg = _tiny_cfg()
    model, variables = create_model(cfg)
    x = jnp.zeros((1, 6, 1, 32, 32), jnp.float32)
    logits, feats = model.apply(variables, x, train=False,
                                channels_last=True, return_features=True)
    assert logits.shape[0] == 1 and logits.shape[-1] == 2  # NHWC
    assert feats.ndim == 4 and feats.shape[0] == 1


def test_epoch_rng_uses_both_key_words():
    """Distinct high words of the threefry key must produce distinct rbg
    streams (the old re-key kept only the low 32 bits)."""
    cfg = _tiny_cfg()
    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables)
    trainer._rng_impl = "rbg"
    # Two keys sharing the low word but differing in the high word.
    k1 = jax.random.wrap_key_data(np.array([1, 42], np.uint32))
    k2 = jax.random.wrap_key_data(np.array([2, 42], np.uint32))
    r1 = trainer._epoch_rng(k1)
    r2 = trainer._epoch_rng(k2)
    b1 = jax.random.bits(r1, (4,), jnp.uint32)
    b2 = jax.random.bits(r2, (4,), jnp.uint32)
    assert not np.array_equal(np.asarray(b1), np.asarray(b2))
