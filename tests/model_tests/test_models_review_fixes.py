"""Models/ops review fixes: band surgery through the factory, preprocess
crop conditions, torch-parity conv inits, and dropout edge rates."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.model_tests import torch_ref


def test_factory_band_surgery_for_non_pretrained_band_count(tmp_path):
    """12-band model + 6-band pretrained checkpoint: the patch embed is
    tiled per the reference (model.py:330) instead of crashing at the
    first forward with a 6-channel kernel."""
    from instageo_tpu.configs.config import load_config
    from instageo_tpu.models.registry import get_arch
    from instageo_tpu.train.factory import create_model

    rng = np.random.default_rng(0)
    arch = get_arch("prithvi_eo_tiny", in_chans=6, num_frames=1, img_size=32)
    sd = torch_ref.make_vit_state_dict(
        rng, patch_size=(1, 16, 16), in_chans=6, embed_dim=arch.embed_dim,
        depth=arch.depth)
    ckpt = tmp_path / "pretrained.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(ckpt))

    cfg = load_config("config", overrides={
        "dataloader.img_size": 32,
        "dataloader.bands": list(range(12)),  # 2x the pretrained bands
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": True,
        "model.pretrained_path": str(ckpt),
        "tpu.precision": "f32",
    })
    model, variables = create_model(cfg)
    w = variables["params"]["prithvi_encoder"]["patch_embed"]["proj"]["kernel"]
    assert w.shape[0] == 12 * 16 * 16  # flattened 12-band patch rows
    x = jnp.zeros((1, 12, 1, 32, 32), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape[0] == 1
    # Tiled surgery: band i and band i+6 copy the same pretrained channel.
    w3 = np.asarray(w).reshape(12, 16 * 16, -1)
    np.testing.assert_allclose(w3[0], w3[6], rtol=1e-6)


def test_preprocess_crop_checks_both_dims():
    from instageo_tpu.ops.preprocess import preprocess_chips

    mean, std = jnp.zeros(6), jnp.ones(6)
    tall = jnp.zeros((1, 6, 48, 32), jnp.uint16)
    out = preprocess_chips(tall, mean, std, img_size=32)
    assert out.shape[-2:] == (32, 32)  # height cropped too
    small = jnp.zeros((1, 6, 24, 32), jnp.uint16)
    with pytest.raises(ValueError, match="smaller than"):
        preprocess_chips(small, mean, std, img_size=32)


def test_convtranspose_init_matches_torch_statistics():
    """ConvT kernels draw from U(±1/sqrt(k²·OUT)) — torch computes fan_in
    from weight.size(1), the out-channel dim of ConvTranspose2d — and
    biases are uniform, not zeros."""
    from instageo_tpu.models.seg import ConvTranspose2dTorch

    m = ConvTranspose2dTorch(features=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)))
    k = np.asarray(v["params"]["kernel"])  # (3, 3, 64, 16)
    bound = 1.0 / np.sqrt(3 * 3 * 16)
    assert abs(k).max() <= bound + 1e-7
    # Spread fills the bound (a fan_in init would cap at bound/2).
    assert abs(k).max() > bound * 0.9
    b = np.asarray(v["params"]["bias"])
    assert abs(b).max() > 0  # uniform, not zeros
    assert abs(b).max() <= bound + 1e-7


def test_dropout_edge_rates():
    from instageo_tpu.models.seg import TPUDropout

    x = jnp.ones((4, 64), jnp.float32)
    # rate >= 1: everything dropped, no division by zero.
    out = TPUDropout(1.0).apply({}, x, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(0)})
    assert (np.asarray(out) == 0).all()
    # bits8 with a rate whose keep prob rounds to 0: clamps to 1/256 and
    # produces finite grads.
    drop = TPUDropout(0.999, impl="bits8")

    def loss(x):
        y = drop.apply({}, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
        return (y ** 2).sum()

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_dropout_rejects_rate_one():
    from instageo_tpu.ops.dropout import fused_dropout

    with pytest.raises(ValueError, match="rate"):
        fused_dropout(jnp.ones((8, 128)), jnp.int32(0), 1.0)
