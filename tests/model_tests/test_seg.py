"""Tests for the PrithviSeg decoder: torch parity + shape semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from instageo_tpu.models.seg import ConvTranspose2dTorch, PrithviSeg, create_prithvi_seg


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(0)
    b, h, w, cin, cout = 2, 7, 7, 8, 4
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)

    mod = ConvTranspose2dTorch(cout)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (b, 2 * h, 2 * w, cout)

    # Convert our HWIO correlation kernel back to torch layout: torch
    # ConvTranspose2d weight is (I, O, kh, kw) = flip(our kernel).T on the
    # spatial dims (see models/checkpoint.py for the forward conversion).
    kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, I, O)
    bias = np.asarray(params["params"]["bias"])
    tconv = torch.nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1, output_padding=1)
    with torch.no_grad():
        w_t = torch.from_numpy(kernel[::-1, ::-1].copy()).permute(2, 3, 0, 1)
        tconv.weight.copy_(w_t)
        tconv.bias.copy_(torch.from_numpy(bias))
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_prithvi_seg_tiny_shapes():
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=3, temporal_step=1,
                               image_size=32, num_bands=6)
    x = jnp.zeros((2, 6, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    logits = model.apply(variables, x)
    # tiny: patch 16 -> grid 2x2, 4 upscaling x2 stages -> 32x32.
    assert logits.shape == (2, 3, 32, 32)

    logits2, feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, 256, 2, 2)  # (B, D*T, s, s)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_prithvi_seg_train_mode_updates_batch_stats():
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=2, temporal_step=1,
                               image_size=32, num_bands=6)
    x = jnp.ones((2, 6, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 2, 32, 32)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_prithvi_seg_multitemporal_channel_layout():
    """Channel layout after the token reshape must be d-major, t-minor."""
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=2, temporal_step=2,
                               image_size=32, num_bands=6)
    x = jnp.zeros((1, 6, 2, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (1, 512, 2, 2)  # D*T = 256*2


@pytest.mark.parametrize("variant,expected_out", [
    ("prithvi_eo_tiny", 32),
])
def test_head_output_resolution(variant, expected_out):
    model = create_prithvi_seg(variant, num_classes=2, image_size=32, num_bands=6)
    x = jnp.zeros((1, 6, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape[-1] == expected_out


def test_v2_600_kernel_shrink_formula():
    """k=5/7 with padding=1 shrink the map exactly like the reference.

    Per stage: out = 2*in (convT) - (k - 3). For s0=2 (img 32, p14 -> side
    2 after int sqrt), stages k=(5,5,5,7): 2,4->2? — just verify against the
    composed formula on the real model.
    """
    side = 2  # encoder side for image_size=28, patch 14
    expected = side
    for k in (5, 5, 5, 7):
        expected = 2 * expected - (k - 3)
    model = create_prithvi_seg("prithvi_eo_v2_600", num_classes=2, image_size=28,
                               num_bands=6, depth=1)
    x = jnp.zeros((1, 6, 1, 28, 28))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2, expected, expected)


def test_remat_training_grad():
    """tpu.remat (per-block jax.checkpoint) must stay differentiable,
    including with attn_impl=auto — the deterministic flag has to pass
    through nn.remat as a STATIC argument (traced, the impl branch
    raised TracerBoolConversionError)."""
    import jax
    import jax.numpy as jnp

    from instageo_tpu.models.seg import create_prithvi_seg

    m = create_prithvi_seg("prithvi_eo_tiny", num_classes=2, temporal_step=1,
                           image_size=32, num_bands=6, attn_impl="auto",
                           remat=True)
    x = jnp.zeros((4, 6, 1, 32, 32), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out, _ = m.apply({**v, "params": p}, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(v["params"])
    import numpy as np
    assert all(np.isfinite(leaf).all() for leaf in jax.tree.leaves(g))


def test_fast_head_shapes_and_training():
    """model.head_impl=fast (round 4): 3 lane-filling stages + half-res
    classifier + bilinear logit resize. Output shape matches the torch
    head's for k=3 variants; training (dropout+BN+grad) works; the param
    scopes are fast_* so a cross-impl checkpoint resume fails loudly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instageo_tpu.models.seg import create_prithvi_seg

    m = create_prithvi_seg("prithvi_eo_tiny", num_classes=3, temporal_step=1,
                           image_size=32, num_bands=6, head_impl="fast")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 6, 1, 32, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert "fast_up_0" in p and "fast_head_conv" in p
    assert "up_0" not in p and "head_conv" not in p
    # 128-channel floor: tiny embed_dim=256 -> stages (128, 128, 128).
    assert p["fast_up_0"]["convt"]["kernel"].shape[-1] == 128
    assert p["fast_up_2"]["conv"]["kernel"].shape[-1] == 128

    out = m.apply(v, x)
    assert out.shape == (2, 3, 32, 32)  # full input resolution (resized)

    def loss(params):
        logits, _ = m.apply({**v, "params": params}, x, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
        return (logits.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(p)
    assert all(np.isfinite(leaf).all() for leaf in jax.tree.leaves(g))

    # channels_last serving path keeps NHWC at full resolution too.
    nhwc = m.apply(v, x, channels_last=True)
    assert nhwc.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(nhwc).transpose(0, 3, 1, 2),
                               np.asarray(out), atol=1e-6)


def test_fast_head_config_plumbing():
    """model.head_impl flows through the factory; typos are rejected."""
    import pytest as _pytest

    from instageo_tpu.configs.config import load_config
    from instageo_tpu.train.factory import build_model

    cfg = load_config("config", overrides={
        "model.head_impl": "fast", "dataloader.img_size": 32,
        "model.load_pretrained_weights": False})
    assert build_model(cfg).head_impl == "fast"
    bad = load_config("config", overrides={
        "model.head_impl": "fsat", "dataloader.img_size": 32,
        "model.load_pretrained_weights": False})
    with _pytest.raises(ValueError, match="head_impl"):
        build_model(bad)
