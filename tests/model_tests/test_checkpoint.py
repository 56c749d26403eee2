"""End-to-end checkpoint conversion parity: torch state dict -> JAX forward."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from instageo_tpu.models.checkpoint import (
    filter_checkpoint_vit,
    select_patch_embed_weights,
    seg_variables_from_torch,
    vit_params_from_torch,
)
from instageo_tpu.models.prithvi import PrithviViT
from instageo_tpu.models.registry import PRETRAINED_BANDS, get_arch
from instageo_tpu.models.seg import PrithviSeg

from tests.model_tests import torch_ref


def _tiny_arch(**kw):
    return get_arch("prithvi_eo_tiny", in_chans=6, num_frames=1, img_size=32, **kw)


def test_vit_conversion_forward_parity():
    rng = np.random.default_rng(0)
    arch = _tiny_arch()
    sd = torch_ref.make_vit_state_dict(
        rng, patch_size=(1, 16, 16), in_chans=6, embed_dim=arch.embed_dim,
        depth=arch.depth,
    )
    x = rng.standard_normal((2, 6, 1, 32, 32)).astype(np.float32)

    ref = torch_ref.vit_forward(
        torch.from_numpy(x), sd, patch_size=(1, 16, 16),
        embed_dim=arch.embed_dim, depth=arch.depth, num_heads=arch.num_heads,
    ).numpy()

    params = vit_params_from_torch(sd, arch, model_bands=PRETRAINED_BANDS)
    model = PrithviViT(
        img_size=32, patch_size=(1, 16, 16), num_frames=1, in_chans=6,
        embed_dim=arch.embed_dim, depth=arch.depth, num_heads=arch.num_heads,
    )
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_seg_conversion_forward_parity():
    rng = np.random.default_rng(1)
    arch = _tiny_arch()
    sd = torch_ref.make_seg_state_dict(
        rng, patch_size=(1, 16, 16), in_chans=6, embed_dim=arch.embed_dim,
        depth=arch.depth, num_frames=1, num_classes=3,
    )
    x = rng.standard_normal((2, 6, 1, 32, 32)).astype(np.float32)

    ref = torch_ref.seg_forward(
        torch.from_numpy(x), sd, patch_size=(1, 16, 16), embed_dim=arch.embed_dim,
        depth=arch.depth, num_heads=arch.num_heads, num_frames=1,
    ).numpy()

    variables = seg_variables_from_torch(
        {"net." + k: v for k, v in sd.items()}, arch
    )
    model = PrithviSeg(variant="prithvi_eo_tiny", num_classes=3, temporal_step=1,
                       image_size=32, in_chans=6)
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-3)


def test_filter_drops_decoder_and_strips_prefix():
    rng = np.random.default_rng(2)
    arch = _tiny_arch(depth=2)
    base = torch_ref.make_vit_state_dict(
        rng, patch_size=(1, 16, 16), in_chans=6, embed_dim=arch.embed_dim, depth=4,
    )
    sd = {"encoder." + k: v for k, v in base.items()}
    sd["mask_token"] = np.zeros((1, 1, arch.embed_dim), np.float32)
    sd["decoder_embed.weight"] = np.zeros((4, 4), np.float32)
    sd["encoder.pos_embed"] = np.zeros((1, 5, arch.embed_dim), np.float32)
    sd["norm_dec.weight"] = np.zeros((4,), np.float32)

    clean = filter_checkpoint_vit(sd, arch)
    assert "mask_token" not in clean
    assert not any("decoder" in k or "_dec" in k or "pos_embed" in k for k in clean)
    assert "patch_embed.proj.weight" in clean  # prefix stripped
    # depth truncation: blocks 2,3 dropped
    assert not any(k.startswith("blocks.2") or k.startswith("blocks.3") for k in clean)
    assert any(k.startswith("blocks.1") for k in clean)


def test_nested_state_dict_unwrapped():
    rng = np.random.default_rng(3)
    arch = _tiny_arch(depth=1)
    base = torch_ref.make_vit_state_dict(
        rng, patch_size=(1, 16, 16), in_chans=6, embed_dim=arch.embed_dim, depth=1,
    )
    clean = filter_checkpoint_vit({"model_state_dict": base}, arch)
    assert "cls_token" in clean


def test_band_surgery_reorders_and_reinits():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((8, 6, 1, 2, 2)).astype(np.float32)
    model_bands = ["RED", "GREEN", "NEW_BAND"]
    out = select_patch_embed_weights(w, PRETRAINED_BANDS, model_bands)
    assert out.shape == (8, 3, 1, 2, 2)
    np.testing.assert_array_equal(out[:, 0], w[:, PRETRAINED_BANDS.index("RED")])
    np.testing.assert_array_equal(out[:, 1], w[:, PRETRAINED_BANDS.index("GREEN")])
    # NEW_BAND gets xavier init, bounded and not copied from anywhere.
    assert not any(np.allclose(out[:, 2], w[:, j]) for j in range(6))
    bound = np.sqrt(6.0 / (3 * 4 + 8))
    assert np.abs(out[:, 2]).max() <= bound + 1e-6


def test_band_repeat_for_multi_band_inputs():
    """Reference repeats PRETRAINED_BANDS for 12/18-band inputs (model.py:330)."""
    rng = np.random.default_rng(5)
    w = rng.standard_normal((8, 6, 1, 2, 2)).astype(np.float32)
    model_bands = PRETRAINED_BANDS * 2
    out = select_patch_embed_weights(w, PRETRAINED_BANDS, model_bands)
    assert out.shape == (8, 12, 1, 2, 2)
    for i, band in enumerate(model_bands):
        np.testing.assert_array_equal(out[:, i], w[:, PRETRAINED_BANDS.index(band)])
