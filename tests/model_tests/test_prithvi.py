"""Numerics tests for the Prithvi encoder: parity vs torch primitives.

Each critical layer is checked against the equivalent torch op with shared
weights — validating both the math and the checkpoint weight-layout
conversions (reference semantics: instageo/model/pritvhi.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from instageo_tpu.models.prithvi import (
    Block,
    PatchEmbed3D,
    PrithviViT,
    _resize_bicubic_align_corners,
    get_1d_sincos_pos_embed_from_grid,
    get_3d_sincos_pos_embed,
    interpolate_pos_encoding,
)


def test_1d_sincos_matches_formula():
    d, m = 32, 7
    pos = np.arange(m, dtype=np.float32)
    emb = get_1d_sincos_pos_embed_from_grid(d, pos)
    assert emb.shape == (m, d)
    omega = 1.0 / 10000 ** (np.arange(d // 2) / (d / 2.0))
    np.testing.assert_allclose(emb[:, : d // 2], np.sin(np.outer(pos, omega)), atol=1e-6)
    np.testing.assert_allclose(emb[:, d // 2 :], np.cos(np.outer(pos, omega)), atol=1e-6)


def test_3d_sincos_layout():
    d = 64  # divisible by 16
    t, h, w = 2, 3, 4
    emb = get_3d_sincos_pos_embed(d, (t, h, w), cls_token=True)
    assert emb.shape == (1 + t * h * w, d)
    np.testing.assert_array_equal(emb[0], np.zeros(d))
    # Token (t0,h0,w0) vs (t0,h0,w1): only the w-section (first 6/16·d) differs.
    w_dim = d // 16 * 6
    tok = emb[1:]
    assert not np.allclose(tok[0, :w_dim], tok[1, :w_dim])
    np.testing.assert_allclose(tok[0, w_dim:], tok[1, w_dim:], atol=1e-6)
    # (t0,h0,w0) vs (t1,h0,w0): only the t-section (last 4/16·d) differs.
    t_dim = d // 16 * 4
    stride_t = h * w
    np.testing.assert_allclose(tok[0, : d - t_dim], tok[stride_t, : d - t_dim], atol=1e-6)
    assert not np.allclose(tok[0, d - t_dim :], tok[stride_t, d - t_dim :])


def test_bicubic_align_corners_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 9)).astype(np.float32)
    out = _resize_bicubic_align_corners(jnp.asarray(x), (14, 18))
    ref = F.interpolate(
        torch.from_numpy(x), size=(14, 18), mode="bicubic", align_corners=True
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_patch_embed_matches_conv3d():
    rng = np.random.default_rng(1)
    b, c, t, h, w = 2, 6, 3, 32, 32
    patch = (1, 16, 16)
    d = 64
    x = rng.standard_normal((b, c, t, h, w)).astype(np.float32)

    mod = PatchEmbed3D(patch_size=patch, embed_dim=d)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    # Same weights through torch Conv3d(kernel=stride=patch).
    kernel = np.asarray(params["params"]["proj"]["kernel"])  # (c*pt*ph*pw, d)
    bias = np.asarray(params["params"]["proj"]["bias"])
    conv = torch.nn.Conv3d(c, d, kernel_size=patch, stride=patch)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel.T.reshape(d, c, *patch)))
        conv.bias.copy_(torch.from_numpy(bias))
        ref = conv(torch.from_numpy(x))  # (b, d, t, h/16, w/16)
        ref = ref.flatten(2).transpose(1, 2).numpy()  # (b, L, d)

    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def _torch_block(x, p, num_heads):
    """timm-Block-equivalent forward in torch from our param tree."""

    def t(a):
        return torch.from_numpy(np.asarray(a))

    xt = torch.from_numpy(x)
    h = F.layer_norm(xt, (x.shape[-1],), t(p["norm1"]["scale"]), t(p["norm1"]["bias"]), 1e-5)
    # Our qkv kernel is head-structured (D, 3, H, Dh); torch's fused Linear
    # view is the flattened (D, 3D) matrix.
    d = x.shape[-1]
    qkv = (h @ t(p["attn"]["qkv"]["kernel"]).reshape(d, -1)
           + t(p["attn"]["qkv"]["bias"]).reshape(-1))
    b, l, _ = qkv.shape
    qkv = qkv.reshape(b, l, 3, num_heads, d // num_heads).permute(2, 0, 3, 1, 4)
    attn_out = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
    attn_out = attn_out.transpose(1, 2).reshape(b, l, d)
    attn_out = attn_out @ t(p["attn"]["proj"]["kernel"]) + t(p["attn"]["proj"]["bias"])
    xt = xt + attn_out
    h = F.layer_norm(xt, (d,), t(p["norm2"]["scale"]), t(p["norm2"]["bias"]), 1e-5)
    h = h @ t(p["mlp"]["fc1"]["kernel"]) + t(p["mlp"]["fc1"]["bias"])
    h = F.gelu(h)  # exact erf gelu, like timm's nn.GELU()
    h = h @ t(p["mlp"]["fc2"]["kernel"]) + t(p["mlp"]["fc2"]["bias"])
    return (xt + h).numpy()


def test_block_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 32)).astype(np.float32)
    mod = Block(num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = _torch_block(x, params["params"], num_heads=4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_vit_forward_shapes_and_pos_embed():
    mod = PrithviViT(
        img_size=32, patch_size=(1, 16, 16), num_frames=2, in_chans=6,
        embed_dim=64, depth=2, num_heads=4,
    )
    x = jnp.zeros((2, 6, 2, 32, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 1 + 2 * 2 * 2, 64)

    # With zero input and zero projection bias untouched, the tokens before
    # blocks equal the pos embed; just check determinism instead.
    out2 = mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_vit_accepts_4d_input_when_temporal_patch_is_1():
    mod = PrithviViT(
        img_size=32, patch_size=(1, 16, 16), num_frames=1, in_chans=3,
        embed_dim=64, depth=1, num_heads=4,
    )
    x = jnp.zeros((1, 3, 32, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(params, x).shape == (1, 5, 64)


def test_interpolate_pos_encoding_identity_and_resize():
    grid = (2, 4, 4)
    same = interpolate_pos_encoding(64, grid, (1, 16, 16), (2, 64, 64))
    np.testing.assert_allclose(
        np.asarray(same)[0], get_3d_sincos_pos_embed(64, grid, cls_token=True), atol=1e-6
    )
    # Different frame count: regenerated for new t.
    newt = interpolate_pos_encoding(64, grid, (1, 16, 16), (3, 64, 64))
    assert newt.shape == (1, 1 + 3 * 16, 64)
    # Different spatial size: bicubic resize.
    news = interpolate_pos_encoding(64, grid, (1, 16, 16), (2, 128, 128))
    assert news.shape == (1, 1 + 2 * 64, 64)


def test_tl_variant_has_scale_params():
    mod = PrithviViT(
        img_size=32, patch_size=(1, 16, 16), num_frames=1, in_chans=3,
        embed_dim=64, depth=1, num_heads=4,
        coords_encoding=("time", "location"), coords_scale_learn=True,
    )
    x = jnp.zeros((1, 3, 1, 32, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    assert "temporal_embed_enc" in p and "location_embed_enc" in p
    np.testing.assert_allclose(np.asarray(p["temporal_embed_enc"]["scale"]), [0.1])

    # Forward with coords changes the output.
    base = mod.apply(params, x)
    tc = jnp.asarray([[[2020.0, 120.0]]])
    lc = jnp.asarray([[10.0, 20.0]])
    withc = mod.apply(params, x, temporal_coords=tc, location_coords=lc)
    assert not np.allclose(np.asarray(base), np.asarray(withc))


def test_temporal_location_encoders_match_torch():
    """TL encoder NUMERICAL parity (round-4, VERDICT #3): the jax
    Temporal/LocationEncoder activations equal the reference math
    (pritvhi.py:273-367) ported to torch, with a non-trivial learned
    scale so the scale wiring is exercised, not just existence."""
    from tests.model_tests.torch_ref import (location_encoder_forward,
                                             temporal_encoder_forward)
    from instageo_tpu.models.prithvi import LocationEncoder, TemporalEncoder

    d = 256
    sd = {"temporal_embed_enc.scale": np.asarray([0.37], np.float32),
          "location_embed_enc.scale": np.asarray([-0.21], np.float32)}
    tc = np.asarray([[[2020.0, 120.0], [2021.0, 241.0], [2023.0, 15.0]],
                     [[2013.0, 1.0], [2019.0, 365.0], [2024.0, 366.0]]],
                    np.float32)
    lc = np.asarray([[10.5, 20.25], [-33.9, 151.2]], np.float32)

    tenc = TemporalEncoder(d, trainable_scale=True)
    tvars = {"params": {"scale": jnp.asarray(sd["temporal_embed_enc.scale"])}}
    ours_t = np.asarray(tenc.apply(tvars, jnp.asarray(tc),
                                   tokens_per_frame=4))
    ref_t = temporal_encoder_forward(torch.from_numpy(tc), sd, d,
                                     tokens_per_frame=4).numpy()
    assert ours_t.shape == ref_t.shape == (2, 12, d)
    np.testing.assert_allclose(ours_t, ref_t, atol=2e-5, rtol=1e-5)

    lenc = LocationEncoder(d, trainable_scale=True)
    lvars = {"params": {"scale": jnp.asarray(sd["location_embed_enc.scale"])}}
    ours_l = np.asarray(lenc.apply(lvars, jnp.asarray(lc)))
    ref_l = location_encoder_forward(torch.from_numpy(lc), sd, d).numpy()
    assert ours_l.shape == ref_l.shape == (2, 1, d)
    np.testing.assert_allclose(ours_l, ref_l, atol=2e-5, rtol=1e-5)


def test_tl_forward_matches_torch_end_to_end():
    """Full encoder forward WITH coords vs the torch replica sharing the
    same weights: validates the TL embeddings' integration points
    (pre-cls addition, per-frame repeat, broadcast over tokens)."""
    from instageo_tpu.models.checkpoint import vit_params_from_torch
    from instageo_tpu.models.registry import PRETRAINED_BANDS, get_arch
    from tests.model_tests.torch_ref import make_vit_state_dict, vit_forward

    arch = get_arch("prithvi_eo_tiny", in_chans=6, num_frames=2, img_size=32,
                    coords_encoding=("time", "location"),
                    coords_scale_learn=True)
    rng = np.random.default_rng(9)
    sd = make_vit_state_dict(rng, patch_size=tuple(arch.patch_size),
                             in_chans=6, embed_dim=arch.embed_dim,
                             depth=arch.depth, tl=True)
    params = vit_params_from_torch(sd, arch, PRETRAINED_BANDS,
                                   list(PRETRAINED_BANDS))
    assert np.allclose(np.asarray(params["temporal_embed_enc"]["scale"]),
                       [0.37])

    model = PrithviViT(
        img_size=32, patch_size=tuple(arch.patch_size), num_frames=2,
        in_chans=6, embed_dim=arch.embed_dim, depth=arch.depth,
        num_heads=arch.num_heads, coords_encoding=("time", "location"),
        coords_scale_learn=True,
    )
    x = rng.normal(size=(2, 6, 2, 32, 32)).astype(np.float32)
    tc = np.asarray([[[2020.0, 120.0], [2020.0, 136.0]],
                     [[2021.0, 5.0], [2021.0, 21.0]]], np.float32)
    lc = np.asarray([[10.0, 20.0], [-35.0, 150.0]], np.float32)
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x),
        temporal_coords=jnp.asarray(tc), location_coords=jnp.asarray(lc)))
    ref = vit_forward(
        torch.from_numpy(x), sd, patch_size=tuple(arch.patch_size),
        embed_dim=arch.embed_dim, depth=arch.depth,
        num_heads=arch.num_heads,
        temporal_coords=torch.from_numpy(tc),
        location_coords=torch.from_numpy(lc)).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)
    # The TL terms must actually matter: without coords the outputs differ.
    base = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert not np.allclose(base, ref, atol=5e-4)


def test_gelu_variants_close_to_exact():
    """tpu.gelu serving knobs (tanh/bf16) stay within activation-level
    tolerance of the exact-erf default on realistic magnitudes."""
    from instageo_tpu.models.prithvi import Mlp

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 10, 32)).astype(np.float32))
    exact = Mlp(64, 32, dtype=jnp.bfloat16, gelu="exact")
    variables = exact.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(exact.apply(variables, x), np.float32)
    for impl in ("tanh", "bf16"):
        out = np.asarray(Mlp(64, 32, dtype=jnp.bfloat16, gelu=impl).apply(
            variables, x), np.float32)
        np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
