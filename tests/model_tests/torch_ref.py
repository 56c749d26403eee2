"""Functional torch forward passes driven by a flat Prithvi state dict.

Test-only oracle: consumes the documented reference checkpoint layout
(instageo/model/pritvhi.py, model.py) using raw torch primitives, so that
converted JAX parameters can be checked for end-to-end forward parity
without importing (or copying) the reference implementation.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

from instageo_tpu.models.prithvi import get_3d_sincos_pos_embed


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key], dtype=np.float32))


def block_forward(x, sd, prefix, num_heads):
    d = x.shape[-1]
    h = F.layer_norm(x, (d,), _t(sd, f"{prefix}.norm1.weight"), _t(sd, f"{prefix}.norm1.bias"), 1e-5)
    qkv = h @ _t(sd, f"{prefix}.attn.qkv.weight").T + _t(sd, f"{prefix}.attn.qkv.bias")
    b, l, _ = qkv.shape
    qkv = qkv.reshape(b, l, 3, num_heads, d // num_heads).permute(2, 0, 3, 1, 4)
    attn = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
    attn = attn.transpose(1, 2).reshape(b, l, d)
    attn = attn @ _t(sd, f"{prefix}.attn.proj.weight").T + _t(sd, f"{prefix}.attn.proj.bias")
    x = x + attn
    h = F.layer_norm(x, (d,), _t(sd, f"{prefix}.norm2.weight"), _t(sd, f"{prefix}.norm2.bias"), 1e-5)
    h = h @ _t(sd, f"{prefix}.mlp.fc1.weight").T + _t(sd, f"{prefix}.mlp.fc1.bias")
    h = F.gelu(h)
    h = h @ _t(sd, f"{prefix}.mlp.fc2.weight").T + _t(sd, f"{prefix}.mlp.fc2.bias")
    return x + h


def sincos_1d_torch(embed_dim, pos):
    """Reference ``get_1d_sincos_embed_from_grid_torch`` (pritvhi.py:40-65)."""
    omega = torch.arange(embed_dim // 2, dtype=pos.dtype)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = torch.einsum("m,d->md", pos.reshape(-1), omega)
    return torch.cat([torch.sin(out), torch.cos(out)], dim=1)


def temporal_encoder_forward(temporal_coords, sd, embed_dim,
                             tokens_per_frame=None,
                             prefix="temporal_embed_enc"):
    """Reference ``TemporalEncoder.forward`` (pritvhi.py:273-322):
    year/julian-day sincos halves, scaled, repeated per frame."""
    year_dim = embed_dim // 2
    jday_dim = embed_dim - year_dim
    shape = temporal_coords.shape[:2] + (-1,)
    year = sincos_1d_torch(
        year_dim, temporal_coords[:, :, 0].flatten()).reshape(shape)
    jday = sincos_1d_torch(
        jday_dim, temporal_coords[:, :, 1].flatten()).reshape(shape)
    emb = _t(sd, f"{prefix}.scale") * torch.cat([year, jday], dim=-1)
    if tokens_per_frame is not None:
        emb = torch.repeat_interleave(emb, tokens_per_frame, dim=1)
    return emb


def location_encoder_forward(location_coords, sd, embed_dim,
                             prefix="location_embed_enc"):
    """Reference ``LocationEncoder.forward`` (pritvhi.py:325-367)."""
    lat_dim = embed_dim // 2
    lon_dim = embed_dim - lat_dim
    shape = location_coords.shape[:1] + (1, -1)
    lat = sincos_1d_torch(
        lat_dim, location_coords[:, 0].flatten()).reshape(shape)
    lon = sincos_1d_torch(
        lon_dim, location_coords[:, 1].flatten()).reshape(shape)
    return _t(sd, f"{prefix}.scale") * torch.cat([lat, lon], dim=-1)


def vit_forward(x, sd, *, patch_size, embed_dim, depth, num_heads,
                temporal_coords=None, location_coords=None):
    """x: torch (B, C, T, H, W) -> tokens (B, 1+L, D).

    ``temporal_coords``/``location_coords`` apply the TL embeddings the
    way the framework's PrithviViT does when coords are passed (the
    reference constructs the encoders but its forward never applies them
    — pritvhi.py:498-530)."""
    tokens = F.conv3d(
        x, _t(sd, "patch_embed.proj.weight"), _t(sd, "patch_embed.proj.bias"),
        stride=patch_size,
    )
    grid = tuple(s // p for s, p in zip(x.shape[-3:], patch_size))
    tokens = tokens.flatten(2).transpose(1, 2)
    pos = torch.from_numpy(get_3d_sincos_pos_embed(embed_dim, grid, cls_token=True))
    tokens = tokens + pos[1:]
    if temporal_coords is not None:
        tpf = tokens.shape[1] // temporal_coords.shape[1]
        tokens = tokens + temporal_encoder_forward(
            temporal_coords, sd, embed_dim, tpf)
    if location_coords is not None:
        tokens = tokens + location_encoder_forward(
            location_coords, sd, embed_dim)
    cls = (_t(sd, "cls_token") + pos[:1]).expand(x.shape[0], 1, embed_dim)
    tokens = torch.cat([cls, tokens], dim=1)
    for i in range(depth):
        tokens = block_forward(tokens, sd, f"blocks.{i}", num_heads)
    return F.layer_norm(
        tokens, (embed_dim,), _t(sd, "norm.weight"), _t(sd, "norm.bias"), 1e-5
    )


def seg_forward(x, sd, *, patch_size, embed_dim, depth, num_heads, num_frames,
                conv_kernels=(3, 3, 3, 3)):
    """Full PrithviSeg forward in eval mode from a 'net.'-stripped state dict."""
    enc_sd = {k[len("prithvi_encoder."):]: v for k, v in sd.items()
              if k.startswith("prithvi_encoder.")}
    feats = vit_forward(x, enc_sd, patch_size=patch_size, embed_dim=embed_dim,
                        depth=depth, num_heads=num_heads)[:, 1:, :]
    b, l, d = feats.shape
    side = int(math.isqrt(l // num_frames))
    h = feats.permute(0, 2, 1).reshape(b, -1, side, side)
    for i in range(4):
        base = f"segmentation_head.{i}"
        h = F.conv_transpose2d(h, _t(sd, f"{base}.0.weight"), _t(sd, f"{base}.0.bias"),
                               stride=2, padding=1, output_padding=1)
        h = F.conv2d(h, _t(sd, f"{base}.2.weight"), _t(sd, f"{base}.2.bias"), padding=1)
        h = F.batch_norm(h, _t(sd, f"{base}.3.running_mean"), _t(sd, f"{base}.3.running_var"),
                         _t(sd, f"{base}.3.weight"), _t(sd, f"{base}.3.bias"),
                         training=False, eps=1e-5)
        h = F.relu(h)
    return F.conv2d(h, _t(sd, "segmentation_head.5.weight"),
                    _t(sd, "segmentation_head.5.bias"))


def make_vit_state_dict(rng, *, patch_size, in_chans, embed_dim, depth,
                        mlp_ratio=4.0, tl=False):
    """Random state dict with real Prithvi encoder key names/shapes.

    ``tl=True`` adds the ``_tl``-variant keys (the trainable
    ``temporal_embed_enc.scale`` / ``location_embed_enc.scale`` — the only
    TL encoder parameters, pritvhi.py:289-293/341-345) with non-trivial
    values so a mapping bug shows up numerically."""
    pt, ph, pw = patch_size
    hidden = int(embed_dim * mlp_ratio)

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd = {
        "patch_embed.proj.weight": r(embed_dim, in_chans, pt, ph, pw),
        "patch_embed.proj.bias": r(embed_dim),
        "cls_token": r(1, 1, embed_dim),
        "norm.weight": 1.0 + r(embed_dim),
        "norm.bias": r(embed_dim),
    }
    if tl:
        sd["temporal_embed_enc.scale"] = np.asarray([0.37], np.float32)
        sd["location_embed_enc.scale"] = np.asarray([-0.21], np.float32)
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": 1.0 + r(embed_dim),
            f"blocks.{i}.norm1.bias": r(embed_dim),
            f"blocks.{i}.attn.qkv.weight": r(3 * embed_dim, embed_dim),
            f"blocks.{i}.attn.qkv.bias": r(3 * embed_dim),
            f"blocks.{i}.attn.proj.weight": r(embed_dim, embed_dim),
            f"blocks.{i}.attn.proj.bias": r(embed_dim),
            f"blocks.{i}.norm2.weight": 1.0 + r(embed_dim),
            f"blocks.{i}.norm2.bias": r(embed_dim),
            f"blocks.{i}.mlp.fc1.weight": r(hidden, embed_dim),
            f"blocks.{i}.mlp.fc1.bias": r(hidden),
            f"blocks.{i}.mlp.fc2.weight": r(embed_dim, hidden),
            f"blocks.{i}.mlp.fc2.bias": r(embed_dim),
        })
    return sd


def make_seg_state_dict(rng, *, patch_size, in_chans, embed_dim, depth,
                        num_frames, num_classes, conv_kernels=(3, 3, 3, 3)):
    """Random state dict with the reference PrithviSeg ('net.'-stripped) keys."""
    sd = {f"prithvi_encoder.{k}": v for k, v in make_vit_state_dict(
        rng, patch_size=patch_size, in_chans=in_chans, embed_dim=embed_dim,
        depth=depth).items()}

    def r(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    dims = [(embed_dim * num_frames) // (2 ** i) for i in range(5)]
    for i in range(4):
        k = conv_kernels[i]
        base = f"segmentation_head.{i}"
        sd.update({
            f"{base}.0.weight": r(dims[i], dims[i + 1], 3, 3),  # ConvT (I,O,kh,kw)
            f"{base}.0.bias": r(dims[i + 1]),
            f"{base}.2.weight": r(dims[i + 1], dims[i + 1], k, k),
            f"{base}.2.bias": r(dims[i + 1]),
            f"{base}.3.weight": 1.0 + r(dims[i + 1]),
            f"{base}.3.bias": r(dims[i + 1]),
            f"{base}.3.running_mean": r(dims[i + 1]),
            f"{base}.3.running_var": (1.0 + r(dims[i + 1])).clip(0.5),
        })
    sd["segmentation_head.5.weight"] = r(num_classes, dims[4], 1, 1)
    sd["segmentation_head.5.bias"] = r(num_classes)
    return sd
