"""Checkpoint interop: torch Prithvi checkpoints → JAX parameter trees.

Implements the reference's checkpoint-adaptation semantics
(``instageo/model/utils.py:89-315`` and ``model.py:229-248``) against our
Flax parameter layout:

* unwrap nested ``*state_dict`` containers;
* strip MAE ``encoder.`` prefixes and legacy ``_timm_module.`` markers;
* drop decoder weights / mask tokens / frozen pos-embed (ours is
  regenerated from static shapes);
* truncate transformer depth;
* band surgery on the patch-embed projection: weights for bands present in
  the pretrained set are copied per-band, missing bands get fresh
  xavier-uniform init (``utils.py:199-268``);
* layout conversion: torch Conv3d/Linear/Conv2d/ConvTranspose2d weights →
  matmul kernels / HWIO conv kernels.

Weights arrive as numpy arrays (``torch.load`` + ``.numpy()`` upstream, or
an ``.npz``); no torch dependency in this module.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import numpy as np

from instageo_tpu.models.registry import PRETRAINED_BANDS, PrithviArch


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensors (and anything with .detach/.cpu/.numpy)
    for attr in ("detach", "cpu"):
        if hasattr(v, attr):
            v = getattr(v, attr)()
    if hasattr(v, "numpy"):
        return v.numpy()
    return np.asarray(v)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt``/``.ckpt`` (via torch) or ``.npz`` file to numpy dict."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(obj, dict):
        raise ValueError(f"Unsupported checkpoint object in {path}: {type(obj)}")
    return {k: _to_numpy(v) for k, v in _unwrap_state_dict(obj).items()}


def _unwrap_state_dict(state_dict: Mapping) -> Mapping:
    """Return the value of the first key ending in 'state_dict', else as-is.

    Reference ``get_state_dict`` (utils.py:89-117).
    """
    for k in state_dict.keys():
        if isinstance(k, str) and k.endswith("state_dict"):
            return state_dict[k]
    return state_dict


def _xavier_uniform(rng: np.random.Generator, shape_2d, full_shape) -> np.ndarray:
    """torch ``xavier_uniform_`` on a (fan_out, fan_in) view."""
    fan_out, fan_in = shape_2d
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return rng.uniform(-bound, bound, size=full_shape).astype(np.float32)


def select_patch_embed_weights(
    weight: np.ndarray,
    pretrained_bands: Sequence[str],
    model_bands: Sequence[str],
    seed: int = 0,
) -> np.ndarray:
    """Band surgery on a torch Conv3d patch-embed weight (D, C, pt, ph, pw).

    Bands present in ``pretrained_bands`` are copied into their position in
    ``model_bands``; missing bands keep a fresh xavier-uniform init.
    Reference ``utils.py:199-268``.
    """
    d = weight.shape[0]
    c_model = len(model_bands)
    out_shape = (d, c_model) + weight.shape[2:]
    rng = np.random.default_rng(seed)
    flat_in = int(np.prod(out_shape[1:]))
    out = _xavier_uniform(rng, (d, flat_in), out_shape)
    for index, band in enumerate(model_bands):
        if band in pretrained_bands:
            out[:, index] = weight[:, list(pretrained_bands).index(band)]
    return out


def filter_checkpoint_vit(
    state_dict: Mapping[str, np.ndarray],
    arch: PrithviArch,
    pretrained_bands: Optional[Sequence[str]] = None,
    model_bands: Optional[Sequence[str]] = None,
) -> Dict[str, np.ndarray]:
    """Clean a Prithvi(-MAE) state dict for the ViT encoder.

    Reference ``checkpoint_filter_fn_vit`` (utils.py:271-315) + depth
    truncation (model.py:242-247).
    """
    pretrained_bands = list(pretrained_bands or PRETRAINED_BANDS)
    model_bands = list(model_bands or pretrained_bands)
    state_dict = _unwrap_state_dict(state_dict)

    clean: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        k = k.replace("_timm_module.", "")
        if "pos_embed" in k:
            continue  # regenerated from static shapes
        if "decoder" in k or "_dec" in k or k == "mask_token":
            continue
        if not arch.temporal_encoding and "temporal_embed" in k:
            continue
        if not arch.location_encoding and "location_embed" in k:
            continue
        if k.startswith("encoder."):
            k = k[len("encoder.") :]
        # terratorch-style checkpoints name the patch embed "projection";
        # normalize so downstream converters can rely on "proj".
        k = k.replace("patch_embed.projection.", "patch_embed.proj.")
        clean[k] = _to_numpy(v)

    # Depth truncation: keep blocks [0, depth).
    clean = {
        k: v
        for k, v in clean.items()
        if not k.startswith("blocks.") or int(k.split(".")[1]) < arch.depth
    }

    proj_key = None
    for k in clean:
        if k.endswith("patch_embed.proj.weight"):
            proj_key = k
            break
    if proj_key is None:
        raise KeyError("Could not find patch embed weight in state_dict.")
    w = clean[proj_key]
    expected_spatial = tuple(arch.patch_size)
    if w.shape[2:] == expected_spatial and w.shape[0] == arch.embed_dim:
        clean[proj_key] = select_patch_embed_weights(w, pretrained_bands, model_bands)
    return clean


# ---------------------------------------------------------------------------
# Layout conversion: torch tensors -> Flax kernels
# ---------------------------------------------------------------------------


def _linear(params: Dict, sd: Mapping, torch_prefix: str) -> None:
    params["kernel"] = sd[f"{torch_prefix}.weight"].T.astype(np.float32)
    if f"{torch_prefix}.bias" in sd:
        params["bias"] = sd[f"{torch_prefix}.bias"].astype(np.float32)


def _qkv_linear(params: Dict, sd: Mapping, torch_prefix: str,
                num_heads: int) -> None:
    """torch fused qkv Linear (3D, D) -> head-structured (D, 3, H, Dh).

    Pure reshape of the transposed torch weight (see models/prithvi.py
    ``QKVProj``: the head-structured layout is what makes tensor
    parallelism shard on heads without resharding).
    """
    w = sd[f"{torch_prefix}.weight"]
    d = w.shape[1]
    params["kernel"] = (
        w.T.reshape(d, 3, num_heads, -1).astype(np.float32))
    if f"{torch_prefix}.bias" in sd:
        params["bias"] = (
            sd[f"{torch_prefix}.bias"].reshape(3, num_heads, -1)
            .astype(np.float32))


def _layernorm(params: Dict, sd: Mapping, torch_prefix: str) -> None:
    params["scale"] = sd[f"{torch_prefix}.weight"].astype(np.float32)
    params["bias"] = sd[f"{torch_prefix}.bias"].astype(np.float32)


def vit_params_from_torch(
    state_dict: Mapping[str, np.ndarray],
    arch: PrithviArch,
    pretrained_bands: Optional[Sequence[str]] = None,
    model_bands: Optional[Sequence[str]] = None,
    filter_fn: bool = True,
) -> Dict:
    """Convert a (cleaned) torch Prithvi ViT state dict to our param tree."""
    sd = (
        filter_checkpoint_vit(state_dict, arch, pretrained_bands, model_bands)
        if filter_fn
        else dict(state_dict)
    )
    p: Dict = {}

    # Patch embed: Conv3d (D, C, pt, ph, pw) -> Dense kernel (C·pt·ph·pw, D).
    w = sd["patch_embed.proj.weight"]
    d = w.shape[0]
    p["patch_embed"] = {"proj": {"kernel": w.reshape(d, -1).T.astype(np.float32)}}
    if "patch_embed.proj.bias" in sd:
        p["patch_embed"]["proj"]["bias"] = sd["patch_embed.proj.bias"].astype(np.float32)

    p["cls_token"] = sd["cls_token"].astype(np.float32)

    for i in range(arch.depth):
        blk: Dict = {"norm1": {}, "norm2": {},
                     "attn": {"qkv": {}, "proj": {}},
                     "mlp": {"fc1": {}, "fc2": {}}}
        _layernorm(blk["norm1"], sd, f"blocks.{i}.norm1")
        _layernorm(blk["norm2"], sd, f"blocks.{i}.norm2")
        _qkv_linear(blk["attn"]["qkv"], sd, f"blocks.{i}.attn.qkv",
                    arch.num_heads)
        _linear(blk["attn"]["proj"], sd, f"blocks.{i}.attn.proj")
        _linear(blk["mlp"]["fc1"], sd, f"blocks.{i}.mlp.fc1")
        _linear(blk["mlp"]["fc2"], sd, f"blocks.{i}.mlp.fc2")
        p[f"blocks_{i}"] = blk

    p["norm"] = {}
    _layernorm(p["norm"], sd, "norm")

    if arch.temporal_encoding and "temporal_embed_enc.scale" in sd:
        p["temporal_embed_enc"] = {"scale": sd["temporal_embed_enc.scale"].astype(np.float32)}
    if arch.location_encoding and "location_embed_enc.scale" in sd:
        p["location_embed_enc"] = {"scale": sd["location_embed_enc.scale"].astype(np.float32)}
    return p


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> Flax HWIO."""
    return w.transpose(2, 3, 1, 0).astype(np.float32)


def _convt2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> our flipped HWIO correlation kernel."""
    return w.transpose(2, 3, 0, 1)[::-1, ::-1].astype(np.float32)


def seg_variables_from_torch(
    state_dict: Mapping[str, np.ndarray],
    arch: PrithviArch,
    *,
    num_up_blocks: int = 4,
    prefix: str = "net.",
) -> Dict:
    """Convert a reference ``PrithviSeg`` Lightning checkpoint to Flax variables.

    Torch module layout (reference model.py:386-390): ``net.prithvi_encoder.*``
    plus ``net.segmentation_head.{i}`` where blocks 0-3 are
    Sequential(ConvT[0], Dropout[1], Conv[2], BN[3], ReLU[4]) and the head is
    Dropout[4] + Conv1x1[5]. Returns ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {k: _to_numpy(v) for k, v in _unwrap_state_dict(state_dict).items()}
    # Accept both 'net.'-prefixed Lightning dicts and bare module dicts.
    if prefix and any(k.startswith(prefix) for k in sd):
        sd = {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}

    enc_sd = {
        k[len("prithvi_encoder.") :]: v
        for k, v in sd.items()
        if k.startswith("prithvi_encoder.")
    }
    params: Dict = {"prithvi_encoder": vit_params_from_torch(enc_sd, arch, filter_fn=False)}
    batch_stats: Dict = {}

    for i in range(num_up_blocks):
        base = f"segmentation_head.{i}"
        up = {
            "convt": {
                "kernel": _convt2d_kernel(sd[f"{base}.0.weight"]),
                "bias": sd[f"{base}.0.bias"].astype(np.float32),
            },
            "conv": {
                "kernel": _conv2d_kernel(sd[f"{base}.2.weight"]),
                "bias": sd[f"{base}.2.bias"].astype(np.float32),
            },
            "bn": {
                "scale": sd[f"{base}.3.weight"].astype(np.float32),
                "bias": sd[f"{base}.3.bias"].astype(np.float32),
            },
        }
        params[f"up_{i}"] = up
        batch_stats[f"up_{i}"] = {
            "bn": {
                "mean": sd[f"{base}.3.running_mean"].astype(np.float32),
                "var": sd[f"{base}.3.running_var"].astype(np.float32),
            }
        }

    head_idx = num_up_blocks + 1  # Dropout occupies num_up_blocks slot
    params["head_conv"] = {
        "kernel": _conv2d_kernel(sd[f"segmentation_head.{head_idx}.weight"]),
        "bias": sd[f"segmentation_head.{head_idx}.bias"].astype(np.float32),
    }
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# Reverse conversion: Flax variables -> reference torch layout (export)
# ---------------------------------------------------------------------------


def _linear_to_torch(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _qkv_to_torch(sd: Dict, prefix: str, p: Mapping) -> None:
    """Head-structured qkv (D, 3, H, Dh) -> torch fused Linear (3D, D)."""
    kernel = np.asarray(p["kernel"])
    d = kernel.shape[0]
    sd[f"{prefix}.weight"] = kernel.reshape(d, -1).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"]).reshape(-1)


def _layernorm_to_torch(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def vit_params_to_torch(params: Mapping, arch: PrithviArch,
                        patch_size: Optional[Sequence[int]] = None
                        ) -> Dict[str, np.ndarray]:
    """Our ViT param tree -> reference torch encoder state dict.

    Inverse of :func:`vit_params_from_torch`; lets models fine-tuned here be
    loaded by the reference PyTorch stack.
    """
    patch = tuple(patch_size or arch.patch_size)
    sd: Dict[str, np.ndarray] = {}
    kernel = np.asarray(params["patch_embed"]["proj"]["kernel"])  # (C·p, D)
    d = kernel.shape[1]
    c = kernel.shape[0] // int(np.prod(patch))
    sd["patch_embed.proj.weight"] = kernel.T.reshape(d, c, *patch)
    if "bias" in params["patch_embed"]["proj"]:
        sd["patch_embed.proj.bias"] = np.asarray(
            params["patch_embed"]["proj"]["bias"])
    sd["cls_token"] = np.asarray(params["cls_token"])
    for i in range(arch.depth):
        blk = params[f"blocks_{i}"]
        _layernorm_to_torch(sd, f"blocks.{i}.norm1", blk["norm1"])
        _layernorm_to_torch(sd, f"blocks.{i}.norm2", blk["norm2"])
        _qkv_to_torch(sd, f"blocks.{i}.attn.qkv", blk["attn"]["qkv"])
        _linear_to_torch(sd, f"blocks.{i}.attn.proj", blk["attn"]["proj"])
        _linear_to_torch(sd, f"blocks.{i}.mlp.fc1", blk["mlp"]["fc1"])
        _linear_to_torch(sd, f"blocks.{i}.mlp.fc2", blk["mlp"]["fc2"])
    _layernorm_to_torch(sd, "norm", params["norm"])
    if "temporal_embed_enc" in params:
        sd["temporal_embed_enc.scale"] = np.asarray(
            params["temporal_embed_enc"]["scale"])
    if "location_embed_enc" in params:
        sd["location_embed_enc.scale"] = np.asarray(
            params["location_embed_enc"]["scale"])
    return sd


def seg_variables_to_torch(variables: Mapping, arch: PrithviArch,
                           num_up_blocks: int = 4,
                           prefix: str = "net.") -> Dict[str, np.ndarray]:
    """Our PrithviSeg variables -> reference Lightning state-dict layout.

    Inverse of :func:`seg_variables_from_torch` (same Sequential indices:
    blocks 0-3 = [ConvT, Dropout, Conv, BN, ReLU], head = Dropout[4] +
    Conv1x1[5]).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    enc = vit_params_to_torch(params["prithvi_encoder"], arch)
    for k, v in enc.items():
        sd[f"prithvi_encoder.{k}"] = v
    for i in range(num_up_blocks):
        up = params[f"up_{i}"]
        base = f"segmentation_head.{i}"
        # our flipped-HWIO correlation kernel -> torch ConvT (I, O, kh, kw)
        k = np.asarray(up["convt"]["kernel"])[::-1, ::-1]
        sd[f"{base}.0.weight"] = k.transpose(2, 3, 0, 1)
        sd[f"{base}.0.bias"] = np.asarray(up["convt"]["bias"])
        sd[f"{base}.2.weight"] = np.asarray(
            up["conv"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{base}.2.bias"] = np.asarray(up["conv"]["bias"])
        sd[f"{base}.3.weight"] = np.asarray(up["bn"]["scale"])
        sd[f"{base}.3.bias"] = np.asarray(up["bn"]["bias"])
        bn_stats = batch_stats.get(f"up_{i}", {}).get("bn", {})
        sd[f"{base}.3.running_mean"] = np.asarray(
            bn_stats.get("mean", np.zeros_like(up["bn"]["bias"])))
        sd[f"{base}.3.running_var"] = np.asarray(
            bn_stats.get("var", np.ones_like(up["bn"]["scale"])))
    head_idx = num_up_blocks + 1
    sd[f"segmentation_head.{head_idx}.weight"] = np.asarray(
        params["head_conv"]["kernel"]).transpose(3, 2, 0, 1)
    sd[f"segmentation_head.{head_idx}.bias"] = np.asarray(
        params["head_conv"]["bias"])
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def export_torch_checkpoint(variables: Mapping, arch: PrithviArch,
                            path: str) -> str:
    """Write a reference-compatible ``.ckpt`` (torch) or ``.npz`` file."""
    sd = seg_variables_to_torch(variables, arch)
    if path.endswith(".npz"):
        np.savez(path, **sd)
        return path
    import torch

    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}}, path)
    return path


def load_pretrained_encoder(
    path: str,
    arch: PrithviArch,
    pretrained_bands: Optional[Sequence[str]] = None,
    model_bands: Optional[Sequence[str]] = None,
) -> Dict:
    """Load + convert a pretrained Prithvi(-MAE) torch checkpoint file."""
    sd = load_torch_file(path)
    return vit_params_from_torch(sd, arch, pretrained_bands, model_bands)
