"""Round-trip checkpoint interop: flax -> torch layout -> flax."""

import numpy as np

import jax
import jax.numpy as jnp

from instageo_tpu.models.checkpoint import (
    export_torch_checkpoint,
    load_torch_file,
    seg_variables_from_torch,
    seg_variables_to_torch,
)
from instageo_tpu.models.registry import get_arch
from instageo_tpu.models.seg import PrithviSeg


def _arch():
    return get_arch("prithvi_eo_tiny", in_chans=6, num_frames=1, img_size=32)


def test_export_import_roundtrip_is_identity(tmp_path):
    model = PrithviSeg(variant="prithvi_eo_tiny", num_classes=3,
                       temporal_step=1, image_size=32, in_chans=6)
    x = jnp.zeros((1, 6, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(3), x)

    path = str(tmp_path / "export.ckpt")
    export_torch_checkpoint(variables, _arch(), path)

    sd = load_torch_file(path)
    assert any(k.startswith("net.prithvi_encoder.") for k in sd)
    back = seg_variables_from_torch(sd, _arch())

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables["params"])[0],
            jax.tree_util.tree_flatten_with_path(back["params"])[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))
    for a, b in zip(jax.tree.leaves(variables["batch_stats"]),
                    jax.tree.leaves(back["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # forward parity of the round-tripped weights
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=(2, 6, 1, 32, 32)).astype(np.float32))
    out_a = model.apply(variables, xr)
    out_b = model.apply(back, xr)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_exported_layout_matches_reference_shapes(tmp_path):
    """Exported tensors carry the reference module layout and shapes."""
    model = PrithviSeg(variant="prithvi_eo_tiny", num_classes=2,
                       temporal_step=1, image_size=32, in_chans=6)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1, 32, 32)))
    sd = seg_variables_to_torch(variables, _arch())
    # Conv3d patch embed: (D, C, pt, ph, pw)
    assert sd["net.prithvi_encoder.patch_embed.proj.weight"].shape == \
        (256, 6, 1, 16, 16)
    # qkv Linear: (3D, D)
    assert sd["net.prithvi_encoder.blocks.0.attn.qkv.weight"].shape == (768, 256)
    # ConvT: (I, O, kh, kw); first stage 256 -> 128
    assert sd["net.segmentation_head.0.0.weight"].shape == (256, 128, 3, 3)
    # final 1x1 conv OIHW
    assert sd["net.segmentation_head.5.weight"].shape == (2, 16, 1, 1)
    # BN stats present
    assert "net.segmentation_head.0.3.running_mean" in sd


def test_export_npz(tmp_path):
    model = PrithviSeg(variant="prithvi_eo_tiny", num_classes=2,
                       temporal_step=1, image_size=32, in_chans=6)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 6, 1, 32, 32)))
    path = export_torch_checkpoint(variables, _arch(), str(tmp_path / "e.npz"))
    sd = load_torch_file(path)
    assert "net.cls_token" in sd or "net.prithvi_encoder.cls_token" in sd
