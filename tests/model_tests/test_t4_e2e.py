"""T=4 temporal configuration, end to end (VERDICT r3 #9).

The reference Prithvi family supports num_frames<=4 (reference
pritvhi.py:149-203) but its shipped tasks stop at 3 frames. The
``multitemporal_crop_t4`` config exercises the ceiling: 4 frames → 785
tokens at 224px on V1-100M, the regime where the flash-attention kernel
wins outright (PERF.md). Here the whole user journey runs at CI scale:
train → eval → chip_inference → granule streaming, all with
temporal_dim=4 chips (24-channel files, T·C stacking).
"""

import numpy as np
import pandas as pd
import pytest

import jax

from instageo_tpu.configs.config import load_config
from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.train.run import main as run_main


def test_t4_config_values():
    cfg = load_config("multitemporal_crop_t4")
    assert int(cfg.dataloader.temporal_dim) == 4
    assert len(list(cfg.dataloader.bands)) == 24          # T·C stacking
    assert len(list(cfg.dataloader.mean)) == 6            # per-band, not per-step
    assert cfg.tpu.attn_impl == "auto"                    # L=785 → flash on TPU


def test_t4_full_scale_shapes():
    """The REAL 100M encoder accepts T=4 at 224px: 4·196+1 = 785 tokens,
    logits back at full resolution (eval_shape: no FLOPs spent)."""
    from instageo_tpu.models.seg import create_prithvi_seg

    m = create_prithvi_seg(variant="prithvi_eo_v1_100", num_classes=13,
                           temporal_step=4, image_size=224)
    x = jax.ShapeDtypeStruct((2, 6, 4, 224, 224), np.float32)
    vs = jax.eval_shape(lambda r, xx: m.init(r, xx), jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda v, xx: m.apply(v, xx, train=False), vs, x)
    assert out.shape == (2, 13, 224, 224)
    # Tubelet depth 1 → every frame its own tokens: the patch projection
    # consumes one frame's 6·16² patch (not a 4-frame tubelet), so
    # L = 4·(224/16)² + cls = 785.
    emb = vs["params"]["prithvi_encoder"]["patch_embed"]["proj"]["kernel"]
    assert emb.shape[0] == 6 * 1 * 16 * 16


@pytest.fixture(scope="module")
def t4_chips(tmp_path_factory):
    """8 chips of (24, 32, 32) = 4 frames × 6 bands, 13-class labels."""
    root = tmp_path_factory.mktemp("t4_chips")
    rng = np.random.default_rng(11)
    rows = []
    for i in range(8):
        arr = rng.integers(1, 10000, size=(24, 32, 32)).astype(np.uint16)
        lab = rng.integers(0, 13, size=(1, 32, 32)).astype(np.int16)
        # Make class identifiable from band 0 of every frame.
        for t in range(4):
            arr[6 * t] = (lab[0].astype(np.uint16) + 1) * 700
        tr = Affine.from_origin(499980 + i * 960, 4100040, 30, 30)
        write_geotiff(str(root / f"chip_{i}.tif"), arr, transform=tr,
                      crs=32633, nodata=0)
        write_geotiff(str(root / f"seg_map_{i}.tif"), lab, transform=tr,
                      crs=32633, nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_map_{i}.tif"})
    pd.DataFrame(rows).to_csv(root / "train.csv", index=False)
    return root


def _overrides(root, run_dir):
    return [
        "--config-name", "multitemporal_crop_t4",
        f"root_dir={root}",
        f"train_filepath={root / 'train.csv'}",
        f"valid_filepath={root / 'train.csv'}",
        f"test_filepath={root / 'train.csv'}",
        f"run_dir={run_dir}",
        "model.model_name=prithvi_eo_tiny",
        "model.load_pretrained_weights=False",
        "dataloader.img_size=32",
        "dataloader.no_data_value=0",
        "dataloader.mean=[5000,5000,5000,5000,5000,5000]",
        "dataloader.std=[3000,3000,3000,3000,3000,3000]",
        "dataloader.reduce_to_zero=False",  # fixture labels already 0..12
        "train.batch_size=8",
        "train.num_epochs=2",
        "test.img_size=32", "test.crop_size=32", "test.stride=32",
        "tpu.precision=f32",
    ]


def test_t4_train_eval_infer(t4_chips, tmp_path):
    run_dir = tmp_path / "run"
    hist = run_main(["mode=train"] + _overrides(t4_chips, run_dir))
    assert "val_IoU" in hist and np.isfinite(hist["train_loss"])
    ckpt = run_dir / "instageo_best_checkpoint"
    assert ckpt.exists()

    metrics = run_main(["mode=eval", f"checkpoint_path={ckpt}"]
                       + _overrides(t4_chips, tmp_path / "eval"))
    assert "test_IoU" in metrics and "test_roc_auc" in metrics
    assert "test_IoU_12" in metrics  # 13-class per-class metrics present

    n = run_main(["mode=chip_inference", f"checkpoint_path={ckpt}"]
                 + _overrides(t4_chips, tmp_path / "infer"))
    assert n == 8
    preds = sorted((t4_chips / "predictions").glob("prediction_*.tif"))
    assert len(preds) == 8
    with GeoTiffReader(str(preds[0])) as r:
        arr = r.read(1)
    assert set(np.unique(arr)) <= set(range(13))


def test_t4_granule_stream(t4_chips, tmp_path):
    """Whole-tile streaming path with 4 frames: (24, 96, 96) tile →
    stitched (96, 96) prediction, chips never touching the host."""
    from instageo_tpu.serve.granule import granule_inference
    from instageo_tpu.train.factory import create_model

    cfg = load_config("multitemporal_crop_t4", overrides={
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "dataloader.img_size": 32,
    })
    model, variables = create_model(cfg)
    rng = np.random.default_rng(0)
    tile = rng.integers(1, 10000, size=(24, 96, 96)).astype(np.uint16)
    pred, dt = granule_inference(
        tile, model, variables, mean=[5000.0] * 6, std=[3000.0] * 6,
        chip_size=32, temporal_size=4, batch_size=4, no_data_value=0)
    assert pred.shape == (96, 96)
    assert set(np.unique(pred)) <= set(range(13))
