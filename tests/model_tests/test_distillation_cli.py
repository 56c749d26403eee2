"""Distillation + config-path workflows through the run CLI."""

import os

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.geotiff import Affine, write_geotiff
from instageo_tpu.train.run import main as run_main


@pytest.fixture(scope="module")
def chips(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        arr = rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16)
        lab = rng.integers(0, 2, size=(32, 32)).astype(np.int16)
        tr = Affine.from_origin(499980 + i * 960, 4100040, 30, 30)
        write_geotiff(str(root / f"chip_{i}.tif"), arr, transform=tr,
                      crs=32633, nodata=0)
        write_geotiff(str(root / f"seg_map_{i}.tif"), lab[None], transform=tr,
                      crs=32633, nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_map_{i}.tif"})
    pd.DataFrame(rows).to_csv(root / "train.csv", index=False)
    return root


def _overrides(root, run_dir):
    return [
        f"root_dir={root}", f"train_filepath={root / 'train.csv'}",
        f"valid_filepath={root / 'train.csv'}",
        f"test_filepath={root / 'train.csv'}", f"run_dir={run_dir}",
        "model.model_name=prithvi_eo_tiny", "model.load_pretrained_weights=False",
        "dataloader.img_size=32", "dataloader.bands=[0,1,2,3,4,5]",
        "dataloader.mean=[5000,5000,5000,5000,5000,5000]",
        "dataloader.std=[3000,3000,3000,3000,3000,3000]",
        "dataloader.no_data_value=0", "train.ignore_index=-1",
        "train.batch_size=8", "train.num_epochs=1",
        "test.img_size=32", "test.crop_size=32", "test.stride=32",
        "tpu.precision=f32",
    ]


def test_distillation_via_cli(chips, tmp_path):
    teacher_dir = tmp_path / "teacher"
    run_main(["mode=train"] + _overrides(chips, teacher_dir))
    teacher_ckpt = teacher_dir / "instageo_best_checkpoint"
    assert teacher_ckpt.exists()

    student_dir = tmp_path / "student"
    hist = run_main(
        ["mode=train", "train.distillation=true",
         f"train.teacher_ckpt_path={teacher_ckpt}"]
        + _overrides(chips, student_dir))
    assert np.isfinite(hist["train_loss"])
    assert (student_dir / "instageo_best_checkpoint").exists()


def test_eval_with_config_path(chips, tmp_path):
    """The experiment-script workflow: re-load a run's .hydra config."""
    run_dir = tmp_path / "run"
    run_main(["mode=train"] + _overrides(chips, run_dir))
    metrics = run_main([
        f"--config-path={run_dir / '.hydra'}", "--config-name=config",
        "mode=eval",
        f"checkpoint_path={run_dir / 'instageo_best_checkpoint'}",
        f"run_dir={tmp_path / 'eval'}",
    ])
    assert "test_IoU" in metrics
