"""mode=replica: the one-command replication runbook (VERDICT r3 #4).

Every pre-network stage of the Sen1Floods11 replica chain — stats →
train → val/test eval → BASELINE-format report — runs here against the
synthetic chip fixtures; only the data download and the real pretrained
weights are environment-gated (and the gate itself is tested).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.geotiff import Affine, write_geotiff
from instageo_tpu.train.run import main as run_main


@pytest.fixture(scope="module")
def chip_dir(tmp_path_factory):
    """8 separable chips (6 bands, 32px) + labels, as in test_run_cli."""
    root = tmp_path_factory.mktemp("replica_chips")
    rng = np.random.default_rng(3)
    rows = []
    for i in range(8):
        arr = rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16)
        sign = rng.choice([0, 1], size=(2, 2))
        lab = np.repeat(np.repeat(sign, 16, axis=0), 16, axis=1).astype(np.int16)
        arr[0] = np.where(lab > 0, 8000, 1000)
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
        f"root_dir={root}",
        f"train_filepath={root / 'train.csv'}",
        f"valid_filepath={root / 'train.csv'}",
        f"test_filepath={root / 'train.csv'}",
        f"run_dir={run_dir}",
        "model.model_name=prithvi_eo_tiny",
        "model.load_pretrained_weights=False",
        "dataloader.img_size=32",
        "dataloader.bands=[0,1,2,3,4,5]",
        "dataloader.no_data_value=0",
        "dataloader.mean=[5000,5000,5000,5000,5000,5000]",
        "dataloader.std=[3000,3000,3000,3000,3000,3000]",
        "train.ignore_index=-1",
        "train.batch_size=8",
        "train.num_epochs=2",
        "train.learning_rate=0.002",
        "test.img_size=32", "test.crop_size=32", "test.stride=32",
        "tpu.precision=f32",
        "replica.task=sen1floods11",
        # CI fixtures replicate from a fresh init — the explicit (and
        # only) gate opt-out (train/replica.py _check_pretrained_gate).
        "replica.require_pretrained=False",
    ]


def test_replica_end_to_end(chip_dir, tmp_path):
    run_dir = tmp_path / "replica"
    report = run_main(
        ["mode=replica", "replica.apply_stats=True"]
        + _overrides(chip_dir, run_dir))

    # Stage results all present and well-formed.
    assert report["task"] == "sen1floods11"
    stats = report["dataset_stats"]
    assert len(stats["mean"]) == 6 and len(stats["class_weights"]) == 2
    assert os.path.exists(report["checkpoint"])
    for split in ("val", "test"):
        m = report["metrics"][split]
        assert set(m) == {"mIoU", "Acc", "mF1", "ROC-AUC"}
        assert 0.0 <= m["Acc"] <= 100.0  # percent, README convention
        assert (run_dir / f"eval_{split}.json").exists()
    # The task matched a published reference row → deltas computed.
    assert report["reference"]["source"] == "reference README.md:31"
    assert report["deltas"]["mIoU"] == pytest.approx(
        report["metrics"]["test"]["mIoU"] - 88.53)

    # apply_stats fed the computed stats into the TRAINED config.
    trained = (run_dir / ".hydra" / "config.yaml").read_text()
    assert f"{stats['mean'][0]:.6f}"[:8] in trained or str(stats["mean"][0])[:8] in trained

    # Artifacts: machine-readable + paste-ready table.
    with open(run_dir / "report.json") as f:
        assert json.load(f)["metrics"]["test"]["Acc"] == pytest.approx(
            report["metrics"]["test"]["Acc"])
    md = (run_dir / "REPORT.md").read_text()
    assert "| Flood mapping (Sen1Floods11) |" in md
    assert "InstaGeo-Baseline" in md and "88.53" in md
    assert "delta (test − reference)" in md


def test_replica_pretrained_gate(chip_dir, tmp_path, monkeypatch):
    """A real replica from a fresh init is refused up front."""
    monkeypatch.delenv("PRITHVI_PRETRAINED_PATH", raising=False)
    gated = [o for o in _overrides(chip_dir, tmp_path / "gated")
             if not o.startswith("replica.require_pretrained")]
    with pytest.raises(RuntimeError, match="PRITHVI_PRETRAINED_PATH"):
        run_main(["mode=replica"] + gated
                 + ["model.load_pretrained_weights=True"])
    # Turning the pretrained LOAD off is not a bypass: with the gate up
    # (require_pretrained defaults True) a fresh-init replica is refused
    # too — replica.require_pretrained=False is the only opt-out.
    with pytest.raises(RuntimeError, match="require_pretrained"):
        run_main(["mode=replica"] + gated
                 + ["model.load_pretrained_weights=False"])
    assert not (tmp_path / "gated" / "REPORT.md").exists()


def test_replica_requires_test_split(chip_dir, tmp_path):
    with pytest.raises(Exception, match="test_filepath"):
        run_main(["mode=replica"] + _overrides(chip_dir, tmp_path / "nosplit")
                 + ["test_filepath=null"])


def test_runbook_scripts_are_sound():
    """The gated shell runbooks at least parse (bash -n) and carry the
    single mode=replica entry."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    script = os.path.join(repo, "experiments", "train", "flood_mapping",
                          "sen1floods_replica.sh")
    subprocess.run(["bash", "-n", script], check=True)
    text = open(script).read()
    assert "mode=replica" in text
    runbook = os.path.join(repo, "experiments", "sen1floods_runbook.sh")
    subprocess.run(["bash", "-n", runbook], check=True)
    rb = open(runbook).read()
    assert "PRITHVI_PRETRAINED_PATH" in rb  # the weights gate
    assert "sen1floods_replica.sh" in rb    # chains data + train stages
    # The data stage writes {split}/s2_raster_dataset.csv manifests
    # (data/pipeline.py run()); the runbook must promote them to the
    # {split}.csv names the train stage reads, and thread DATA_DIR into
    # both sub-stages (not just the gate).
    assert "s2_raster_dataset.csv" in rb
    for sub in ("experiments/data/flood_mapping/sen1floods_replica.sh",
                "experiments/train/flood_mapping/sen1floods_replica.sh"):
        text = open(os.path.join(repo, sub)).read()
        assert "DATA_DIR" in text, sub
