"""DataProcessor: argv wiring, manifest normalization, flag hygiene."""

import json
import os

import pandas as pd
import pytest

from instageo_tpu.data import raster_chip_creator
from instageo_tpu.webapp.data_processor import DataProcessor


@pytest.fixture()
def captured(monkeypatch):
    """Stub the chip creator CLI; record the parsed flag values."""
    seen = []

    def fake_main(argv):
        f = raster_chip_creator.FLAGS
        seen.append({
            "output_directory": f.output_directory,
            "is_bbox_feature": f.is_bbox_feature,
            "bbox_feature_path": f.bbox_feature_path,
            "date": f.date,
            "data_source": f.data_source,
            "chip_size": f.chip_size,
            "num_steps": f.num_steps,
            "temporal_step": f.temporal_step,
            "temporal_tolerance": f.temporal_tolerance,
            "cloud_coverage": f.cloud_coverage,
            "mask_types": list(f.mask_types),
        })

    monkeypatch.setattr(raster_chip_creator, "main", fake_main)
    return seen


def test_extract_wires_parameters_and_counts(tmp_path, captured):
    data_dir = str(tmp_path / "task1")
    proc = DataProcessor(data_dir, {
        "data_source": "HLS", "chip_size": 128, "num_steps": 2,
        "temporal_step": 20, "temporal_tolerance": 7, "cloud_coverage": 15,
        "date": "2024-05-01", "mask_types": ["cloud", "water"],
    })
    bboxes = [[10.0, 44.0, 10.2, 44.2]]

    # simulate the pipeline having produced chips + a manifest
    os.makedirs(os.path.join(data_dir, "chips"))
    for i in range(3):
        open(os.path.join(data_dir, "chips", f"chip_{i}.tif"), "w").close()
    pd.DataFrame({"Input": [os.path.join(data_dir, "chips", f"chip_{i}.tif")
                            for i in range(3)]}).to_csv(
        os.path.join(data_dir, "hls_raster_dataset.csv"))

    result = proc.extract_data_from_bboxes(bboxes)

    with open(os.path.join(data_dir, "bounding_boxes.json")) as f:
        assert json.load(f) == {"bboxes": bboxes}
    (call,) = captured
    assert call["chip_size"] == 128
    assert call["num_steps"] == 2
    assert call["temporal_step"] == 20
    assert call["temporal_tolerance"] == 7
    assert call["cloud_coverage"] == 15
    assert call["date"] == "2024-05-01"
    assert call["is_bbox_feature"] is True
    assert call["mask_types"] == ["cloud", "water"]
    assert result["chip_count"] == 3
    # manifest Input paths normalized to be relative to data_path
    df = pd.read_csv(result["dataset_csv"])
    assert list(df["Input"]) == [f"chips/chip_{i}.tif" for i in range(3)]


def test_no_flag_leak_between_tasks(tmp_path, captured):
    """A task without mask_types must not inherit the previous task's."""
    p1 = DataProcessor(str(tmp_path / "a"), {
        "chip_size": 96, "mask_types": ["cloud"]})
    p1.extract_data_from_bboxes([[0, 0, 1, 1]])
    p2 = DataProcessor(str(tmp_path / "b"), {"chip_size": 224})
    p2.extract_data_from_bboxes([[0, 0, 1, 1]])

    first, second = captured
    assert first["mask_types"] == ["cloud"]
    assert second["mask_types"] == []  # default, not leaked
    assert second["chip_size"] == 224
