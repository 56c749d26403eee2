"""Typed config dataclasses + serving-config assembly."""

from instageo_tpu.configs.config_dataclasses import (
    AppConfig,
    ChipInferenceConfig,
    DataSourceEnum,
    ModelEnum,
    dict_to_chip_inference_config,
)


def test_model_enum_covers_registry_variants():
    from instageo_tpu.models.registry import PRITHVI_ARCHS

    assert {m.value for m in ModelEnum} == set(PRITHVI_ARCHS)


def test_data_source_enum():
    assert {d.value for d in DataSourceEnum} == {"HLS", "S2", "S1"}


def test_app_config_defaults_match_yaml():
    from instageo_tpu.configs.config import load_config

    cfg = load_config("config")
    app = AppConfig()
    assert app.mode == cfg["mode"] == "train"
    assert app.train.ignore_index == cfg["train"]["ignore_index"]
    assert app.dataloader.img_size == cfg["dataloader"]["img_size"]
    assert app.test.crop_size == cfg["test"]["crop_size"]
    assert ChipInferenceConfig().mode == "chip_inference"


def test_dict_to_chip_inference_config():
    cfg = dict_to_chip_inference_config({
        "test_filepath": "/data/chips.csv",
        "checkpoint_path": "/models/best",
        "train": {"batch_size": 4},
        "dataloader": {"img_size": 96},
    })
    assert cfg["mode"] == "chip_inference"  # pinned even if omitted
    assert cfg["test_filepath"] == "/data/chips.csv"
    assert cfg["checkpoint_path"] == "/models/best"
    assert cfg["train"]["batch_size"] == 4
    assert cfg["dataloader"]["img_size"] == 96
    # untouched defaults survive the merge
    assert cfg["model"]["model_name"]
    assert cfg["train"]["ignore_index"] is not None
