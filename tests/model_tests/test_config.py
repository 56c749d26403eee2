"""Config-system tests: dotted overrides, typing, CLI parsing."""

import pytest

from instageo_tpu.configs.config import (
    ConfigDict,
    check_required_flags,
    get_augmentations,
    load_config,
    load_config_from_argv,
    merge,
    parse_overrides,
)


def test_load_default_config():
    cfg = load_config("config")
    assert cfg.mode == "train"
    assert cfg.train.batch_size == 8
    assert cfg.model.model_name == "prithvi_eo_tiny"
    assert cfg.dataloader.bands == [1, 2, 3, 8, 11, 12]


def test_dotted_overrides_yaml_typed():
    cfg = load_config("config", overrides={
        "train.learning_rate": 1e-3,
        "model.weight_clip_range": [-1, 1],
        "checkpoint_path": "/x/y",
    })
    assert cfg.train.learning_rate == 1e-3
    assert cfg.model.weight_clip_range == [-1, 1]
    assert cfg.checkpoint_path == "/x/y"


def test_parse_overrides_types():
    over, name, path = parse_overrides([
        "--config-name=sen1floods11", "--config-path=/cfgs",
        "train.batch_size=32", "model.weight_clip_range=[-0.5,0.5]",
        "train.scheduler=true", "checkpoint_path=null",
        "+extra.key=hello",
    ])
    assert name == "sen1floods11" and path == "/cfgs"
    assert over["train.batch_size"] == 32
    assert over["model.weight_clip_range"] == [-0.5, 0.5]
    assert over["train.scheduler"] is True
    assert over["checkpoint_path"] is None
    assert over["extra.key"] == "hello"


def test_load_from_argv_task_configs():
    for name in ("sen1floods11", "multitemporal_crop_classification", "locust"):
        cfg = load_config_from_argv([f"--config-name={name}"])
        assert cfg.model.model_name.startswith("prithvi")
    cfg = load_config_from_argv(["--config-name=locust", "train.num_epochs=5"])
    assert cfg.train.num_epochs == 5
    assert cfg.train.weight_decay == 0.1  # locust value preserved


def test_get_augmentations_order_and_filtering():
    cfg = load_config("sen1floods11")
    augs = get_augmentations(cfg)
    names = [a["name"] for a in augs]
    assert names == ["hflip", "vflip"]  # only enabled ops
    assert all("use" not in a for a in augs)
    assert augs[0]["p"] == 0.5


def test_check_required_flags():
    cfg = load_config("config")
    with pytest.raises(ValueError, match="root_dir"):
        check_required_flags(["root_dir"], cfg)
    cfg["root_dir"] = "/data"
    check_required_flags(["root_dir"], cfg)  # no raise


def test_merge_deep():
    base = ConfigDict.wrap({"a": {"b": 1, "c": 2}, "d": 3})
    out = merge(base, {"a": {"b": 10}})
    assert out.a.b == 10 and out.a.c == 2 and out.d == 3
    assert base.a.b == 1  # base untouched


def test_to_yaml_roundtrip():
    import yaml

    cfg = load_config("config")
    parsed = yaml.safe_load(cfg.to_yaml())
    assert parsed["train"]["batch_size"] == cfg.train.batch_size
