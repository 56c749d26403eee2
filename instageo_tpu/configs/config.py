"""Hydra-compatible configuration system (YAML + dotted CLI overrides).

The reference uses Hydra (``instageo/model/run.py:60``) with configs under
``instageo/model/configs/*.yaml`` and CLI overrides like
``train.learning_rate=1e-4``. Hydra is not a dependency here; this module
implements the same public surface — ``--config-name``/``--config-path``
flags, dotted-key overrides with YAML-typed values, attribute-style access
(``cfg.train.batch_size``) — over plain YAML + a lightweight ConfigDict.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Iterable, List, Optional, Tuple

import yaml

_CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))


class ConfigDict(dict):
    """dict with attribute access and recursive wrapping (OmegaConf-lite)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigDict.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _set_dotted(cfg: Dict, dotted_key: str, value: Any) -> None:
    parts = dotted_key.split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            node[p] = {}
        node = node[p]
    node[parts[-1]] = value


def _parse_value(raw: str) -> Any:
    """YAML-typed scalar/list parsing, Hydra-style (null, true, [1,2], ...)."""
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def parse_overrides(tokens: Iterable[str]) -> Tuple[Dict[str, Any], Optional[str], Optional[str]]:
    """Split argv tokens into (overrides, config_name, config_path)."""
    overrides: Dict[str, Any] = {}
    config_name = None
    config_path = None
    toks = list(tokens)
    i = 0
    while i < len(toks):
        tok = toks[i]
        flag = tok.split("=", 1)[0]
        if flag in ("--config-name", "--config-path"):
            # Hydra accepts both --config-name=NAME and --config-name NAME;
            # silently dropping the space-separated value would train with
            # the DEFAULT config.
            if "=" in tok:
                value = tok.split("=", 1)[1]
            elif i + 1 < len(toks) and "=" not in toks[i + 1]:
                i += 1
                value = toks[i]
            else:
                raise ValueError(f"{tok} requires a value "
                                 f"({tok}=NAME or '{tok} NAME')")
            if flag == "--config-name":
                config_name = value
            else:
                config_path = value
        elif "=" in tok and not tok.startswith("-"):
            key, raw = tok.split("=", 1)
            # Hydra's +key=value (append) is accepted transparently.
            overrides[key.lstrip("+")] = _parse_value(raw)
        elif tok.startswith("-"):
            # This repo's data CLIs take absl-style --flag=value, so a user
            # typing '--train.batch_size=128' here is a likely mistake —
            # silently ignoring it would train with the default value.
            raise ValueError(
                f"Unrecognized flag {tok!r}: overrides use Hydra style "
                f"(key=value, e.g. {tok.lstrip('-')}), not --flags")
        i += 1
    return overrides, config_name, config_path


def load_config(
    config_name: str = "config",
    config_path: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> ConfigDict:
    """Load a YAML config and apply dotted overrides."""
    path_dir = config_path or _CONFIG_DIR
    name = config_name if config_name.endswith((".yaml", ".yml")) else config_name + ".yaml"
    path = os.path.join(path_dir, name)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if overrides:
        for k, v in overrides.items():
            _set_dotted(cfg, k, v)
    return ConfigDict.wrap(cfg)


def load_config_from_argv(argv: List[str], default_name: str = "config") -> ConfigDict:
    """Hydra-style entry: parse argv into config + overrides."""
    overrides, name, path = parse_overrides(argv)
    return load_config(name or default_name, path, overrides)


def save_config(cfg: ConfigDict, run_dir: str) -> str:
    """Persist the resolved config like Hydra's ``.hydra/config.yaml``."""
    out_dir = os.path.join(run_dir, ".hydra")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "config.yaml")
    with open(out, "w") as f:
        f.write(cfg.to_yaml())
    return out


def merge(base: ConfigDict, *updates: Dict) -> ConfigDict:
    """Deep-merge dicts into a copy of base."""
    out = copy.deepcopy(base.to_dict() if isinstance(base, ConfigDict) else base)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                rec(dst[k], v)
            else:
                dst[k] = copy.deepcopy(v)

    for u in updates:
        rec(out, u.to_dict() if isinstance(u, ConfigDict) else u)
    return ConfigDict.wrap(out)


def get_augmentations(cfg: ConfigDict) -> List[Dict[str, Any]]:
    """Parse ``cfg.dataloader.augmentations`` into an ordered op list.

    Mirrors the reference's config surface (pipeline_utils.py:143-181):
    each entry has ``use``/``p`` plus op-specific parameters; returns
    ``[{"name": ..., "p": ..., **params}, ...]`` for enabled ops.
    """
    aug_cfg = cfg.get("dataloader", {}).get("augmentations") or {}
    ops: List[Dict[str, Any]] = []
    for name, spec in aug_cfg.items():
        spec = dict(spec)
        if not spec.pop("use", False):
            continue
        ops.append({"name": name, **spec})
    return ops


def check_required_flags(required: Iterable[str], cfg: ConfigDict) -> None:
    """Raise if any required top-level config value is missing/None.

    Reference ``check_required_flags`` (pipeline_utils.py:44-55).
    """
    missing = [k for k in required if cfg.get(k) in (None, "None", "null")]
    if missing:
        raise ValueError(f"Missing required config values: {missing}")
