"""Model registry: YAML-driven catalog of deployable fine-tuned models.

Same schema and surface as the reference (``instageo/model/registry/
model_registry.py``): a ``models_registry.yaml`` (env
``MODELS_REGISTRY_PATH``) maps model keys → metadata per size, and each
model's Hydra config is read from
``{MODELS_PATH}/{key}/{size}/.hydra/config.yaml``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml
from pydantic import BaseModel

from instageo_tpu.configs.config import ConfigDict

DEFAULT_REGISTRY_PATH = os.path.join(os.path.dirname(__file__),
                                     "models_registry.yaml")


class ModelInfo(BaseModel):
    """Registry/API schema (reference configs/config_dataclasses.py:11-26)."""

    name: str
    model_key: str
    description: str = ""
    data_source: str = "HLS"
    chip_size: int = 224
    num_steps: int = 1
    temporal_step: int = 30
    temporal_tolerance: int = 5
    # size name -> per-size overrides (model_name, gcs_folder, ...), as
    # stored in models_registry.yaml and read by get_model_metadata_for_size
    sizes: Dict[str, Dict[str, Any]] = {}
    default_size: str = "base"
    extra: Dict[str, Any] = {}


class ModelRegistry:
    """Reference ``ModelRegistry`` surface (model_registry.py:17-91)."""

    def __init__(self, registry_path: Optional[str] = None,
                 models_path: Optional[str] = None) -> None:
        self.registry_path = (registry_path
                              or os.environ.get("MODELS_REGISTRY_PATH")
                              or DEFAULT_REGISTRY_PATH)
        self.models_path = models_path or os.environ.get("MODELS_PATH", "models")
        self._registry: Optional[Dict[str, Any]] = None

    def _load(self) -> Dict[str, Any]:
        if self._registry is None:
            if os.path.exists(self.registry_path):
                with open(self.registry_path) as f:
                    self._registry = yaml.safe_load(f) or {}
            else:
                self._registry = {}
        return self._registry

    def get_available_models(self) -> List[Dict[str, Any]]:
        """All models with their metadata (reference :17-40)."""
        reg = self._load()
        out = []
        for key, spec in reg.get("models", {}).items():
            out.append({"model_key": key, **spec})
        return out

    def get_model_metadata(self, model_key: str) -> Dict[str, Any]:
        reg = self._load()
        models = reg.get("models", {})
        if model_key not in models:
            raise KeyError(f"Unknown model {model_key!r}")
        return {"model_key": model_key, **models[model_key]}

    def get_model_metadata_for_size(self, model_key: str,
                                    size: Optional[str] = None) -> Dict[str, Any]:
        """Metadata with the per-size overrides applied (reference :34-60)."""
        meta = dict(self.get_model_metadata(model_key))
        sizes = meta.pop("sizes", {}) or {}
        size = size or meta.get("default_size") or (
            next(iter(sizes)) if sizes else None)
        if size and isinstance(sizes, dict) and size in sizes:
            meta.update(sizes[size] or {})
        meta["size"] = size
        return meta

    def get_model_config(self, model_key: str, size: str) -> ConfigDict:
        """Load the model's training config (reference :69-80)."""
        path = os.path.join(self.models_path, model_key, size,
                            ".hydra", "config.yaml")
        with open(path) as f:
            return ConfigDict.wrap(yaml.safe_load(f))

    def get_checkpoint_path(self, model_key: str, size: str) -> str:
        """Per-model best-checkpoint path (reference tasks.py:605-619).

        Raises FileNotFoundError at the lookup (where the cause is clear)
        instead of handing callers a nonexistent path that only fails deep
        inside checkpoint loading.
        """
        base = os.path.join(self.models_path, model_key, size)
        for name in ("instageo_best_checkpoint", "instageo_best_checkpoint.ckpt"):
            p = os.path.join(base, name)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(
            f"No checkpoint for model {model_key!r} size {size!r} under "
            f"{base} (expected instageo_best_checkpoint[.ckpt]; run "
            f"model_registry_sync.sh or set MODELS_PATH)")
