"""Evaluation/inference pipeline orchestration (Ray pipeline replacement).

Mirrors the reference ``RayEvaluationPipeline``
(``instageo/model/inference_pipeline.py``): environment setup, config
validation, dataloader construction, server startup, eval / chip-inference
execution, and cleanup — minus the Ray actor boundary (the server is an
in-process TPU engine).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, Dict, Optional

from instageo_tpu.configs.config import ConfigDict
from instageo_tpu.serve.server import ModelServer

log = logging.getLogger(__name__)

REQUIRED_KEYS = ("root_dir", "test_filepath", "checkpoint_path")


def dict_to_chip_inference_config(d: Dict[str, Any]) -> ConfigDict:
    """Programmatic config assembly (reference config_dataclasses.py:153-181)."""
    from instageo_tpu.configs.config import load_config, merge

    base = load_config("config")
    return merge(base, d)


class EvaluationPipeline:
    """Reference ``RayEvaluationPipeline`` surface (:135-373)."""

    def __init__(self, cfg: ConfigDict) -> None:
        from instageo_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()  # serving restarts / workers start hot
        self.cfg = cfg
        self.server: Optional[ModelServer] = None
        self._validate()

    def _validate(self) -> None:
        missing = [k for k in REQUIRED_KEYS if not self.cfg.get(k)]
        if missing:
            raise ValueError(f"Missing required config values: {missing}")
        if not os.path.exists(str(self.cfg.checkpoint_path)):
            raise FileNotFoundError(
                f"checkpoint_path {self.cfg.checkpoint_path} does not exist")

    def start_evaluation_pipeline(self) -> ModelServer:
        """Load the model + compile (reference :236-278)."""
        if self.server is None:
            self.server = ModelServer(self.cfg)
        return self.server

    def _infer_loader(self):
        from instageo_tpu.data.dataloader import (
            create_dataloader,
            infer_collate,
            process_and_augment,
        )
        from instageo_tpu.data.dataloader import InstaGeoDataset

        cfg = self.cfg
        pre = partial(
            process_and_augment,
            mean=list(cfg.dataloader.mean),
            std=list(cfg.dataloader.std),
            temporal_size=int(cfg.dataloader.get("temporal_dim", 1)),
            im_size=int(cfg.dataloader.get("img_size", 224)),
            # Inference must be deterministic: chips larger than img_size
            # take the SAME center window every run (and save_prediction
            # re-anchors the output raster to that window).
            crop="center",
            augmentations=None,
        )
        ds = InstaGeoDataset(
            filename=str(cfg.test_filepath),
            input_root=str(cfg.root_dir),
            preprocess_func=pre,
            chip_no_data_value=cfg.dataloader.get("no_data_value", -9999) or 0,
            label_no_data_value=cfg.train.get("ignore_index", -100),
            replace_label=(tuple(cfg.dataloader.replace_label)
                           if cfg.dataloader.get("replace_label") else None),
            reduce_to_zero=bool(cfg.dataloader.get("reduce_to_zero", False)),
            constant_multiplier=float(cfg.dataloader.get("constant_multiplier", 1.0)),
            bands=cfg.dataloader.get("bands"),
            include_filenames=True,
            cache_dir=cfg.dataloader.get("cache_dir"),
        )
        return create_dataloader(ds, int(cfg.train.get("batch_size", 8)),
                                 collate_fn=infer_collate,
                                 num_workers=int(cfg.dataloader.get("num_workers", 1)),
                                 worker_mode=str(cfg.dataloader.get("worker_mode", "thread")))

    def evaluate(self) -> Dict[str, float]:
        """Sliding-window test evaluation (reference :289-299)."""
        from instageo_tpu.data.dataloader import (
            InstaGeoDataset,
            create_dataloader,
            eval_collate,
            process_test,
        )

        cfg = self.cfg
        server = self.start_evaluation_pipeline()
        pre = partial(
            process_test,
            mean=list(cfg.dataloader.mean),
            std=list(cfg.dataloader.std),
            temporal_size=int(cfg.dataloader.get("temporal_dim", 1)),
            img_size=int(cfg.test.get("img_size", 224)),
            crop_size=int(cfg.test.get("crop_size", 224)),
            stride=int(cfg.test.get("stride", 224)),
        )
        ds = InstaGeoDataset(
            filename=str(cfg.test_filepath),
            input_root=str(cfg.root_dir),
            preprocess_func=pre,
            chip_no_data_value=cfg.dataloader.get("no_data_value", -9999) or 0,
            label_no_data_value=cfg.train.get("ignore_index", -100),
            replace_label=(tuple(cfg.dataloader.replace_label)
                           if cfg.dataloader.get("replace_label") else None),
            reduce_to_zero=bool(cfg.dataloader.get("reduce_to_zero", False)),
            constant_multiplier=float(cfg.dataloader.get("constant_multiplier", 1.0)),
            bands=cfg.dataloader.get("bands"),
            cache_dir=cfg.dataloader.get("cache_dir"),
        )
        loader = create_dataloader(ds, int(cfg.train.get("batch_size", 8)),
                                   collate_fn=eval_collate,
                                   num_workers=int(cfg.dataloader.get("num_workers", 1)),
                                   worker_mode=str(cfg.dataloader.get("worker_mode", "thread")))
        return server.evaluate(lambda: iter(loader))

    def chip_inference(self, out_dir: Optional[str] = None) -> Dict[str, Any]:
        """Batched chip inference (reference :301-308).

        Defaults to the fused fast path (raw uint16 transfer + on-device
        preprocessing, ops/preprocess.py); set ``tpu.fused_infer=false`` for
        the host-preprocessed loader path.
        """
        server = self.start_evaluation_pipeline()
        out = out_dir or os.path.join(str(self.cfg.root_dir), "predictions")
        cfg = self.cfg
        if bool((cfg.get("tpu") or {}).get("fused_infer", True)):
            from instageo_tpu.serve.infer import chip_inference_from_paths

            loader = self._infer_loader()  # QA-scanned file list
            paths = [p for p, _ in loader.dataset.file_paths]
            n, dt = chip_inference_from_paths(
                paths, out, server.model, server.variables,
                mean=list(cfg.dataloader.mean), std=list(cfg.dataloader.std),
                temporal_size=int(cfg.dataloader.get("temporal_dim", 1)),
                bands=cfg.dataloader.get("bands"),
                constant_multiplier=float(
                    cfg.dataloader.get("constant_multiplier", 1.0)),
                is_reg_task=bool(cfg.get("is_reg_task", False)),
                batch_size=int(cfg.train.get("batch_size", 8)),
                # chips on disk may exceed the model input (chip_size 256
                # vs img_size 224); the loader path crops, so must we
                img_size=int(cfg.dataloader.get("img_size", 224)),
            )
            server.requests_served += 1
            return {"num_chips": n, "inference_time": dt,
                    "chips_per_sec": n / dt if dt else 0.0}
        return server.chip_inference(iter(self._infer_loader()), out)

    def cleanup(self) -> None:
        """Release the engine (reference :319-336 shuts Ray down).

        Closes the server's dynamic batcher first: its worker thread
        holds the predict closure (model + device buffers) alive and
        never exits on its own — without this, each serve/cleanup cycle
        in a long-lived process leaks one model's HBM."""
        if self.server is not None and hasattr(self.server, "close"):
            self.server.close()
        self.server = None
