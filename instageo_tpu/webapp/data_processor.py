"""Data processor: in-process proxy to the raster chip creator.

Reference: ``instageo/new_apps/backend/app/data_processor.py`` — writes
``bounding_boxes.json``, assembles the absl argv, and invokes the raster
chip creator's ``main`` in process; exposes chip counts and the manifest
CSV path for the prediction stage.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Any, Dict, List

log = logging.getLogger(__name__)


class DataProcessor:
    """Reference DataProcessor surface (:32-172)."""

    def __init__(self, data_dir: str, parameters: Dict[str, Any]) -> None:
        self.data_dir = data_dir
        self.parameters = parameters or {}
        os.makedirs(self.data_dir, exist_ok=True)

    @property
    def data_path(self) -> str:
        return self.data_dir

    @property
    def dataset_csv(self) -> str:
        src = str(self.parameters.get("data_source", "HLS")).lower()
        return os.path.join(self.data_dir, f"{src}_raster_dataset.csv")

    def extract_data_from_bboxes(self, bboxes: List[List[float]]) -> Dict[str, Any]:
        """Write bboxes JSON, run the raster chip creator, count chips.

        Reference :113-172 (flags assembled from the model's registry
        metadata carried in ``parameters``).
        """
        bbox_path = os.path.join(self.data_dir, "bounding_boxes.json")
        with open(bbox_path, "w") as f:
            json.dump({"bboxes": bboxes}, f)

        p = self.parameters
        argv = [
            "raster_chip_creator",
            f"--output_directory={self.data_dir}",
            "--is_bbox_feature=true",
            f"--bbox_feature_path={bbox_path}",
            f"--date={p.get('date', '2024-06-01')}",
            f"--data_source={p.get('data_source', 'HLS')}",
            f"--chip_size={p.get('chip_size', 224)}",
            f"--num_steps={p.get('num_steps', 1)}",
            f"--temporal_step={p.get('temporal_step', 30)}",
            f"--temporal_tolerance={p.get('temporal_tolerance', 5)}",
            f"--cloud_coverage={p.get('cloud_coverage', 10)}",
            f"--spatial_resolution={p.get('spatial_resolution', 0.0002694945852358564)}",
        ]
        if p.get("mask_types"):
            argv.append(f"--mask_types={','.join(p['mask_types'])}")

        from instageo_tpu.data import raster_chip_creator

        # Workers are long-lived and flags are process-global: reset so a
        # previous task's optional flags (e.g. mask_types) don't leak into
        # tasks that omit them.
        raster_chip_creator.FLAGS.unparse_flags()
        raster_chip_creator.FLAGS(argv)
        raster_chip_creator.main(None)

        chips = glob.glob(os.path.join(self.data_dir, "chips", "*.tif"))
        # The raster pipeline writes absolute Input paths; normalize the
        # manifest so the dataset reads relative to data_path.
        csv = self.dataset_csv
        if os.path.exists(csv):
            import pandas as pd

            df = pd.read_csv(csv, index_col=0)
            if "Input" in df.columns:
                df["Input"] = df["Input"].map(
                    lambda v: os.path.relpath(str(v), self.data_dir))
            df.to_csv(csv, index=False)
        return {"chip_count": len(chips), "data_path": self.data_dir,
                "dataset_csv": csv}
