"""Raster Chip Creator CLI: label rasters or bbox JSON -> chips.

Same surface as the reference (``instageo/data/raster_chip_creator.py``):
``--records_file`` points at a CSV of label rasters (or, with
``--is_bbox_feature``, a JSON of bounding boxes — the web-backend path);
chips are cut on a fixed grid aligned to the label rasters / bboxes. S1 is
not supported (reference raises NotImplementedError — :206-207).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

import pandas as pd
from absl import app, flags

from instageo_tpu.data import flags as _flags  # shared registry
from instageo_tpu.data.geo_utils import create_grid_polygons
from instageo_tpu.data.stac import create_records_with_items
from instageo_tpu.data.sources import hls, s2

FLAGS = _flags.FLAGS

if "records_file" not in FLAGS:
    flags.DEFINE_string("records_file", None,
                        "CSV of label rasters (label_filename, date columns).")
    flags.DEFINE_string("raster_path", "", "Directory holding label rasters.")
    flags.DEFINE_bool("qa_check", True, "Run chip/label QA checks.")
    flags.DEFINE_bool("is_bbox_feature", False,
                      "Records are bounding boxes (no labels produced).")
    flags.DEFINE_string("bbox_feature_path", None,
                        "JSON file containing bounding boxes.")
    flags.DEFINE_string("date", None, "Acquisition date for bbox features.")

RASTER_SOURCE_CONFIG = {
    "HLS": {
        "add_stac_items_func": hls.add_hls_raster_stac_items,
        "pipeline_class": hls.HLSRasterPipeline,
        "granules_field": "hls_granules",
        "items_field": "hls_items",
        "client_func": hls.get_client,
    },
    "S2": {
        "add_stac_items_func": s2.add_s2_stac_items,
        "pipeline_class": s2.S2RasterPipeline,
        "granules_field": "s2_granules",
        "items_field": "s2_items",
        "client_func": s2.get_client,
    },
}


def _load_grid_records() -> pd.DataFrame:
    """Build the chip-grid records from bboxes or a label-raster CSV."""
    if FLAGS.is_bbox_feature:
        with open(FLAGS.bbox_feature_path) as f:
            payload = json.load(f)
        bboxes = payload["bboxes"] if isinstance(payload, dict) else payload
        return create_grid_polygons(
            bboxes, FLAGS.date, FLAGS.chip_size, FLAGS.spatial_resolution,
            FLAGS.src_crs)
    records = pd.read_csv(FLAGS.records_file)
    from instageo_tpu.data.crs import Transformer
    from instageo_tpu.data.geotiff import GeoTiffReader
    from instageo_tpu.data.geo_utils import get_polygon_tile_ids

    def _reproject_bbox(bbox, src, dst):
        """Axis-aligned hull of the bbox's corners in the target CRS."""
        if src == dst:
            return bbox
        t = Transformer.from_crs(src, dst, always_xy=True)
        xs, ys = t.transform(
            [bbox[0], bbox[2], bbox[0], bbox[2]],
            [bbox[1], bbox[1], bbox[3], bbox[3]])
        return (float(min(xs)), float(min(ys)),
                float(max(xs)), float(max(ys)))

    rows = []
    for _, rec in records.iterrows():
        path = os.path.join(FLAGS.raster_path, rec["label_filename"])
        with GeoTiffReader(path) as r:
            t = r.transform
            raster_crs = r.crs or 4326
            x0, y0 = t * (0, 0)
            x1, y1 = t * (r.width, r.height)
        native = (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
        # The pipeline slices chips with ``bbox`` interpreted in src_crs;
        # MGRS/STAC dispatch needs true 4326 (the reference reprojects its
        # geo records the same way — raster_chip_creator.py:102).
        rows.append({"label_filename": rec["label_filename"],
                     "date": rec["date"],
                     "bbox": _reproject_bbox(native, raster_crs,
                                             FLAGS.src_crs),
                     "bbox_4326": _reproject_bbox(native, raster_crs, 4326)})
    df = pd.DataFrame(rows)
    df["mgrs_tile_id"] = df["bbox_4326"].map(
        lambda b: sorted(get_polygon_tile_ids(b)))
    return df.explode("mgrs_tile_id", ignore_index=True)


def main(argv: Any) -> None:
    del argv
    if FLAGS.data_source == "S1":
        raise NotImplementedError(
            "S1 raster chip creation is not supported (reference parity).")

    grid = _load_grid_records()
    grid["date"] = pd.to_datetime(grid["date"])
    grid["input_features_date"] = grid["date"]

    config = RASTER_SOURCE_CONFIG[FLAGS.data_source]
    out_dir = FLAGS.output_directory
    os.makedirs(out_dir, exist_ok=True)
    dataset_file = os.path.join(out_dir,
                                f"{FLAGS.data_source.lower()}_dataset.json")
    records_file = os.path.join(out_dir, "filtered_raster_records.parquet")

    if not (os.path.exists(dataset_file) and os.path.exists(records_file)):
        client = config["client_func"]()
        with_items = config["add_stac_items_func"](
            client, grid,
            num_steps=FLAGS.num_steps,
            temporal_step=FLAGS.temporal_step,
            temporal_tolerance=FLAGS.temporal_tolerance,
            temporal_tolerance_minutes=FLAGS.temporal_tolerance_minutes,
            cloud_coverage=FLAGS.cloud_coverage,
            daytime_only=FLAGS.daytime_only,
        )
        filtered, dataset = create_records_with_items(
            with_items, config["granules_field"], config["items_field"])
        with open(dataset_file, "w") as f:
            json.dump(dataset, f, indent=4)
        filtered.drop(columns=[c for c in ("tile_queries",) if c in filtered]
                      ).to_parquet(records_file)
    else:
        with open(dataset_file) as f:
            dataset = json.load(f)
        filtered = pd.read_parquet(records_file)

    pipeline = config["pipeline_class"](
        output_directory=out_dir,
        chip_size=FLAGS.chip_size,
        mask_types=list(FLAGS.mask_types),
        masking_strategy=FLAGS.masking_strategy,
        src_crs=FLAGS.src_crs,
        spatial_resolution=FLAGS.spatial_resolution,
        window_size=_flags.chip_window_size(),
        task_type=FLAGS.task_type,
        raster_path=FLAGS.raster_path,
        qa_check=FLAGS.qa_check,
        is_bbox_feature=FLAGS.is_bbox_feature,
    )
    pipeline.run(dataset, filtered)
    logging.info("Raster chip creation complete: %s", out_dir)


if __name__ == "__main__":
    app.run(main)
