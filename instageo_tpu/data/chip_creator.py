"""Chip Creator CLI: geo-located point observations -> training chips.

``python -m instageo_tpu.data.chip_creator --dataframe_path=obs.csv
--output_directory=out --data_source=HLS ...`` — same flag surface and
workflow as the reference (``instageo/data/chip_creator.py``): parse
observations (CSV or filtered Parquet), combine date/time, assign MGRS
tiles (density filter), search STAC per source, cache the granule dataset
(JSON) + filtered records (parquet) for resume, then run the chip pipeline.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable, Dict

import pandas as pd
from absl import app

from instageo_tpu.data import flags as _flags  # registers shared flags
from instageo_tpu.data.pipeline import get_tiles
from instageo_tpu.data.stac import create_records_with_items
from instageo_tpu.data.sources import hls, s1, s2

FLAGS = _flags.FLAGS

DATA_SOURCE_CONFIG: Dict[str, Dict[str, Any]] = {
    "HLS": {
        "add_stac_items_func": hls.add_hls_stac_items,
        "pipeline_class": hls.HLSPointsPipeline,
        "granules_field": "hls_granules",
        "items_field": "hls_items",
        "client_func": hls.get_client,
        "extra_params": ["temporal_tolerance_minutes", "cloud_coverage",
                         "daytime_only"],
    },
    "S2": {
        "add_stac_items_func": s2.add_s2_stac_items,
        "pipeline_class": s2.S2PointsPipeline,
        "granules_field": "s2_granules",
        "items_field": "s2_items",
        "client_func": s2.get_client,
        "extra_params": ["temporal_tolerance_minutes", "cloud_coverage",
                         "daytime_only"],
    },
    "S1": {
        "add_stac_items_func": s1.add_s1_stac_items,
        "pipeline_class": s1.S1PointsPipeline,
        "granules_field": "s1_granules",
        "items_field": "s1_items",
        "client_func": s1.get_client,
        "extra_params": ["temporal_tolerance_minutes"],
    },
}


def parse_filters(raw: list) -> list:
    """col:op:value triplets -> pyarrow filter tuples (reference :96-145)."""
    filters = []
    for spec in raw:
        col, op, value = spec.split(":", 2)
        try:
            value = json.loads(value)
        except json.JSONDecodeError:
            pass
        filters.append((col, op, value))
    return filters


def localize_granules(dataset: Dict[str, Any], out_dir: str,
                      data_source: str) -> Dict[str, Any]:
    """Fetch granule assets to ``{out_dir}/granules`` and re-point hrefs.

    Implements the reference's ``processing_method='download'`` /
    ``'download-only'`` semantics (chip_creator.py:62-71): whole granule
    assets are fetched locally before chipping, instead of streaming
    range-reads from the remote COGs. Already-downloaded valid files are
    skipped, so the step is resumable. Returns the dataset with every
    successfully fetched asset href rewritten to its local file.
    """
    from instageo_tpu.data.downloads import parallel_download

    sign = None
    if data_source in ("S2", "S1"):
        from instageo_tpu.data.sources.s2 import MPCSigner

        sign = MPCSigner("sentinel-1-rtc" if data_source == "S1"
                         else "sentinel-2-l2a")

    granules_dir = os.path.join(out_dir, "granules")
    urls: Dict[str, str] = {}
    slots: Dict[str, list] = {}  # filename -> [(granule_dict, asset_name)]
    for entry in dataset.values():
        for granule in entry.get("granules", []):
            for name, asset in granule.get("assets", {}).items():
                href = asset.get("href", "")
                if not href.startswith(("http://", "https://")):
                    continue  # already local
                ext = os.path.splitext(href.split("?", 1)[0])[1] or ".tif"
                fname = f"{granule['id']}_{name}{ext}"
                urls[fname] = sign(href) if sign else href
                slots.setdefault(fname, []).append((granule, name))

    if not urls:
        return dataset
    logging.info("Downloading %d granule assets to %s", len(urls),
                 granules_dir)
    done = parallel_download(urls, granules_dir,
                             headers={} if sign else None)
    for path in done:
        fname = os.path.basename(path)
        for granule, name in slots.get(fname, []):
            granule["assets"][name]["href"] = path
    missing = len(urls) - len(done)
    if missing:
        logging.warning("%d granule assets failed to download; their "
                        "tiles fall back to remote reads.", missing)
    return dataset


def process_data_source(
    data_source: str,
    sub_data: pd.DataFrame,
    add_stac_items_func: Callable,
    pipeline_class: type,
    granules_field: str,
    items_field: str,
    client_func: Callable,
    **kwargs: Any,
) -> None:
    """Search/cache/run for one data source (reference :189-255)."""
    out_dir = FLAGS.output_directory
    dataset_file = os.path.join(out_dir, f"{data_source.lower()}_dataset.json")
    records_file = os.path.join(out_dir, "filtered_obsv_records.parquet")

    if not (os.path.exists(dataset_file) and os.path.exists(records_file)):
        logging.info("Creating %s dataset JSON.", data_source)
        os.makedirs(out_dir, exist_ok=True)
        client = client_func()
        with_items = add_stac_items_func(client, sub_data, **kwargs)
        filtered_records, dataset = create_records_with_items(
            with_items, granules_field, items_field)
        with open(dataset_file, "w") as f:
            json.dump(dataset, f, indent=4)
        filtered_records.drop(
            columns=[c for c in ("tile_queries",) if c in filtered_records],
        ).to_parquet(records_file)
    else:
        logging.info("%s dataset JSON already created", data_source)
        with open(dataset_file) as f:
            dataset = json.load(f)
        filtered_records = pd.read_parquet(records_file)

    if FLAGS.processing_method in ("download", "download-only"):
        dataset = localize_granules(dataset, out_dir, data_source)
        if FLAGS.processing_method == "download-only":
            logging.info("processing_method=download-only: granules saved "
                         "under %s, skipping chip creation.",
                         os.path.join(out_dir, "granules"))
            return

    logging.info("Creating Chips and Segmentation Maps")
    pipeline = pipeline_class(
        output_directory=out_dir,
        chip_size=FLAGS.chip_size,
        mask_types=list(FLAGS.mask_types),
        masking_strategy=FLAGS.masking_strategy,
        src_crs=FLAGS.src_crs,
        spatial_resolution=FLAGS.spatial_resolution,
        window_size=_flags.chip_window_size(),
        task_type=FLAGS.task_type,
    )
    obsv_records = {
        key: grp for key, grp in filtered_records.groupby("stac_items_str")
    }
    pipeline.run(dataset, obsv_records)


def main(argv: Any) -> None:
    """CSV/Parquet Chip Creator entry point (reference :258-330)."""
    del argv
    if FLAGS.data_format == "parquet":
        filters = parse_filters(FLAGS.filters) if FLAGS.filters else None
        data = pd.read_parquet(FLAGS.dataframe_path, filters=filters)
    else:
        data = pd.read_csv(FLAGS.dataframe_path)

    data["date"] = pd.to_datetime(data["date"])
    if "time" in data.columns:
        data["date"] = data["date"] + pd.to_timedelta(data["time"])
    if FLAGS.shift_to_month_start:
        data["date"] = data["date"] - pd.offsets.MonthBegin(1)
    data["input_features_date"] = (
        data["date"] - pd.DateOffset(days=FLAGS.temporal_step)
        if FLAGS.is_time_series_task else data["date"]
    )
    num_steps = FLAGS.num_steps if FLAGS.is_time_series_task else 1

    sub_data = get_tiles(data, src_crs=FLAGS.src_crs, min_count=FLAGS.min_count)

    if FLAGS.data_source not in DATA_SOURCE_CONFIG:
        raise ValueError(
            f"data_source {FLAGS.data_source!r} must be one of "
            f"{sorted(DATA_SOURCE_CONFIG)}")
    config = DATA_SOURCE_CONFIG[FLAGS.data_source]
    extra = {p: getattr(FLAGS, p) for p in config["extra_params"]}
    process_data_source(
        data_source=FLAGS.data_source,
        sub_data=sub_data,
        add_stac_items_func=config["add_stac_items_func"],
        pipeline_class=config["pipeline_class"],
        granules_field=config["granules_field"],
        items_field=config["items_field"],
        client_func=config["client_func"],
        num_steps=num_steps,
        temporal_step=FLAGS.temporal_step,
        temporal_tolerance=FLAGS.temporal_tolerance,
        **extra,
    )


if __name__ == "__main__":
    app.run(main)
