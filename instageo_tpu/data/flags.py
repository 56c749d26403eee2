"""Shared absl flag registry for the data CLIs.

Same public flag surface as the reference (``instageo/data/flags.py``):
names, defaults, validators. Import this module once per CLI.
"""

from __future__ import annotations

from absl import flags

from instageo_tpu.ops.chip_ops import MASK_DECODING_POS

FLAGS = flags.FLAGS


def define_common_flags() -> None:
    """Register the shared flags (idempotent)."""
    if "chip_size" in FLAGS:
        return
    flags.DEFINE_string("dataframe_path", None,
                        "Path to the DataFrame CSV/Parquet file.")
    flags.DEFINE_enum("data_format", "csv", ["csv", "parquet"],
                      "Format of the observations file.")
    flags.DEFINE_enum(
        "processing_method", "cog", ["cog", "download", "download-only"],
        "How to obtain granule data (reference chip_creator.py:62-71): "
        "'cog' streams chips straight from remote COGs; 'download' fetches "
        "whole granule assets locally first, then chips from the local "
        "files; 'download-only' fetches the granules and stops.")
    flags.DEFINE_list("filters", [],
                      "Parquet filters as col:op:value triplets.")
    flags.DEFINE_integer("chip_size", 256, "Size of each chip.")
    flags.DEFINE_string("output_directory", None,
                        "Directory where the chips and segmentation maps will be saved.")
    flags.DEFINE_integer("min_count", 100,
                         "Minimum observation counts per tile.")
    flags.DEFINE_integer("src_crs", 4326,
                         "EPSG code of the points' source CRS.")
    flags.DEFINE_float("spatial_resolution", 0.0002694945852358564,
                       "Spatial resolution of the chip grid (CRS units/pixel).")
    flags.DEFINE_bool("shift_to_month_start", True,
                      "Shift observation dates to the month start.")
    flags.DEFINE_bool("is_time_series_task", True,
                      "Whether multiple timesteps are fetched per observation.")
    flags.DEFINE_integer("num_steps", 3, "Number of temporal steps.")
    flags.DEFINE_integer("temporal_step", 30, "Temporal step size in days.")
    flags.DEFINE_integer("temporal_tolerance", 5,
                         "Tolerance (days) when searching for the closest tile.")
    flags.DEFINE_integer("temporal_tolerance_minutes", 0,
                         "Additional tolerance in minutes.")
    flags.DEFINE_enum("data_source", "HLS", ["HLS", "S2", "S1"],
                      "Data source to use.")
    flags.DEFINE_integer("cloud_coverage", 10,
                         "Max percentage cloud cover per granule.",
                         lower_bound=0, upper_bound=100)
    flags.DEFINE_integer(
        "window_size", 0,
        "Half-size of the label window around each observation pixel.",
        lower_bound=0)
    flags.DEFINE_list("mask_types", [], "List of masking types to apply.")
    flags.register_validator(
        "mask_types",
        lambda vals: all(v in MASK_DECODING_POS["HLS"] for v in vals),
        message=f"Valid values are {list(MASK_DECODING_POS['HLS'])}")
    flags.DEFINE_enum("masking_strategy", "each", ["each", "any"],
                      "'each' = per-timestep masking; 'any' = collapse over time.")
    flags.DEFINE_bool("daytime_only", False,
                      "Select only daytime satellite observations.")
    flags.DEFINE_enum("task_type", "seg", ["seg", "reg"],
                      "'seg' saves int labels; 'reg' saves float32 labels.")


define_common_flags()
