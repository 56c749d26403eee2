"""Shared absl flag registry for the data CLIs.

Same public flag surface as the reference (``instageo/data/flags.py``):
names, defaults, validators. Import this module once per CLI.

The absl registry is process-global and ``data_cleaner`` registers three
reference-named flags (``no_data_value``, ``ignore_index``,
``window_size`` — reference data_cleaner.py:67-111) whose ``window_size``
default (1) differs from the chip creators' (0, reference flags.py).
Both modules therefore register per-flag only when the name is free, and
read ``window_size`` through a helper that applies THEIR default when
the flag was registered by the other module and not passed explicitly.
(The reference has the same latent collision; its CLIs only avoid it by
never sharing a process.)
"""

from __future__ import annotations

from absl import flags

from instageo_tpu.ops.chip_ops import MASK_DECODING_POS

FLAGS = flags.FLAGS

CHIP_WINDOW_DEFAULT = 0


def _define(define_fn, name: str, *args, **kwargs) -> None:
    if name not in FLAGS:
        define_fn(name, *args, **kwargs)


def window_size_with_default(default: int) -> int:
    """``window_size`` with the CALLER's default applied when the flag was
    registered by the other CLI family (chip creators default 0, the data
    cleaner defaults 1) and not passed on the command line.

    In-process multi-CLI flows must call ``FLAGS.unparse_flags()``
    between CLIs (as the demos, tests, and webapp workers do) — absl's
    parsed values and ``present`` bits otherwise persist, leaking one
    CLI's explicit ``--window_size`` into the other's different
    parameter (true of every shared flag, e.g. ``output_directory``)."""
    fl = FLAGS["window_size"]
    if fl.present or fl.default == default:
        return int(FLAGS.window_size)
    return default


def chip_window_size() -> int:
    return window_size_with_default(CHIP_WINDOW_DEFAULT)


def define_common_flags() -> None:
    """Register the shared flags (idempotent, collision-tolerant)."""
    _define(flags.DEFINE_string, "dataframe_path", None,
            "Path to the DataFrame CSV/Parquet file.")
    _define(flags.DEFINE_enum, "data_format", "csv", ["csv", "parquet"],
            "Format of the observations file.")
    _define(
        flags.DEFINE_enum, "processing_method", "cog",
        ["cog", "download", "download-only"],
        "How to obtain granule data (reference chip_creator.py:62-71): "
        "'cog' streams chips straight from remote COGs; 'download' fetches "
        "whole granule assets locally first, then chips from the local "
        "files; 'download-only' fetches the granules and stops.")
    _define(flags.DEFINE_list, "filters", [],
            "Parquet filters as col:op:value triplets.")
    _define(flags.DEFINE_integer, "chip_size", 256, "Size of each chip.")
    _define(flags.DEFINE_string, "output_directory", None,
            "Directory where the chips and segmentation maps will be saved.")
    _define(flags.DEFINE_integer, "min_count", 100,
            "Minimum observation counts per tile.")
    _define(flags.DEFINE_integer, "src_crs", 4326,
            "EPSG code of the points' source CRS.")
    _define(flags.DEFINE_float, "spatial_resolution", 0.0002694945852358564,
            "Spatial resolution of the chip grid (CRS units/pixel).")
    _define(flags.DEFINE_bool, "shift_to_month_start", True,
            "Shift observation dates back to a month start "
            "(reference-exact `date - MonthBegin(1)`: dates already on "
            "the 1st roll back to the PREVIOUS month's start).")
    _define(flags.DEFINE_bool, "is_time_series_task", True,
            "Whether multiple timesteps are fetched per observation.")
    _define(flags.DEFINE_integer, "num_steps", 3, "Number of temporal steps.")
    _define(flags.DEFINE_integer, "temporal_step", 30,
            "Temporal step size in days.")
    _define(flags.DEFINE_integer, "temporal_tolerance", 5,
            "Tolerance (days) when searching for the closest tile.")
    _define(flags.DEFINE_integer, "temporal_tolerance_minutes", 0,
            "Additional tolerance in minutes.")
    _define(flags.DEFINE_enum, "data_source", "HLS", ["HLS", "S2", "S1"],
            "Data source to use.")
    _define(flags.DEFINE_integer, "cloud_coverage", 10,
            "Max percentage cloud cover per granule.",
            lower_bound=0, upper_bound=100)
    if "window_size" not in FLAGS:
        flags.DEFINE_integer(
            "window_size", CHIP_WINDOW_DEFAULT,
            "Half-size of the label window around each observation pixel.",
            lower_bound=0)
    if "mask_types" not in FLAGS:
        flags.DEFINE_list("mask_types", [], "List of masking types to apply.")
        flags.register_validator(
            "mask_types",
            lambda vals: all(v in MASK_DECODING_POS["HLS"] for v in vals),
            message=f"Valid values are {list(MASK_DECODING_POS['HLS'])}")
    _define(flags.DEFINE_enum, "masking_strategy", "each", ["each", "any"],
            "'each' = per-timestep masking; 'any' = collapse over time.")
    _define(flags.DEFINE_bool, "daytime_only", False,
            "Select only daytime satellite observations.")
    _define(flags.DEFINE_enum, "task_type", "seg", ["seg", "reg"],
            "'seg' saves int labels; 'reg' saves float32 labels.")


define_common_flags()
