"""Data Cleaner CLI: post-hoc chip QA and segmentation-map cleaning.

Same surface and semantics as the reference (``instageo/data/
data_cleaner.py``): drop chips whose no-data ratio exceeds a threshold
(``any``/``all`` band strategies), and clean seg maps by either ``buffer``
(dilate observation pixels by a window) or ``limit`` (keep only observation
pixels from a points CSV).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np
import pandas as pd
from absl import app, flags

from instageo_tpu.data.crs import Transformer, to_mgrs
from instageo_tpu.data.geotiff import GeoTiffReader, write_geotiff

FLAGS = flags.FLAGS

if "chips_dataset_csv" not in FLAGS:
    flags.DEFINE_string("chips_dataset_csv", None,
                        "CSV with Input and Label columns.")
    flags.DEFINE_string("output_chips_dataset_csv", None,
                        "Where to save the cleaned CSV.")
    flags.DEFINE_bool("drop_chips", False,
                      "Drop chips by no-data ratio threshold.")
    flags.DEFINE_enum("drop_chips_strategy", "any", ["any", "all"],
                      "'any': drop if any band exceeds; 'all': all bands.")
    flags.DEFINE_float("no_data_threshold", 0.5,
                       "No-data pixel ratio above which a chip is dropped.")
    flags.DEFINE_bool("clean_seg_maps", False, "Clean segmentation maps.")
    flags.DEFINE_enum("cleaning_method", "buffer", ["buffer", "limit"],
                      "buffer: dilate observation px; limit: keep only obs px.")
    flags.DEFINE_string("observation_points_csv", None,
                        "Points CSV (x, y, date[, mgrs_tile_id]) for 'limit'.")
    flags.DEFINE_string("seg_map_output_dir", None,
                        "Directory for cleaned seg maps (default: in place).")

# Reference flag names (data_cleaner.py:67-111): no_data_value,
# ignore_index, window_size. The chip-creator CLIs' shared registry
# (data/flags.py) also defines ``window_size`` (default 0); the absl
# registry is process-global, so register our own only when free and
# otherwise share theirs, falling back to the cleaner default of 1 when
# the flag was not passed explicitly.
for _name, _default, _help in [
    ("no_data_value", -9999, "No-data value in chips."),
    ("ignore_index", -1, "Ignore value written for non-observation pixels."),
    ("window_size", 1, "Half-size of the dilation window for 'buffer'."),
]:
    if _name not in FLAGS:
        flags.DEFINE_integer(_name, _default, _help)

_CLEANER_WINDOW_DEFAULT = 1


def _window_size() -> int:
    """window_size with the cleaner default (1) — see
    ``data.flags.window_size_with_default``."""
    from instageo_tpu.data.flags import window_size_with_default

    return window_size_with_default(_CLEANER_WINDOW_DEFAULT)


def should_drop_chip(chip_fname: str, no_data_threshold: float,
                     no_data_value: float, drop_chips_strategy: str) -> bool:
    """True if the chip's no-data ratio exceeds the threshold (ref :117-142)."""
    with GeoTiffReader(chip_fname) as r:
        chip = r.read()
    if drop_chips_strategy == "any":
        no_data_mask = np.any(chip == no_data_value, axis=0)
    elif drop_chips_strategy == "all":
        no_data_mask = np.all(chip == no_data_value, axis=0)
    else:
        raise ValueError(f"Invalid strategy {drop_chips_strategy!r}")
    return float(np.mean(no_data_mask)) > no_data_threshold


def _write_like(path_in: str, seg_map: np.ndarray, out_dir: Optional[str]) -> str:
    with GeoTiffReader(path_in) as src:
        transform, crs, nodata = src.transform, src.crs, src.nodata
    out_dir = out_dir or os.path.dirname(path_in)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, os.path.basename(path_in))
    write_geotiff(out_path, seg_map, transform=transform, crs=crs, nodata=nodata)
    return out_path


def buffer_observation_pixels(
    seg_map_fname: str,
    chip_fname: str,
    window_size: int,
    no_data_value: float,
    ignore_index: int,
    seg_map_output_dir: Optional[str],
) -> str:
    """Dilate labeled pixels by a (2w+1)² window, then re-apply the chip
    no-data mask (reference :143-202)."""
    with GeoTiffReader(chip_fname) as r:
        chip = r.read()
    with GeoTiffReader(seg_map_fname) as r:
        seg_map = r.read()
    rows, cols = np.where(seg_map[0] != ignore_index)
    offsets = np.arange(-window_size, window_size + 1)
    orow, ocol = np.meshgrid(offsets, offsets)
    wr = np.clip(rows[:, None, None] + orow, 0, seg_map.shape[1] - 1)
    wc = np.clip(cols[:, None, None] + ocol, 0, seg_map.shape[2] - 1)
    values = seg_map[0, rows, cols]
    seg_map[0, wr.ravel(), wc.ravel()] = np.repeat(
        values, (2 * window_size + 1) ** 2)
    mask = np.all(chip == no_data_value, axis=0)
    seg_map[0, mask] = ignore_index
    return _write_like(seg_map_fname, seg_map, seg_map_output_dir)


def limit_seg_map_to_observation_pixels(
    seg_map_fname: str,
    observation_points: pd.DataFrame,
    ignore_index: int,
    seg_map_output_dir: Optional[str],
) -> Optional[str]:
    """Keep only pixels at observation points (reference :203-270).

    Filename layout: ``seg_map_{date}_{tile_id}_{x}_{y}.tif`` where
    tile_id embeds the MGRS code at a sensor-dependent position (HLS:
    ``...L30_T38PMB_...``; S2: ``S2B_MSIL2A_..._T33TUN_...``) — so the
    MGRS tile is located by PATTERN (``T`` + 2 digits + 3 letters), not
    by a fixed split index, which only matched HLS names and made the
    filter drop every S2/S1 row.
    """
    import re

    base = os.path.basename(seg_map_fname)
    parts = base.split("_")
    chip_date = parts[2] if len(parts) >= 4 else ""
    m = re.search(r"_T(\d{2}[A-Z]{3})_", base)
    mgrs_tile = m.group(1) if m else (
        parts[4][1:] if len(parts) >= 5 else "")

    with GeoTiffReader(seg_map_fname) as src:
        seg_map = src.read()
        crs = src.crs
        transform = src.transform

    relevant = observation_points[
        (observation_points["mgrs_tile_id"] == mgrs_tile)
        & (observation_points["date"].str.replace("-", "") == chip_date)
    ]
    if relevant.empty:
        return None
    mask = np.zeros(seg_map[0].shape, dtype=bool)
    t = Transformer.from_crs(4326, crs, always_xy=True)
    xs, ys = t.transform(relevant["x"].values, relevant["y"].values)
    for x, y in zip(np.atleast_1d(xs), np.atleast_1d(ys)):
        row, col = transform.rowcol(float(x), float(y))
        if 0 <= row < seg_map.shape[1] and 0 <= col < seg_map.shape[2]:
            mask[row, col] = True
    seg_map = np.where(mask, seg_map, ignore_index).astype(seg_map.dtype)
    return _write_like(seg_map_fname, seg_map, seg_map_output_dir)


def clean_data(
    chips_dataset_csv: str,
    output_chips_dataset_csv: str,
    drop_chips: bool = False,
    drop_chips_strategy: str = "any",
    no_data_threshold: float = 0.5,
    no_data_value: float = -9999,
    clean_seg_maps: bool = False,
    observation_points_csv: Optional[str] = None,
    cleaning_method: str = "buffer",
    ignore_index: int = -1,
    window_size: int = 1,
    seg_map_output_dir: Optional[str] = None,
) -> pd.DataFrame:
    """Orchestrate dropping + cleaning and save the new CSV (ref :271-373)."""
    df = pd.read_csv(chips_dataset_csv)
    num_rows = len(df)
    if not all(c in df.columns for c in ("Input", "Label")):
        raise ValueError("CSV must contain 'Input' and 'Label' columns")

    if drop_chips:
        df = df[~df["Input"].apply(
            should_drop_chip,
            args=(no_data_threshold, no_data_value, drop_chips_strategy))]

    if clean_seg_maps:
        if cleaning_method == "buffer":
            df = df.copy()
            df["Label"] = df.apply(
                lambda row: buffer_observation_pixels(
                    row["Label"], row["Input"], window_size, no_data_value,
                    ignore_index, seg_map_output_dir),
                axis=1)
        elif cleaning_method == "limit":
            if not observation_points_csv:
                raise ValueError(
                    "Observation points CSV is required for 'limit'")
            points = pd.read_csv(observation_points_csv)
            if not all(c in points.columns for c in ("x", "y", "date")):
                raise ValueError(
                    "Observation points CSV must contain x, y, date")
            if "mgrs_tile_id" not in points.columns:
                points["mgrs_tile_id"] = [
                    to_mgrs(r.y, r.x, 0) for r in points.itertuples()]
            df = df.copy()
            df["Label"] = df["Label"].apply(
                limit_seg_map_to_observation_pixels,
                args=(points, ignore_index, seg_map_output_dir))
            df = df[df["Label"].notna()]
        else:
            raise ValueError(f"Invalid cleaning method: {cleaning_method}")

    df.to_csv(output_chips_dataset_csv, index=False)
    logging.info("Cleaned data saved to %s. Dropped %d rows.",
                 output_chips_dataset_csv, num_rows - len(df))
    return df


def main(argv: Any) -> None:
    del argv
    clean_data(
        chips_dataset_csv=FLAGS.chips_dataset_csv,
        output_chips_dataset_csv=FLAGS.output_chips_dataset_csv,
        drop_chips=FLAGS.drop_chips,
        drop_chips_strategy=FLAGS.drop_chips_strategy,
        no_data_threshold=FLAGS.no_data_threshold,
        no_data_value=FLAGS.no_data_value,
        clean_seg_maps=FLAGS.clean_seg_maps,
        observation_points_csv=FLAGS.observation_points_csv,
        cleaning_method=FLAGS.cleaning_method,
        ignore_index=FLAGS.ignore_index,
        window_size=_window_size(),
        seg_map_output_dir=FLAGS.seg_map_output_dir,
    )


if __name__ == "__main__":
    app.run(main)
