"""Prediction map viewer CLI (legacy Streamlit app replacement).

Reference: ``instageo/apps/app.py`` — browse prediction GeoTIFFs by
country / year / month and render them on a map. Streamlit isn't in this
image, so the same browse-and-render workflow runs as a CLI producing a
self-contained HTML map:

    python -m instageo_tpu.apps.app --directory=preds --country_code=KE \
        --year=2023 --month=6 --output=map.html

Predictions are matched by the reference's naming convention
(``{directory}/{year}/{month}/*{tile}*.tif``) against the country→MGRS
lookup in ``utils/country_code_to_mgrs_tiles.json``.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Any, List

from absl import app, flags

from instageo_tpu.apps.viz import create_map_with_geotiff_tiles

FLAGS = flags.FLAGS

if "directory" not in FLAGS:
    flags.DEFINE_string("directory", None, "Directory containing predictions.")
    flags.DEFINE_string("country_code", None,
                        "ISO country code to filter tiles (optional).")
    flags.DEFINE_integer("year", None, "Prediction year.")
    flags.DEFINE_integer("month", None, "Prediction month (1-12).")
    flags.DEFINE_string("output", "map.html", "Output HTML file.")
    flags.DEFINE_float("threshold_low", 0.8, "Lower display threshold.")
    flags.DEFINE_float("threshold_high", 1.0, "Upper display threshold.")

_COUNTRY_MAP_PATH = os.path.join(os.path.dirname(__file__), "utils",
                                 "country_code_to_mgrs_tiles.json")


def load_country_tiles(country_code: str) -> List[str]:
    """Country -> MGRS tile list (reference apps/utils data file)."""
    if not os.path.exists(_COUNTRY_MAP_PATH):
        return []
    with open(_COUNTRY_MAP_PATH) as f:
        mapping = json.load(f)
    return mapping.get(country_code.upper(), [])


def find_prediction_tiles(directory: str, year: int = None, month: int = None,
                          country_code: str = None) -> List[str]:
    """Locate prediction GeoTIFFs (reference app.py:71-106 browse logic)."""
    patterns = []
    if year and month:
        patterns.append(os.path.join(directory, str(year), f"{month:02d}",
                                     "*.tif"))
        patterns.append(os.path.join(directory, str(year), str(month), "*.tif"))
    elif year:
        patterns.append(os.path.join(directory, str(year), "*", "*.tif"))
    if not patterns:
        # Only undated browsing falls back to the flat layout: silently
        # returning every date's predictions for a dated query would show
        # the wrong data labeled as the requested month.
        patterns.append(os.path.join(directory, "*.tif"))
    paths: List[str] = []
    for pat in patterns:
        paths.extend(glob.glob(pat))
        if paths:
            break
    if not paths and (year or month):
        logging.warning(
            "No tiles under the dated layout %s for year=%s month=%s "
            "(flat *.tif files are only browsed without a date filter).",
            directory, year, month)
    if country_code:
        tiles = load_country_tiles(country_code)
        if tiles:
            paths = [p for p in paths
                     if any(t in os.path.basename(p) for t in tiles)]
    return sorted(set(paths))


def main(argv: Any) -> None:
    del argv
    if not FLAGS.directory:
        raise ValueError("--directory is required")
    paths = find_prediction_tiles(FLAGS.directory, FLAGS.year, FLAGS.month,
                                  FLAGS.country_code)
    if not paths:
        logging.warning("No prediction tiles found.")
    out = create_map_with_geotiff_tiles(
        paths, FLAGS.output,
        threshold=(FLAGS.threshold_low, FLAGS.threshold_high))
    print(f"Map written to {out} ({len(paths)} tiles found; "
          "skipped tiles are logged as warnings)")


if __name__ == "__main__":
    app.run(main)
