"""Viewer app tests: overlay rendering + map HTML generation."""

import json
import os

import numpy as np
import pytest

from instageo_tpu.apps.app import find_prediction_tiles, load_country_tiles
from instageo_tpu.apps.viz import (
    create_map_with_geotiff_tiles,
    read_geotiff_to_overlay,
)
from instageo_tpu.data.geotiff import Affine, write_geotiff


@pytest.fixture
def pred_tif(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.uniform(0, 1, size=(64, 64)).astype(np.float32)
    arr[0, 0] = -1  # nodata
    p = tmp_path / "prediction_20230601_T37MDT_0_0.tif"
    write_geotiff(str(p), arr[None],
                  transform=Affine.from_origin(36.8, -1.2, 0.001, 0.001),
                  crs=4326, nodata=-1)
    return p


def test_overlay_threshold(pred_tif):
    rgba, bounds = read_geotiff_to_overlay(str(pred_tif), threshold=(0.8, 1.0))
    assert rgba.shape == (64, 64, 4)
    # values <= 0.8 transparent, > 0.8 opaque red-ish
    assert (rgba[..., 3] > 0).any() and (rgba[..., 3] == 0).any()
    assert bounds[0] < bounds[2] and bounds[1] < bounds[3]
    assert abs(bounds[3] - 36.864) < 0.01  # lon max = 36.8 + 64*0.001


def test_map_html(pred_tif, tmp_path):
    out = create_map_with_geotiff_tiles([str(pred_tif)],
                                        str(tmp_path / "map.html"))
    html = open(out).read()
    assert "leaflet" in html
    assert "data:image/png;base64," in html
    assert "imageOverlay" in html


def test_find_tiles_with_country_filter(pred_tif, tmp_path):
    paths = find_prediction_tiles(str(pred_tif.parent), country_code="KE")
    assert len(paths) == 1  # T37MDT is in the KE tile list
    paths = find_prediction_tiles(str(pred_tif.parent), country_code="ML")
    assert len(paths) == 0


def test_country_lookup():
    assert "37MDT" in load_country_tiles("ke")
    assert load_country_tiles("ZZ") == []


def test_country_table_is_complete():
    """All 76 reference-supported countries resolve to non-empty tile lists."""
    import json
    import os

    import instageo_tpu.apps.app as app_mod

    path = os.path.join(os.path.dirname(app_mod.__file__), "utils",
                        "country_code_to_mgrs_tiles.json")
    table = json.load(open(path))
    assert len(table) >= 76
    assert all(len(v) > 0 for v in table.values())
    for cc in ("AE", "KE", "ML", "NG", "US" if "US" in table else "AE"):
        if cc in table:
            assert load_country_tiles(cc.lower()) == table[cc]
