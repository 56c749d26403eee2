"""Unit tests for STAC selection logic + geo utilities.

Mirrors the reference's unit coverage (tests/data_tests/test_stac_utils.py
and test_geo_utils.py): daytime filtering, asset renaming, dataset-entry
validation, candidate dispatch, closest-item selection, bbox helpers, chip
grids, raster window slicing. These were previously exercised only through
the pipeline e2e tests.
"""

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.geo_utils import (
    bbox_contains,
    bbox_intersects,
    create_grid_polygons,
    get_complete_chips_coords,
    get_polygon_tile_ids,
    make_valid_bbox,
    point_within,
    slice_raster_window,
)
from instageo_tpu.data.geotiff import Affine
from instageo_tpu.data.stac import (
    StacItem,
    dispatch_candidate_items,
    find_closest_items,
    is_daytime,
    is_valid_dataset_entry,
    rename_stac_items,
)


def _item(dt, cloud=10, bbox=(14.9, 42.9, 15.1, 43.1), item_id="i",
          collection="HLSS30_2.0", assets=None):
    return StacItem(id=item_id, collection=collection, bbox=bbox,
                    datetime=pd.Timestamp(dt, tz="UTC"),
                    properties={"eo:cloud_cover": cloud},
                    assets=dict(assets or {}))


# ---------------------------------------------------------------------------
# is_daytime (reference test_stac_utils.py:44-113)
# ---------------------------------------------------------------------------


def test_is_daytime_equator():
    # Local noon UTC at lon 0 / lat 0 is daytime; local midnight is not.
    noon = _item("2022-06-21T12:00:00", bbox=(-0.1, -0.1, 0.1, 0.1))
    midnight = _item("2022-06-21T00:00:00", bbox=(-0.1, -0.1, 0.1, 0.1))
    assert is_daytime(noon)
    assert not is_daytime(midnight)


def test_is_daytime_longitude_offset():
    # Local noon at lon 180 is UTC midnight.
    item = _item("2022-06-21T00:00:00", bbox=(179.8, -0.1, 180.0, 0.1))
    assert is_daytime(item)


def test_is_daytime_polar():
    # Polar night: no sunrise -> never daytime.
    item = _item("2022-12-21T12:00:00", bbox=(14.9, 79.9, 15.1, 80.1))
    assert not is_daytime(item)
    # Missing datetime -> False.
    nodate = StacItem(id="x", collection="c", bbox=(0, 0, 1, 1),
                      datetime=pd.NaT, properties={}, assets={})
    assert not is_daytime(nodate)


# ---------------------------------------------------------------------------
# rename / validity (reference :232-248, :352-427)
# ---------------------------------------------------------------------------


def test_rename_stac_items_per_collection():
    a = _item("2022-01-01T10:00:00", collection="HLSS30_2.0",
              assets={"B8A": "p1", "B02": "p2"})
    b = _item("2022-01-01T10:00:00", collection="HLSL30_2.0",
              assets={"B05": "p3"})
    nameplate = {"HLSS30_2.0": {"B8A": "NIR"}, "HLSL30_2.0": {"B05": "NIR"}}
    rename_stac_items([a, b], nameplate)
    assert "NIR" in a.assets and a.assets["NIR"] == "p1"
    assert "B8A" not in a.assets and "B02" in a.assets
    assert b.assets == {"NIR": "p3"}


def test_is_valid_dataset_entry():
    assert is_valid_dataset_entry(["g1", "g2", "g3"])
    assert not is_valid_dataset_entry(["g1", None, "g3"])  # missing timestep
    assert not is_valid_dataset_entry(["g1", "g1", "g2"])  # duplicate


# ---------------------------------------------------------------------------
# dispatch + closest-item selection (reference :324-350, :429+)
# ---------------------------------------------------------------------------


def test_dispatch_candidate_items_point_in_footprint():
    obs = pd.DataFrame({"x": [15.0, 20.0], "y": [43.0, 50.0]})
    inside = _item("2022-01-01T10:00:00", item_id="inside")
    out = dispatch_candidate_items(obs, [inside], "cands")
    assert out is not None
    assert [it.id for it in out.iloc[0]["cands"]] == ["inside"]
    assert out.iloc[1]["cands"] == []  # second point outside the footprint


def test_dispatch_candidate_items_none_when_no_match():
    obs = pd.DataFrame({"x": [100.0], "y": [0.0]})
    assert dispatch_candidate_items(
        obs, [_item("2022-01-01T10:00:00")], "cands") is None


def test_find_closest_items_min_cloud_within_tolerance():
    cands = [
        _item("2022-05-20T10:00:00", cloud=50, item_id="cloudy_near"),
        _item("2022-05-21T10:00:00", cloud=5, item_id="clear_near"),
        _item("2022-05-01T10:00:00", cloud=0, item_id="clear_far"),
    ]
    obsv = pd.Series({
        "tile_queries": ("T33TUN", ["2022-05-22", "2022-04-30"]),
        "cands": cands,
    })
    got = find_closest_items(obsv, "cands", temporal_tolerance=3)
    # timestep 1: clear_near wins (min cloud within ±3 days of 05-22);
    # timestep 2: only clear_far is within ±3 days of 04-30.
    assert got[0].id == "clear_near"
    assert got[1].id == "clear_far"


def test_find_closest_items_none_outside_tolerance():
    obsv = pd.Series({
        "tile_queries": ("T33TUN", ["2022-01-01"]),
        "cands": [_item("2022-03-01T10:00:00")],
    })
    assert find_closest_items(obsv, "cands", temporal_tolerance=5) == [None]


def test_find_closest_items_no_candidates():
    obsv = pd.Series({"tile_queries": ("T", ["2022-01-01", "2022-02-01"])})
    assert find_closest_items(obsv, "cands", 5) == [None, None]


# ---------------------------------------------------------------------------
# geo utils (reference test_geo_utils.py)
# ---------------------------------------------------------------------------


def test_make_valid_bbox_orders_and_buffers():
    assert make_valid_bbox(2.0, 1.0, 1.0, 3.0) == (1.0, 1.0, 2.0, 3.0)
    # degenerate (zero-width) box gets the epsilon buffer
    b = make_valid_bbox(1.0, 1.0, 1.0, 3.0)
    assert b[0] == pytest.approx(0.999) and b[2] == pytest.approx(1.001)
    b = make_valid_bbox(5.0, 2.0, 5.0, 2.0)
    assert b == pytest.approx((4.999, 1.999, 5.001, 2.001))


def test_get_polygon_tile_ids_corner_sampling():
    tiles = get_polygon_tile_ids((14.9, 42.9, 15.1, 43.1))
    assert tiles and all(t[:2].isdigit() or t[0].isdigit() for t in tiles)
    # A bbox inside one tile yields one id; one spanning a zone edge yields >1.
    assert len(get_polygon_tile_ids((15.0, 43.0, 15.01, 43.01))) == 1
    assert len(get_polygon_tile_ids((11.5, 43.0, 12.5, 43.01))) > 1


def test_bbox_predicates():
    a, b = (0, 0, 2, 2), (1, 1, 3, 3)
    assert bbox_intersects(a, b)
    assert not bbox_intersects(a, (5, 5, 6, 6))
    assert bbox_contains(a, (0.5, 0.5, 1.5, 1.5))
    assert not bbox_contains(a, b)
    assert point_within(a, 1, 1) and not point_within(a, 3, 1)


def test_get_complete_chips_coords_whole_chips_only():
    coords = get_complete_chips_coords(0.0, 1.0, 0.01, 32, max_bound=180)
    assert len(coords) % 32 == 0
    assert len(coords) >= 100  # ceil(100 / 32) * 32 = 128
    # clipped at the max bound
    coords = get_complete_chips_coords(179.5, 180.0, 0.01, 32, max_bound=180)
    assert coords.size == 0 or coords[-1] + 0.01 * 32 <= 180 + 0.01 * 32


def test_create_grid_polygons_rows_and_mgrs():
    df = create_grid_polygons(
        [[15.0, 43.0, 15.2, 43.2]], date="2022-05-25", chip_size=32,
        spatial_resolution=0.00269494585235856, crs=4326)
    assert not df.empty
    assert {"label_filename", "date", "bbox", "bbox_4326",
            "mgrs_tile_id"} <= set(df.columns)
    # every chip bbox lies inside the request bbox (within one chip)
    for b in df["bbox"]:
        assert b[0] >= 15.0 - 1e-9 and b[3] <= 43.3
    assert (df["date"] == "2022-05-25").all()
    assert df["mgrs_tile_id"].str.len().between(3, 5).all()


def test_slice_raster_window_exact_chip():
    data = np.arange(6 * 64 * 64, dtype=np.uint16).reshape(6, 64, 64)
    tr = Affine.from_origin(500000, 4200000, 30, 30)
    # bbox covering rows/cols 8..40 -> sliced to exactly 32 with chip_size
    x0, y0 = tr * (8, 40)
    x1, y1 = tr * (40, 8)
    out = slice_raster_window(data, tr, (x0, y0, x1, y1), chip_size=32)
    assert out is not None
    window, wtr = out
    assert window.shape == (6, 32, 32)
    assert (window == data[:, 8:40, 8:40]).all()
    # window transform is anchored at the window's top-left corner
    wx, wy = wtr * (0, 0)
    assert (wx, wy) == tr * (8, 8)


def test_slice_raster_window_reprojects_bbox():
    from instageo_tpu.data.crs import Transformer

    data = np.ones((1, 64, 64), np.uint16)
    tr = Affine.from_origin(500000, 4763000, 30, 30)
    t = Transformer.from_crs(32633, 4326, always_xy=True)
    lon0, lat0 = t.transform(500000 + 8 * 30, 4763000 - 40 * 30)
    lon1, lat1 = t.transform(500000 + 40 * 30, 4763000 - 8 * 30)
    out = slice_raster_window(
        data, tr, (float(lon0), float(lat0), float(lon1), float(lat1)),
        bbox_crs=4326, raster_crs=32633, chip_size=32)
    assert out is not None and out[0].shape == (1, 32, 32)


def test_slice_raster_window_empty_returns_none():
    data = np.ones((1, 16, 16), np.uint16)
    tr = Affine.from_origin(0, 480, 30, 30)
    assert slice_raster_window(data, tr, (10000, 10000, 10010, 10010)) is None
