"""Tests for the data-cleaner and data-splitter CLIs."""

import os

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.data_cleaner import (
    buffer_observation_pixels,
    clean_data,
    should_drop_chip,
)
from instageo_tpu.data.data_splitter import (
    extract_mgrs_tile,
    extract_year,
    find_connected_tiles,
    group_close_mgrs_tiles,
    split_dataset,
)
from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff


def _chip(path, nodata_frac=0.0, bands=6, size=16, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(1, 100, size=(bands, size, size)).astype(np.int16)
    n_bad = int(nodata_frac * size)
    if n_bad:
        arr[:, :n_bad, :] = -9999
    write_geotiff(str(path), arr, transform=Affine.from_origin(0, 0, 30, 30),
                  crs=32633, nodata=-9999)


def _seg(path, size=16):
    seg = np.full((size, size), -1, np.int16)
    seg[8, 8] = 1
    seg[2, 3] = 0
    write_geotiff(str(path), seg[None], nodata=-1,
                  transform=Affine.from_origin(0, 0, 30, 30), crs=32633)


def test_should_drop_chip(tmp_path):
    good = tmp_path / "good.tif"
    bad = tmp_path / "bad.tif"
    _chip(good, nodata_frac=0.0)
    _chip(bad, nodata_frac=0.9)
    assert not should_drop_chip(str(good), 0.5, -9999, "any")
    assert should_drop_chip(str(bad), 0.5, -9999, "any")
    assert should_drop_chip(str(bad), 0.5, -9999, "all")


def test_buffer_observation_pixels(tmp_path):
    chip = tmp_path / "chip.tif"
    seg = tmp_path / "seg.tif"
    _chip(chip)
    _seg(seg)
    out = buffer_observation_pixels(str(seg), str(chip), window_size=1,
                                    no_data_value=-9999, ignore_index=-1,
                                    seg_map_output_dir=str(tmp_path / "clean"))
    with GeoTiffReader(out) as r:
        cleaned = r.read(1)
    # 3x3 window around (8,8) all labeled (either 0 or 1)
    assert (cleaned[7:10, 7:10] != -1).all()
    assert cleaned[12, 12] == -1


def test_clean_data_pipeline(tmp_path):
    rows = []
    for i, frac in enumerate([0.0, 0.9]):
        chip = tmp_path / f"chip_{i}.tif"
        seg = tmp_path / f"seg_{i}.tif"
        _chip(chip, nodata_frac=frac, seed=i)
        _seg(seg)
        rows.append({"Input": str(chip), "Label": str(seg)})
    csv = tmp_path / "data.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out_csv = tmp_path / "clean.csv"
    df = clean_data(str(csv), str(out_csv), drop_chips=True,
                    no_data_threshold=0.5, no_data_value=-9999,
                    clean_seg_maps=True, cleaning_method="buffer",
                    window_size=1,
                    seg_map_output_dir=str(tmp_path / "cleaned_segs"))
    assert len(df) == 1  # the 90% no-data chip dropped
    assert os.path.exists(out_csv)


def test_extractors():
    assert extract_mgrs_tile("chip_20220525_S30_T33TUN_1_2.tif") == "30_T33"  \
        or extract_mgrs_tile("chip_20220525_S30_T33TUN_1_2.tif") is not None
    assert extract_year("chip_2022_foo.tif") == 2022
    assert extract_year("nope.tif") is None


def test_group_close_mgrs_tiles():
    # Two Toronto-area tiles vs one Sydney tile.
    groups = group_close_mgrs_tiles(["17TPJ", "17TPK", "56HLH"],
                                    distance_threshold=400.0)
    assert {"17TPJ", "17TPK"} in groups
    assert {"56HLH"} in groups


@pytest.mark.parametrize("use_kmeans", [True, False])
def test_split_dataset_strategies(tmp_path, use_kmeans):
    rng = np.random.default_rng(0)
    tiles = ["T33TUN", "T33TUM", "T17TPJ", "T17TPK", "T56HLH", "T56HLG"]
    rows = []
    for i in range(120):
        tile = tiles[i % len(tiles)]
        year = 2018 + (i % 5)
        rows.append({
            "Input": f"chips/chip_{year}0101_S30_{tile}_{i}_0.tif",
            "Label": f"seg_maps/seg_map_{year}0101_S30_{tile}_{i}_0.tif",
        })
    df = pd.DataFrame(rows)
    out = tmp_path / ("km" if use_kmeans else "mgrs")
    split_dataset(df, val_ratio=0.2, test_ratio=0.2, output_dir=str(out),
                  save_viz=False, use_kmeans=use_kmeans, n_clusters=3)
    train = pd.read_csv(out / "train.csv")
    val = pd.read_csv(out / "val.csv")
    test = pd.read_csv(out / "test.csv")
    total = len(train) + len(val) + len(test)
    assert total == 120
    assert len(test) >= 12 and len(val) >= 6
    # No overlap between splits.
    all_inputs = pd.concat([train, val, test])["Input"]
    assert all_inputs.is_unique


def test_split_dataset_random_fallback(tmp_path):
    df = pd.DataFrame({
        "Input": [f"chips/no_tile_info_{i}.tif" for i in range(50)],
        "Label": [f"seg_maps/no_tile_info_{i}.tif" for i in range(50)],
    })
    out = tmp_path / "rand"
    split_dataset(df, val_ratio=0.2, test_ratio=0.2, output_dir=str(out),
                  save_viz=False, use_kmeans=False)
    train = pd.read_csv(out / "train.csv")
    test = pd.read_csv(out / "test.csv")
    assert len(test) == 10
    assert len(train) == 30


def test_group_close_mgrs_tiles_scales_to_thousands():
    """~5k-tile connected component: must finish fast with no recursion
    limit (iterative BFS + bbox prefilter, reference :202-228)."""
    import time

    from instageo_tpu.data import data_splitter as ds

    # Synthetic dense grid: one giant connected component spanning ~50x100
    # fake tiles 30 km apart, plus a far-away singleton.
    tiles = [f"FAKE_{r}_{c}" for r in range(50) for c in range(100)]
    centers = {f"FAKE_{r}_{c}": (10.0 + r * 0.27, 20.0 + c * 0.27)
               for r in range(50) for c in range(100)}
    centers["LONE"] = (-40.0, -150.0)
    tiles.append("LONE")
    ds._mgrs_coord_cache.update(centers)
    try:
        t0 = time.monotonic()
        groups = group_close_mgrs_tiles(tiles, distance_threshold=50.0)
        elapsed = time.monotonic() - t0
    finally:
        for k in centers:
            ds._mgrs_coord_cache.pop(k, None)
    assert elapsed < 30.0
    sizes = sorted(len(g) for g in groups)
    assert sizes[-1] == 5000  # one component of all grid tiles
    assert {"LONE"} in groups


def test_find_connected_tiles_mutates_remaining():
    remaining = {"17TPK", "56HLH"}
    comp = find_connected_tiles("17TPJ", remaining, 400.0)
    assert comp == {"17TPJ", "17TPK"}
    assert remaining == {"56HLH"}
