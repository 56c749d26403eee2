"""Round-3 data-layer review fixes: mixed-resolution STAC stacking,
per-granule HLS band names, projected chip grids, sensor-agnostic MGRS
parsing, TIFF predictor support/guards, splitter flags, atomic resume
state, and NaN fill."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff


# -- STAC mixed-resolution stacking ------------------------------------------


def _fake_assets(monkeypatch, planes):
    """Patch _load_asset to serve arrays by href key."""
    from instageo_tpu.data import stac as stac_mod

    def fake_load(href, headers=None):
        arr, res = planes[href]
        t = Affine.from_origin(300000, 4100040, res, res)
        return arr, t, 32633

    monkeypatch.setattr(stac_mod, "_load_asset", fake_load)


def test_open_stac_items_upsamples_mixed_resolutions(monkeypatch):
    """S2-style 10m/20m assets align on the FINEST grid (nearest
    upsampling), not a top-left crop of the 10m bands."""
    from instageo_tpu.data.stac import StacItem, open_stac_items

    b10 = np.arange(16, dtype=np.uint16).reshape(4, 4)      # 10 m, 4x4
    b20 = np.array([[1, 2], [3, 4]], np.uint16)             # 20 m, 2x2
    scl = np.array([[4, 5], [6, 7]], np.uint16)             # 20 m mask
    _fake_assets(monkeypatch, {
        "B02": (b10, 10), "B11": (b20, 20), "SCL": (scl, 20)})
    item = StacItem(id="S2B_X", collection="sentinel-2-l2a",
                    datetime=pd.Timestamp("2024-01-01T00:00:00Z"),
                    bbox=(0, 0, 1, 1), assets={"B02": "B02", "B11": "B11",
                                               "SCL": "SCL"})
    bands, masks, transform, crs = open_stac_items(
        {"granules": [item]}, bands_asset=["B02", "B11"], mask_band="SCL",
        load_masks=True)
    assert bands.shape == (2, 4, 4)
    np.testing.assert_array_equal(bands[0], b10)
    # 20 m plane upsampled by repetition to the 10 m grid.
    np.testing.assert_array_equal(bands[1],
                                  np.repeat(np.repeat(b20, 2, 0), 2, 1))
    np.testing.assert_array_equal(masks[0],
                                  np.repeat(np.repeat(scl, 2, 0), 2, 1))
    # Transform is the finest plane's (10 m).
    assert transform.a == 10


def test_open_hls_stac_items_per_granule_band_names(monkeypatch, tmp_path):
    """Mixed L30/S30 series read each granule's OWN band names (S30 B8A
    vs L30 B05 are the same NIR band under different asset keys)."""
    from instageo_tpu.data import stac as stac_mod
    from instageo_tpu.data.sources import hls as hls_mod
    from instageo_tpu.data.sources.hls import open_hls_stac_items

    a = hls_mod.BANDS_SETTINGS
    l30_assets = list(a.HLS_L30_ASSETS)
    s30_assets = list(a.HLS_ASSETS)
    seen = []

    def fake_load(href, headers=None):
        seen.append(href)
        return (np.full((4, 4), 7, np.int32),
                Affine.from_origin(0, 4, 30, 30), 32633)

    monkeypatch.setattr(stac_mod, "_load_asset", fake_load)
    from instageo_tpu.data.stac import StacItem

    def item(gid, assets):
        return StacItem(id=gid, collection="HLS",
                        datetime=pd.Timestamp("2024-01-01T00:00:00Z"),
                        bbox=(0, 0, 1, 1),
                        assets={k: f"{gid}:{k}" for k in
                                assets + [a.HLS_MASK_ASSET]})

    g_l30 = item("HLS.L30.T38PMB.2024001T072029.v2.0", l30_assets)
    g_s30 = item("HLS.S30.T38PMB.2024004T071631.v2.0", s30_assets)
    bands, masks, _, _ = open_hls_stac_items(
        {"granules": [g_l30, g_s30]}, load_masks=True)
    assert bands.shape[0] == len(l30_assets) + len(s30_assets)
    # Each granule was read under its own collection's asset names.
    l30_reads = [h for h in seen if h.startswith("HLS.L30")]
    s30_reads = [h for h in seen if h.startswith("HLS.S30")]
    assert {h.split(":")[1] for h in l30_reads} >= set(l30_assets)
    assert {h.split(":")[1] for h in s30_reads} >= set(s30_assets)


# -- projected chip grids ------------------------------------------------------


def test_create_grid_polygons_projected_crs_keeps_all_chips():
    from instageo_tpu.data.geo_utils import create_grid_polygons

    # One exact chip in EPSG:32633 (eastings ~500km trip a 180-degree
    # bound if it is wrongly applied to projected coords).
    chip, res = 32, 30.0
    bbox = [500000.0, 4100000.0, 500000.0 + chip * res, 4100000.0 + chip * res]
    df = create_grid_polygons([bbox], "2024-06-01", chip, res, crs=32633)
    # One chip (possibly duplicated across overlapping MGRS tiles).
    assert df["label_filename"].nunique() == 1


# -- sensor-agnostic MGRS parse in the cleaner ---------------------------------


def test_cleaner_limit_parses_s2_names(tmp_path):
    from instageo_tpu.data.data_cleaner import (
        limit_seg_map_to_observation_pixels,
    )

    tr = Affine.from_origin(300000, 4100040, 30, 30)
    seg = np.full((1, 8, 8), 3, np.int16)
    name = "seg_map_20240601_S2B_MSIL2A_20240601T072621_T33TUN_R049_0_0.tif"
    p = str(tmp_path / name)
    write_geotiff(p, seg, transform=tr, crs=32633)

    obs = pd.DataFrame({
        "mgrs_tile_id": ["33TUN"],
        "date": ["2024-06-01"],
        # lon/lat of a pixel inside the raster
        "x": [15.0], "y": [37.0],
    })
    # The point may fall outside this tiny synthetic raster; the key
    # assertion is that the S2-style name MATCHES the observation row
    # (the old parse produced 'SIL2A' and returned None for every row).
    out = limit_seg_map_to_observation_pixels(p, obs, -1, str(tmp_path / "o"))
    assert out is not None


# -- TIFF predictor -------------------------------------------------------------


def test_write_geotiff_predictor_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    smooth = np.cumsum(rng.integers(0, 3, size=(2, 64, 64)), axis=2
                       ).astype(np.uint16)
    p_off = str(tmp_path / "off.tif")
    p_on = str(tmp_path / "on.tif")
    write_geotiff(p_off, smooth, compress="deflate")
    write_geotiff(p_on, smooth, compress="deflate", predictor=True)
    with GeoTiffReader(p_on) as r:
        np.testing.assert_array_equal(r.read(), smooth)
    # Differencing should help smooth data.
    assert os.path.getsize(p_on) < os.path.getsize(p_off)
    # The native decoder honors the predictor tag too.
    from instageo_tpu import native

    if native.available():
        out = native.read_batch_native([p_on], smooth.shape, smooth.dtype)
        np.testing.assert_array_equal(out[0], smooth)


def test_unsupported_predictor_raises(tmp_path):
    p = str(tmp_path / "p2.tif")
    arr = np.arange(64, dtype=np.uint16).reshape(1, 8, 8)
    write_geotiff(p, arr, compress="deflate", predictor=True)
    data = bytearray(open(p, "rb").read())
    import struct

    tag2 = struct.pack("<HHI", 317, 3, 1) + struct.pack("<H", 2) + b"\0\0"
    tag3 = struct.pack("<HHI", 317, 3, 1) + struct.pack("<H", 3) + b"\0\0"
    idx = bytes(data).find(tag2)
    assert idx > 0
    data[idx:idx + len(tag3)] = tag3
    p3 = str(tmp_path / "p3.tif")
    open(p3, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="predictor"):
        with GeoTiffReader(p3) as r:
            r.read()
    from instageo_tpu import native

    if native.available():
        # Native contract: failed items are zero-filled (QA drops them) —
        # the guard must reject the file instead of decoding garbage.
        out = native.read_batch_native([p3], arr.shape, arr.dtype)
        assert (out[0] == 0).all()


# -- splitter flags --------------------------------------------------------------


def test_kmeans_split_honors_include_flags(tmp_path):
    from instageo_tpu.data.data_splitter import split_dataset

    rng = np.random.default_rng(0)
    tiles = ["T33TUN", "T33TUM", "T32TQM", "T36TUN", "T38PMB", "T31TCJ"]
    rows = [{"Input": f"chip_20240601_L30_{t}_{i}_{i}.tif", "Label": "x"}
            for t in tiles for i in range(4)]
    df = pd.DataFrame(rows)
    out = tmp_path / "splits"
    split_dataset(df, output_dir=str(out), save_viz=False,
                  include_test=False, include_val=True,
                  use_kmeans=True, n_clusters=3, random_state=7)
    train = pd.read_csv(out / "train.csv")
    # No test split requested: every record is in train or val.
    val_path = out / "val.csv"
    n_val = len(pd.read_csv(val_path)) if val_path.exists() else 0
    test_path = out / "test.csv"
    n_test = len(pd.read_csv(test_path)) if test_path.exists() else 0
    assert n_test == 0
    assert len(train) + n_val == len(df)


# -- atomic resume state ----------------------------------------------------------


def test_pipeline_resume_state_survives_corruption(tmp_path):
    from instageo_tpu.data.pipeline import BaseDataPipeline

    class P(BaseDataPipeline):  # minimal concrete
        @property
        def data_source(self):
            return "TEST"

        def load_tile(self, key, dataset):
            return None

    p = P.__new__(P)
    state = str(tmp_path / "processed_tiles.json")
    p._mark_processed("k1", state)
    assert p._is_processed("k1", state)
    assert not os.path.exists(state + ".tmp")
    # Corrupt file: treated as empty (reprocess), not a crash.
    with open(state, "w") as f:
        f.write('["k1", trunc')
    assert not p._is_processed("k1", state)
    p._mark_processed("k2", state)
    assert json.load(open(state)) == ["k2"]


# -- NaN fill in the loader --------------------------------------------------------


def test_process_data_fills_float_nans(tmp_path):
    from instageo_tpu.data.dataloader import process_data

    arr = np.full((2, 8, 8), 0.5, np.float32)
    arr[0, 0, 0] = np.nan
    p = str(tmp_path / "s1_chip.tif")
    write_geotiff(p, arr)
    x, _ = process_data(p, no_data_value=-9999)
    assert x[0, 0, 0] == -9999
    assert np.isfinite(x).all()
