"""S2 (SCL-masked) and S1 (no-mask, float32) pipeline E2E tests."""

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.crs import latlon_to_utm, utm_to_latlon
from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.data.stac import StacClient, StacItem

TILE = 64
CHIP = 32
RES = 30.0


def _tile_world(tmp_path, bands, mask_band=None, dtype=np.uint16,
                mask_values=None, collection="sentinel-2-l2a",
                item_id="S2B_MSIL2A_20240530T100000_N0510_R022_T33TUN_x"):
    lat0, lon0 = 43.0, 15.0
    e0, n0, zone, south = latlon_to_utm(lat0, lon0)
    ox = float(e0) - (TILE / 2) * RES
    oy = float(n0) + (TILE / 2) * RES
    tr = Affine.from_origin(ox, oy, RES, RES)
    rng = np.random.default_rng(0)
    assets = {}
    for b in bands:
        if dtype == np.float32:
            arr = rng.uniform(0.0, 0.5, size=(TILE, TILE)).astype(np.float32)
        else:
            arr = rng.integers(100, 5000, size=(TILE, TILE)).astype(dtype)
        p = str(tmp_path / f"{item_id}_{b}.tif")
        write_geotiff(p, arr[None], transform=tr, crs=32633, nodata=0)
        assets[b] = p
    if mask_band:
        scl = np.full((TILE, TILE), 4, np.uint16)  # vegetation class
        if mask_values:
            scl[:2, :2] = mask_values[0]  # cloud class in first chip
        pm = str(tmp_path / f"{item_id}_{mask_band}.tif")
        write_geotiff(pm, scl[None], transform=tr, crs=32633)
        assets[mask_band] = pm

    lat_a, lon_a = utm_to_latlon(ox, oy - TILE * RES, zone, south)
    lat_b, lon_b = utm_to_latlon(ox + TILE * RES, oy, zone, south)
    item = StacItem(
        id=item_id, collection=collection,
        bbox=(float(lon_a), float(lat_a), float(lon_b), float(lat_b)),
        datetime=pd.Timestamp("2024-05-30T10:00:00", tz="UTC"),
        properties={"eo:cloud_cover": 2}, assets=assets)
    obs = []
    for px, py, label in ((5, 5, 1), (CHIP + 5, CHIP + 7, 0)):
        lat, lon = utm_to_latlon(ox + px * RES, oy - py * RES, zone, south)
        obs.append({"x": float(lon), "y": float(lat), "label": label,
                    "input_features_date": pd.Timestamp("2024-05-30"),
                    "date": pd.Timestamp("2024-05-30")})
    df = pd.DataFrame(obs)
    from instageo_tpu.data.pipeline import get_tiles

    df = get_tiles(df, min_count=1)
    return item, df


def test_s2_points_pipeline_scl_masking(tmp_path, monkeypatch):
    from instageo_tpu.data.sources import s2
    from instageo_tpu.data.stac import create_records_with_items

    item, df = _tile_world(tmp_path, ["B02", "B03", "B04", "B8A", "B11", "B12"],
                           mask_band="SCL", mask_values=[9])
    monkeypatch.setattr(StacClient, "search", lambda self, **kw: [item])

    best = s2.add_s2_stac_items(s2.get_client(), df, num_steps=1,
                                temporal_tolerance=5)
    records, dataset = create_records_with_items(best, "s2_granules", "s2_items")
    assert len(dataset) == 1

    out_dir = tmp_path / "out"
    pipe = s2.S2PointsPipeline(
        output_directory=str(out_dir), chip_size=CHIP, src_crs=4326,
        mask_types=["cloud"], masking_strategy="any", window_size=0,
        task_type="seg")
    manifest = pipe.run(dataset, {k: g for k, g in
                                  records.groupby("stac_items_str")})
    assert len(manifest) == 2
    chips = sorted((out_dir / "chips").glob("*.tif"))
    first = [c for c in chips if c.name.endswith("_0_0.tif")][0]
    with GeoTiffReader(str(first)) as r:
        arr = r.read()
        assert r.count == 6
        assert arr.dtype == np.uint16
    # SCL cloud class 9 masked to nodata in the first chip corner
    assert (arr[:, :2, :2] == 0).all()


def test_s1_points_pipeline_float32(tmp_path, monkeypatch):
    from instageo_tpu.data.sources import s1
    from instageo_tpu.data.stac import create_records_with_items

    item, df = _tile_world(
        tmp_path, ["vv", "vh"], dtype=np.float32,
        collection="sentinel-1-rtc",
        item_id="S1A_IW_GRDH_1SDV_20240530T100000_20240530T100025_054000_069000_ABCD")
    monkeypatch.setattr(StacClient, "search", lambda self, **kw: [item])

    best = s1.add_s1_stac_items(s1.get_client(), df, num_steps=1,
                                temporal_tolerance=5)
    records, dataset = create_records_with_items(best, "s1_granules", "s1_items")
    assert len(dataset) == 1

    out_dir = tmp_path / "out"
    pipe = s1.S1PointsPipeline(
        output_directory=str(out_dir), chip_size=CHIP, src_crs=4326,
        mask_types=[], masking_strategy="any", window_size=0, task_type="seg")
    manifest = pipe.run(dataset, {k: g for k, g in
                                  records.groupby("stac_items_str")})
    assert len(manifest) == 2
    chip = sorted((out_dir / "chips").glob("*.tif"))[0]
    with GeoTiffReader(str(chip)) as r:
        assert r.count == 2  # vv, vh
        assert r.dtypes[0] == "float32"
        assert r.nodata == -1.0


def test_failed_tile_is_retried_on_resume(tmp_path, monkeypatch):
    """A tile whose load fails must NOT be marked processed: the resume
    contract requires the next run to retry it (ADVICE round-1, medium)."""
    import json

    from instageo_tpu.data.sources import s2
    from instageo_tpu.data.stac import create_records_with_items

    item, df = _tile_world(tmp_path, ["B02", "B03", "B04", "B8A", "B11", "B12"],
                           mask_band="SCL")
    monkeypatch.setattr(StacClient, "search", lambda self, **kw: [item])
    best = s2.add_s2_stac_items(s2.get_client(), df, num_steps=1,
                                temporal_tolerance=5)
    records, dataset = create_records_with_items(best, "s2_granules", "s2_items")

    out_dir = tmp_path / "out"
    pipe = s2.S2PointsPipeline(
        output_directory=str(out_dir), chip_size=CHIP, src_crs=4326,
        mask_types=["cloud"], masking_strategy="any", window_size=0,
        task_type="seg")
    grouped = {k: g for k, g in records.groupby("stac_items_str")}

    # First run: transient failure (load_tile returns None, as it does for
    # caught download/decode errors).
    monkeypatch.setattr(type(pipe), "load_tile", lambda self, key, ds: None)
    manifest = pipe.run(dataset, grouped)
    assert len(manifest) == 0
    state_file = out_dir / "processed_tiles.json"
    state = json.loads(state_file.read_text()) if state_file.exists() else []
    assert state == []  # key left unmarked for retry

    # Second run (resume): load succeeds, chips are produced.
    monkeypatch.undo()
    monkeypatch.setattr(StacClient, "search", lambda self, **kw: [item])
    manifest = pipe.run(dataset, grouped)
    assert len(manifest) == 2
    state = json.loads((out_dir / "processed_tiles.json").read_text())
    assert len(state) == 1
