"""Golden chip-output parity: pipeline output vs an independent oracle.

VERDICT round-1 quality-parity item (a): the framework's chip outputs are
diffed BIT-FOR-BIT against a from-scratch numpy oracle that re-implements
the reference chip math directly from the reference sources — slice
(hls_utils.py:500-533), Fmask bit decode + any/each masking
(data_pipeline.py:229-267), pixel-center bounds filter + windowed label
stamping with the reference's exact clip bounds (data_pipeline.py:385-421),
seg-map invalidation (data_pipeline.py:66-98), and chip-grid addressing
(data_pipeline.py:424-443). The oracle shares NO code with
instageo_tpu.ops/chip math; only the GeoTIFF codec is common (its
rasterio interop is covered separately in test_golden_interop.py).
"""

import os

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.crs import Transformer, latlon_to_utm, utm_to_latlon
from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.data.stac import StacClient, StacItem

TILE_SIZE = 96
CHIP = 32
RES = 30.0
BANDS = ["B02", "B03", "B04", "B8A", "B11", "B12"]
NO_DATA = 0
SEG_NO_DATA = -1


@pytest.fixture
def world(tmp_path, monkeypatch):
    lat0, lon0 = 43.0, 15.0
    e0, n0, zone, south = latlon_to_utm(lat0, lon0)
    origin_x = float(e0) - (TILE_SIZE / 2) * RES
    origin_y = float(n0) + (TILE_SIZE / 2) * RES
    transform = Affine.from_origin(origin_x, origin_y, RES, RES)
    epsg = 32633

    rng = np.random.default_rng(7)
    band_arrays = {}
    assets = {}
    for i, b in enumerate(BANDS):
        arr = rng.integers(50 + i, 6000, size=(TILE_SIZE, TILE_SIZE)
                           ).astype(np.uint16)
        # scatter a few raw nodata pixels too
        arr[rng.random((TILE_SIZE, TILE_SIZE)) < 0.002] = NO_DATA
        band_arrays[b] = arr
        p = str(tmp_path / f"granule_{b}.tif")
        write_geotiff(p, arr[None], transform=transform, crs=epsg,
                      nodata=NO_DATA)
        assets[b] = p
    fmask = np.zeros((TILE_SIZE, TILE_SIZE), np.uint16)
    fmask[3:9, 4:12] = 2          # cloud bit (pos 1)
    fmask[40:44, 40:46] = 2 + 8   # cloud + cloud_shadow bits
    pmask = str(tmp_path / "granule_Fmask.tif")
    write_geotiff(pmask, fmask[None], transform=transform, crs=epsg)
    assets["Fmask"] = pmask

    lat_a, lon_a = utm_to_latlon(origin_x, origin_y - TILE_SIZE * RES, zone, south)
    lat_b, lon_b = utm_to_latlon(origin_x + TILE_SIZE * RES, origin_y, zone, south)
    item = StacItem(
        id="HLS.S30.T33TUN.2022145T100000.v2.0",
        collection="HLSS30_2.0",
        bbox=(float(lon_a), float(lat_a), float(lon_b), float(lat_b)),
        datetime=pd.Timestamp("2022-05-25T10:00:00", tz="UTC"),
        properties={"eo:cloud_cover": 5},
        assets=assets,
    )
    monkeypatch.setattr(StacClient, "search", lambda self, **kw: [item])

    # Observations: several points across 3 chips, incl. window overlap
    # at a chip edge (exercises the reference's clip behavior).
    pts_utm = [
        (origin_x + 5 * RES, origin_y - 5 * RES, 1),           # chip (0,0), cloudy zone
        (origin_x + 20 * RES, origin_y - 22 * RES, 0),         # chip (0,0)
        (origin_x + (CHIP + 9) * RES, origin_y - (CHIP + 11) * RES, 1),  # (1,1)
        (origin_x + (CHIP - 1) * RES, origin_y - 2 * RES, 1),  # (0,0) edge: window clips
        (origin_x + (2 * CHIP + 3) * RES, origin_y - 4 * RES, 0),  # (2,0)
    ]
    rows = []
    lonlats = []
    for x, y, label in pts_utm:
        lat, lon = utm_to_latlon(x, y, zone, south)
        lonlats.append((float(lon), float(lat), label))
        rows.append({"x": float(lon), "y": float(lat), "label": label,
                     "date": "2022-05-25"})
    csv = tmp_path / "obs.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return {
        "tmp_path": tmp_path, "csv": csv, "bands": band_arrays,
        "fmask": fmask, "transform": transform, "epsg": epsg,
        "lonlats": lonlats, "origin": (origin_x, origin_y),
    }


def _oracle(world, mask_types=("cloud",), masking_strategy="any",
            window_size=1):
    """Reference chip math re-implemented from the reference sources."""
    MASK_POS = {"cloud": 1, "near_cloud_or_shadow": 2, "cloud_shadow": 3,
                "water": 5}
    ox, oy = world["origin"]
    tile = np.stack([world["bands"][b] for b in BANDS]).astype(np.float64)
    fmask = world["fmask"]

    # Observations start as lon/lat (the CSV the CLI reads) and are
    # reprojected to the tile CRS exactly like the reference's
    # reproject_coordinates (data_pipeline.py:330-349) — the oracle must
    # consume the SAME reprojected floats or pixel-edge points flip floor().
    t = Transformer.from_crs(4326, world["epsg"], always_xy=True)
    lons = np.array([p[0] for p in world["lonlats"]])
    lats = np.array([p[1] for p in world["lonlats"]])
    xs, ys = (np.asarray(v) for v in t.transform(lons, lats))
    labels = np.array([p[2] for p in world["lonlats"]])

    # get_chip_coords (data_pipeline.py:424-443): floor(inv affine),
    # unique (col//cs, row//cs) pairs
    cols = np.floor((xs - ox) / RES).astype(int)
    rows = np.floor((oy - ys) / RES).astype(int)
    coords = np.unique(np.stack((cols // CHIP, rows // CHIP), axis=-1), axis=0)

    n_chips = TILE_SIZE // CHIP
    out = {}
    for cx, cy in coords:
        if cx >= n_chips or cy >= n_chips:
            continue
        sl = (slice(cy * CHIP, (cy + 1) * CHIP),
              slice(cx * CHIP, (cx + 1) * CHIP))
        chip = tile[:, sl[0], sl[1]].copy()
        # apply_mask (data_pipeline.py:229-267)
        m = fmask[sl][None]  # (time=1, h, w)
        for mt in mask_types:
            pos = MASK_POS[mt]
            decoded = (m // (2 ** pos)) % 2
            if masking_strategy == "any":
                dm = decoded.any(axis=0)
            else:
                dm = np.repeat(decoded, chip.shape[0] // m.shape[0], axis=0)
            chip = np.where(dm == 0, chip, NO_DATA)
        if (chip != NO_DATA).sum() == 0:
            continue

        # create_segmentation_map (data_pipeline.py:385-421):
        # pixel-CENTER bounds filter, floor(inv chip affine), meshgrid
        # window with clip to chip size - 1, sequential overwrite.
        seg = np.full((CHIP, CHIP), SEG_NO_DATA, np.int16)
        chip_ox = ox + cx * CHIP * RES
        chip_oy = oy - cy * CHIP * RES
        x_centers_min = chip_ox + 0.5 * RES
        x_centers_max = chip_ox + (CHIP - 0.5) * RES
        y_centers_max = chip_oy - 0.5 * RES
        y_centers_min = chip_oy - (CHIP - 0.5) * RES
        inside = ((xs >= x_centers_min) & (xs <= x_centers_max)
                  & (ys >= y_centers_min) & (ys <= y_centers_max))
        pxs, pys, pls = xs[inside], ys[inside], labels[inside]
        pcols = np.floor((pxs - chip_ox) / RES).astype(int)
        prows = np.floor((chip_oy - pys) / RES).astype(int)
        offsets = np.arange(-window_size, window_size + 1)
        off_r, off_c = np.meshgrid(offsets, offsets)
        win_r = np.clip(prows[:, None, None] + off_r, 0, CHIP - 1)
        win_c = np.clip(pcols[:, None, None] + off_c, 0, CHIP - 1)
        win_l = np.repeat(pls, off_r.size)
        seg[win_r.ravel(), win_c.ravel()] = win_l

        # mask_segmentation_map (data_pipeline.py:66-98)
        if masking_strategy == "any":
            valid = (chip != NO_DATA).all(axis=0)
        else:
            valid = (chip != NO_DATA).any(axis=0)
        seg = np.where(valid, seg, SEG_NO_DATA).astype(np.int16)
        if (seg != SEG_NO_DATA).sum() == 0:
            continue
        out[(cx, cy)] = (chip.astype(np.uint16), seg)
    return out


def test_pipeline_matches_oracle_bit_for_bit(world):
    out_dir = world["tmp_path"] / "out"
    from instageo_tpu.data import chip_creator

    argv = [
        "chip_creator",
        f"--dataframe_path={world['csv']}",
        f"--output_directory={out_dir}",
        "--data_source=HLS",
        "--chip_size=32",
        "--min_count=1",
        "--shift_to_month_start=false",
        "--is_time_series_task=false",
        "--mask_types=cloud",
        "--masking_strategy=any",
        "--window_size=1",
        "--temporal_tolerance=5",
    ]
    chip_creator.FLAGS(argv)
    chip_creator.main(None)

    expected = _oracle(world)
    chips = sorted((out_dir / "chips").glob("chip_*.tif"))
    assert len(chips) == len(expected), (
        f"pipeline produced {[c.name for c in chips]}, oracle expects "
        f"{sorted(expected)}")

    for chip_path in chips:
        # chip_{date}_{tile}_{x}_{y}.tif
        parts = chip_path.stem.split("_")
        cx, cy = int(parts[-2]), int(parts[-1])
        assert (cx, cy) in expected, f"unexpected chip {(cx, cy)}"
        exp_chip, exp_seg = expected[(cx, cy)]
        with GeoTiffReader(str(chip_path)) as r:
            got_chip = r.read()
            assert r.nodata == NO_DATA
            assert r.crs == world["epsg"]
        assert got_chip.dtype == exp_chip.dtype == np.uint16
        np.testing.assert_array_equal(
            got_chip, exp_chip,
            err_msg=f"chip ({cx},{cy}) differs from the oracle")

        seg_path = chip_path.parent.parent / "seg_maps" / \
            chip_path.name.replace("chip_", "seg_map_")
        with GeoTiffReader(str(seg_path)) as r:
            got_seg = r.read(1)
            assert r.nodata == SEG_NO_DATA
        assert got_seg.dtype == exp_seg.dtype == np.int16
        np.testing.assert_array_equal(
            got_seg, exp_seg,
            err_msg=f"seg map ({cx},{cy}) differs from the oracle")


def test_pipeline_matches_oracle_each_strategy(world):
    """Same diff under masking_strategy=each and window_size=0."""
    out_dir = world["tmp_path"] / "out_each"
    from instageo_tpu.data import chip_creator

    argv = [
        "chip_creator",
        f"--dataframe_path={world['csv']}",
        f"--output_directory={out_dir}",
        "--data_source=HLS",
        "--chip_size=32",
        "--min_count=1",
        "--shift_to_month_start=false",
        "--is_time_series_task=false",
        "--mask_types=cloud,cloud_shadow",
        "--masking_strategy=each",
        "--window_size=0",
        "--temporal_tolerance=5",
    ]
    chip_creator.FLAGS(argv)
    chip_creator.main(None)

    expected = _oracle(world, mask_types=("cloud", "cloud_shadow"),
                       masking_strategy="each", window_size=0)
    chips = sorted((out_dir / "chips").glob("chip_*.tif"))
    assert len(chips) == len(expected)
    for chip_path in chips:
        parts = chip_path.stem.split("_")
        cx, cy = int(parts[-2]), int(parts[-1])
        exp_chip, exp_seg = expected[(cx, cy)]
        with GeoTiffReader(str(chip_path)) as r:
            np.testing.assert_array_equal(r.read(), exp_chip)
        seg_path = chip_path.parent.parent / "seg_maps" / \
            chip_path.name.replace("chip_", "seg_map_")
        with GeoTiffReader(str(seg_path)) as r:
            np.testing.assert_array_equal(r.read(1), exp_seg)
