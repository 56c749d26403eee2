"""End-to-end chip-creator CLI test: mocked STAC search, local COG tiles.

Exercises the full path the reference gates behind ``@pytest.mark.auth``
(tests/data_tests/test_chip_creator.py): observations CSV -> MGRS tiles ->
STAC search -> item dispatch/selection -> tile load -> device chip math ->
chips + seg maps + manifest. Only the network search is mocked; COG decode
runs through the real codec on files written by the real writer.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.crs import latlon_to_utm, utm_to_latlon
from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.data.stac import StacClient, StacItem


TILE_SIZE = 64
CHIP = 32
RES = 30.0


@pytest.fixture
def hls_world(tmp_path, monkeypatch):
    """Local 'granule' band files + STAC items + observation CSV."""
    # Tile placed in UTM 33N around a known lat/lon.
    lat0, lon0 = 43.0, 15.0
    e0, n0, zone, south = latlon_to_utm(lat0, lon0)
    origin_x = float(e0) - (TILE_SIZE / 2) * RES
    origin_y = float(n0) + (TILE_SIZE / 2) * RES
    transform = Affine.from_origin(origin_x, origin_y, RES, RES)
    epsg = 32633

    rng = np.random.default_rng(0)
    assets = {}
    band_names = ["B02", "B03", "B04", "B8A", "B11", "B12"]
    for i, b in enumerate(band_names):
        arr = rng.integers(100 + i * 10, 5000, size=(TILE_SIZE, TILE_SIZE)
                           ).astype(np.uint16)
        p = str(tmp_path / f"granule_{b}.tif")
        write_geotiff(p, arr[None], transform=transform, crs=epsg, nodata=0)
        assets[b] = p
    fmask = np.zeros((TILE_SIZE, TILE_SIZE), np.uint16)
    fmask[:2, :2] = 2  # cloud bit set in the first chip
    pmask = str(tmp_path / "granule_Fmask.tif")
    write_geotiff(pmask, fmask[None], transform=transform, crs=epsg)
    assets["Fmask"] = pmask

    # Item bbox in 4326 covering the tile.
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

    monkeypatch.setattr(StacClient, "search",
                        lambda self, **kw: [item], raising=True)

    # Observations: points inside chips (0,0) and (1,1), lat/lon CRS.
    pts_utm = [
        (origin_x + 5 * RES, origin_y - 5 * RES, 1),
        (origin_x + (CHIP + 5) * RES, origin_y - (CHIP + 7) * RES, 0),
        (origin_x + 6 * RES, origin_y - 8 * RES, 1),
    ]
    rows = []
    for x, y, label in pts_utm:
        lat, lon = utm_to_latlon(x, y, zone, south)
        rows.append({"x": float(lon), "y": float(lat), "label": label,
                     "date": "2022-05-25"})
    csv = tmp_path / "obs.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return tmp_path, csv, item


def test_chip_creator_cli_end_to_end(hls_world):
    tmp_path, csv, _item = hls_world
    out_dir = tmp_path / "out"

    from instageo_tpu.data import chip_creator
    argv = [
        "chip_creator",
        f"--dataframe_path={csv}",
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

    # Cached search artifacts for resume.
    assert (out_dir / "hls_dataset.json").exists()
    assert (out_dir / "filtered_obsv_records.parquet").exists()

    chips = sorted((out_dir / "chips").glob("chip_*.tif"))
    segs = sorted((out_dir / "seg_maps").glob("seg_map_*.tif"))
    assert len(chips) == 2 and len(segs) == 2  # chips (0,0) and (1,1)

    manifest = pd.read_csv(out_dir / "hls_dataset.csv")
    assert set(manifest.columns) == {"Input", "Label"}
    assert len(manifest) == 2

    with GeoTiffReader(str(chips[0])) as r:
        assert r.count == 6
        assert r.crs == 32633
        arr = r.read()
    # Cloud-masked pixels (0:2, 0:2) must be no-data in the first-grid chip.
    first = [c for c in chips if c.name.endswith("_0_0.tif")][0]
    with GeoTiffReader(str(first)) as r:
        arr0 = r.read()
    assert (arr0[:, :2, :2] == 0).all()
    assert (arr0 != 0).any()

    with GeoTiffReader(str(segs[0])) as r:
        seg = r.read(1)
    vals = set(np.unique(seg).tolist())
    assert vals <= {-1, 0, 1}
    assert len(vals) > 1  # some labels stamped

    # Window size 1 stamps a 3x3 block: the chip with label=1 points.
    seg_first = [s for s in segs if s.name.endswith("_0_0.tif")][0]
    with GeoTiffReader(str(seg_first)) as r:
        s0 = r.read(1)
    assert (s0 == 1).sum() >= 9

    # Idempotent resume: rerun produces no duplicates and doesn't crash —
    # and the manifest KEEPS the previously processed tiles' rows (a
    # resumed run returns no rows for done tiles; rewriting the CSV with
    # only the new rows would silently drop them).
    chip_creator.main(None)
    assert len(sorted((out_dir / "chips").glob("chip_*.tif"))) == 2
    manifest = pd.read_csv(out_dir / "hls_dataset.csv")
    assert len(manifest) == 2
    assert set(manifest.columns) == {"Input", "Label"}


def test_chip_creator_download_mode(hls_world, monkeypatch):
    """--processing_method=download serves granules over real localhost
    HTTP, downloads them once, chips from the local copies, and produces
    byte-identical chips to the streaming 'cog' mode. 'download-only'
    stops after the fetch."""
    import functools
    import http.server
    import threading

    from instageo_tpu.data import downloads

    tmp_path, csv, item = hls_world
    # Test fixtures are far smaller than any real granule; relax the
    # truncated-download size floor so they pass validation.
    monkeypatch.setattr(downloads, "MIN_VALID_SIZE", 64)

    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(tmp_path))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        local_assets = dict(item.assets)
        item.assets = {
            name: f"http://127.0.0.1:{port}/{os.path.basename(path)}"
            for name, path in local_assets.items()
        }

        from instageo_tpu.data import chip_creator
        common = [
            "chip_creator",
            f"--dataframe_path={csv}",
            "--data_source=HLS",
            "--chip_size=32",
            "--min_count=1",
            "--shift_to_month_start=false",
            "--is_time_series_task=false",
            "--mask_types=cloud",
            "--masking_strategy=any",
            "--window_size=1",
        ]

        out_dl = tmp_path / "out_dl"
        chip_creator.FLAGS(common + [f"--output_directory={out_dl}",
                                     "--processing_method=download-only"])
        chip_creator.main(None)
        fetched = sorted((out_dl / "granules").glob("*.tif"))
        assert len(fetched) == 7  # 6 bands + Fmask
        assert not (out_dl / "chips").exists()
        # Cached dataset JSON keeps the REMOTE hrefs (resume contract).
        ds = json.load(open(out_dl / "hls_dataset.json"))
        hrefs = [a["href"] for e in ds.values() for g in e["granules"]
                 for a in g["assets"].values()]
        assert all(h.startswith("http://127.0.0.1") for h in hrefs)

        chip_creator.FLAGS(common + [f"--output_directory={out_dl}",
                                     "--processing_method=download"])
        chip_creator.main(None)
        chips_dl = sorted((out_dl / "chips").glob("chip_*.tif"))
        assert len(chips_dl) == 2
    finally:
        srv.shutdown()

    # Chips from local downloads == chips streamed from the originals.
    out_cog = tmp_path / "out_cog"
    item.assets = local_assets
    chip_creator.FLAGS(common + [f"--output_directory={out_cog}",
                                 "--processing_method=cog"])
    chip_creator.main(None)
    chips_cog = sorted((out_cog / "chips").glob("chip_*.tif"))
    for a, b in zip(chips_dl, chips_cog):
        assert a.name == b.name
        with GeoTiffReader(str(a)) as ra, GeoTiffReader(str(b)) as rb:
            assert np.array_equal(ra.read(), rb.read())
