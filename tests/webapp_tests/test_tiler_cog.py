"""Tile math + COG merge unit tests."""

import math
import os

import numpy as np
import pytest

from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.webapp.cog import COGConverter, merge_rasters
from instageo_tpu.webapp.tiler import (
    COGTiler,
    latlon_to_mercator,
    mercator_to_latlon,
    tile_bounds_mercator,
)


def test_mercator_roundtrip():
    lat, lon = 43.64, -79.38
    mx, my = latlon_to_mercator(lat, lon)
    lat2, lon2 = mercator_to_latlon(np.asarray([mx]), np.asarray([my]))
    assert abs(float(lat2[0]) - lat) < 1e-9
    assert abs(float(lon2[0]) - lon) < 1e-9


def test_tile_bounds():
    # z=0 tile covers the whole mercator world
    b = tile_bounds_mercator(0, 0, 0)
    assert b[0] == pytest.approx(-20037508.34, rel=1e-6)
    assert b[2] == pytest.approx(20037508.34, rel=1e-6)
    # z=1: (0,0) is the NW quadrant
    b = tile_bounds_mercator(1, 0, 0)
    assert b[0] < 0 and b[2] == pytest.approx(0, abs=1)
    assert b[1] == pytest.approx(0, abs=1) and b[3] > 0


def test_merge_rasters_union_grid(tmp_path):
    a = np.full((1, 16, 16), 1, np.int16)
    b = np.full((1, 16, 16), 2, np.int16)
    pa = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    # b sits directly east of a
    write_geotiff(pa, a, transform=Affine.from_origin(0, 480, 30, 30), crs=32633)
    write_geotiff(pb, b, transform=Affine.from_origin(480, 480, 30, 30), crs=32633)
    mosaic, tr, crs = merge_rasters([pa, pb], fill_value=0)
    assert mosaic.shape == (1, 16, 32)
    assert (mosaic[0, :, :16] == 1).all()
    assert (mosaic[0, :, 16:] == 2).all()
    assert tr.c == 0 and tr.f == 480 and crs == 32633


def test_cog_converter_and_stats(tmp_path):
    data_dir = tmp_path / "task"
    os.makedirs(data_dir / "predictions")
    os.makedirs(data_dir / "chips")
    rng = np.random.default_rng(0)
    for i in range(2):
        pred = rng.integers(0, 2, size=(1, 32, 32)).astype(np.int8)
        write_geotiff(str(data_dir / "predictions" / f"prediction_{i}.tif"),
                      pred, transform=Affine.from_origin(i * 960, 960, 30, 30),
                      crs=32633, nodata=-1)
        chip = rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16)
        write_geotiff(str(data_dir / "chips" / f"chip_{i}.tif"), chip,
                      transform=Affine.from_origin(i * 960, 960, 30, 30),
                      crs=32633, nodata=0)
    conv = COGConverter(str(data_dir), block_size=32, num_overviews=2)
    result = conv.merge_task_files_to_cog("t1")
    assert result["chips_cog"] and result["predictions_cog"]
    with GeoTiffReader(result["chips_cog"]) as r:
        assert r.count == 3  # RGB selection
        assert r.width == 64
    stats = conv.compute_seg_stats(result["predictions_cog"])
    assert stats["total_pixels"] == 64 * 32
    assert set(stats["classes"]) <= {"0", "1"}


def test_cog_tiler_renders(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 2, size=(1, 128, 128)).astype(np.int8)
    p = str(tmp_path / "pred.tif")
    # geographic raster for simple bounds math
    write_geotiff(p, arr, transform=Affine.from_origin(10.0, 45.0, 0.001, 0.001),
                  crs=4326, nodata=-1)
    tiler = COGTiler(p)
    b = tiler.bounds_4326()
    assert b[0] == pytest.approx(10.0) and b[3] == pytest.approx(45.0)
    # find the covering tile at z=12
    lon, lat = 10.06, 44.95
    z = 12
    xt = int((lon + 180) / 360 * 2 ** z)
    yt = int((1 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2 * 2 ** z)
    png = tiler.render_tile(z, xt, yt, mode="classes")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    stats = tiler.statistics()
    assert "b1" in stats and 0 <= stats["b1"]["mean"] <= 1
    tj = tiler.tilejson("/t/{z}/{x}/{y}.png")
    assert tj["bounds"][0] == pytest.approx(10.0)
    tiler.close()


def test_tiler_cache_invalidates_on_rewrite_and_evicts(tmp_path):
    import os
    import time as _time

    import numpy as np

    from instageo_tpu.data.geotiff import Affine, write_geotiff
    from instageo_tpu.webapp.tiler import TilerService

    svc = TilerService(str(tmp_path))
    tr = Affine.from_origin(0, 1, 0.1, 0.1)

    def write_cog(tid, value):
        d = tmp_path / tid
        d.mkdir(exist_ok=True)
        write_geotiff(str(d / f"{tid}_predictions.tif"),
                      np.full((1, 8, 8), value, np.int8),
                      transform=tr, crs=4326)

    write_cog("t1", 1)
    tiler1 = svc.get_tiler("t1", "predictions")
    assert svc.get_tiler("t1", "predictions") is tiler1  # cached

    # Re-run rewrites the COG -> cached tiler must be replaced, serving
    # the NEW data.
    _time.sleep(0.01)
    write_cog("t1", 2)
    os.utime(tmp_path / "t1" / "t1_predictions.tif")
    tiler2 = svc.get_tiler("t1", "predictions")
    assert tiler2 is not tiler1
    assert int(tiler2._level(0)[0, 0, 0]) == 2

    # LRU eviction: the cache never exceeds MAX_CACHED entries.
    for i in range(svc.MAX_CACHED + 3):
        write_cog(f"e{i}", i)
        svc.get_tiler(f"e{i}", "predictions")
    assert len(svc._tilers) <= svc.MAX_CACHED


def test_task_id_path_traversal_rejected(tmp_path):
    """URL-supplied task ids must never traverse out of the data dir."""
    import pytest as _pytest

    from instageo_tpu.webapp.tiler import TilerService

    svc = TilerService(str(tmp_path))
    for bad in ("../../etc", "a/../b", "..", "", "a\x00b"):
        with _pytest.raises(FileNotFoundError):
            svc.get_tiler(bad, "predictions")
        assert svc.visualize_urls(bad) == {}


def test_concurrent_tile_renders_are_consistent(tmp_path):
    """Tile renders run on executor threads; concurrent cache-miss
    decodes on one shared reader corrupted tiles before the decode lock
    (reproduced: zlib errors + silently wrong arrays)."""
    import concurrent.futures

    import numpy as np

    from instageo_tpu.data.geotiff import Affine, write_geotiff
    from instageo_tpu.webapp.tiler import COGTiler

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 3000, size=(3, 256, 256)).astype(np.uint16)
    p = str(tmp_path / "cog.tif")
    write_geotiff(p, arr, transform=Affine.from_origin(0, 50, 0.001, 0.001),
                  crs=4326, compress="deflate")

    tiler = COGTiler(p)
    ref = tiler.render_tile(9, 255, 181)
    tiler2 = COGTiler(p)  # fresh: empty level cache for the race

    with concurrent.futures.ThreadPoolExecutor(6) as pool:
        futs = [pool.submit(tiler2.render_tile, 9, 255, 181)
                for _ in range(12)]
        outs = [f.result() for f in futs]  # raises on decode corruption
    assert all(o == ref for o in outs)
