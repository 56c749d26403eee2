"""GeoTIFF codec tests: roundtrips + cross-validation against OpenCV's libtiff."""

import numpy as np
import pytest

import cv2

from instageo_tpu.data.geotiff import (
    Affine,
    GeoTiffReader,
    read_geotiff,
    write_geotiff,
)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "float32", "int32"])
@pytest.mark.parametrize("compress", ["none", "deflate", "lzw"])
def test_roundtrip_dtypes_compressions(tmp_path, dtype, compress):
    rng = np.random.default_rng(0)
    if dtype.startswith("float"):
        arr = rng.normal(size=(4, 37, 53)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(max(info.min, -1000), min(info.max, 10000),
                           size=(4, 37, 53)).astype(dtype)
    path = str(tmp_path / "x.tif")
    write_geotiff(path, arr, compress=compress)
    out = read_geotiff(path)
    np.testing.assert_array_equal(out, arr)


def test_roundtrip_tiled(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 10000, size=(18, 224, 224)).astype(np.uint16)
    path = str(tmp_path / "tiled.tif")
    write_geotiff(path, arr, tiled=True, tile_size=64)
    np.testing.assert_array_equal(read_geotiff(path), arr)


def test_geo_metadata_roundtrip(tmp_path):
    arr = np.zeros((2, 16, 16), np.int16)
    tr = Affine.from_origin(499980.0, 4100040.0, 30.0, 30.0)
    path = str(tmp_path / "geo.tif")
    write_geotiff(path, arr, transform=tr, crs=32633, nodata=-1)
    with GeoTiffReader(path) as r:
        assert r.width == 16 and r.height == 16 and r.count == 2
        assert r.crs == 32633
        assert r.nodata == -1
        t = r.transform
        assert t.a == 30.0 and t.e == -30.0
        assert t.c == 499980.0 and t.f == 4100040.0
        assert r.profile["dtype"] == "int16"


def test_geographic_crs(tmp_path):
    path = str(tmp_path / "wgs.tif")
    write_geotiff(path, np.zeros((1, 4, 4), np.uint8),
                  transform=Affine.from_origin(-1.0, 10.0, 0.001, 0.001), crs=4326)
    with GeoTiffReader(path) as r:
        assert r.crs == 4326


def test_cv2_reads_our_files(tmp_path):
    """OpenCV's libtiff must decode what we write (interop oracle)."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 60000, size=(1, 40, 56)).astype(np.uint16)
    for compress in ("none", "deflate", "lzw"):
        path = str(tmp_path / f"{compress}.tif")
        write_geotiff(path, arr, compress=compress)
        out = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        assert out is not None, f"cv2 failed to read {compress}"
        np.testing.assert_array_equal(out, arr[0])


def test_we_read_cv2_files(tmp_path):
    """We must decode what libtiff writes (strips, possibly LZW+predictor)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 60000, size=(33, 47)).astype(np.uint16)
    path = str(tmp_path / "cv2.tif")
    assert cv2.imwrite(path, img)
    np.testing.assert_array_equal(read_geotiff(path)[0], img)

    # float32 via cv2
    imgf = rng.normal(size=(20, 30)).astype(np.float32)
    pathf = str(tmp_path / "cv2f.tif")
    assert cv2.imwrite(pathf, imgf)
    np.testing.assert_array_equal(read_geotiff(pathf)[0], imgf)

    # 3-channel uint8 (cv2 takes BGR and stores RGB -> reverse channels)
    img3 = rng.integers(0, 255, size=(21, 19, 3)).astype(np.uint8)
    path3 = str(tmp_path / "cv2c.tif")
    assert cv2.imwrite(path3, img3)
    np.testing.assert_array_equal(
        read_geotiff(path3), img3[..., ::-1].transpose(2, 0, 1))


def test_band_indexing(tmp_path):
    arr = np.stack([np.full((8, 8), i, np.uint8) for i in range(5)])
    path = str(tmp_path / "bands.tif")
    write_geotiff(path, arr)
    with GeoTiffReader(path) as r:
        np.testing.assert_array_equal(r.read(1), np.zeros((8, 8)))
        np.testing.assert_array_equal(r.read([2, 4])[1], np.full((8, 8), 3))


def test_affine_math():
    t = Affine.from_origin(100.0, 200.0, 10.0, 10.0)
    assert t * (0, 0) == (100.0, 200.0)
    assert t * (2, 3) == (120.0, 170.0)
    row, col = t.rowcol(125.0, 165.0)
    assert (row, col) == (3, 2)
    x, y = t.xy(3, 2)
    assert (x, y) == (125.0, 165.0)
    inv = t.invert()
    assert inv * (120.0, 170.0) == (2.0, 3.0)


def test_not_a_tiff(tmp_path):
    p = tmp_path / "bad.tif"
    p.write_bytes(b"not a tiff at all")
    with pytest.raises(ValueError):
        GeoTiffReader(str(p))
