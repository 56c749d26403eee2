"""Native C++ decoder tests: bit-exact parity with the Python codec."""

import numpy as np
import pytest

from instageo_tpu.data.geotiff import Affine, read_geotiff, write_cog, write_geotiff
from instageo_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder not built")


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "int32", "float32"])
@pytest.mark.parametrize("compress", ["none", "deflate", "lzw"])
def test_native_matches_python(tmp_path, dtype, compress):
    rng = np.random.default_rng(0)
    if dtype.startswith("float"):
        arr = rng.normal(size=(5, 33, 47)).astype(dtype)
    else:
        arr = rng.integers(0, 200, size=(5, 33, 47)).astype(dtype)
    p = str(tmp_path / "x.tif")
    write_geotiff(p, arr, compress=compress)
    np.testing.assert_array_equal(native.read_geotiff_native(p), arr)
    np.testing.assert_array_equal(native.read_geotiff_native(p), read_geotiff(p))


def test_native_reads_tiled_cog(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 10000, size=(6, 200, 300)).astype(np.uint16)
    p = str(tmp_path / "cog.tif")
    write_cog(p, arr, transform=Affine.from_origin(0, 0, 30, 30), crs=32633,
              tile_size=128)
    np.testing.assert_array_equal(native.read_geotiff_native(p), arr)


def test_native_info(tmp_path):
    arr = np.zeros((3, 10, 20), np.int16)
    p = str(tmp_path / "info.tif")
    write_geotiff(p, arr)
    w, h, b, dt = native.read_info(p)
    assert (w, h, b) == (20, 10, 3)
    assert dt == np.int16


def test_native_batch(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    arrays = []
    for i in range(10):
        a = rng.integers(0, 10000, size=(6, 32, 32)).astype(np.uint16)
        p = str(tmp_path / f"c{i}.tif")
        write_geotiff(p, a, compress="deflate")
        paths.append(p)
        arrays.append(a)
    batch = native.read_batch_native(paths, (6, 32, 32), np.uint16, n_threads=4)
    np.testing.assert_array_equal(batch, np.stack(arrays))


def test_native_batch_bad_file_zero_filled(tmp_path):
    good = str(tmp_path / "good.tif")
    write_geotiff(good, np.ones((2, 8, 8), np.uint8))
    bad = str(tmp_path / "bad.tif")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    batch = native.read_batch_native([good, bad], (2, 8, 8), np.uint8)
    assert (batch[0] == 1).all()
    assert (batch[1] == 0).all()


def test_native_error_on_missing():
    with pytest.raises(IOError):
        native.read_geotiff_native("/nonexistent/file.tif")
