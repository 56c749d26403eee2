"""Codec robustness: truncated/corrupted inputs must raise, not hang/crash."""

import numpy as np
import pytest

from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff


@pytest.fixture
def valid_tif(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 10000, size=(3, 32, 32)).astype(np.uint16)
    p = str(tmp_path / "ok.tif")
    write_geotiff(p, arr, transform=Affine.from_origin(0, 0, 30, 30),
                  crs=32633, compress="deflate")
    return p, arr


@pytest.mark.parametrize("keep", [8, 16, 64, 200])
def test_truncated_files_raise(valid_tif, tmp_path, keep):
    p, _ = valid_tif
    data = open(p, "rb").read()
    bad = tmp_path / f"trunc_{keep}.tif"
    bad.write_bytes(data[:keep])
    with pytest.raises(Exception):
        with GeoTiffReader(str(bad)) as r:
            r.read()


def test_bitflips_do_not_hang(valid_tif, tmp_path):
    p, arr = valid_tif
    data = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(1)
    crashes = 0
    for trial in range(25):
        corrupted = bytearray(data)
        for _ in range(4):
            pos = int(rng.integers(4, len(corrupted)))
            corrupted[pos] ^= 0xFF
        bad = tmp_path / f"fuzz_{trial}.tif"
        bad.write_bytes(bytes(corrupted))
        try:
            with GeoTiffReader(str(bad)) as r:
                out = r.read()
        except Exception:
            crashes += 1  # raising is fine; hanging/segfaulting is not
            continue
        # A decode that SUCCEEDS must still be shape-consistent (outside
        # the try so a violation is NOT swallowed as a "crash").
        assert out.shape[1:] == arr.shape[1:]
    # The real assertions are implicit: the loop terminated (no hang) and
    # no trial segfaulted; on this dense deflate fixture most or all
    # trials raise, which is the accepted outcome.
    assert 0 <= crashes <= 25


def test_native_decoder_corrupt_inputs(valid_tif, tmp_path):
    from instageo_tpu import native

    if not native.available():
        pytest.skip("native decoder not built")
    p, arr = valid_tif
    data = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(2)
    for trial in range(25):
        corrupted = bytearray(data)
        for _ in range(4):
            pos = int(rng.integers(4, len(corrupted)))
            corrupted[pos] ^= 0xFF
        bad = tmp_path / f"nfuzz_{trial}.tif"
        bad.write_bytes(bytes(corrupted))
        try:
            native.read_geotiff_native(str(bad))
        except Exception:
            pass  # errors are fine; crashes would kill the process
    # batch path: corrupt items zero-fill
    batch = native.read_batch_native(
        [p, str(tmp_path / "nfuzz_0.tif")], arr.shape, arr.dtype)
    np.testing.assert_array_equal(batch[0], arr)


def test_zero_length_file(tmp_path):
    p = tmp_path / "empty.tif"
    p.write_bytes(b"")
    with pytest.raises(Exception):
        GeoTiffReader(str(p))


def test_cyclic_ifd_does_not_loop(tmp_path, valid_tif):
    """An IFD whose next pointer points at itself must not loop forever."""
    p, _ = valid_tif
    data = bytearray(open(p, "rb").read())
    # next-IFD pointer of the first IFD: header(8) + 2 + n*12
    import struct

    (n_tags,) = struct.unpack_from("<H", data, 8)
    off = 8 + 2 + n_tags * 12
    struct.pack_into("<I", data, off, 8)  # point back at the first IFD
    bad = tmp_path / "cyclic.tif"
    bad.write_bytes(bytes(data))
    with GeoTiffReader(str(bad)) as r:  # must terminate
        assert len(r.ifds) >= 1


def _mutate_ifd_tag(data: bytes, tag_id: int, *, new_id=None,
                    new_count=None, new_value=None) -> bytes:
    """Surgically rewrite one IFD tag of a classic little-endian TIFF."""
    import struct

    buf = bytearray(data)
    ifd = struct.unpack_from("<I", buf, 4)[0]
    n = struct.unpack_from("<H", buf, ifd)[0]
    for i in range(n):
        off = ifd + 2 + 12 * i
        tid = struct.unpack_from("<H", buf, off)[0]
        if tid != tag_id:
            continue
        if new_id is not None:
            struct.pack_into("<H", buf, off, new_id)
        if new_count is not None:
            struct.pack_into("<I", buf, off + 4, new_count)
        if new_value is not None:
            struct.pack_into("<I", buf, off + 8, new_value)
        return bytes(buf)
    raise AssertionError(f"tag {tag_id} not found")


def test_native_decoder_malformed_geometry(valid_tif, tmp_path):
    """Targeted malformed-IFD cases for the native decoder's bounds
    clamps: missing byte counts, huge RowsPerStrip, zero-size geometry.
    Must fail (or succeed) CLEANLY — never read/write out of bounds."""
    from instageo_tpu import native

    if not native.available():
        pytest.skip("native decoder not built")
    p, _ = valid_tif
    data = open(p, "rb").read()

    cases = {
        # StripByteCounts renamed away: offsets without counts.
        "no_counts": _mutate_ifd_tag(data, 279, new_id=59999),
        # RowsPerStrip huge: geometry implies fewer strips than offsets.
        "huge_rps": _mutate_ifd_tag(data, 278, new_value=2 ** 30),
        # RowsPerStrip tiny: geometry implies far MORE strips than exist.
        "tiny_rps": _mutate_ifd_tag(data, 278, new_value=1),
        # Zero width.
        "zero_w": _mutate_ifd_tag(data, 256, new_value=0),
    }
    for name, blob in cases.items():
        bad = tmp_path / f"{name}.tif"
        bad.write_bytes(blob)
        try:
            native.read_geotiff_native(str(bad))
        except Exception:
            pass  # clean failure is the contract; crashing is not
    assert True
