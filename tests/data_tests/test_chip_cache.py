"""Decoded-chip .npy cache (dataloader.cache_dir).

Multi-epoch training re-pays TIFF decode every epoch unless the decoded
raster is cached; these tests pin the cache's contract: bit-identical
arrays, mtime/size invalidation, corrupt-entry self-heal, stale-key
pruning, and graceful degradation when the cache dir is unwritable.
"""

import os

import numpy as np
import pytest

from instageo_tpu.data.dataloader import (
    InstaGeoDataset,
    _read_full_cached,
    get_raster_data,
    process_and_augment,
)
from instageo_tpu.data.geotiff import write_geotiff


@pytest.fixture()
def chip(tmp_path):
    arr = np.random.default_rng(0).integers(
        1, 10000, size=(6, 32, 32)).astype(np.uint16)
    path = tmp_path / "chip_0.tif"
    write_geotiff(str(path), arr, compress="deflate", nodata=0)
    return str(path), arr


def test_cache_roundtrip_bit_identical(chip, tmp_path):
    path, arr = chip
    cache = str(tmp_path / "cache")
    first = _read_full_cached(path, cache)
    entries = os.listdir(cache)
    assert len(entries) == 1 and entries[0].endswith(".npy")
    second = _read_full_cached(path, cache)  # served from the entry
    np.testing.assert_array_equal(first, arr)
    np.testing.assert_array_equal(second, arr)
    assert second.dtype == arr.dtype


def test_cache_hit_skips_decode(chip, tmp_path, monkeypatch):
    path, arr = chip
    cache = str(tmp_path / "cache")
    _read_full_cached(path, cache)  # populate

    import instageo_tpu.data.dataloader as dl

    def boom(_):
        raise AssertionError("decode called on a warm cache")

    monkeypatch.setattr(dl, "_read_full", boom)
    out = dl._read_full_cached(path, cache)
    np.testing.assert_array_equal(out, arr)


def test_cache_invalidated_on_rewrite(chip, tmp_path):
    path, _ = chip
    cache = str(tmp_path / "cache")
    _read_full_cached(path, cache)
    new = np.full((6, 32, 32), 7, np.uint16)
    write_geotiff(path, new, compress="deflate", nodata=0)
    # force a distinct mtime_ns even on coarse filesystems
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    out = _read_full_cached(path, cache)
    np.testing.assert_array_equal(out, new)
    # stale key pruned: one entry per source file
    assert len(os.listdir(cache)) == 1


def test_corrupt_entry_self_heals(chip, tmp_path):
    path, arr = chip
    cache = str(tmp_path / "cache")
    _read_full_cached(path, cache)
    entry = os.path.join(cache, os.listdir(cache)[0])
    with open(entry, "wb") as f:
        f.write(b"not an npy")
    out = _read_full_cached(path, cache)
    np.testing.assert_array_equal(out, arr)
    # entry rewritten and loadable again
    np.testing.assert_array_equal(np.load(entry), arr)


def test_unwritable_cache_degrades_to_decode(chip, tmp_path):
    path, arr = chip
    blocked = tmp_path / "blocked"
    blocked.mkdir()
    blocked.chmod(0o500)
    try:
        out = _read_full_cached(path, str(blocked / "cache"))
        np.testing.assert_array_equal(out, arr)
    finally:
        blocked.chmod(0o700)


def test_get_raster_data_band_select_outside_cache(chip, tmp_path):
    path, arr = chip
    cache = str(tmp_path / "cache")
    out = get_raster_data(path, is_label=False, bands=[2, 0], cache_dir=cache)
    np.testing.assert_array_equal(out, arr[[2, 0]])
    # cache entry stores the FULL raster, not the band subset
    entry = os.path.join(cache, os.listdir(cache)[0])
    assert np.load(entry).shape == arr.shape


def test_qa_scan_cached_matches_uncached(tmp_path):
    """get_valid_filepaths drops the same rows with/without cache_dir.

    Includes a chip whose label is all-invalid under the data mask (the
    mask_label_with_chip drop path) and an unreadable chip.
    """
    import pandas as pd

    from instageo_tpu.data.dataloader import get_valid_filepaths

    rng = np.random.default_rng(2)
    rows = []
    # row 0: valid pair
    arr = rng.integers(1, 10000, size=(6, 16, 16)).astype(np.uint16)
    lab = np.ones((1, 16, 16), np.int16)
    write_geotiff(str(tmp_path / "ok.tif"), arr, nodata=0)
    write_geotiff(str(tmp_path / "ok_seg.tif"), lab, nodata=-1)
    rows.append({"Input": "ok.tif", "Label": "ok_seg.tif"})
    # row 1: chip all-nodata -> label fully masked -> dropped
    write_geotiff(str(tmp_path / "bad.tif"),
                  np.zeros((6, 16, 16), np.uint16), nodata=0)
    write_geotiff(str(tmp_path / "bad_seg.tif"), lab, nodata=-1)
    rows.append({"Input": "bad.tif", "Label": "bad_seg.tif"})
    # row 2: unreadable chip -> dropped
    (tmp_path / "junk.tif").write_bytes(b"\x00" * 64)
    write_geotiff(str(tmp_path / "junk_seg.tif"), lab, nodata=-1)
    rows.append({"Input": "junk.tif", "Label": "junk_seg.tif"})
    csv = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    plain = get_valid_filepaths(str(csv), str(tmp_path),
                                no_data_value=0, ignore_index=-1)
    cached = get_valid_filepaths(str(csv), str(tmp_path),
                                 no_data_value=0, ignore_index=-1,
                                 cache_dir=str(tmp_path / "cache"))
    assert plain == cached
    assert [os.path.basename(p[0]) for p in plain] == ["ok.tif"]


def test_dataset_cached_epoch_matches_uncached(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(1)
    rows = []
    for i in range(3):
        arr = rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16)
        lab = rng.integers(0, 2, size=(1, 32, 32)).astype(np.int16)
        write_geotiff(str(tmp_path / f"chip_{i}.tif"), arr,
                      compress="deflate", nodata=0)
        write_geotiff(str(tmp_path / f"seg_{i}.tif"), lab,
                      compress="deflate", nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_{i}.tif"})
    csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    def make(cache_dir):
        from functools import partial

        return InstaGeoDataset(
            filename=str(csv),
            input_root=str(tmp_path),
            preprocess_func=partial(
                process_and_augment, mean=[5000.0] * 6, std=[3000.0] * 6,
                im_size=32, augmentations=None,
                rng=np.random.default_rng(7)),
            chip_no_data_value=0,
            label_no_data_value=-1,
            replace_label=None,
            reduce_to_zero=False,
            constant_multiplier=1.0,
            bands=[0, 1, 2, 3, 4, 5],
            cache_dir=cache_dir,
        )

    plain = make(None)
    cached = make(str(tmp_path / "cache"))
    for i in range(3):
        x0, y0 = plain[i]
        x1, y1 = cached[i]   # populates
        x2, y2 = cached[i]   # hits
        np.testing.assert_array_equal(x0, x1)
        np.testing.assert_array_equal(x0, x2)
        np.testing.assert_array_equal(y0, y1)
        np.testing.assert_array_equal(y0, y2)
