"""Dataset/augmentation/loader tests over framework-written GeoTIFF chips."""

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.dataloader import (
    DataLoader,
    InstaGeoDataset,
    crop_array,
    default_collate,
    eval_collate,
    get_valid_filepaths,
    mask_label_with_chip,
    normalize_and_reshape,
    process_and_augment,
    process_data,
    process_test,
    random_augs,
)
from instageo_tpu.data.geotiff import Affine, write_geotiff


def _write_chip(path, bands=6, size=32, dtype=np.uint16, seed=0, nodata_rows=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(1, 10000, size=(bands, size, size)).astype(dtype)
    if nodata_rows:
        arr[:, :nodata_rows, :] = 0
    write_geotiff(str(path), arr, transform=Affine.from_origin(0, 0, 30, 30),
                  crs=32633, nodata=0)
    return arr


def _write_label(path, size=32, seed=1, all_invalid=False):
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, 2, size=(size, size)).astype(np.int16)
    if all_invalid:
        lab[:] = -1
    write_geotiff(str(path), lab[None], nodata=-1)
    return lab


def test_process_data_band_select_multiplier(tmp_path):
    chip = tmp_path / "chip.tif"
    lab = tmp_path / "lab.tif"
    arr = _write_chip(chip)
    _write_label(lab)
    x, y = process_data(str(chip), str(lab), bands=[0, 2], constant_multiplier=2.0)
    assert x.shape == (2, 32, 32)
    np.testing.assert_allclose(x[1], arr[2] * 2.0)
    assert y.shape == (1, 32, 32)


def test_replace_label_and_reduce(tmp_path):
    chip = tmp_path / "c.tif"
    lab = tmp_path / "l.tif"
    _write_chip(chip)
    rng_lab = _write_label(lab)
    _, y = process_data(str(chip), str(lab), replace_label=(0, 7), reduce_to_zero=True)
    expected = np.where(rng_lab == 0, 7, rng_lab) - 1
    np.testing.assert_array_equal(y[0], expected)


def test_mask_label_with_chip(tmp_path):
    chip = tmp_path / "c.tif"
    lab_ok = tmp_path / "ok.tif"
    lab_bad = tmp_path / "bad.tif"
    _write_chip(chip, bands=6)
    _write_label(lab_ok)
    _write_label(lab_bad, all_invalid=True)
    assert mask_label_with_chip(str(chip), str(lab_ok)) is False
    assert mask_label_with_chip(str(chip), str(lab_bad)) is True


def test_get_valid_filepaths_drops_bad_rows(tmp_path):
    good_chip = tmp_path / "good.tif"
    good_lab = tmp_path / "goodlab.tif"
    bad_lab = tmp_path / "badlab.tif"
    _write_chip(good_chip)
    _write_label(good_lab)
    _write_label(bad_lab, all_invalid=True)
    df = pd.DataFrame({
        "Input": ["good.tif", "good.tif", "missing.tif"],
        "Label": ["goodlab.tif", "badlab.tif", "goodlab.tif"],
    })
    csv = tmp_path / "data.csv"
    df.to_csv(csv, index=False)
    paths = get_valid_filepaths(str(csv), str(tmp_path), 0, -1)
    assert len(paths) == 1
    assert paths[0][0].endswith("good.tif")


def test_normalize_and_reshape():
    rng = np.random.default_rng(0)
    ims = rng.normal(10, 3, size=(12, 8, 8)).astype(np.float32)  # T=2, C=6
    mean = list(range(6))
    std = [1.0] * 6
    out = normalize_and_reshape(ims, mean, std, temporal_size=2)
    assert out.shape == (6, 2, 8, 8)
    np.testing.assert_allclose(out[3, 1], ims.reshape(2, 6, 8, 8)[1, 3] - 3.0,
                               rtol=1e-6)


def test_augs_flip_determinism_and_shapes():
    rng_img = np.random.default_rng(0)
    ims = rng_img.integers(0, 10000, (6, 16, 16)).astype(np.float32)
    label = rng_img.integers(0, 2, (16, 16)).astype(np.float32)
    augs = [{"name": "hflip", "p": 1.0}, {"name": "vflip", "p": 1.0}]
    out, lab = random_augs(ims, label, np.random.default_rng(0), augs)
    np.testing.assert_array_equal(out, ims[:, ::-1, ::-1])
    np.testing.assert_array_equal(lab, label[::-1, ::-1])


def test_rotate_fills_nodata():
    ims = np.full((1, 16, 16), 5.0, np.float32)
    label = np.ones((16, 16), np.float32)
    augs = [{"name": "rotate", "p": 1.0, "degrees": 45}]
    out, lab = random_augs(ims, label, np.random.default_rng(3), augs,
                           chip_no_data_value=0, label_no_data_value=-1)
    assert (out == 0).any()  # corners filled with chip nodata
    assert (lab == -1).any()  # label corners filled with ignore


def test_brightness_blur_noise_stay_in_range():
    rng = np.random.default_rng(0)
    ims = rng.integers(0, 10000, (6, 16, 16)).astype(np.float32)
    augs = [
        {"name": "brightness", "p": 1.0, "brightness_range": [1.2, 1.2],
         "contrast_range": [1.1, 1.1]},
        {"name": "blur", "p": 1.0, "kernel_size": 3, "sigma_range": [1.0, 1.0]},
        {"name": "noise", "p": 1.0, "noise_std": 0.05},
    ]
    out, _ = random_augs(ims, None, np.random.default_rng(1), augs,
                         max_pixel_value=10000.0)
    assert out.min() >= 0 and out.max() <= 10000
    assert not np.array_equal(out, ims)


def test_process_and_augment_output_shape():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 10000, (12, 40, 40)).astype(np.uint16)  # T=2, C=6
    y = rng.integers(0, 2, (40, 40)).astype(np.int16)
    ims, lab = process_and_augment(
        x, y, mean=[0] * 6, std=[1] * 6, temporal_size=2, im_size=32,
        augmentations=None, rng=np.random.default_rng(1))
    assert ims.shape == (6, 2, 32, 32)
    assert lab.shape == (32, 32)


def test_process_test_sliding_window():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 10000, (6, 64, 64)).astype(np.uint16)
    y = rng.integers(0, 2, (64, 64)).astype(np.int16)
    imgs, labels = process_test(x, y, [0] * 6, [1] * 6, temporal_size=1,
                                img_size=64, crop_size=32, stride=32)
    assert imgs.shape == (4, 6, 1, 32, 32)
    assert labels.shape == (4, 32, 32)
    # first crop is the top-left window
    np.testing.assert_allclose(imgs[0, :, 0], x[:, :32, :32].astype(np.float32))


def test_dataset_and_loader_end_to_end(tmp_path):
    for i in range(5):
        _write_chip(tmp_path / f"chip_{i}.tif", seed=i)
        _write_label(tmp_path / f"lab_{i}.tif", seed=i + 10)
    df = pd.DataFrame({
        "Input": [f"chip_{i}.tif" for i in range(5)],
        "Label": [f"lab_{i}.tif" for i in range(5)],
    })
    csv = tmp_path / "train.csv"
    df.to_csv(csv, index=False)

    from functools import partial
    ds = InstaGeoDataset(
        str(csv), str(tmp_path),
        preprocess_func=partial(
            process_and_augment, mean=[0] * 6, std=[1] * 6, temporal_size=1,
            im_size=32, augmentations=None),
        chip_no_data_value=0, label_no_data_value=-1,
        replace_label=None, reduce_to_zero=False, constant_multiplier=1.0,
        bands=[0, 1, 2, 3, 4, 5],
    )
    assert len(ds) == 5
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    x, y = batches[0]
    assert x.shape == (2, 6, 1, 32, 32)
    assert y.shape == (2, 32, 32)
    # loader reshuffles across epochs: per-sample labels are distinct
    # (seeded per chip), so a different epoch order MUST change the
    # concatenated stream — equal streams would mean a frozen order.
    first = np.concatenate([b[1].ravel() for b in batches])
    second = np.concatenate([b[1].ravel() for b in list(loader)])
    assert first.shape == second.shape
    assert not np.array_equal(first, second)


def test_eval_collate_concatenates():
    a = (np.zeros((4, 6, 1, 8, 8)), np.zeros((4, 8, 8)))
    b = (np.ones((4, 6, 1, 8, 8)), np.ones((4, 8, 8)))
    x, y = eval_collate([a, b])
    assert x.shape == (8, 6, 1, 8, 8)


def test_crop_array_dims():
    assert crop_array(np.zeros((8, 8)), 1, 2, 5, 6).shape == (4, 4)
    assert crop_array(np.zeros((3, 8, 8)), 1, 2, 5, 6).shape == (3, 4, 4)
    assert crop_array(np.zeros((2, 3, 8, 8)), 1, 2, 5, 6).shape == (2, 3, 4, 4)
    with pytest.raises(ValueError):
        crop_array(np.zeros(8), 0, 0, 4, 4)
