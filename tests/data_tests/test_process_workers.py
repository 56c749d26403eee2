"""worker_mode=process: spawned-worker loader parity with the thread loader.

The thread loader's numpy augment passes hold the GIL, so multi-core
scaling needs real processes (the reference's torch DataLoader forks
workers the same way). These tests pin that the process loader yields
bit-identical batches in the same order, and that worker exceptions
surface in the consumer.
"""

import os
from functools import partial

import numpy as np
import pandas as pd
import pytest

from instageo_tpu.data.dataloader import (
    DataLoader,
    InstaGeoDataset,
    process_and_augment,
)
from instageo_tpu.data.geotiff import write_geotiff


def _make_ds(tmp_path, n=6):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        write_geotiff(str(tmp_path / f"chip_{i}.tif"),
                      rng.integers(1, 10000, size=(6, 32, 32)).astype(np.uint16),
                      compress="deflate", nodata=0)
        write_geotiff(str(tmp_path / f"seg_{i}.tif"),
                      rng.integers(0, 2, size=(1, 32, 32)).astype(np.int16),
                      compress="deflate", nodata=-1)
        rows.append({"Input": f"chip_{i}.tif", "Label": f"seg_{i}.tif"})
    csv = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return InstaGeoDataset(
        filename=str(csv),
        input_root=str(tmp_path),
        preprocess_func=partial(
            process_and_augment, mean=[5000.0] * 6, std=[3000.0] * 6,
            im_size=32, augmentations=None),
        chip_no_data_value=0,
        label_no_data_value=-1,
        replace_label=None,
        reduce_to_zero=False,
        constant_multiplier=1.0,
        bands=[0, 1, 2, 3, 4, 5],
    )


@pytest.mark.slow
def test_process_loader_matches_thread_loader(tmp_path):
    ds = _make_ds(tmp_path)
    thread = DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                        num_workers=2, worker_mode="thread")
    proc = DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                      num_workers=2, worker_mode="process")
    tb = list(thread)
    pb = list(proc)
    assert len(tb) == len(pb) == 3
    for (tx, ty), (px, py) in zip(tb, pb):
        np.testing.assert_array_equal(tx, px)
        np.testing.assert_array_equal(ty, py)


@pytest.mark.slow
def test_process_loader_surfaces_worker_errors(tmp_path):
    ds = _make_ds(tmp_path, n=4)
    # poison one sample: unreadable file swapped in AFTER the QA scan
    bad = tmp_path / "chip_1.tif"
    bad.write_bytes(b"\x00" * 32)
    loader = DataLoader(ds, batch_size=2, num_workers=2,
                        worker_mode="process")
    with pytest.raises(Exception):
        list(loader)


def test_worker_mode_validated():
    with pytest.raises(ValueError):
        DataLoader([], batch_size=1, worker_mode="greenlet")
