"""Granule-scale streaming inference tests."""

import numpy as np

import jax

from instageo_tpu.data.geotiff import Affine, GeoTiffReader, write_geotiff
from instageo_tpu.models.seg import create_prithvi_seg
from instageo_tpu.serve.granule import granule_inference, granule_inference_to_file


def _model():
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=2,
                               image_size=32, num_bands=6)
    x0 = np.zeros((1, 6, 1, 32, 32), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(x0))
    return model, variables


def test_granule_inference_stitches_grid():
    rng = np.random.default_rng(0)
    tile = rng.integers(1, 10000, size=(6, 96, 128)).astype(np.uint16)
    model, variables = _model()
    pred, dt = granule_inference(
        tile, model, variables, mean=[5000.0] * 6, std=[3000.0] * 6,
        chip_size=32, batch_size=4)
    assert pred.shape == (96, 128)  # 3x4 chips, whole-chip crop
    assert pred.dtype == np.int8
    assert set(np.unique(pred)) <= {0, 1}

    # Stitching parity: each chip individually predicted matches its window.
    from instageo_tpu.ops.preprocess import make_fused_predict_fn

    predict = make_fused_predict_fn(model, variables, [5000.0] * 6,
                                    [3000.0] * 6)
    one = np.asarray(predict(jax.numpy.asarray(tile[None, :, 32:64, 64:96])))
    np.testing.assert_array_equal(pred[32:64, 64:96], one[0])


def test_granule_inference_to_file(tmp_path):
    rng = np.random.default_rng(1)
    tile = rng.integers(1, 10000, size=(6, 64, 64)).astype(np.uint16)
    src = str(tmp_path / "granule.tif")
    write_geotiff(src, tile, transform=Affine.from_origin(499980, 4100040, 30, 30),
                  crs=32633, nodata=0)
    model, variables = _model()
    out = granule_inference_to_file(
        src, str(tmp_path / "pred.tif"), model, variables,
        mean=[5000.0] * 6, std=[3000.0] * 6, chip_size=32, batch_size=4)
    with GeoTiffReader(out) as r:
        assert (r.width, r.height) == (64, 64)
        assert r.crs == 32633
        assert r.transform.c == 499980
        arr = r.read(1)
    assert arr.dtype == np.int8


def test_granule_full_coverage_of_remainders():
    """Non-multiple tiles are fully covered: the last chip row/col clamps
    to the tile edge (a 3660px HLS tile no longer loses its 76px strip)."""
    rng = np.random.default_rng(2)
    tile = rng.integers(1, 10000, size=(6, 80, 100)).astype(np.uint16)
    model, variables = _model()
    pred, _ = granule_inference(
        tile, model, variables, mean=[5000.0] * 6, std=[3000.0] * 6,
        chip_size=32, batch_size=4)
    assert pred.shape == (80, 100)

    from instageo_tpu.ops.preprocess import make_fused_predict_fn

    predict = make_fused_predict_fn(model, variables, [5000.0] * 6,
                                    [3000.0] * 6)
    # The bottom-right corner comes from the edge-clamped chip at (68, 48).
    corner = np.asarray(predict(
        jax.numpy.asarray(tile[None, :, 48:80, 68:100])))
    np.testing.assert_array_equal(pred[48:, 68:], corner[0])


def test_granule_overlap_discards_borders():
    rng = np.random.default_rng(3)
    tile = rng.integers(1, 10000, size=(6, 96, 96)).astype(np.uint16)
    model, variables = _model()
    pred, _ = granule_inference(
        tile, model, variables, mean=[5000.0] * 6, std=[3000.0] * 6,
        chip_size=32, batch_size=8, overlap=4)
    assert pred.shape == (96, 96)

    from instageo_tpu.ops.preprocess import make_fused_predict_fn

    predict = make_fused_predict_fn(model, variables, [5000.0] * 6,
                                    [3000.0] * 6)
    # An interior chip's CENTER must match its standalone prediction (the
    # center is never overwritten by a later chip's interior).
    cx = cy = 48  # a chip start (stride 24: starts 0,24,48,...)
    one = np.asarray(predict(
        jax.numpy.asarray(tile[None, :, cy:cy + 32, cx:cx + 32])))
    np.testing.assert_array_equal(
        pred[cy + 12:cy + 20, cx + 12:cx + 20], one[0, 12:20, 12:20])

    import pytest as _pytest
    with _pytest.raises(ValueError):
        granule_inference(tile, model, variables, mean=[5000.0] * 6,
                          std=[3000.0] * 6, chip_size=32, overlap=16)


def test_granule_nodata_pixels_masked():
    """Pixels with no input data in any band get -1 (seg) in the stitched
    prediction instead of a confident class (review fix)."""
    model, variables = _model()
    tile = np.random.default_rng(0).uniform(
        1, 10, size=(6, 64, 64)).astype(np.float32)
    tile[:, :8, :8] = 0.0  # all-band nodata corner
    pred, _ = granule_inference(
        tile, model, variables, mean=[5.0] * 6, std=[3.0] * 6,
        chip_size=32, no_data_value=0)
    assert (pred[:8, :8] == -1).all()
    assert (pred[16:, 16:] >= 0).all()


def test_granule_nodata_mask_uses_selected_bands():
    """A pixel that is fill in every band the MODEL sees must come back
    -1 even when an unselected (e.g. QA) band has valid data there."""
    rng = np.random.default_rng(3)
    # 8-band stack; the model uses bands 0-5, band 6/7 are QA-like.
    tile = rng.integers(1, 10000, size=(8, 32, 32)).astype(np.uint16)
    tile[:6, :8, :8] = 0          # model bands: fill in the corner
    tile[6:, :, :] = 7            # QA bands valid EVERYWHERE
    model, variables = _model()
    pred, _ = granule_inference(
        tile, model, variables, mean=[5000.0] * 6, std=[3000.0] * 6,
        chip_size=32, batch_size=1, bands=[0, 1, 2, 3, 4, 5],
        no_data_value=0)
    assert (pred[:8, :8] == -1).all()
    assert (pred[8:, 8:] != -1).all()
