"""Stats-mode semantics + assorted edge-path tests."""

import numpy as np
import pytest

from instageo_tpu.train.stats import compute_class_weights, compute_stats


def test_compute_stats_matches_reference_semantics():
    """Per-band mean and average-of-batch-variances (not pooled variance)."""
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(3):
        x = rng.normal(loc=[1.0, 2.0], scale=[0.5, 1.5],
                       size=(4, 8, 8, 2)).transpose(0, 3, 1, 2)
        x = x[:, :, None]  # (B, C, T, H, W)
        y = rng.integers(-1, 3, size=(4, 8, 8))
        batches.append((x.astype(np.float32), y))
    mean, std, cw = compute_stats(iter(batches))
    assert len(mean) == 2 and len(std) == 2
    assert mean[0] == pytest.approx(1.0, abs=0.1)
    assert mean[1] == pytest.approx(2.0, abs=0.2)
    assert std[0] == pytest.approx(0.5, abs=0.1)
    assert std[1] == pytest.approx(1.5, abs=0.2)
    # ignore label -1 removed from class weights
    assert cw is not None and len(cw) == 3
    assert all(w > 0 for w in cw)


def test_compute_stats_regression_skips_weights():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 2, 1, 8, 8)).astype(np.float32)
    y = rng.normal(size=(4, 8, 8)).astype(np.float32)
    mean, std, cw = compute_stats(iter([(x, y)]), is_reg_task=True)
    assert cw is None


def test_compute_class_weights_formula():
    # total/(n_classes*count), indexed list up to max class
    cw = compute_class_weights({0: 75, 2: 25})
    assert cw[0] == pytest.approx(100 / (2 * 75))
    assert cw[1] == 0.0
    assert cw[2] == pytest.approx(100 / (2 * 25))


def test_empty_stats():
    mean, std, cw = compute_stats(iter([]))
    assert mean == [] and std == [] and cw is None


def test_granule_inference_multiband_temporal():
    import jax

    from instageo_tpu.models.seg import create_prithvi_seg
    from instageo_tpu.serve.granule import granule_inference

    rng = np.random.default_rng(2)
    # T=2 x 6 bands stacked (b0_t0..b5_t0, b0_t1..)
    tile = rng.integers(1, 10000, size=(12, 64, 64)).astype(np.uint16)
    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=2,
                               temporal_step=2, image_size=32, num_bands=6)
    v = model.init(jax.random.PRNGKey(0),
                   jax.numpy.zeros((1, 6, 2, 32, 32)))
    pred, _ = granule_inference(tile, model, v, mean=[5000.0] * 6,
                                std=[3000.0] * 6, chip_size=32,
                                temporal_size=2, batch_size=4)
    assert pred.shape == (64, 64)
