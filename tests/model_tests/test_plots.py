"""Regression plot tests."""

import os

import numpy as np

from instageo_tpu.train.plots import create_regression_plot


def test_create_regression_plot(tmp_path):
    rng = np.random.default_rng(0)
    labels = rng.normal(2, 1, 5000)
    preds = labels + rng.normal(0, 0.3, 5000)
    out = create_regression_plot(
        preds, labels,
        {"test_RMSE": 0.3, "test_MAE": 0.24, "test_R2": 0.91,
         "test_Pearson": 0.95},
        str(tmp_path / "reg.png"), "test")
    assert out and os.path.exists(out)
    assert os.path.getsize(out) > 10000  # real figure, not empty


def test_empty_inputs_return_none(tmp_path):
    assert create_regression_plot(
        np.array([]), np.array([]), {}, str(tmp_path / "x.png")) is None
