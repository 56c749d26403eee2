"""Numeric-exactness tests for the streaming metric accumulators:
mega-batch confusion-matrix updates (f32 dot_general is exact only to
2^24 counts per cell — updates are segmented) and compensated regression
sums (R2/Pearson are catastrophic cancellations of the raw sums)."""

import numpy as np

import jax.numpy as jnp

from instageo_tpu.train.metrics import ConfusionMatrix, RegressionStats


def test_confusion_matrix_exact_beyond_f32_mantissa_in_one_update():
    """A single update with >2^24 pixels of one class must count exactly
    (an unsegmented f32 reduction saturates at 16,777,216)."""
    n = (1 << 24) + 1_000_000  # 17.8M pixels, all class 0 -> one CM cell
    y = jnp.zeros((n,), jnp.int32)
    cm = ConfusionMatrix.empty(2).update(y, y)
    counts = np.asarray(cm.matrix, np.float64) + np.asarray(
        cm.matrix_lo, np.float64)
    assert int(round(counts[0, 0])) == n
    total = float(cm.total) + float(cm.total_lo)
    assert int(round(total)) == n
    out = cm.compute()
    assert out["accuracy"] == 1.0


def test_confusion_matrix_segmented_matches_small_updates():
    """Segmented mega-update == many small updates (same counts)."""
    rng = np.random.default_rng(0)
    n = (1 << 23) + 12345  # crosses one segment boundary
    yt = rng.integers(0, 3, n).astype(np.int32)
    yp = rng.integers(0, 3, n).astype(np.int32)
    big = ConfusionMatrix.empty(3).update(jnp.asarray(yt), jnp.asarray(yp))
    small = ConfusionMatrix.empty(3)
    for i in range(0, n, 1 << 20):
        small = small.update(jnp.asarray(yt[i:i + (1 << 20)]),
                             jnp.asarray(yp[i:i + (1 << 20)]))
    np.testing.assert_array_equal(
        np.asarray(big.matrix, np.float64) + np.asarray(big.matrix_lo,
                                                        np.float64),
        np.asarray(small.matrix, np.float64) + np.asarray(small.matrix_lo,
                                                          np.float64))


def test_regression_stats_compensated_accumulation():
    """Many updates with mean >> std: R2/Pearson from the compensated
    pairs must match a float64 oracle (plain f32 accumulators lose the
    variance to cancellation)."""
    rng = np.random.default_rng(1)
    n_updates, per = 400, 20_000
    xs = rng.normal(200.0, 3.0, size=(n_updates, per)).astype(np.float32)
    ys = (xs + rng.normal(0.0, 1.0, size=xs.shape)).astype(np.float32)

    state = RegressionStats.empty()
    for i in range(n_updates):
        state = state.update(jnp.asarray(xs[i]), jnp.asarray(ys[i]))
    got = state.compute()

    x = xs.astype(np.float64).ravel()
    y = ys.astype(np.float64).ravel()
    ss_res = ((y - x) ** 2).sum()
    ss_tot = ((x - x.mean()) ** 2).sum()
    want_r2 = 1 - ss_res / ss_tot
    want_p = np.corrcoef(x, y)[0, 1]
    assert abs(got["r2_score"] - want_r2) < 5e-3, (got["r2_score"], want_r2)
    assert abs(got["pearson_corrcoef"] - want_p) < 5e-3
    assert abs(got["rmse"] - np.sqrt(ss_res / x.size)) < 1e-3
