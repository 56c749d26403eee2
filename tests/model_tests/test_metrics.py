"""Metric correctness vs scikit-learn/scipy (the reference's own test style)."""

import numpy as np
import pytest
from scipy import stats as scipy_stats
from sklearn import metrics as skm

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from instageo_tpu.train.losses import (
    kl_distillation_loss,
    masked_cross_entropy,
    masked_mse,
)
from instageo_tpu.train.metrics import (
    AucHistogram,
    ConfusionMatrix,
    RegressionStats,
    RunningAUC,
    RunningConfusionMatrix,
    RunningRegressionMetrics,
)


@pytest.fixture
def cls_data():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 3, size=5000)
    y_pred = rng.integers(0, 3, size=5000)
    return y_true, y_pred


def test_confusion_matrix_vs_sklearn(cls_data):
    y_true, y_pred = cls_data
    cm = ConfusionMatrix.empty(3)
    # stream in chunks
    for i in range(0, len(y_true), 1300):
        cm = cm.update(jnp.asarray(y_true[i:i + 1300]), jnp.asarray(y_pred[i:i + 1300]))
    m = cm.compute()
    assert m["accuracy"] == pytest.approx(skm.accuracy_score(y_true, y_pred))
    assert m["precision"] == pytest.approx(
        skm.precision_score(y_true, y_pred, average="macro"))
    assert m["recall"] == pytest.approx(skm.recall_score(y_true, y_pred, average="macro"))
    assert m["f1"] == pytest.approx(skm.f1_score(y_true, y_pred, average="macro"))
    assert m["jaccard"] == pytest.approx(
        skm.jaccard_score(y_true, y_pred, average="macro"))
    np.testing.assert_allclose(
        m["jaccard_per_class"], skm.jaccard_score(y_true, y_pred, average=None))


def test_confusion_matrix_ignore_index(cls_data):
    y_true, y_pred = cls_data
    y_true = y_true.copy()
    y_true[::7] = -1
    cm = ConfusionMatrix.empty(3).update(
        jnp.asarray(y_true), jnp.asarray(y_pred), ignore_index=-1)
    keep = y_true != -1
    assert cm.compute()["accuracy"] == pytest.approx(
        skm.accuracy_score(y_true[keep], y_pred[keep]))

    # numpy wrapper parity
    r = RunningConfusionMatrix(3, ignore_index=-1)
    r.update(y_true, y_pred)
    assert r.compute()["f1"] == pytest.approx(cm.compute()["f1"])


def test_auc_histogram_vs_sklearn():
    rng = np.random.default_rng(1)
    n, c = 20000, 3
    y_true = rng.integers(0, c, size=n)
    logits = rng.standard_normal((n, c)) + np.eye(c)[y_true] * 1.5
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)

    auc = AucHistogram.empty(c)
    for i in range(0, n, 4096):
        auc = auc.update(jnp.asarray(y_true[i:i + 4096]), jnp.asarray(probs[i:i + 4096]))
    ours = auc.score()["roc_auc_macro"]
    ref = skm.roc_auc_score(y_true, probs, multi_class="ovr", average="macro")
    assert ours == pytest.approx(ref, abs=2e-3)  # 1024-bin histogram error

    r = RunningAUC(c)
    r.update(y_true, probs)
    assert r.score()["roc_auc_macro"] == pytest.approx(ours, abs=1e-6)


def test_auc_binary_1d_scores():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 4000)
    s = np.clip(rng.normal(0.5 + 0.3 * (y - 0.5) * 2, 0.2), 0, 1)
    r = RunningAUC(2)
    r.update(y, s)
    ref = skm.roc_auc_score(y, s)
    # class-1 AUC matches sklearn binary AUC
    assert r.score()["roc_auc_per_class"][1] == pytest.approx(ref, abs=2e-3)


def test_regression_stats_vs_sklearn_scipy():
    rng = np.random.default_rng(3)
    y_true = rng.normal(2.0, 1.0, 10000)
    y_pred = y_true + rng.normal(0, 0.5, 10000)

    st = RegressionStats.empty()
    for i in range(0, len(y_true), 3000):
        st = st.update(jnp.asarray(y_true[i:i + 3000]), jnp.asarray(y_pred[i:i + 3000]))
    m = st.compute(include_ee=True)
    assert m["mae"] == pytest.approx(skm.mean_absolute_error(y_true, y_pred), rel=1e-4)
    assert m["rmse"] == pytest.approx(
        np.sqrt(skm.mean_squared_error(y_true, y_pred)), rel=1e-4)
    assert m["r2_score"] == pytest.approx(skm.r2_score(y_true, y_pred), rel=1e-3)
    assert m["pearson_corrcoef"] == pytest.approx(
        scipy_stats.pearsonr(y_true, y_pred)[0], rel=1e-3)

    r = RunningRegressionMetrics(include_ee=True)
    r.update(y_true, y_pred)
    assert r.compute()["rmse"] == pytest.approx(m["rmse"], rel=1e-4)
    assert r.compute()["ee_percentage"] == pytest.approx(m["ee_percentage"], rel=1e-3)


def test_masked_cross_entropy_vs_torch():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(-1, 3, size=(2, 8, 8)).astype(np.int64)
    weights = [1.0, 3.0, 0.5]

    ours = float(masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), ignore_index=-1,
        class_weights=weights))

    crit = torch.nn.CrossEntropyLoss(
        weight=torch.tensor(weights), ignore_index=-1, reduction="none")
    loss = crit(torch.from_numpy(logits), torch.from_numpy(labels))
    mask = torch.from_numpy(labels) != -1
    ref = float(loss[mask].mean())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_masked_mse_and_log_scale():
    rng = np.random.default_rng(5)
    preds = rng.normal(1, 0.3, (2, 8, 8)).astype(np.float32)
    labels = rng.normal(1, 0.3, (2, 8, 8)).astype(np.float32)
    labels[0, 0, :] = -1.0
    ours = float(masked_mse(jnp.asarray(preds), jnp.asarray(labels), ignore_index=-1.0))
    m = labels != -1
    assert ours == pytest.approx(float(((preds - labels) ** 2)[m].mean()), rel=1e-5)

    ours_log = float(masked_mse(jnp.asarray(preds), jnp.asarray(labels),
                                ignore_index=-1.0, use_log_scale=True))
    assert ours_log == pytest.approx(
        float(((preds - np.log1p(labels)) ** 2)[m].mean()), rel=1e-4)


def test_kl_distillation_vs_torch():
    rng = np.random.default_rng(6)
    s = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    t = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    labels = rng.integers(-1, 3, size=(2, 4, 4)).astype(np.int64)

    ours = float(kl_distillation_loss(jnp.asarray(s), jnp.asarray(t),
                                      jnp.asarray(labels), ignore_index=-1))

    valid = torch.from_numpy(labels).reshape(-1) != -1
    s_t = torch.from_numpy(s).permute(0, 2, 3, 1).reshape(-1, 3)[valid]
    t_t = torch.from_numpy(t).permute(0, 2, 3, 1).reshape(-1, 3)[valid]
    ref = float(torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(s_t, dim=1), F.softmax(t_t, dim=1)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_confusion_matrix_exact_beyond_int32():
    """Epochs past 2^31 labeled pixels must not wrap (the old int32
    accumulator went negative ~43k chips of 224²); the (hi, lo) f32
    representation stays exact."""
    import jax.numpy as jnp

    from instageo_tpu.train.metrics import ConfusionMatrix, _two_sum

    cm = ConfusionMatrix.empty(2)
    chunk = float(2 ** 22)  # per-batch-scale count (< 2^24: f32-exact)
    steps = 1024            # 1024 * 2 * 2^22 = 2^33 > int32 range
    for _ in range(steps):
        upd = jnp.array([[chunk, 1.0], [0.0, chunk]], jnp.float32)
        m_hi, m_lo = _two_sum(cm.matrix, cm.matrix_lo, upd)
        t_hi, t_lo = _two_sum(cm.total, cm.total_lo, upd.sum())
        cm = ConfusionMatrix(matrix=m_hi, matrix_lo=m_lo,
                             total=t_hi, total_lo=t_lo)
    out = cm.compute(include_per_class=False)
    total = steps * (2 * 2 ** 22 + 1)
    diag = steps * 2 * 2 ** 22
    assert out["accuracy"] == pytest.approx(diag / total, abs=1e-12)
    m = (np.asarray(cm.matrix, np.float64)
         + np.asarray(cm.matrix_lo, np.float64))
    assert m[0, 0] == steps * 2 ** 22  # exact, no wrap, no rounding
    assert m[0, 1] == steps
