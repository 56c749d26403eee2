"""Streaming metrics, accumulated on device — no per-step host syncs.

The reference updates numpy metrics with a ``.cpu().numpy()`` transfer every
step (segmentation.py:143-151), a device→host sync the TPU rebuild removes:
metric state here is a small pytree of integer/float accumulators carried
through the jitted step function, with a single host transfer per epoch at
``compute()`` time. Metric *formulas* match the reference ``metrics.py``
exactly (validated against scikit-learn in tests, like the reference's own
test suite).

States provided:
* :class:`ConfusionMatrix` — acc / precision / recall / F1 / IoU, macro +
  per-class (reference metrics.py:63-171);
* :class:`AucHistogram` — 1024-bin one-vs-rest streaming ROC-AUC
  (metrics.py:179-281);
* :class:`RegressionStats` — RMSE / MAE / R² / Pearson / expected-error
  (metrics.py:289-420).

Numpy wrappers (``RunningConfusionMatrix`` etc.) expose the reference's
host-side API for non-jit consumers (data QA, the web backend).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def _safe_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    den = np.asarray(den, dtype=float)
    out = np.zeros_like(den, dtype=float)
    np.divide(num, den, out=out, where=den != 0)
    return out


# ---------------------------------------------------------------------------
# Confusion matrix
# ---------------------------------------------------------------------------


def _two_sum(hi: jnp.ndarray, lo: jnp.ndarray, x: jnp.ndarray):
    """Compensated (Knuth TwoSum) accumulation: ``hi + lo`` stays exact.

    Per-batch CM updates are exact integers in f32 (≤ 2^24 counts per
    batch), but a single f32 — or int32 — accumulator overflows on
    epochs beyond ~2·10⁹ labeled pixels (≈ 43k chips of 224²; int32 CMs
    go NEGATIVE there). Two f32 words give ~2^48 of exact integer range
    with TPU-native arithmetic (no x64, no scatter, no host syncs).
    """
    s = hi + x
    bb = s - hi
    err = (hi - (s - bb)) + (x - bb)
    return s, lo + err


@flax.struct.dataclass
class ConfusionMatrix:
    """Device-side streaming confusion matrix (single-label)."""

    matrix: jnp.ndarray  # (C, C) f32 high word (exact with matrix_lo)
    matrix_lo: jnp.ndarray  # (C, C) f32 compensation word
    total: jnp.ndarray  # scalar f32 high word
    total_lo: jnp.ndarray  # scalar f32 compensation word

    @classmethod
    def empty(cls, num_classes: int) -> "ConfusionMatrix":
        z = jnp.zeros((num_classes, num_classes), jnp.float32)
        return cls(matrix=z, matrix_lo=z,
                   total=jnp.zeros((), jnp.float32),
                   total_lo=jnp.zeros((), jnp.float32))

    def update(
        self,
        y_true: jnp.ndarray,
        y_pred: jnp.ndarray,
        ignore_index: Optional[int] = None,
    ) -> "ConfusionMatrix":
        """Accumulate a batch. Any shapes; invalid labels are masked out.

        The CM is computed as a one-hot contraction (``Tᵀ·P``) rather than a
        scatter-add: a megapixel batch's scatter serializes on TPU (~seconds
        per step), while the (N, C)×(N, C) matmul runs on the MXU in
        microseconds.
        """
        c = self.matrix.shape[0]
        y_true = y_true.reshape(-1).astype(jnp.int32)
        y_pred = y_pred.reshape(-1).astype(jnp.int32)
        # Out-of-range labels/preds (stray negatives, >= C) are masked, not
        # clipped into edge classes, so they never skew accuracy/IoU.
        valid = ((y_true >= 0) & (y_true < c)
                 & (y_pred >= 0) & (y_pred < c))
        if ignore_index is not None:
            valid &= y_true != ignore_index
        yt = jnp.clip(y_true, 0, c - 1)
        yp = jnp.clip(y_pred, 0, c - 1)

        def seg_update(m_hi, m_lo, yt_s, yp_s, valid_s):
            t_oh = jax.nn.one_hot(yt_s, c, dtype=jnp.bfloat16)
            t_oh = t_oh * valid_s[:, None].astype(jnp.bfloat16)
            p_oh = jax.nn.one_hot(yp_s, c, dtype=jnp.bfloat16)
            upd = jax.lax.dot_general(
                t_oh, p_oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return _two_sum(m_hi, m_lo, upd)

        # The dot_general's f32 reduction is exact only up to 2^24 counts
        # per cell; composed eval batches (batch x sliding-window crops)
        # reach 1e8 pixels per update, where a dominant class would
        # silently lose +1s BEFORE the two-sum compensation sees them.
        # Segments of 2^23 keep each partial exact (and bound the one-hot
        # operands' memory at mega-batches).
        n = yt.shape[0]
        seg = 1 << 23
        if n <= seg:
            m_hi, m_lo = seg_update(self.matrix, self.matrix_lo, yt, yp,
                                    valid)
        else:
            pad = (-n) % seg
            yts = jnp.pad(yt, (0, pad)).reshape(-1, seg)
            yps = jnp.pad(yp, (0, pad)).reshape(-1, seg)
            vs = jnp.pad(valid, (0, pad)).reshape(-1, seg)  # pads False

            def body(carry, xs):
                return seg_update(*carry, *xs), None

            (m_hi, m_lo), _ = jax.lax.scan(
                body, (self.matrix, self.matrix_lo), (yts, yps, vs))

        # Exact valid count: int32 sum (exact to 2^31), split into two
        # f32-exact words before entering the compensated total.
        cnt = valid.sum(dtype=jnp.int32)
        t_hi, t_lo = _two_sum(self.total, self.total_lo,
                              ((cnt >> 12) << 12).astype(jnp.float32))
        t_hi, t_lo = _two_sum(t_hi, t_lo, (cnt & 0xFFF).astype(jnp.float32))
        return ConfusionMatrix(matrix=m_hi, matrix_lo=m_lo,
                               total=t_hi, total_lo=t_lo)

    def merge(self, other: "ConfusionMatrix") -> "ConfusionMatrix":
        m_hi, m_lo = _two_sum(self.matrix, self.matrix_lo + other.matrix_lo,
                              other.matrix)
        t_hi, t_lo = _two_sum(self.total, self.total_lo + other.total_lo,
                              other.total)
        return ConfusionMatrix(matrix=m_hi, matrix_lo=m_lo,
                               total=t_hi, total_lo=t_lo)

    def compute(self, include_per_class: bool = True) -> Dict:
        """Host-side finalize; formulas match reference metrics.py:125-166."""
        m = (np.asarray(jax.device_get(self.matrix), dtype=np.float64)
             + np.asarray(jax.device_get(self.matrix_lo), dtype=np.float64))
        m = np.rint(m).astype(np.int64)
        total = int(round(float(jax.device_get(self.total))
                          + float(jax.device_get(self.total_lo))))
        tp = np.diag(m)
        fp = m.sum(axis=0) - tp
        fn = m.sum(axis=1) - tp
        precision = _safe_div(tp, tp + fp)
        recall = _safe_div(tp, tp + fn)
        f1 = _safe_div(2 * precision * recall, precision + recall)
        jaccard = _safe_div(tp, tp + fp + fn)
        out: Dict = {
            "accuracy": tp.sum() / total if total else float("nan"),
            "precision": precision.mean(),
            "recall": recall.mean(),
            "f1": f1.mean(),
            "jaccard": jaccard.mean(),
        }
        if include_per_class:
            out.update(
                {
                    "precision_per_class": precision.tolist(),
                    "recall_per_class": recall.tolist(),
                    "f1_per_class": f1.tolist(),
                    "jaccard_per_class": jaccard.tolist(),
                }
            )
        return out


# ---------------------------------------------------------------------------
# Histogram ROC-AUC (one-vs-rest)
# ---------------------------------------------------------------------------


def _hist_factors(n_bins: int) -> Tuple[int, int]:
    """Factor n_bins into (hi, lo) with hi the largest divisor <= sqrt."""
    h = int(n_bins ** 0.5)
    while n_bins % h:
        h -= 1
    return h, n_bins // h


@flax.struct.dataclass
class AucHistogram:
    """Device-side histogram ROC-AUC state (reference metrics.py:179-281)."""

    pos_hist: jnp.ndarray  # (C, n_bins) int32
    neg_hist: jnp.ndarray  # (C, n_bins) int32

    @classmethod
    def empty(cls, num_classes: int, n_bins: int = 1024) -> "AucHistogram":
        return cls(
            pos_hist=jnp.zeros((num_classes, n_bins), jnp.int32),
            neg_hist=jnp.zeros((num_classes, n_bins), jnp.int32),
        )

    def update(
        self,
        y_true: jnp.ndarray,
        y_score: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
    ) -> "AucHistogram":
        """y_true (N,), y_score (N, C) probabilities in [0, 1].

        Histogramming is done as one-hot matmuls, not scatter-adds: a
        megapixel scatter serializes on TPU, while two (h, N)×(N, l)
        contractions per class run on the MXU. The bin index is decomposed
        as ``bin = hi·l + lo`` so the one-hots stay (N, 32) instead of
        (N, 1024), keeping peak memory ~32x smaller.
        """
        c, n_bins = self.pos_hist.shape
        nh, nl = _hist_factors(n_bins)
        y_true = y_true.reshape(-1).astype(jnp.int32)
        y_score = y_score.reshape(-1, c)
        if valid is None:
            valid = jnp.ones_like(y_true, dtype=bool)
        else:
            valid = valid.reshape(-1)
        # bin = floor(clip(score) * (n_bins - 1))  (reference _bin, :209-212)
        bins = jnp.floor(jnp.clip(y_score, 0.0, 1.0) * (n_bins - 1)).astype(jnp.int32)
        contract = (((0,), (0,)), ((), ()))

        def seg_hists(yt_s, bins_s, v_s):
            pos_rows, neg_rows = [], []
            for ci in range(c):  # C is small and static (2-13 classes)
                oh_hi = jax.nn.one_hot(bins_s[:, ci] // nl, nh,
                                       dtype=jnp.bfloat16)
                oh_lo = jax.nn.one_hot(bins_s[:, ci] % nl, nl,
                                       dtype=jnp.bfloat16)
                is_pos = (yt_s == ci) & v_s
                is_neg = (yt_s != ci) & v_s
                pos2d = jax.lax.dot_general(
                    oh_hi * is_pos[:, None].astype(jnp.bfloat16), oh_lo,
                    contract, preferred_element_type=jnp.float32)
                neg2d = jax.lax.dot_general(
                    oh_hi * is_neg[:, None].astype(jnp.bfloat16), oh_lo,
                    contract, preferred_element_type=jnp.float32)
                pos_rows.append(pos2d.reshape(n_bins))
                neg_rows.append(neg2d.reshape(n_bins))
            return jnp.stack(pos_rows), jnp.stack(neg_rows)

        # Segmented like ConfusionMatrix.update: the per-update f32
        # reduction is exact only to 2^24 counts per bin, and composed
        # eval batches reach 1e8 pixels; int32 epoch totals stay exact.
        n = y_true.shape[0]
        seg = 1 << 23
        if n <= seg:
            pos2, neg2 = seg_hists(y_true, bins, valid)
            return AucHistogram(
                pos_hist=self.pos_hist + pos2.astype(jnp.int32),
                neg_hist=self.neg_hist + neg2.astype(jnp.int32),
            )
        pad = (-n) % seg
        yts = jnp.pad(y_true, (0, pad)).reshape(-1, seg)
        binss = jnp.pad(bins, ((0, pad), (0, 0))).reshape(-1, seg, c)
        vs = jnp.pad(valid, (0, pad)).reshape(-1, seg)  # pads False

        def body(carry, xs):
            ph, nh_ = carry
            p2, n2 = seg_hists(*xs)
            return (ph + p2.astype(jnp.int32),
                    nh_ + n2.astype(jnp.int32)), None

        (ph, nh_), _ = jax.lax.scan(
            body, (self.pos_hist, self.neg_hist), (yts, binss, vs))
        return AucHistogram(pos_hist=ph, neg_hist=nh_)

    def score(self, include_per_class: bool = True) -> Dict:
        """Host-side AUC via cumulative histograms (metrics.py:246-274)."""
        pos = np.asarray(jax.device_get(self.pos_hist), dtype=np.float64)
        neg = np.asarray(jax.device_get(self.neg_hist), dtype=np.float64)
        n_pos = pos.sum(axis=1)
        n_neg = neg.sum(axis=1)
        cum_neg_before = np.cumsum(neg, axis=1) - neg
        auc_num = (pos * cum_neg_before).sum(axis=1) + 0.5 * (pos * neg).sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            per_class = np.where(
                (n_pos > 0) & (n_neg > 0), auc_num / (n_pos * n_neg), np.nan
            )
        macro = np.nanmean(per_class) if not np.all(np.isnan(per_class)) else float("nan")
        if include_per_class:
            return {"roc_auc_macro": macro, "roc_auc_per_class": per_class.tolist()}
        return {"roc_auc_macro": macro}


# ---------------------------------------------------------------------------
# Regression statistics
# ---------------------------------------------------------------------------


def _acc_pair(pair: jnp.ndarray, add: jnp.ndarray) -> jnp.ndarray:
    """Add ``add`` into a (2,) [hi, lo] compensated f32 pair."""
    hi, lo = _two_sum(pair[0], pair[1], add)
    return jnp.stack([hi, lo])


@flax.struct.dataclass
class RegressionStats:
    """Device-side sum statistics for streaming regression metrics.

    Each statistic is a (2,) [hi, lo] compensated f32 pair (x64 is off on
    TPU): R²/Pearson are computed as ``sum_x2 − n·x̄²`` — a catastrophic
    cancellation that amplifies plain-f32 accumulator rounding into
    multi-percent metric errors over long epochs when labels' mean ≫ std
    (the same failure the ConfusionMatrix's two-sum guards against).
    """

    n: jnp.ndarray
    sum_x: jnp.ndarray
    sum_y: jnp.ndarray
    sum_xy: jnp.ndarray
    sum_x2: jnp.ndarray
    sum_y2: jnp.ndarray
    sum_abs_error: jnp.ndarray
    sum_squared_error: jnp.ndarray
    within_ee_count: jnp.ndarray

    @classmethod
    def empty(cls) -> "RegressionStats":
        z = jnp.zeros((2,), jnp.float32)
        return cls(n=z, sum_x=z, sum_y=z, sum_xy=z, sum_x2=z, sum_y2=z,
                   sum_abs_error=z, sum_squared_error=z, within_ee_count=z)

    def update(
        self,
        y_true: jnp.ndarray,
        y_pred: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
        ee_bias: float = 0.05,
        ee_coef: float = 0.15,
    ) -> "RegressionStats":
        x = y_true.reshape(-1).astype(jnp.float32)
        y = y_pred.reshape(-1).astype(jnp.float32)
        if valid is None:
            v = jnp.ones_like(x)
        else:
            v = valid.reshape(-1).astype(jnp.float32)
        x = x * v
        y = y * v
        abs_err = jnp.abs(y - x)
        within = (abs_err <= ee_bias + ee_coef * x).astype(jnp.float32) * v
        return RegressionStats(
            n=_acc_pair(self.n, v.sum()),
            sum_x=_acc_pair(self.sum_x, x.sum()),
            sum_y=_acc_pair(self.sum_y, y.sum()),
            sum_xy=_acc_pair(self.sum_xy, (x * y).sum()),
            sum_x2=_acc_pair(self.sum_x2, (x * x).sum()),
            sum_y2=_acc_pair(self.sum_y2, (y * y).sum()),
            sum_abs_error=_acc_pair(self.sum_abs_error, (abs_err * v).sum()),
            sum_squared_error=_acc_pair(self.sum_squared_error,
                                        (abs_err * abs_err * v).sum()),
            within_ee_count=_acc_pair(self.within_ee_count, within.sum()),
        )

    def compute(self, include_ee: bool = False, ee_bias: float = 0.05,
                ee_coef: float = 0.15) -> Dict:
        s = {}
        for k in ("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2",
                  "sum_abs_error", "sum_squared_error", "within_ee_count"):
            pair = np.asarray(jax.device_get(getattr(self, k)), np.float64)
            s[k] = float(pair[0] + pair[1])
        return _finalize_regression(s, include_ee, ee_bias, ee_coef)


def _finalize_regression(s: Dict[str, float], include_ee: bool,
                         ee_bias: float, ee_coef: float) -> Dict:
    """Metric formulas from raw sums (shared by the device state and the
    numpy RunningRegressionMetrics wrapper — one copy of the math)."""
    n = s["n"]
    if n == 0:
        nan = float("nan")
        return {"mae": nan, "rmse": nan, "r2_score": nan,
                "pearson_corrcoef": nan, "ee_percentage": None,
                "ee_bias": ee_bias, "ee_coef": ee_coef}
    mae = s["sum_abs_error"] / n
    rmse = float(np.sqrt(s["sum_squared_error"] / n))
    x_mean = s["sum_x"] / n
    y_mean = s["sum_y"] / n
    ss_tot = s["sum_x2"] - n * x_mean * x_mean
    r2 = 1 - s["sum_squared_error"] / ss_tot if (n >= 2 and ss_tot != 0) else float("nan")
    cov = s["sum_xy"] - n * x_mean * y_mean
    std_x = np.sqrt(max(s["sum_x2"] - n * x_mean * x_mean, 0.0))
    std_y = np.sqrt(max(s["sum_y2"] - n * y_mean * y_mean, 0.0))
    pearson = cov / (std_x * std_y) if (n >= 2 and std_x and std_y) else float("nan")
    return {
        "mae": mae,
        "rmse": rmse,
        "r2_score": r2,
        "pearson_corrcoef": pearson,
        "ee_percentage": (s["within_ee_count"] / n * 100) if include_ee else None,
        "ee_bias": ee_bias,
        "ee_coef": ee_coef,
    }


# ---------------------------------------------------------------------------
# Numpy wrappers with the reference's host-side API
# ---------------------------------------------------------------------------


class RunningConfusionMatrix:
    """Numpy streaming confusion matrix (reference API, metrics.py:63-171)."""

    def __init__(self, num_classes: int, ignore_index: Optional[int] = None) -> None:
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def update(self, y_true, y_pred) -> None:
        y_true = np.asarray(y_true).ravel()
        y_pred = np.asarray(y_pred).ravel()
        if y_true.shape != y_pred.shape:
            raise ValueError("y_true and y_pred shapes differ.")
        if self.ignore_index is not None:
            mask = y_true != self.ignore_index
            y_true, y_pred = y_true[mask], y_pred[mask]
        if y_true.size == 0:
            return
        k = self.num_classes
        binc = np.bincount(y_true * k + y_pred, minlength=k * k)
        self.matrix += binc.reshape(k, k)
        self.total += y_true.size

    def compute(self, include_per_class: bool = True) -> Dict:
        # Split the exact int64 host counts into the device state's
        # (hi, lo) f32 representation losslessly.
        m64 = self.matrix.astype(np.float64)
        m_hi = m64.astype(np.float32)
        m_lo = (m64 - m_hi.astype(np.float64)).astype(np.float32)
        t64 = float(self.total)
        t_hi = np.float32(t64)
        state = ConfusionMatrix(
            matrix=jnp.asarray(m_hi),
            matrix_lo=jnp.asarray(m_lo),
            total=jnp.asarray(t_hi),
            total_lo=jnp.asarray(np.float32(t64 - float(t_hi))),
        )
        return state.compute(include_per_class)

    def reset(self) -> None:
        self.matrix = np.zeros((self.num_classes, self.num_classes), np.int64)
        self.total = 0


class RunningAUC:
    """Numpy streaming ROC-AUC (reference API, metrics.py:179-281)."""

    def __init__(self, num_classes: int, n_bins: int = 1024,
                 min_score: float = 0.0, max_score: float = 1.0) -> None:
        self.num_classes = num_classes
        self.n_bins = n_bins
        self.min_score = min_score
        self.max_score = max_score
        self.reset()

    def update(self, y_true, y_score) -> None:
        y_true = np.asarray(y_true).ravel()
        y_score = np.asarray(y_score)
        if y_score.ndim == 1:
            if self.num_classes != 2:
                raise ValueError("For 1-D y_score, num_classes must be 2.")
            y_score = np.stack([1 - y_score, y_score], axis=1)
        if y_true.shape[0] != y_score.shape[0]:
            raise ValueError("y_true and y_score length mismatch.")
        if y_score.shape[1] != self.num_classes:
            raise ValueError("Second dim of y_score must equal num_classes.")
        span = self.max_score - self.min_score
        norm = (np.clip(y_score, self.min_score, self.max_score) - self.min_score) / span
        bins = (norm * (self.n_bins - 1)).astype(np.int64)
        for cls in range(self.num_classes):
            pos = y_true == cls
            self.pos_hist[cls] += np.bincount(bins[pos, cls], minlength=self.n_bins)
            self.neg_hist[cls] += np.bincount(bins[~pos, cls], minlength=self.n_bins)

    def score(self, include_per_class: bool = True) -> Dict:
        state = AucHistogram(
            pos_hist=jnp.asarray(self.pos_hist, jnp.int32),
            neg_hist=jnp.asarray(self.neg_hist, jnp.int32),
        )
        return state.score(include_per_class)

    def reset(self) -> None:
        self.pos_hist = np.zeros((self.num_classes, self.n_bins), np.int64)
        self.neg_hist = np.zeros((self.num_classes, self.n_bins), np.int64)


class RunningRegressionMetrics:
    """Numpy streaming regression metrics (reference API, metrics.py:289-420)."""

    def __init__(self, ee_bias: float = 0.05, ee_coef: float = 0.15,
                 include_ee: bool = False) -> None:
        self.ee_bias = ee_bias
        self.ee_coef = ee_coef
        self.include_ee = include_ee
        self.reset()

    def update(self, y_true, y_pred) -> None:
        y_true = np.asarray(y_true, dtype=np.float64).ravel()
        y_pred = np.asarray(y_pred, dtype=np.float64).ravel()
        if y_true.shape != y_pred.shape:
            raise ValueError("y_true and y_pred shapes differ.")
        self.n += y_true.size
        self.sum_x += y_true.sum()
        self.sum_y += y_pred.sum()
        self.sum_xy += (y_true * y_pred).sum()
        self.sum_x2 += (y_true * y_true).sum()
        self.sum_y2 += (y_pred * y_pred).sum()
        abs_err = np.abs(y_pred - y_true)
        self.sum_abs_error += abs_err.sum()
        self.sum_squared_error += (abs_err * abs_err).sum()
        self.within_ee_count += np.sum(abs_err <= self.ee_bias + self.ee_coef * y_true)

    def compute(self) -> Dict:
        # Same finalize as the device state — one copy of the formulas.
        s = {k: float(getattr(self, k)) for k in (
            "n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2",
            "sum_abs_error", "sum_squared_error", "within_ee_count")}
        return _finalize_regression(s, self.include_ee, self.ee_bias,
                                    self.ee_coef)

    def reset(self) -> None:
        self.n = 0
        self.sum_x = self.sum_y = self.sum_xy = 0.0
        self.sum_x2 = self.sum_y2 = 0.0
        self.sum_abs_error = self.sum_squared_error = 0.0
        self.within_ee_count = 0
