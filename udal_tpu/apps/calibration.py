"""Uncertainty calibration: fitting + inference-time application.

Parity with the reference calibration stack
(`/root/reference/src/calibrate_regression.py:351-1055`,
`calibrate_classification.py:52-545`, `utils_box.py:295-524`,
`utils_class.py:44-271`):

Regression (box) calibrators — six variants pickled per model:
  iso_all, ts_all, iso per-coordinate, ts per-coordinate,
  iso per-class-per-coordinate, relative iso per-class-per-coordinate
  (sigma normalized by box w/h). Isotonic regression maps predicted sigma →
  |residual| (sklearn, clip out-of-bounds); temperature scaling divides
  sigma by a scalar T fitted by gradient descent (100 steps, lr 0.1) on
  RMSE/MAE between residuals and sigma/|T| (`calibrate_regression.py:
  441-544`).

Classification calibrators — eight variants:
  {ts_all, ts_percls, iso_all, iso_percls} x {plain, "unc_" = fitted on 10
  logit samples from N(logit, sigma_mc)} (`calibrate_classification.py:
  442-545`). TS minimizes CE of logits/T; isotonic maps softmax prob →
  one-hot correctness.

Metrics: regression interval-coverage ECE (`utils_box.py:31-53`), NLL
(`utils_box.py:17-29`), RMSUE, sharpness, %-in-±sigma
(`calibrate_regression.py:231-349`); classification ECE/MCE/ACE/NLL/Brier
(`calibrate_classification.py:97-144`).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import stats
from sklearn.isotonic import IsotonicRegression


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def calc_nll(residuals: np.ndarray, box_uncert: np.ndarray) -> float:
    """Gaussian NLL of residuals under predicted sigma — `utils_box.py:17-29`."""
    nll = np.nan_to_num(stats.norm.logpdf(residuals, scale=box_uncert))
    return float(-np.sum(nll) / len(nll))


def calc_ece_regression(gt: np.ndarray, pred: np.ndarray,
                        sigma: np.ndarray, n_intervals: int = 100) -> float:
    """Interval-coverage ECE — `utils_box.py:31-53`."""
    p_m = np.linspace(0, 1, n_intervals)
    emp = []
    for p in p_m:
        fit = np.abs(pred - gt) <= np.abs(sigma * stats.norm.ppf((1 - p) / 2))
        emp.append(np.mean(fit, axis=0))
    emp = np.asarray(emp)
    if gt.ndim == 1:
        return float(np.mean(np.abs(emp - p_m)))
    return float(np.mean(np.abs(emp - p_m[:, None])))


def regression_metrics(gt: np.ndarray, pred: np.ndarray, sigma: np.ndarray
                       ) -> Dict[str, float]:
    """%-in-±sigma, ECE, NLL, RMSUE, sharpness."""
    residuals = np.abs(pred - gt)
    in_1s = float(np.mean(residuals <= sigma))
    rmsue = float(np.sqrt(np.mean((residuals - sigma) ** 2)))
    return {
        "pct_within_1sigma": in_1s,
        "ece": calc_ece_regression(gt, pred, sigma),
        "nll": calc_nll(residuals.flatten(), sigma.flatten()),
        "rmsue": rmsue,
        "sharpness": float(np.mean(sigma)),
    }


def classification_metrics(y_true_onehot: np.ndarray, probs: np.ndarray,
                           n_bins: int = 10) -> Dict[str, float]:
    """ECE/MCE/ACE/NLL/Brier — `calibrate_classification.py:97-144`."""
    conf = probs.max(-1)
    correct = (probs.argmax(-1) == y_true_onehot.argmax(-1)).astype(float)
    bins = np.linspace(0, 1, n_bins + 1)
    ece = mce = 0.0
    ace_terms = []
    for i in range(n_bins):
        m = (conf > bins[i]) & (conf <= bins[i + 1])
        if m.sum() == 0:
            continue
        gap = abs(correct[m].mean() - conf[m].mean())
        ece += m.mean() * gap
        mce = max(mce, gap)
        ace_terms.append(gap)
    eps = 1e-12
    nll = float(-np.mean(np.sum(y_true_onehot * np.log(probs + eps), -1)))
    brier = float(np.mean(np.sum((probs - y_true_onehot) ** 2, -1)))
    return {"ece": float(ece), "mce": float(mce),
            "ace": float(np.mean(ace_terms)) if ace_terms else 0.0,
            "nll": nll, "brier": brier}


# ---------------------------------------------------------------------------
# Temperature-scaling fits (gradient descent, reference hyperparameters)
# ---------------------------------------------------------------------------

def fit_temperature_regression(residuals: np.ndarray, sigma: np.ndarray,
                               loss: str = "mae", steps: int = 100,
                               lr: float = 0.1) -> float:
    """T minimizing |residual - sigma/|T|| — `calibrate_regression.py:441-544`."""
    import jax
    import jax.numpy as jnp

    residuals = jnp.asarray(residuals, jnp.float32).flatten()
    sigma = jnp.asarray(sigma, jnp.float32).flatten()

    def loss_fn(t):
        scaled = jnp.where(jnp.abs(t) > 0, sigma / jnp.abs(t), 0.0)
        err = residuals - scaled
        if loss == "mae":
            return jnp.mean(jnp.abs(err))
        if loss == "mse":
            return jnp.mean(jnp.square(err))
        return jnp.sqrt(jnp.mean(jnp.square(err)))

    g = jax.jit(jax.grad(loss_fn))
    t = 1.0
    for _ in range(steps):
        t = t - lr * float(g(t))
    return abs(t)


def fit_temperature_classification(y_true_onehot: np.ndarray,
                                   logits: np.ndarray, per_class: bool,
                                   steps: int = 100, lr: float = 0.1):
    """T (scalar or per-class vector) minimizing CE of logits/T —
    `calibrate_classification.py:71-95`."""
    import jax
    import jax.numpy as jnp

    y = jnp.asarray(y_true_onehot, jnp.float32)
    lg = jnp.asarray(logits, jnp.float32)

    def loss_fn(t):
        scaled = lg / t
        logp = jax.nn.log_softmax(scaled, axis=-1)
        return -jnp.mean(jnp.sum(y * logp, axis=-1))

    g = jax.jit(jax.grad(loss_fn))
    t = (np.ones(logits.shape[-1], np.float32) if per_class
         else np.float32(1.0))
    for _ in range(steps):
        t = t - lr * np.asarray(g(jnp.asarray(t)))
    return t


# ---------------------------------------------------------------------------
# Regression calibration (fit all six variants)
# ---------------------------------------------------------------------------

REGRESSION_CALIBRATORS = ["iso_all", "ts_all", "iso_percoo", "ts_percoo",
                          "iso_perclscoo", "rel_iso_perclscoo"]


def relativize(boxes: np.ndarray, sigma: np.ndarray) -> np.ndarray:
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    return sigma / np.stack([h, w, h, w], axis=1)


class RegressionCalib:
    """Fit all regression calibrators — `calibrate_regression.py:583-1055`."""

    def __init__(self, gt_boxes: np.ndarray, pred_boxes: np.ndarray,
                 sigma: np.ndarray, gt_classes: np.ndarray,
                 num_classes: int, val_split: float = 0.8):
        self.gt = np.asarray(gt_boxes, np.float64)
        self.pred = np.asarray(pred_boxes, np.float64)
        self.sigma = np.nan_to_num(np.asarray(sigma, np.float64))
        self.classes = np.asarray(gt_classes).astype(int)
        self.num_classes = num_classes
        self.split = int(val_split * len(self.gt))

    def _iso(self, sigma, residuals, y_bounds=False) -> IsotonicRegression:
        return IsotonicRegression(increasing=True, out_of_bounds="clip").fit(
            sigma, residuals)

    def fit_all(self) -> Dict[str, Any]:
        res = np.abs(self.pred - self.gt)
        out: Dict[str, Any] = {}
        out["iso_all"] = self._iso(self.sigma.flatten(), res.flatten())
        out["ts_all"] = fit_temperature_regression(res, self.sigma)
        out["iso_percoo"] = [self._iso(self.sigma[:, j], res[:, j])
                             for j in range(4)]
        out["ts_percoo"] = [fit_temperature_regression(res[:, j],
                                                       self.sigma[:, j])
                            for j in range(4)]
        percls = []
        for c in range(1, self.num_classes + 1):
            m = self.classes == c
            for j in range(4):
                if m.sum() >= 2:
                    percls.append(self._iso(self.sigma[m, j], res[m, j]))
                else:
                    # degenerate class: identity-ish calibrator on all data
                    percls.append(self._iso(self.sigma[:, j], res[:, j]))
        out["iso_perclscoo"] = percls

        rel_sigma = relativize(self.pred, self.sigma)
        rel_res = relativize(self.pred, res)
        rel = []
        for c in range(1, self.num_classes + 1):
            m = self.classes == c
            for j in range(4):
                if m.sum() >= 2:
                    rel.append(self._iso(rel_sigma[m, j], rel_res[m, j]))
                else:
                    rel.append(self._iso(rel_sigma[:, j], rel_res[:, j]))
        out["rel_iso_perclscoo"] = rel
        return out

    def metrics_before_after(self, calibrators: Dict[str, Any]
                             ) -> Dict[str, Dict[str, float]]:
        out = {"raw": regression_metrics(self.gt, self.pred, self.sigma)}
        iso = calibrators["iso_all"]
        cal = iso.predict(self.sigma.flatten()).reshape(-1, 4)
        out["iso_all"] = regression_metrics(self.gt, self.pred, cal)
        out["ts_all"] = regression_metrics(self.gt, self.pred,
                                           self.sigma / calibrators["ts_all"])
        return out


# ---------------------------------------------------------------------------
# Classification calibration (fit all eight variants)
# ---------------------------------------------------------------------------

def stable_softmax(x: np.ndarray) -> np.ndarray:
    z = x - np.max(x, axis=-1, keepdims=True)
    e = np.exp(z)
    return e / np.sum(e, axis=-1, keepdims=True)


class ClassificationCalib:
    """Fit the eight classification calibrators —
    `calibrate_classification.py:442-545`."""

    def __init__(self, y_true: np.ndarray, logits: np.ndarray,
                 sigma_mc: Optional[np.ndarray], num_classes: int,
                 rng: Optional[np.random.RandomState] = None):
        self.y_true = np.asarray(y_true).astype(int)       # class ids (1-based)
        self.logits = np.asarray(logits, np.float64)
        self.sigma_mc = (np.asarray(sigma_mc, np.float64)
                         if sigma_mc is not None else None)
        self.num_classes = num_classes
        self.rng = rng or np.random.RandomState(0)

    def _onehot(self, y):
        oh = np.zeros((len(y), self.num_classes))
        valid = (y >= 1) & (y <= self.num_classes)
        oh[np.arange(len(y))[valid], y[valid] - 1] = 1.0
        return oh

    def _fit_four(self, y_onehot, logits) -> Dict[str, Any]:
        probs = stable_softmax(logits)
        return {
            "ts_all": fit_temperature_classification(y_onehot, logits, False),
            "ts_percls": fit_temperature_classification(y_onehot, logits, True),
            "iso_all": IsotonicRegression(y_min=0, y_max=1,
                                          out_of_bounds="clip").fit(
                probs.flatten(), y_onehot.flatten()),
            "iso_percls": [IsotonicRegression(y_min=0, y_max=1,
                                              out_of_bounds="clip").fit(
                probs[:, i], y_onehot[:, i])
                for i in range(self.num_classes)],
        }

    def fit_all(self) -> Dict[str, Any]:
        y_onehot = self._onehot(self.y_true)
        out = self._fit_four(y_onehot, self.logits)
        if self.sigma_mc is not None:
            # sample 10 logit draws from N(logit, sigma_mc) — uncertainty-
            # aware variants (`calibrate_classification.py:519-528`)
            samples = (self.logits[None] + self.rng.randn(
                10, *self.logits.shape) * self.sigma_mc[None])
            s_logits = samples.reshape(-1, self.logits.shape[-1])
            s_onehot = np.tile(y_onehot, (10, 1))
            unc = self._fit_four(s_onehot, s_logits)
            out.update({f"unc_{k}": v for k, v in unc.items()})
        return out


# ---------------------------------------------------------------------------
# Persistence + inference-time application
# ---------------------------------------------------------------------------

def save_calibrators(directory: str, regression: Dict[str, Any],
                     classification: Dict[str, Any]) -> None:
    """Pickle layout parity: results/calibration/<model>/{regression,
    classification}/<name> (`calibrate_regression.py:622-693`)."""
    for sub, d in [("regression", regression),
                   ("classification", classification)]:
        os.makedirs(os.path.join(directory, sub), exist_ok=True)
        for name, calib in d.items():
            with open(os.path.join(directory, sub, f"{sub}_{name}"), "wb") as f:
                pickle.dump(calib, f)


def load_calibrators(directory: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    out: List[Dict[str, Any]] = [{}, {}]
    for i, sub in enumerate(["regression", "classification"]):
        d = os.path.join(directory, sub)
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            with open(os.path.join(d, name), "rb") as f:
                out[i][name.replace(f"{sub}_", "", 1)] = pickle.load(f)
    return out[0], out[1]


class CalibrateBoxUncert:
    """Apply the regression calibrators at inference —
    `utils_box.py:295-524` (all six applied, returned per variant)."""

    def __init__(self, calibrators: Dict[str, Any], num_classes: int):
        self.c = calibrators
        self.num_classes = num_classes

    def __call__(self, sigma: np.ndarray, classes: np.ndarray,
                 boxes: np.ndarray) -> Dict[str, np.ndarray]:
        sigma = np.nan_to_num(np.asarray(sigma, np.float64))
        classes = np.asarray(classes).astype(int)
        out: Dict[str, np.ndarray] = {}
        if "iso_all" in self.c:
            out["iso_all"] = self.c["iso_all"].predict(
                sigma.flatten()).reshape(-1, 4)
        if "ts_all" in self.c:
            out["ts_all"] = sigma / self.c["ts_all"]
        if "iso_percoo" in self.c:
            out["iso_percoo"] = np.stack(
                [self.c["iso_percoo"][j].predict(sigma[:, j])
                 for j in range(4)], axis=1)
        if "ts_percoo" in self.c:
            out["ts_percoo"] = np.stack(
                [sigma[:, j] / self.c["ts_percoo"][j] for j in range(4)],
                axis=1)
        for key, rel in [("iso_perclscoo", False), ("rel_iso_perclscoo", True)]:
            if key not in self.c:
                continue
            calibs = np.asarray(self.c[key], dtype=object).reshape(
                self.num_classes, 4)
            src = relativize(boxes, sigma) if rel else sigma
            res = np.zeros_like(src)
            for ci in range(1, self.num_classes + 1):
                m = classes == ci
                if not np.any(m):
                    continue
                for j in range(4):
                    res[m, j] = calibs[ci - 1, j].predict(src[m, j])
            if rel:
                h = boxes[:, 2] - boxes[:, 0]
                w = boxes[:, 3] - boxes[:, 1]
                res = res * np.stack([h, w, h, w], axis=1)
            out[key] = res
        return out


class CalibrateClass:
    """Apply the classification calibrators — `utils_class.py:44-271`.

    Returns per-variant calibrated (probs, entropy).
    """

    def __init__(self, calibrators: Dict[str, Any], num_classes: int):
        self.c = calibrators
        self.num_classes = num_classes

    @staticmethod
    def _entropy(probs: np.ndarray) -> np.ndarray:
        p = np.clip(probs, 1e-12, 1.0)
        p = p / p.sum(-1, keepdims=True)
        return -np.sum(p * np.log(p), axis=-1)

    def _apply_one(self, name: str, key: str,
                   logits: np.ndarray) -> Dict[str, np.ndarray]:
        if name.startswith("ts"):
            probs = stable_softmax(logits / np.asarray(self.c[key]))
        else:
            probs = stable_softmax(logits)
            if name.endswith("all"):
                probs = self.c[key].predict(probs.flatten()).reshape(
                    probs.shape)
            else:
                probs = np.stack([self.c[key][i].predict(probs[:, i])
                                  for i in range(self.num_classes)], axis=1)
        return {"probs": probs, "entropy": self._entropy(probs)}

    def __call__(self, logits: np.ndarray, uncert: np.ndarray = None,
                 n_samples: int = 10, seed: int = 0,
                 noise: np.ndarray = None
                 ) -> Dict[str, Dict[str, np.ndarray]]:
        """Apply all fitted calibrators.

        With ``uncert`` (the per-class MC logit sigma), the uncertainty-aware
        variants run the reference's sampled path (`utils_class.py:119-182`):
        draw ``n_samples`` logits from N(logit, sigma), calibrate each,
        then probs = mean over samples, ``mcclass`` = std over samples
        (the calibrated epistemic class sigma), entropy of the mean. Those
        results are returned under the UNPREFIXED method name — matching the
        reference's prediction_data keys (``iso_percls_mcclass`` etc.,
        `infer_model.py:884-900`) — with a deterministic seed instead of the
        reference's unseeded tfp sampling. ``noise`` ([n_samples, n, C]
        standard-normal draws) overrides the seeded generation so batched
        callers can reproduce per-image seeding exactly.
        """
        logits = np.asarray(logits, np.float64)
        out: Dict[str, Dict[str, np.ndarray]] = {}
        sampled = None
        if uncert is not None:
            if noise is None:
                noise = np.random.RandomState(seed).randn(n_samples,
                                                          *logits.shape)
            uncert = np.nan_to_num(np.asarray(uncert, np.float64))
            sampled = logits[None] + noise * uncert[None]
            sampled = sampled.reshape(-1, logits.shape[-1])
        for name in ("ts_all", "ts_percls", "iso_all", "iso_percls"):
            if sampled is not None and "unc_" + name in self.c:
                r = self._apply_one(name, "unc_" + name, sampled)
                probs = r["probs"].reshape(n_samples, -1, logits.shape[-1])
                mean = probs.mean(axis=0)
                out[name] = {"probs": mean, "entropy": self._entropy(mean),
                             "mcclass": probs.std(axis=0)}
            elif name in self.c:
                out[name] = self._apply_one(name, name, logits)
            if uncert is None and "unc_" + name in self.c:
                # no sigma available: the unc_ calibrators degrade to the
                # plain path (kept for backward compatibility)
                out["unc_" + name] = self._apply_one(name, "unc_" + name,
                                                     logits)
        return out


# ---------------------------------------------------------------------------
# GT assignment (for gathering calibration data)
# ---------------------------------------------------------------------------

def iou_matrix_corners(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    y1 = np.maximum(a[:, None, 0], b[None, :, 0])
    x1 = np.maximum(a[:, None, 1], b[None, :, 1])
    y2 = np.minimum(a[:, None, 2], b[None, :, 2])
    x2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(y2 - y1, 0, None) * np.clip(x2 - x1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def gt_box_assigner(gt_boxes: np.ndarray, pred_boxes: np.ndarray,
                    method: str = "IoU") -> Tuple[np.ndarray, np.ndarray]:
    """Best prediction per GT (IoU max or MSE min) + its score —
    `utils_extra.py:44-117`. Returns (pred_idx per gt, iou per gt)."""
    if len(pred_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((0,), int), np.zeros((0,))
    iou = iou_matrix_corners(gt_boxes, pred_boxes)
    if method == "MSE":
        mse = np.mean((gt_boxes[:, None] - pred_boxes[None]) ** 2, axis=-1)
        idx = np.argmin(mse, axis=1)
    else:
        idx = np.argmax(iou, axis=1)
    return idx, iou[np.arange(len(gt_boxes)), idx]
