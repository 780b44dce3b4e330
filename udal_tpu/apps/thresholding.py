"""Cost-sensitive uncertainty thresholding / failure recognition.

Parity with the reference `uncertainty_analysis.py` (arXiv 2404.17427 core):

* :func:`roc_metrics` — threshold at a fixed TPR budget (CD, correct
  detections kept) or fixed FPR budget (FD) via ROC interpolation
  (`uncertainty_analysis.py:44-83`);
* :class:`UncertOptimal` — optimization of per-uncertainty combination
  weights minimizing mean FD@CD over IoU thresholds 0.5:0.05:0.75
  (`:86-327`), with per-class weight spaces; writes
  ``optimal_params_<budget>_<b>_iou_<lo>_<hi><name>.txt`` and
  ``optimal_thrs_...txt`` with the same naming/format so downstream parsers
  (auto-label gate, AL loop) interoperate;
* metric tables (JSD, AUROC, FD@CD(b)) per uncertainty → ``thr_metrics``.

The reference uses Optuna/HEBO for the weight search; this rebuild ships a
dependency-free sequential-model optimizer (`minimize_smbo`): seeded random
exploration + Gaussian exploitation around the elite set — equivalent
quality on these ≤(n_uncert × n_class)-dim bounded problems.
"""

from __future__ import annotations

import ast
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from sklearn.metrics import auc, roc_curve

DEFAULT_IOU_THRS = [0.5, 0.55, 0.6, 0.65, 0.7, 0.75]


def roc_metrics(uncert: np.ndarray, y_true: np.ndarray,
                fpr_tpr: float = 0.95, fix_cd: bool = True):
    """Threshold + error rate + AUC at a fixed budget.

    y_true: 1 = correct detection, 0 = failure; low uncertainty should
    indicate correctness (pos_label=0 on the ROC).

    Returns (threshold, error_at_budget, auc) or 0 when the budget is
    unreachable — parity `uncertainty_analysis.py:44-83`.
    """
    fpr, tpr, thresholds = roc_curve(y_true, uncert, pos_label=0)
    roc_auc = auc(fpr, tpr)
    if fix_cd:
        if np.all(fpr > 1 - fpr_tpr):
            return 0
        if np.all(fpr <= 1 - fpr_tpr):
            idxs = [i for i, x in enumerate(1 - fpr) if x >= 1]
            return (min(thresholds[i] for i in idxs),
                    min((1 - tpr)[i] for i in idxs), roc_auc)
        roc_fpr = 1 - np.interp(1 - fpr_tpr, fpr, tpr)
        idx = int(np.argmin(np.abs(1 - tpr - roc_fpr)))
        return thresholds[idx], roc_fpr, roc_auc
    if np.all(tpr < fpr_tpr):
        return 0
    if np.all(tpr >= fpr_tpr):
        idxs = [i for i, x in enumerate(tpr) if x >= 1]
        return (min(thresholds[i] for i in idxs),
                min(fpr[i] for i in idxs), roc_auc)
    fpr95 = np.interp(fpr_tpr, tpr, fpr)
    idx = int(np.argmin(np.abs(fpr - fpr95)))
    return thresholds[idx], fpr95, roc_auc


# ---------------------------------------------------------------------------
# Dependency-free sequential model-based optimizer (Optuna/HEBO stand-in)
# ---------------------------------------------------------------------------

def minimize_smbo(f: Callable[[np.ndarray], float], num_params: int,
                  bounds: Tuple[float, float] = (0.0, 1.0),
                  max_evals: int = 600, patience: int = 300,
                  seed: int = 0) -> Tuple[np.ndarray, float]:
    """Minimize f over a box; seeded exploration + elite-Gaussian refinement."""
    rng = np.random.RandomState(seed)
    lo, hi = bounds
    X: List[np.ndarray] = []
    Y: List[float] = []
    best_y = np.inf
    unchanged = 0
    for it in range(max_evals):
        if it < max(20, max_evals // 10) or rng.rand() < 0.25:
            x = rng.uniform(lo, hi, num_params)
        else:
            elite_n = max(1, len(Y) // 10)
            elite_idx = np.argsort(Y)[:elite_n]
            center = X[int(rng.choice(elite_idx))]
            scale = (hi - lo) * max(0.02, 0.3 * (1 - it / max_evals))
            x = np.clip(center + rng.randn(num_params) * scale, lo, hi)
        y = float(f(x))
        X.append(x)
        Y.append(y)
        if y < best_y - 1e-12:
            best_y = y
            unchanged = 0
        else:
            unchanged += 1
            if unchanged >= patience:
                break
    best = int(np.argmin(Y))
    return X[best], Y[best]


# ---------------------------------------------------------------------------
# Optimal uncertainty combination
# ---------------------------------------------------------------------------

class UncertOptimal:
    """Optimal weighted combination of uncertainties for failure detection.

    API parity with `uncertainty_analysis.UncertOptimal` (`:86-327`): either
    read cached ``optimal_params_*`` or optimize and persist both the weight
    vector and the per-IoU thresholds.
    """

    def __init__(self, gt_classes=None, tps_class=None, ious=None,
                 uncert: Optional[Sequence[np.ndarray]] = None,
                 added_name: str = "", source_path: str = "",
                 per_cls: bool = False, fpr_tpr: float = 0.95,
                 fix_cd: bool = True,
                 iou_thrs: Sequence[float] = DEFAULT_IOU_THRS,
                 seed: int = 0):
        self.gt_classes = (np.asarray(gt_classes).astype(int)
                           if gt_classes is not None else None)
        self.tps_class = np.asarray(tps_class) if tps_class is not None else None
        self.ious = np.asarray(ious) if ious is not None else None
        self.uncert = ([np.asarray(u, np.float64) for u in uncert]
                       if uncert is not None else None)
        self.added_name = added_name
        self.source_path = source_path
        self.per_cls = per_cls
        self.fpr_tpr = fpr_tpr
        self.fix_cd = fix_cd
        self.iou_thrs = list(iou_thrs)
        self.seed = seed
        self.opt_params: Optional[np.ndarray] = None

    # -- file naming parity ----------------------------------------------------
    def _budget(self) -> str:
        return "cd" if self.fix_cd else "fd"

    def _fname(self, kind: str) -> str:
        return os.path.join(
            self.source_path,
            f"{kind}_{self._budget()}_{self.fpr_tpr}_iou_"
            f"{np.min(self.iou_thrs)}_{np.max(self.iou_thrs)}"
            f"{self.added_name}.txt")

    # -- objective --------------------------------------------------------------
    def _combined(self, params: np.ndarray) -> np.ndarray:
        if self.per_cls:
            num_classes = int(np.max(self.gt_classes))
            total = np.zeros_like(self.uncert[0])
            n = 0
            for c in range(num_classes):
                mask = self.gt_classes == c + 1
                for u in self.uncert:
                    total[mask] += u[mask] * params[n]
                    n += 1
            return total
        return sum(p * u for p, u in zip(params, self.uncert))

    def _objective(self, params: np.ndarray) -> float:
        combined = self._combined(params)
        errs = []
        for thr in self.iou_thrs:
            correct = ((self.ious >= thr) * self.tps_class).astype(int)
            r = roc_metrics(combined, correct, self.fpr_tpr, self.fix_cd)
            err = r[1] if r != 0 else 1.0
            if np.isnan(err):
                err = 1.0
            errs.append(err * 100)
        return float(np.mean(errs))

    # -- public -------------------------------------------------------------------
    def optimize(self, max_evals: int = 600) -> np.ndarray:
        if self.per_cls:
            num_params = len(self.uncert) * int(np.max(self.gt_classes))
        else:
            num_params = len(self.uncert)
        best, _ = minimize_smbo(self._objective, num_params,
                                max_evals=max_evals, seed=self.seed)
        self.opt_params = best
        os.makedirs(self.source_path or ".", exist_ok=True)
        with open(self._fname("optimal_params"), "w") as f:
            # reference format: "[w0 w1 ...]" parsed by float(x.strip('[]'))
            f.write("[" + " ".join(repr(float(p)) for p in self.opt_params)
                    + "]")
        thrs = []
        combined = self._combined(self.opt_params)
        for thr in self.iou_thrs:
            correct = ((self.ious >= thr) * self.tps_class).astype(int)
            r = roc_metrics(combined, correct, self.fpr_tpr, self.fix_cd)
            thrs.append(r[0] if r != 0 else 0.0)
        with open(self._fname("optimal_thrs"), "w") as f:
            f.write("[" + " ".join(repr(float(t)) for t in thrs) + "]")
        return self.opt_params

    def get_optimal_uncertainty(self, max_evals: int = 600) -> np.ndarray:
        path = self._fname("optimal_params")
        if os.path.exists(path):
            with open(path) as f:
                self.opt_params = np.asarray(
                    [float(x.strip("[]")) for x in f.read().split()])
            return self.opt_params
        return self.optimize(max_evals)

    def _fdcd_subset(self, weights: np.ndarray, mask: np.ndarray) -> float:
        """Mean FD@CD over the IoU grid for one GT subset and weight set."""
        comb = sum(w * u[mask] for w, u in zip(weights, self.uncert))
        errs = []
        for thr in self.iou_thrs:
            correct = ((self.ious[mask] >= thr) *
                       self.tps_class[mask]).astype(int)
            r = roc_metrics(comb, correct, self.fpr_tpr, self.fix_cd)
            err = r[1] if r != 0 else 1.0
            errs.append((1.0 if np.isnan(err) else err) * 100)
        return float(np.mean(errs))

    def per_class_fixed_params(self, global_params: np.ndarray,
                               max_evals: int = 600) -> np.ndarray:
        """Per-class weight optimization with fixing.

        Parity with the reference's "redo with fix" pass
        (`uncertainty_analysis.py:412-500`): per-class weights are optimized
        jointly, then each class whose class-specific weights do not beat
        the globally-optimal weights on its own FD@CD is fixed back to the
        global weights. Requires ``per_cls=True``.
        """
        assert self.per_cls, "per_class_fixed_params requires per_cls=True"
        perc = self.get_optimal_uncertainty(max_evals)
        nu = len(self.uncert)
        num_classes = int(np.max(self.gt_classes))
        global_params = np.asarray(global_params, np.float64)
        fixed = np.array(perc, np.float64)
        for i in range(num_classes):
            mask = self.gt_classes == i + 1
            if not mask.any():
                fixed[i * nu:(i + 1) * nu] = global_params
                continue
            w_cls = fixed[i * nu:(i + 1) * nu]
            if self._fdcd_subset(w_cls, mask) >= \
                    self._fdcd_subset(global_params, mask):
                fixed[i * nu:(i + 1) * nu] = global_params
        self.opt_params = fixed
        with open(self._fname("optimal_params_clsoptfix"), "w") as f:
            f.write("[" + " ".join(repr(float(p)) for p in fixed) + "]")
        return fixed


def read_optimal_thresholds(source_path: str, fpr_tpr: float = 0.95,
                            fix_cd: bool = True,
                            iou_thrs: Sequence[float] = DEFAULT_IOU_THRS,
                            added_name: str = "") -> np.ndarray:
    budget = "cd" if fix_cd else "fd"
    path = os.path.join(
        source_path, f"optimal_thrs_{budget}_{fpr_tpr}_iou_"
        f"{np.min(iou_thrs)}_{np.max(iou_thrs)}{added_name}.txt")
    with open(path) as f:
        return np.asarray([float(x.strip("[]"))
                           for x in f.read().split()])


# ---------------------------------------------------------------------------
# Metric tables (JSD / AUROC / FD@CD per uncertainty)
# ---------------------------------------------------------------------------

def jensen_shannon_divergence(a: np.ndarray, b: np.ndarray,
                              bins: int = 50) -> float:
    """Empirical JSD between two 1-D samples via shared histograms."""
    lo = min(a.min(), b.min()) if len(a) and len(b) else 0.0
    hi = max(a.max(), b.max()) if len(a) and len(b) else 1.0
    if hi <= lo:
        hi = lo + 1e-6
    pa, _ = np.histogram(a, bins=bins, range=(lo, hi), density=False)
    pb, _ = np.histogram(b, bins=bins, range=(lo, hi), density=False)
    pa = pa / max(pa.sum(), 1)
    pb = pb / max(pb.sum(), 1)
    m = 0.5 * (pa + pb)

    def kl(p, q):
        mask = p > 0
        return float(np.sum(p[mask] * np.log2(p[mask] / np.maximum(q[mask],
                                                                   1e-12))))

    return 0.5 * kl(pa, m) + 0.5 * kl(pb, m)


def threshold_metrics(uncertainties: Dict[str, np.ndarray],
                      tps_class: np.ndarray, ious: np.ndarray,
                      fpr_tpr: float = 0.95, fix_cd: bool = True,
                      iou_thrs: Sequence[float] = DEFAULT_IOU_THRS
                      ) -> Dict[str, Dict[str, float]]:
    """Per-uncertainty JSD / AUROC / mean error@budget table —
    parity `uncertainty_analysis.py:517-732` (thr_metrics_*.txt)."""
    out: Dict[str, Dict[str, float]] = {}
    for name, u in uncertainties.items():
        u = np.asarray(u, np.float64)
        errs, aucs = [], []
        for thr in iou_thrs:
            correct = ((ious >= thr) * tps_class).astype(int)
            r = roc_metrics(u, correct, fpr_tpr, fix_cd)
            if r == 0:
                errs.append(100.0)
                aucs.append(0.5)
            else:
                errs.append(r[1] * 100)
                aucs.append(r[2])
        correct_05 = ((ious >= 0.5) * tps_class).astype(bool)
        jsd = jensen_shannon_divergence(u[correct_05], u[~correct_05]) \
            if correct_05.any() and (~correct_05).any() else 0.0
        metric = "FD@CD" if fix_cd else "CD@FD"
        out[name] = {"jsd": jsd, "auroc": float(np.mean(aucs)),
                     f"{metric}({fpr_tpr})": float(np.mean(errs))}
    return out


def write_threshold_metrics(path: str, table: Dict[str, Dict[str, float]]
                            ) -> None:
    with open(path, "w") as f:
        for name, metrics in table.items():
            f.write(f"{name}: {metrics}\n")
