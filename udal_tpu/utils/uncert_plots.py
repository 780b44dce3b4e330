"""Uncertainty analysis plots: reliability, regression calibration, panels.

Rebuilds the reference's plotting tail (matplotlib Agg, PNG artifacts):

* classification reliability diagrams with ECE/MCE annotations
  (`/root/reference/src/calibrate_classification.py:97-440`);
* regression calibration curves (expected vs observed Gaussian interval
  coverage) with miscalibration area + sharpness — the uncertainty-toolbox
  panels used by the Validator (`validate_model.py:737-794`,
  `utils_extra.py:378-573`), implemented from the published definitions
  (the package is not a dependency);
* thresholding spider plot / heatmaps / top-10 panels
  (`uncertainty_analysis.py:734-1101`);
* a BRISQUE-style no-reference quality proxy from MSCN statistics for the
  ep-vs-al analysis (`uncertainty_ep_vs_al.py:35-590`; the brisque package's
  trained SVR is unavailable, so the score combines the Mahalanobis-style
  distance of MSCN features from pristine-image statistics with
  decorrelation/variance/clipping evidence terms — validated for rank
  monotonicity against distortion-severity ladders, see
  docs/BRISQUE_PROXY.md and tests/test_uncert_plots.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _save(fig, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=110)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


# ---------------------------------------------------------------------------
# Classification reliability
# ---------------------------------------------------------------------------

def reliability_diagram(correct: np.ndarray, confidence: np.ndarray,
                        path: str, bins: int = 15,
                        title: str = "reliability") -> Dict[str, float]:
    """Confidence-vs-accuracy reliability diagram; returns ECE/MCE/ACE.

    Parity: `calibrate_classification.py:97-440` (plot + metric trio).
    """
    plt = _plt()
    correct = np.asarray(correct, float)
    confidence = np.asarray(confidence, float)
    edges = np.linspace(0, 1, bins + 1)
    accs, confs, weights = [], [], []
    n = max(len(correct), 1)
    for i in range(bins):
        m = (confidence > edges[i]) & (confidence <= edges[i + 1])
        if m.any():
            accs.append(correct[m].mean())
            confs.append(confidence[m].mean())
            weights.append(m.sum() / n)
        else:
            accs.append(np.nan)
            confs.append((edges[i] + edges[i + 1]) / 2)
            weights.append(0.0)
    accs_a = np.asarray(accs)
    confs_a = np.asarray(confs)
    w = np.asarray(weights)
    gaps = np.abs(accs_a - confs_a)
    valid = ~np.isnan(accs_a)
    ece = float(np.nansum(w[valid] * gaps[valid]))
    mce = float(np.nanmax(gaps[valid])) if valid.any() else 0.0
    ace = float(np.nanmean(gaps[valid])) if valid.any() else 0.0

    fig, ax = plt.subplots(figsize=(5, 4.5))
    centers = (edges[:-1] + edges[1:]) / 2
    ax.bar(centers, np.nan_to_num(accs_a), width=1 / bins * 0.9,
           label="accuracy", alpha=0.8)
    ax.plot([0, 1], [0, 1], "--", color="gray", label="perfect")
    ax.set_xlabel("confidence")
    ax.set_ylabel("accuracy")
    ax.set_title(f"{title}  ECE={ece:.4f} MCE={mce:.4f} ACE={ace:.4f}")
    ax.legend()
    _save(fig, path)
    return {"ECE": ece, "MCE": mce, "ACE": ace}


# ---------------------------------------------------------------------------
# Regression calibration (uncertainty-toolbox-style)
# ---------------------------------------------------------------------------

def regression_calibration_curve(residuals: np.ndarray, sigma: np.ndarray,
                                 num_points: int = 100):
    """(expected, observed) Gaussian central-interval coverage curve."""
    from scipy import stats

    residuals = np.abs(np.asarray(residuals, float).ravel())
    sigma = np.maximum(np.asarray(sigma, float).ravel(), 1e-12)
    exp_p = np.linspace(0.01, 0.99, num_points)
    z = stats.norm.ppf(0.5 + exp_p / 2)          # central interval half-width
    obs_p = np.asarray([(residuals <= zi * sigma).mean() for zi in z])
    return exp_p, obs_p


def regression_calibration_plot(residuals: np.ndarray, sigma: np.ndarray,
                                path: str, title: str = "calibration"
                                ) -> Dict[str, float]:
    """Average-calibration plot + sharpness; returns miscalibration area,
    RMSUE and sharpness — the validator's uncertainty-toolbox panel
    (`validate_model.py:737-794`)."""
    plt = _plt()
    exp_p, obs_p = regression_calibration_curve(residuals, sigma)
    miscal = float(np.trapezoid(np.abs(obs_p - exp_p), exp_p))
    sharpness = float(np.sqrt(np.mean(np.square(sigma))))
    rmsue = float(np.sqrt(np.mean(
        np.square(np.abs(residuals).ravel() - np.asarray(sigma).ravel()))))

    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    axes[0].plot(exp_p, obs_p, label="observed")
    axes[0].plot([0, 1], [0, 1], "--", color="gray", label="ideal")
    axes[0].fill_between(exp_p, exp_p, obs_p, alpha=0.25)
    axes[0].set_xlabel("expected coverage")
    axes[0].set_ylabel("observed coverage")
    axes[0].set_title(f"miscalibration area={miscal:.4f}")
    axes[0].legend()
    axes[1].hist(np.asarray(sigma).ravel(), bins=40)
    axes[1].set_xlabel("predicted sigma")
    axes[1].set_title(f"sharpness={sharpness:.4f}  RMSUE={rmsue:.4f}")
    fig.suptitle(title)
    _save(fig, path)
    return {"miscal_area": miscal, "sharpness": sharpness, "rmsue": rmsue}


# ---------------------------------------------------------------------------
# Thresholding panels
# ---------------------------------------------------------------------------

def spider_plot(metrics_by_method: Dict[str, Dict[str, float]],
                path: str, title: str = "uncertainty comparison") -> str:
    """Radar/spider chart over per-method metrics
    (`uncertainty_analysis.py:734-820`)."""
    plt = _plt()
    methods = list(metrics_by_method)
    axes_names = sorted({k for m in metrics_by_method.values() for k in m})
    n = len(axes_names)
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False).tolist()
    angles += angles[:1]
    fig, ax = plt.subplots(figsize=(5.5, 5),
                           subplot_kw=dict(polar=True))
    # normalize each axis to [0, 1] over methods
    for name in methods:
        vals = []
        for k in axes_names:
            col = [metrics_by_method[m].get(k, 0.0) for m in methods]
            lo, hi = min(col), max(col)
            v = metrics_by_method[name].get(k, 0.0)
            vals.append(0.5 if hi <= lo else (v - lo) / (hi - lo))
        vals += vals[:1]
        ax.plot(angles, vals, label=name)
        ax.fill(angles, vals, alpha=0.1)
    ax.set_xticks(angles[:-1])
    ax.set_xticklabels(axes_names, fontsize=7)
    ax.set_title(title)
    ax.legend(loc="upper right", bbox_to_anchor=(1.3, 1.1), fontsize=7)
    return _save(fig, path)


def metric_heatmap(matrix: np.ndarray, xlabels: Sequence[str],
                   ylabels: Sequence[str], path: str,
                   title: str = "") -> str:
    """Annotated heatmap (`uncertainty_analysis.py:822-950`)."""
    plt = _plt()
    m = np.asarray(matrix, float)
    fig, ax = plt.subplots(figsize=(1.0 + 0.6 * m.shape[1],
                                    1.0 + 0.5 * m.shape[0]))
    im = ax.imshow(m, cmap="viridis")
    ax.set_xticks(range(len(xlabels)))
    ax.set_xticklabels(xlabels, rotation=45, ha="right", fontsize=7)
    ax.set_yticks(range(len(ylabels)))
    ax.set_yticklabels(ylabels, fontsize=7)
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            ax.text(j, i, f"{m[i, j]:.2f}", ha="center", va="center",
                    fontsize=6, color="w")
    ax.set_title(title)
    fig.colorbar(im, ax=ax, shrink=0.8)
    return _save(fig, path)


def top10_panel(images: List[np.ndarray], labels: List[str], path: str,
                title: str = "top uncertainty") -> str:
    """Grid panel of the top/bottom-ranked images
    (`uncertainty_analysis.py:952-1101`)."""
    plt = _plt()
    n = len(images)
    cols = min(5, max(n, 1))
    rows = -(-n // cols) if n else 1
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.0 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(images[i])
            ax.set_title(labels[i], fontsize=6)
    fig.suptitle(title)
    return _save(fig, path)


# ---------------------------------------------------------------------------
# BRISQUE-style quality proxy
# ---------------------------------------------------------------------------

def mscn_coefficients(gray: np.ndarray, sigma: float = 7.0 / 6.0
                      ) -> np.ndarray:
    """Mean-subtracted contrast-normalized coefficients (the BRISQUE core)."""
    import cv2

    gray = np.asarray(gray, np.float64)
    mu = cv2.GaussianBlur(gray, (7, 7), sigma)
    mu_sq = mu * mu
    var = cv2.GaussianBlur(gray * gray, (7, 7), sigma) - mu_sq
    sd = np.sqrt(np.abs(var))
    return (gray - mu) / (sd + 1.0)


def _pristine_distance(m: np.ndarray) -> float:
    """Distance of the MSCN feature vector (variance, kurtosis proxy,
    pairwise product asymmetries) from pristine natural-scene statistics."""
    feats = [np.var(m),
             np.mean(np.abs(m)) ** 2 / max(np.mean(m * m), 1e-12)]
    for (dy, dx) in ((0, 1), (1, 0), (1, 1), (1, -1)):
        h, w = m.shape[0] - abs(dy), m.shape[1] - abs(dx)
        a = m[:h, :w]
        b = np.roll(np.roll(m, -dy, axis=0), -dx, axis=1)[:h, :w]
        feats.append(np.mean(a * b))
    feats = np.asarray(feats, np.float64)
    # pristine natural-image MSCN statistics (variance ~1, shape ratio
    # ~0.64 for a unit-variance GGD with beta=2, small positive pairwise
    # correlations)
    pristine = np.asarray([1.0, 0.64, 0.30, 0.30, 0.12, 0.12])
    scale = np.asarray([0.25, 0.15, 0.25, 0.25, 0.15, 0.15])
    return float(np.sqrt(np.mean(((feats - pristine) / scale) ** 2)))


def brisque_like_score(image: np.ndarray) -> float:
    """No-reference quality score — higher = more distorted.

    A stand-in for the reference's trained-SVR `brisque` package
    (`uncertainty_ep_vs_al.py` quality correlation). Four terms:

    1. distance of MSCN features from pristine natural-scene statistics
       (catches blur / motion blur / contrast compression);
    2. neighbour-decorrelation evidence: pristine scenes have normalized
       H/V MSCN pairwise correlation >~0.4, white noise drives it to ~0
       and below (the pristine-distance term alone is ANTI-correlated with
       noise severity because noise Gaussianizes MSCN stats toward the
       pristine target);
    3. a small monotone MSCN-variance boost so heavy noise keeps raising
       the score once the correlation term saturates;
    4. clipped-pixel fraction (brightness/exposure saturation).

    Per-image rank monotonicity vs the 5 corruption ladders of
    `data/augment.apply_corruption` is asserted in tests/test_uncert_plots.py
    (mean Spearman rho 0.99, worst-case 0.86, across two disjoint synthetic
    scene families — see docs/BRISQUE_PROXY.md). Only the *ranking* is
    meaningful; absolute values are not calibrated to human opinion scores.
    """
    img = np.asarray(image)
    if img.ndim == 3:
        gray = img[..., :3] @ np.asarray([0.299, 0.587, 0.114])
    else:
        gray = img.astype(np.float64)
    m = mscn_coefficients(gray)
    v = max(float(np.var(m)), 1e-9)
    corrs = []
    for (dy, dx) in ((0, 1), (1, 0)):
        h, w = m.shape[0] - abs(dy), m.shape[1] - abs(dx)
        a = m[:h, :w]
        b = np.roll(np.roll(m, -dy, axis=0), -dx, axis=1)[:h, :w]
        corrs.append(float(np.mean(a * b)) / v)
    clip_frac = float(np.mean((img >= 250) | (img <= 5)))
    return (_pristine_distance(m)
            + 10.0 * max(0.0, 0.35 - min(corrs))
            + 3.0 * float(np.log10(1.0 + v))
            + 3.0 * clip_frac)
