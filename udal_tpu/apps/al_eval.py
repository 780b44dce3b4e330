"""AL-set quality pre-estimation via dataset similarity.

Parity with `/root/reference/src/active_learning_eval.py`:
* per-class GT-crop statistics: aspect ratio, mean 2-D DCT, mean 8x8x8
  color histogram (`collect_metrics`, `:1034-1123`);
* empirical Jensen–Shannon divergence between the selected set's and a
  reference set's statistic distributions combined with class-ratio terms
  (`calculate_set_similarity`, `:946-1027`, `:458-533`);
* ranking of AL methods and Kendall's-tau correlation with per-class AP
  (`:1126-1150`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.fft import dctn
from scipy.stats import kendalltau

from udal_tpu.apps.thresholding import jensen_shannon_divergence


def crop_statistics(image: np.ndarray, box: np.ndarray) -> Dict[str, object]:
    """Aspect ratio, mean 2-D DCT, 8x8x8 color histogram of one GT crop."""
    import cv2

    y1, x1, y2, x2 = [int(v) for v in box]
    crop = image[max(y1, 0):max(y2, y1 + 1), max(x1, 0):max(x2, x1 + 1)]
    if crop.size == 0:
        crop = image[:1, :1]
    h, w = crop.shape[:2]
    gray = cv2.cvtColor(crop, cv2.COLOR_RGB2GRAY) if crop.ndim == 3 else crop
    gray32 = cv2.resize(gray.astype(np.float32), (32, 32))
    dct = dctn(gray32, norm="ortho")
    hist = cv2.calcHist([crop.astype(np.uint8)], [0, 1, 2], None,
                        [8, 8, 8], [0, 256] * 3).flatten()
    hist = hist / max(hist.sum(), 1)
    return {"aspect": w / max(h, 1), "dct_mean": float(np.abs(dct).mean()),
            "hist": hist}


def collect_metrics(samples: Sequence[Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]]
                    ) -> Dict[int, Dict[str, List]]:
    """Per-class crop statistics over (image, boxes, classes) samples —
    parity `collect_metrics` (`active_learning_eval.py:1034-1123`)."""
    out: Dict[int, Dict[str, List]] = {}
    for image, boxes, classes in samples:
        for box, cls in zip(boxes, classes):
            d = out.setdefault(int(cls), {"aspect": [], "dct": [],
                                          "hist": []})
            s = crop_statistics(image, box)
            d["aspect"].append(s["aspect"])
            d["dct"].append(s["dct_mean"])
            d["hist"].append(s["hist"])
    return out


def calculate_set_similarity(set_a: Dict[int, Dict[str, List]],
                             set_b: Dict[int, Dict[str, List]],
                             w_stats: float = 0.5, w_ratio: float = 0.5
                             ) -> float:
    """Similarity in [0, 1]: 1 - mean JSD over shared-class statistics,
    weighted with the class-ratio agreement —
    parity `calculate_set_similarity` (`active_learning_eval.py:946-1027`)."""
    shared = sorted(set(set_a) & set(set_b))
    if not shared:
        return 0.0
    jsds = []
    for c in shared:
        for key in ("aspect", "dct"):
            a = np.asarray(set_a[c][key])
            b = np.asarray(set_b[c][key])
            if len(a) and len(b):
                jsds.append(jensen_shannon_divergence(a, b, bins=20))
        ha = np.mean(np.asarray(set_a[c]["hist"]), axis=0)
        hb = np.mean(np.asarray(set_b[c]["hist"]), axis=0)
        m = 0.5 * (ha + hb)

        def kl(p, q):
            mask = p > 0
            return float(np.sum(p[mask] * np.log2(
                p[mask] / np.maximum(q[mask], 1e-12))))

        jsds.append(0.5 * kl(ha, m) + 0.5 * kl(hb, m))
    stat_sim = 1.0 - float(np.mean(jsds))

    counts_a = np.asarray([len(set_a[c]["aspect"]) for c in shared], float)
    counts_b = np.asarray([len(set_b[c]["aspect"]) for c in shared], float)
    ra = counts_a / counts_a.sum()
    rb = counts_b / counts_b.sum()
    ratio_sim = 1.0 - 0.5 * float(np.abs(ra - rb).sum())
    return w_stats * stat_sim + w_ratio * ratio_sim


def rank_correlation(similarities: Dict[str, float],
                     ap_scores: Dict[str, float]) -> Tuple[float, float]:
    """Kendall's tau between similarity-based and AP-based method rankings —
    parity `active_learning_eval.py:1126-1150`."""
    methods = sorted(set(similarities) & set(ap_scores))
    s = [similarities[m] for m in methods]
    a = [ap_scores[m] for m in methods]
    tau, p = kendalltau(s, a)
    return float(tau), float(p)
