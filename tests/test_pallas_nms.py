"""Pallas NMS kernel vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

from udal_tpu.ops import nms as nms_lib
from udal_tpu.ops.pallas_nms import pallas_soft_nms


def _random_boxes(rng, n, size=256):
    y1 = rng.uniform(0, size - 30, n)
    x1 = rng.uniform(0, size - 30, n)
    h = rng.uniform(10, 80, n)
    w = rng.uniform(10, 80, n)
    boxes = np.stack([y1, x1, y1 + h, x1 + w], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("sigma", [0.0, 0.5])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_nms(sigma, seed):
    rng = np.random.RandomState(seed)
    boxes, scores = _random_boxes(rng, 200)
    score_thr = 0.001 if sigma > 0 else float("-inf")
    ref = nms_lib.soft_nms(boxes, scores, 20, 0.5, score_thr, sigma)
    out = pallas_soft_nms(boxes, scores, 20, 0.5, score_thr, sigma,
                          interpret=True)
    n = int(ref.valid_len)
    assert int(out.valid_len) == n
    np.testing.assert_array_equal(np.asarray(out.indices)[:n],
                                  np.asarray(ref.indices)[:n])
    np.testing.assert_allclose(np.asarray(out.scores)[:n],
                               np.asarray(ref.scores)[:n], rtol=1e-5)
