import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.ops import anchors as anchor_lib


def _d0_anchors(image_size=512):
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = image_size
    return anchor_lib.from_config(cfg)


def test_anchor_count_and_layout():
    a = _d0_anchors(512)
    # levels 3..7 at 512: 64^2+32^2+16^2+8^2+4^2 locations * 9 anchors
    locs = 64**2 + 32**2 + 16**2 + 8**2 + 4**2
    assert a.boxes_np.shape == (locs * 9, 4)
    slices = a.level_slices()
    assert slices[3] == (0, 64 * 64 * 9)
    assert slices[7][1] == locs * 9


def test_anchor_rectangular_image():
    a = _d0_anchors((512, 1024))  # (H, W)
    locs = sum((512 // s) * (1024 // s) for s in (8, 16, 32, 64, 128))
    assert a.boxes_np.shape == (locs * 9, 4)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    a = _d0_anchors(512)
    n = a.boxes_np.shape[0]
    idx = rng.choice(n, 100, replace=False)
    anchors = a.boxes_np[idx]
    # random plausible boxes near the anchors
    gt = anchors + rng.uniform(-5, 5, anchors.shape).astype(np.float32)
    gt = np.stack([np.minimum(gt[:, 0], gt[:, 2] - 1), np.minimum(gt[:, 1], gt[:, 3] - 1),
                   np.maximum(gt[:, 2], gt[:, 0] + 1), np.maximum(gt[:, 3], gt[:, 1] + 1)],
                  axis=1)
    enc = anchor_lib.encode_box_targets(gt, anchors)
    dec = anchor_lib.decode_box_outputs(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-2)


@pytest.mark.parametrize("image_size", [512, (512, 1024)])
def test_anchor_parity_with_reference(image_size):
    from tests.reference_util import import_reference
    ref_anchors = import_reference("anchors")
    ref = ref_anchors.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, image_size)
    ours = _d0_anchors(image_size)
    np.testing.assert_allclose(ours.boxes_np, ref.boxes.numpy(), rtol=1e-6, atol=1e-3)


def test_decode_parity_with_reference():
    from tests.reference_util import import_reference
    ref_anchors = import_reference("anchors")
    import tensorflow as tf

    rng = np.random.RandomState(1)
    a = _d0_anchors(512)
    n = 500
    anchors = a.boxes_np[:n]
    preds = rng.randn(2, n, 4).astype(np.float32) * 0.3
    ref_out = ref_anchors.decode_box_outputs(tf.constant(preds), tf.constant(anchors))
    ours = anchor_lib.decode_box_outputs(preds, anchors)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), rtol=1e-5, atol=1e-3)
