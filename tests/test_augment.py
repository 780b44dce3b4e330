import numpy as np
import pytest

from udal_tpu.data import augment as aug


@pytest.fixture
def img():
    return np.random.RandomState(0).randint(0, 255, (64, 96, 3), np.uint8)


def test_color_ops_preserve_shape_dtype(img):
    for name, fn in aug.COLOR_OPS.items():
        out = fn(img, 5.0)
        assert out.shape == img.shape, name
        assert out.dtype == np.uint8, name


def test_randaugment_seeded(img):
    boxes = np.asarray([[5.0, 5.0, 30.0, 40.0]], np.float32)
    a, ba = aug.randaugment(img, boxes, rng=np.random.RandomState(1))
    b, _ = aug.randaugment(img, boxes, rng=np.random.RandomState(1))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ba, boxes)  # color ops keep boxes


def test_gridmask_zeroes_grid(img):
    out = aug.gridmask(img, ratio=0.5, rng=np.random.RandomState(0))
    assert out.shape == img.shape
    assert (out == 0).any()
    assert (out > 0).any()


def test_mosaic_combines_four(img):
    rng = np.random.RandomState(0)
    samples = []
    for i in range(4):
        boxes = np.asarray([[4.0, 4.0, 40.0, 60.0]], np.float32)
        classes = np.asarray([i + 1])
        samples.append((img, boxes, classes))
    canvas, boxes, classes = aug.mosaic(samples, (128, 128), rng=rng)
    assert canvas.shape == (128, 128, 3)
    assert len(boxes) == len(classes) > 0
    assert np.all(boxes[:, 2] <= 128) and np.all(boxes[:, 3] <= 128)


@pytest.mark.parametrize("wt", ["fog", "rain", "snow", "noise", "sat"])
def test_weather(img, wt):
    out = aug.add_weather(img, wt, severity=0.5)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)


@pytest.mark.parametrize("kind", ["br", "ct", "bl", "ns", "mb"])
def test_corruption_ladders(img, kind):
    outs = aug.apply_corruption(kind, img)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == img.shape


def test_apply_policy_dispatch(img):
    boxes = np.zeros((0, 4), np.float32)
    for policy in (None, "randaug", "v0", "albu"):
        out, b = aug.apply_policy(policy, img, boxes,
                                  rng=np.random.RandomState(0))
        assert out.shape == img.shape
