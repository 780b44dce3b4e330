"""Device-side resize input path (`InputReader(device_resize=True)`).

The host ships NATIVE-size uint8 images + per-image warp params; the
bilinear resize runs on-device (`ops.image_ops.warp_resize_batch`) inside
the jitted train/serve program. These tests pin (a) sub-LSB agreement with
the host cv2 path (`resize_and_crop`), (b) reader-contract equivalence:
a device_resize batch prepared by `train_lib.prepare_batch` matches the
host-resized fast_input batch, (c) the serving entry accepts the warp
contract end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from udal_tpu.config import get_detection_config
from udal_tpu.data.dataloader import (InputReader, resize_and_crop,
                                      scale_factors_to_output)
from udal_tpu.data.synthetic import write_synthetic_dataset
from udal_tpu.ops.image_ops import warp_resize_batch


def test_warp_resize_matches_cv2_eval_path():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (370, 1224, 3), np.uint8)
    h, w = img.shape[:2]
    out_hw = (512, 1024)
    scale, sh, sw = scale_factors_to_output(h, w, out_hw)

    host = resize_and_crop(img, sh, sw, 0, 0, out_hw).astype(np.float32)
    dev = np.asarray(warp_resize_batch(
        jnp.asarray(img)[None], jnp.asarray([[sh / h, sw / w]], jnp.float32),
        jnp.zeros((1, 2), jnp.float32), out_hw))[0]
    assert np.abs(dev - host).max() < 1.0  # sub-LSB on uint8 pixels


def test_warp_resize_matches_cv2_with_crop_offset():
    """Training-style jitter: scale up then crop at a random offset."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (128, 256, 3), np.uint8)
    h, w = img.shape[:2]
    out_hw = (96, 192)
    sh, sw, oy, ox = 160, 320, 37, 81   # upscale 1.25x, crop at offset

    host = resize_and_crop(img, sh, sw, oy, ox, out_hw).astype(np.float32)
    dev = np.asarray(warp_resize_batch(
        jnp.asarray(img)[None], jnp.asarray([[sh / h, sw / w]], jnp.float32),
        jnp.asarray([[oy, ox]], jnp.float32), out_hw))[0]
    # interior agreement is sub-LSB; cv2's fixed-point coefficients allow
    # slightly more drift on strong upscales
    assert np.abs(dev - host).mean() < 0.5
    assert np.abs(dev - host).max() < 3.0


def _mk_dataset(tmp_path, n=8):
    path = str(tmp_path / "dr.tfrecord")
    write_synthetic_dataset(path, num_images=n, height=96, width=160,
                            num_classes=7, seed=0)
    return path


def _cfg():
    cfg = get_detection_config("efficientdet-d0")
    cfg.override({"image_size": 128, "num_classes": 8}, allow_new_keys=True)
    return cfg


def test_reader_device_resize_contract(tmp_path):
    """device_resize batches carry native uint8 + warp labels, and after
    `prepare_batch` match the host-resized fast_input batch."""
    from udal_tpu.train.train_lib import prepare_batch

    path = _mk_dataset(tmp_path)
    cfg = _cfg()

    r_host = InputReader(path, is_training=True, fast_input=True,
                         prefetch=0, seed=3)
    r_dev = InputReader(path, is_training=True, fast_input=True,
                        device_resize=True, prefetch=0, seed=3)
    imgs_h, labels_h = next(r_host(cfg, 4))
    imgs_d, labels_d = next(r_dev(cfg, 4))

    assert imgs_d.dtype == np.uint8 and imgs_d.shape[1:3] == (96, 160)
    assert labels_d["warp_scale"].shape == (4, 2)
    assert labels_d["warp_offset"].shape == (4, 2)
    np.testing.assert_array_equal(labels_h["gt_boxes"], labels_d["gt_boxes"])
    np.testing.assert_array_equal(labels_h["valid_hw"], labels_d["valid_hw"])

    ph_imgs, ph_labels = prepare_batch(cfg, jnp.asarray(imgs_h), labels_h)
    pd_imgs, pd_labels = prepare_batch(cfg, jnp.asarray(imgs_d), labels_d)
    assert pd_imgs.shape == ph_imgs.shape
    # normalized units: 1/255 of a pixel is ~0.017 after /stddev
    assert float(jnp.abs(pd_imgs - ph_imgs).max()) < 0.06
    for k in ph_labels:
        a = np.asarray(ph_labels[k])
        if a.dtype.kind in "fiu":        # skip source_ids / name strings
            np.testing.assert_allclose(a, np.asarray(pd_labels[k]),
                                       atol=1e-6)


def test_serving_native_entry_matches_host_resized(tmp_path):
    """The device-resized+normalized input tensor entering the network
    matches the host-resized path's (everything downstream is literally the
    same program), and the full warp serve runs end to end."""
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.ops.image_ops import warp_resize_batch

    path = _mk_dataset(tmp_path)
    cfg = _cfg()
    r_host = InputReader(path, is_training=False, fast_input=True,
                         prefetch=0, seed=0)
    r_dev = InputReader(path, is_training=False, fast_input=True,
                        device_resize=True, prefetch=0, seed=0)
    imgs_h, labels_h = next(r_host(cfg, 2))
    imgs_d, labels_d = next(r_dev(cfg, 2))

    # input-tensor equivalence: warp+normalize+mask vs host resize twin
    mean = np.asarray(cfg.mean_rgb, np.float32)
    std = np.asarray(cfg.stddev_rgb, np.float32)
    x_host = (imgs_h.astype(np.float32) - mean) / std
    for i in range(2):
        vh, vw = labels_h["valid_hw"][i]
        x_host[i, vh:] = 0.0
        x_host[i, :, vw:] = 0.0
    x_dev = np.asarray(warp_resize_batch(
        jnp.asarray(imgs_d), jnp.asarray(labels_d["warp_scale"]),
        jnp.asarray(labels_d["warp_offset"]), (128, 128)))
    x_dev = (x_dev - mean) / std
    for i in range(2):
        vh, vw = labels_d["valid_hw"][i]
        x_dev[i, vh:] = 0.0
        x_dev[i, :, vw:] = 0.0
    assert np.abs(x_dev - x_host).max() < 0.06  # sub-LSB in pixel units

    # full warp serve runs end to end and returns finite packed outputs
    d = ServingDriver.create(
        "efficientdet-d0", batch_size=2,
        overrides={"image_size": 128, "num_classes": 8,
                   "fpn_cell_repeats": 1, "box_class_repeats": 1})
    out = [np.asarray(t) for t in d.serve_preprocessed_uint8(
        imgs_d, labels_d["valid_hw"], labels_d["image_scales"],
        warp_scale=labels_d["warp_scale"],
        warp_offset=labels_d["warp_offset"])]
    assert out[0].shape[-1] == 4 and np.isfinite(out[0]).all()


def test_device_resize_mp_workers_match_single_process(tmp_path):
    """Worker processes replay the same RNG stream in device_resize mode:
    native images AND warp labels merge bit-identically."""
    path = _mk_dataset(tmp_path)
    cfg = _cfg()
    ref = list(InputReader(path, is_training=False, fast_input=True,
                           device_resize=True, prefetch=0)(cfg, 2))
    got = list(InputReader(path, is_training=False, fast_input=True,
                           device_resize=True, prefetch=2,
                           num_proc=2)(cfg, 2))
    assert len(got) == len(ref) == 4
    for (ri, rl), (gi, gl) in zip(ref, got):
        np.testing.assert_array_equal(ri, gi)
        np.testing.assert_array_equal(rl["warp_scale"], gl["warp_scale"])
        np.testing.assert_array_equal(rl["warp_offset"], gl["warp_offset"])
        np.testing.assert_array_equal(rl["valid_hw"], gl["valid_hw"])


def test_warp_serve_default_valid_hw_is_network_size(tmp_path):
    """Regression: with warp params and no valid_hw, the default mask must
    cover the NETWORK size (the mask applies post-resize), not the native
    dims — a (64,64) native default on a 128px network blanked 3/4 of the
    upscaled image."""
    from udal_tpu.apps.serving import ServingDriver

    d = ServingDriver.create(
        "efficientdet-d0", batch_size=1,
        overrides={"image_size": 128, "num_classes": 8,
                   "fpn_cell_repeats": 1, "box_class_repeats": 1})
    u8 = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    ws = np.asarray([[2.0, 2.0]], np.float32)   # upscale 64 -> 128
    wo = np.zeros((1, 2), np.float32)
    key0 = d._mc_key
    out_default = [np.asarray(t) for t in d.serve_preprocessed_uint8(
        u8, warp_scale=ws, warp_offset=wo)]
    d._mc_key = key0
    out_full = [np.asarray(t) for t in d.serve_preprocessed_uint8(
        u8, valid_hw=np.asarray([[128, 128]], np.int32),
        warp_scale=ws, warp_offset=wo)]
    for a, b in zip(out_default, out_full):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_device_resize_requires_fast_input():
    with pytest.raises(ValueError):
        InputReader("x", is_training=False, device_resize=True)


def test_device_resize_rejects_oversize_image(tmp_path):
    path = _mk_dataset(tmp_path)
    cfg = _cfg()
    r = InputReader(path, is_training=False, fast_input=True,
                    device_resize=True, native_hw=(64, 64), prefetch=0)
    with pytest.raises(ValueError, match="native canvas"):
        next(r(cfg, 2))
