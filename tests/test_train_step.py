import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.data.labels import build_labels
from udal_tpu.parallel.mesh import make_mesh, shard_batch
from udal_tpu.train.train_lib import (create_train_state, eval_step,
                                      make_jitted_train_step)


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


def _setup(batch=2, **overrides):
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    cfg.override({"batch_size": batch}, allow_new_keys=True)
    for k, v in overrides.items():
        cfg.override({k: v}, allow_new_keys=True)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 64, 64, 3), jnp.float32)
    gt_boxes = np.zeros((batch, 5, 4), np.float32)
    gt_classes = np.zeros((batch, 5), np.int32)
    for b in range(batch):
        for i in range(3):
            y1, x1 = rng.uniform(0, 30, 2)
            gt_boxes[b, i] = [y1, x1, y1 + rng.uniform(8, 30),
                              x1 + rng.uniform(8, 30)]
            gt_classes[b, i] = rng.randint(1, 8)
    labels = build_labels(cfg, gt_boxes, gt_classes)
    return cfg, model, state, tx, schedule, images, labels


def test_train_step_runs_and_decreases_loss():
    cfg, model, state, tx, schedule, images, labels = _setup()
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10)
    rng = jax.random.PRNGKey(1)
    state, vals = step_fn(state, images, labels, rng)
    first = float(vals["loss"])
    assert np.isfinite(first)
    assert int(state.step) == 1
    for _ in range(5):
        state, vals = step_fn(state, images, labels, rng)
    assert float(vals["loss"]) < first


def test_train_step_loss_attenuation():
    cfg, model, state, tx, schedule, images, labels = _setup(
        loss_attenuation=True)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10)
    state, vals = step_fn(state, images, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(vals["loss"]))


def test_train_step_on_8_device_mesh():
    cfg, model, state, tx, schedule, images, labels = _setup(batch=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    with mesh:
        step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10, mesh)
        sharded = shard_batch(mesh, {"images": images, **labels})
        images_s = sharded.pop("images")
        state, vals = step_fn(state, images_s, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(vals["loss"]))
    assert int(state.step) == 1


def test_eval_step():
    cfg, model, state, tx, schedule, images, labels = _setup()
    vals = jax.jit(lambda s, i, l: eval_step(cfg, model, s, i, l))(
        state, images, labels)
    assert np.isfinite(float(vals["val_det_loss"]))


def test_ema_params_track():
    cfg, model, state, tx, schedule, images, labels = _setup()
    assert state.ema_params is not None
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10)
    new_state, _ = step_fn(state, images, labels, jax.random.PRNGKey(1))
    # EMA moved slightly toward new params but is not equal to them
    p0 = jax.tree_util.tree_leaves(new_state.params)[0]
    e0 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))


def test_train_step_stac_split():
    cfg, model, state, tx, schedule, images, labels = _setup(
        batch=4, ssl_method="STAC", unlabeled_start=2, stac_lambda=0.5)
    # append a pseudo-score column to groundtruth_data
    gt = np.asarray(labels["groundtruth_data"])
    scores = np.concatenate([np.full((4, gt.shape[1], 1), 0.8, np.float32)],
                            axis=-1)
    labels = dict(labels)
    labels["groundtruth_data"] = np.concatenate([gt, scores], axis=-1)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10)
    state, vals = step_fn(state, images, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(vals["loss"]))
    assert "pseudo_det_loss" in vals


def test_train_step_csd():
    cfg, model, state, tx, schedule, images, labels = _setup(
        batch=4, ssl_method="CSD", unlabeled_start=2, csd_ramp=True,
        csd_BE=True, csd_BE_thr=0.0)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10)
    state, vals = step_fn(state, images, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(vals["loss"]))
    assert "unsup_cls_loss" in vals and "unsup_box_loss" in vals


def test_grouped_batch_stats_matches_reference_groups():
    """Grouped BN moments (≤group_size replicas) — the reference's
    TpuBatchNormalization semantics (`utils.py:186-227`) via shard_map."""
    import jax
    import numpy as np

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from udal_tpu.parallel.mesh import grouped_batch_stats, make_mesh

    mesh = make_mesh(n_data=8)
    rng = np.random.RandomState(0)
    x = rng.randn(16, 4, 3).astype(np.float32)   # 2 samples per device
    mean, var = grouped_batch_stats(x, mesh, group_size=4)
    mean, var = np.asarray(mean), np.asarray(var)
    assert mean.shape == (8, 3)
    # devices 0-3 share group 0 (first 8 samples), 4-7 group 1
    g0 = x[:8].reshape(-1, 3)
    np.testing.assert_allclose(mean[0], g0.mean(0), rtol=1e-5)
    np.testing.assert_allclose(mean[3], mean[0], rtol=1e-6)
    np.testing.assert_allclose(var[0], g0.var(0), rtol=1e-4, atol=1e-5)
    g1 = x[8:].reshape(-1, 3)
    np.testing.assert_allclose(mean[4], g1.mean(0), rtol=1e-5)
    assert not np.allclose(mean[0], mean[4])


def test_train_matmul_precision_in_lowered_hlo():
    """`train_matmul_precision='highest'` must land HIGHEST precision on the
    step's convs/dots at trace time (TPUs otherwise lower f32 convs to bf16
    multiplies, which collapses from-scratch training — docs/ROUND3.md)."""
    cfg, model, state, tx, schedule, images, labels = _setup()
    import functools

    from udal_tpu.train.train_lib import train_step

    def lower(c):
        fn = functools.partial(train_step, c, model, tx, schedule, 10)
        return jax.jit(fn).lower(state, images, labels,
                                 jax.random.PRNGKey(0)).as_text()

    assert "HIGHEST" in lower(cfg)
    cfg2, *_ = _setup(train_matmul_precision=None)
    assert "HIGHEST" not in lower(cfg2)
