"""Tensor-parallel (data x model mesh) training-step tests.

The 'model' axis shards conv output channels / BN vectors (GSPMD inserts
the contraction collectives); a (4, 2) mesh step must agree with the pure
data-parallel (8, 1) step. Runs on the 8-device virtual CPU mesh from
conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.data.labels import build_labels
from udal_tpu.parallel.mesh import (make_mesh, param_partition_spec,
                                    shard_batch, shard_state_tp)
from udal_tpu.train.train_lib import create_train_state, make_jitted_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def tiny_cfg():
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 4
    cfg.loss_attenuation = True
    cfg.override({"batch_size": 8}, allow_new_keys=True)
    return cfg


def make_batch(cfg, n=8):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(n, 64, 64, 3), jnp.float32)
    gt_boxes = np.tile(np.asarray([[4.0, 4.0, 40.0, 40.0]], np.float32),
                       (n, 1, 1))
    gt_classes = np.ones((n, 1), np.int32)
    return images, build_labels(cfg, gt_boxes, gt_classes)


def run_step(n_data, n_model, tensor_parallel):
    cfg = tiny_cfg()
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[:n_data * n_model])
    images, labels = make_batch(cfg)
    with mesh:
        if tensor_parallel:
            state = shard_state_tp(mesh, state, tx)
        step = make_jitted_train_step(cfg, model, tx, schedule, 10, mesh,
                                      tensor_parallel=tensor_parallel)
        batch = shard_batch(mesh, {"images": images, **labels})
        images_s = batch.pop("images")
        state, loss_vals = step(state, images_s, batch, jax.random.PRNGKey(1))
        loss = float(loss_vals["loss"])
    return loss, state


def test_param_partition_spec_shards_channels():
    x4 = jnp.zeros((3, 3, 1, 32))
    spec = param_partition_spec("depthwise/kernel", x4, 2)
    assert spec[-1] == "model"
    x1 = jnp.zeros((33,))   # not divisible -> replicated
    assert param_partition_spec("bn/scale", x1, 2) == \
        jax.sharding.PartitionSpec()
    assert param_partition_spec("any", jnp.zeros(()), 2) == \
        jax.sharding.PartitionSpec()


def test_shard_state_tp_preserves_opt_state():
    """Resharding for TP must keep restored optimizer moments (a resume
    with n_model>1 previously reset them via tx.init)."""
    cfg = tiny_cfg()
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    # simulate a restored state with non-zero moments
    ones = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.5,
                                  state.params)
    opt_state = state.opt_state
    leaves, treedef = jax.tree_util.tree_flatten(
        opt_state, is_leaf=lambda n: jax.tree_util.tree_structure(n)
        == jax.tree_util.tree_structure(state.params))
    pdef = jax.tree_util.tree_structure(state.params)
    leaves = [ones if jax.tree_util.tree_structure(l) == pdef else l
              for l in leaves]
    state = state.replace(opt_state=jax.tree_util.tree_unflatten(
        treedef, leaves))
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    with mesh:
        sharded = shard_state_tp(mesh, state, tx)
    flat_before = jax.tree_util.tree_leaves(state.opt_state)
    flat_after = jax.tree_util.tree_leaves(sharded.opt_state)
    assert len(flat_before) == len(flat_after)
    moment_checked = sharded_checked = False
    for b, a in zip(flat_before, flat_after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        if np.asarray(b).size > 1 and np.allclose(np.asarray(b), 0.5):
            moment_checked = True
            if np.asarray(a).shape and np.asarray(a).shape[-1] % 2 == 0 \
                    and a.sharding.spec and a.sharding.spec[-1] == "model":
                sharded_checked = True
    assert moment_checked, "no param-moment leaves found"
    assert sharded_checked, "no moment leaf got channel sharding"


@pytest.mark.slow
def test_tp_step_matches_dp_step():
    loss_dp, _ = run_step(8, 1, tensor_parallel=False)
    loss_tp, state_tp = run_step(4, 2, tensor_parallel=True)
    assert np.isfinite(loss_dp) and np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-3, atol=2e-3)
    # a backbone conv kernel must actually be sharded over 'model'
    k = state_tp.params["backbone"]["blocks_1"]["expand_conv"]["kernel"]
    spec = k.sharding.spec
    assert spec[-1] == "model", spec


@pytest.mark.slow
def test_train_and_evaluate_with_n_model(tmp_path):
    """The epoch loop builds a (data x model) mesh from config.n_model and
    runs a TP-sharded epoch end to end."""
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.data.synthetic import write_synthetic_dataset
    from udal_tpu.train.loop import train_and_evaluate

    data = str(tmp_path / "train.tfrecord")
    write_synthetic_dataset(data, num_images=8, height=64, width=64,
                            num_classes=3, seed=0)
    cfg = tiny_cfg()
    cfg.num_epochs = 1
    cfg.override({"n_model": 2, "batch_size": 4}, allow_new_keys=True)
    reader = InputReader(data, is_training=True)
    hist = train_and_evaluate(cfg, reader(cfg, 4), steps_per_epoch=2,
                              model_dir=str(tmp_path / "m"),
                              log_fn=lambda s: None)
    assert np.isfinite(hist["loss"][-1])
