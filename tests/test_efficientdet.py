import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.models.efficientdet import EfficientDetNet, mc_forward


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


def _tiny_config(**overrides):
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


def _build(cfg, batch=1):
    model = EfficientDetNet(cfg)
    # non-zero input: with zero activations dropout is invisible
    x = jax.random.normal(jax.random.PRNGKey(42), (batch, 128, 128, 3),
                          jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False))()
    return model, variables, x


def test_output_shapes_deterministic():
    cfg = _tiny_config()
    model, variables, x = _build(cfg, batch=2)
    cls_outs, box_outs = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert len(cls_outs) == 5 and len(box_outs) == 5
    # level 3: 128/8 = 16; 9 anchors; 8 classes
    assert cls_outs[0].shape == (2, 16, 16, 9 * 8)
    assert box_outs[0].shape == (2, 16, 16, 9 * 4)
    assert cls_outs[4].shape == (2, 1, 1, 9 * 8)


def test_loss_attenuation_doubles_box_channels():
    cfg = _tiny_config(loss_attenuation=True)
    model, variables, x = _build(cfg)
    _, box_outs = model.apply(variables, x, train=False)
    assert box_outs[0].shape[-1] == 9 * 8  # (mu, sigma) per anchor


def test_mc_forward_vmap_shapes_and_variance():
    cfg = _tiny_config(mc_dropout=True, mc_dropoutrate=0.1, is_training_bn=False)
    model, variables, x = _build(cfg)
    # Freshly-initialized eval-mode BN decays activations to ~0 over depth;
    # scale the input so dropout-induced differences stay representable.
    x = x * 1e4
    cls_s, box_s = jax.jit(
        lambda v, x, k: mc_forward(model, v, x, k, num_samples=4)
    )(variables, x, jax.random.PRNGKey(7))
    assert cls_s[0].shape == (4, 1, 16, 16, 72)
    assert box_s[0].shape == (4, 1, 16, 16, 36)
    # samples must differ across the leading axis
    std_over_samples = np.asarray(cls_s[0]).std(axis=0).mean()
    assert std_over_samples > 0
    # same key -> identical samples (deterministic seeding)
    cls_s2, _ = jax.jit(
        lambda v, x, k: mc_forward(model, v, x, k, num_samples=4)
    )(variables, x, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(cls_s[0]), np.asarray(cls_s2[0]))


def test_segmentation_head():
    cfg = _tiny_config(heads=["object_detection", "segmentation"])
    model, variables, x = _build(cfg)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 3
    seg = outs[2]
    assert seg.shape[0] == 1 and seg.shape[-1] == cfg.seg_num_classes


def test_train_mode_updates_batch_stats():
    cfg = _tiny_config()
    model, variables, x = _build(cfg)
    out, mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(0)})
    )(variables, x)
    assert "batch_stats" in mutated
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a))
               for b, a in zip(before, after))


def test_qufpn_topology_runs():
    cfg = _tiny_config(fpn_name="qufpn")
    model, variables, x = _build(cfg)
    cls_outs, box_outs = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert cls_outs[0].shape == (1, 16, 16, 72)
    assert len(cls_outs) == 5


def test_d6_sum_fusion_runs():
    cfg = _tiny_config(fpn_weight_method="sum")
    model, variables, x = _build(cfg)
    cls_outs, _ = model.apply(variables, x, train=False)
    assert cls_outs[0].shape[-1] == 72


def test_head_only_mc_shares_backbone():
    cfg = _tiny_config(mc_dropout=True, mc_classheadrate=0.1,
                       mc_boxheadrate=0.1, is_training_bn=False)
    model, variables, x = _build(cfg)
    x = x * 1e4
    cls_s, box_s = jax.jit(
        lambda v, x, k: mc_forward(model, v, x, k, num_samples=3)
    )(variables, x, jax.random.PRNGKey(5))
    assert cls_s[0].shape[0] == 3
    # heads still stochastic across samples
    assert np.asarray(cls_s[0]).std(axis=0).mean() > 0
