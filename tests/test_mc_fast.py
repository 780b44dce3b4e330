"""Tests for the fast MC-dropout path (models/mc_fast.py).

The fold is exact algebra (dropout commutes with the SE mean; a 1x1 conv
absorbs per-channel scales), so with the dropout mask pinned the fast path
must match the naive forward to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full-model compiles dominate these tests — heavy (nightly) tier
pytestmark = pytest.mark.slow

from udal_tpu.config import get_detection_config
from udal_tpu.models.efficientdet import EfficientDetNet, mc_forward
from udal_tpu.models.mc_fast import (PACK, fast_mc_eligible,
                                     folded_block0_tail, mc_shared_prefix)


def small_cfg(mc=True):
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "256x128"
    cfg.num_classes = 3
    cfg.loss_attenuation = True
    cfg.mc_dropout = mc
    cfg.mc_dropoutrate = 0.05 if mc else 0.0
    cfg.mc_dropoutsamp = 2
    cfg.is_training_bn = False
    cfg.mc_fast_fold = True  # opt into the fold (off by default; see mc_fast)
    return cfg


def init_vars(model, h=128, w=256):
    x = jnp.zeros((1, h, w, 3))
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x, train=False)


def test_fast_path_matches_full_forward_with_unit_mask():
    """mask=1 removes the stochastic part: prefix + fold + from-block1 must
    reproduce the no-dropout forward exactly (same params)."""
    cfg = small_cfg(mc=False)  # module applies no dropout anywhere
    model = EfficientDetNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 128, 256, 3), jnp.float32)
    variables = init_vars(model)

    cls_ref, box_ref = model.apply(variables, x, train=False)

    x0p, x0m = mc_shared_prefix(variables, x, jnp.float32)
    c0 = x0p.shape[-1] // PACK
    x1 = folded_block0_tail(variables, x0p, x0m, jax.random.PRNGKey(0),
                            rate=0.0, out_hw=(64, 128),
                            mask=jnp.ones((2, c0), jnp.float32))
    cls_fast, box_fast = model.apply(
        variables, x1, False, method=EfficientDetNet.forward_from_block1)

    for a, b in zip(list(cls_ref) + list(box_ref),
                    list(cls_fast) + list(box_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_folded_tail_matches_explicit_masked_tail():
    """With a random pinned mask, the folded tail equals the explicit
    dropout -> SE -> project -> bn2 computation."""
    cfg = small_cfg()
    model = EfficientDetNet(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 128, 256, 3), jnp.float32)
    variables = init_vars(model)

    x0p, x0m = mc_shared_prefix(variables, x, jnp.float32)
    b = x0p.shape[0]
    c0 = x0p.shape[-1] // PACK
    mask = jnp.asarray((rng.rand(b, c0) > 0.05) / 0.95, jnp.float32)

    got = folded_block0_tail(variables, x0p, x0m, jax.random.PRNGKey(0),
                             rate=0.05, out_hw=(64, 128), mask=mask)

    # explicit reference tail on the unpacked x0
    p0 = variables["params"]["backbone"]["blocks_0"]
    s0 = variables["batch_stats"]["backbone"]["blocks_0"]
    x0 = np.asarray(x0p).reshape(b, 64, 128, c0)
    u = x0 * np.asarray(mask)[:, None, None, :]
    se_in = u.mean(axis=(1, 2), keepdims=True)
    wr, br = np.asarray(p0["se"]["reduce"]["kernel"])[0, 0], \
        np.asarray(p0["se"]["reduce"]["bias"])
    we, be = np.asarray(p0["se"]["expand"]["kernel"])[0, 0], \
        np.asarray(p0["se"]["expand"]["bias"])
    z = se_in @ wr + br
    z = z * (1 / (1 + np.exp(-z)))  # swish
    se = z @ we + be
    s = 1 / (1 + np.exp(-se))
    v = s * u
    wp = np.asarray(p0["project_conv"]["kernel"])[0, 0]
    y = v @ wp
    eps = 1e-3
    scale = np.asarray(s0["bn2"]["bn"]["scale"]) / np.sqrt(
        np.asarray(s0["bn2"]["bn"]["var"]) + eps) \
        if "scale" in s0["bn2"]["bn"] else None
    # batch_stats only holds mean/var; scale/bias live in params
    bnp = variables["params"]["backbone"]["blocks_0"]["bn2"]["bn"]
    bns = variables["batch_stats"]["backbone"]["blocks_0"]["bn2"]["bn"]
    scale = np.asarray(bnp["scale"]) / np.sqrt(np.asarray(bns["var"]) + eps)
    bias = np.asarray(bnp["bias"]) - np.asarray(bns["mean"]) * scale
    want = y * scale + bias

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_mc_forward_uses_fast_path_and_returns_valid_samples():
    cfg = small_cfg()
    # untrained activations decay through depth, so use a dramatic rate to
    # keep the per-sample variation above f32 resolution at the heads
    cfg.mc_dropoutrate = 0.5
    model = EfficientDetNet(cfg)
    variables = init_vars(model)
    assert fast_mc_eligible(cfg, variables)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 128, 256, 3), jnp.float32)
    cls_s, box_s = mc_forward(model, variables, x, jax.random.PRNGKey(3), 3)
    assert cls_s[0].shape[0] == 3 and box_s[0].shape[0] == 3
    for lvl in list(cls_s) + list(box_s):
        assert np.all(np.isfinite(np.asarray(lvl, np.float32)))
    # per-sample variation: the block-1 inputs must differ across samples
    # (with untrained params the delta decays below f32 resolution by the
    # heads, so assert at the fold output; end-to-end distributional
    # equality is covered by test_fast_path_statistics_match_naive_vmap)
    x0p, x0m = mc_shared_prefix(variables, x, jnp.float32)
    k0a, _ = jax.random.split(jax.random.split(jax.random.PRNGKey(3), 3)[0])
    k0b, _ = jax.random.split(jax.random.split(jax.random.PRNGKey(3), 3)[1])
    ta = folded_block0_tail(variables, x0p, x0m, k0a, 0.5, (64, 128))
    tb = folded_block0_tail(variables, x0p, x0m, k0b, 0.5, (64, 128))
    assert float(jnp.abs(ta - tb).max()) > 0.0


def test_fast_path_statistics_match_naive_vmap():
    """Sample-mean of fast and naive paths agree (same distribution)."""
    cfg = small_cfg()
    model = EfficientDetNet(cfg)
    variables = init_vars(model)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 128, 256, 3), jnp.float32)
    t = 48

    from udal_tpu.models.mc_fast import mc_forward_fast
    cls_f, _ = mc_forward_fast(model, variables, x, jax.random.PRNGKey(5), t)

    keys = jax.random.split(jax.random.PRNGKey(6), t)
    cls_n, _ = jax.vmap(lambda k: model.apply(
        variables, x, train=False, rngs={"dropout": k}))(keys)

    for a, b in zip(cls_f, cls_n):
        ma, mb = np.asarray(a).mean(0), np.asarray(b).mean(0)
        sd = np.asarray(a).std(0).mean() + 1e-6
        # means over 48 samples agree within a few standard errors
        assert np.abs(ma - mb).mean() < 6 * sd / np.sqrt(t) + 1e-4


def test_ineligible_configs_fall_back():
    cfg = small_cfg()
    cfg.backbone_name = "efficientnet-lite0"  # no SE -> fold ineligible
    model = EfficientDetNet(cfg)
    variables = init_vars(model)
    assert not fast_mc_eligible(cfg, variables)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(1, 128, 256, 3), jnp.float32)
    cls_s, box_s = mc_forward(model, variables, x, jax.random.PRNGKey(8), 2)
    assert cls_s[0].shape[0] == 2


def test_fused_block01_fold_matches_full_forward_with_unit_masks():
    """The composed block0-tail ⊕ block1-expand matmul with unit masks must
    reproduce the no-dropout forward exactly."""
    from udal_tpu.models.mc_fast import folded_block0_block1_expand

    cfg = small_cfg(mc=False)
    model = EfficientDetNet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 128, 256, 3), jnp.float32)
    variables = init_vars(model)

    cls_ref, box_ref = model.apply(variables, x, train=False)

    x0p, x0m = mc_shared_prefix(variables, x, jnp.float32, pack=4)
    c0 = x0p.shape[-1] // 4
    x1e = folded_block0_block1_expand(
        variables, x0p, x0m, jax.random.PRNGKey(0), rate=0.0,
        out_hw=(64, 128), pack=4,
        mask2=jnp.ones((2, c0), jnp.float32),
        mask1=jnp.ones((2, 6 * 16), jnp.float32))
    cls_fast, box_fast = model.apply(
        variables, x1e, False,
        method=EfficientDetNet.forward_from_block1_expanded)

    for a, b in zip(list(cls_ref) + list(box_ref),
                    list(cls_fast) + list(box_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_all_samples_fold_matches_per_sample_fold():
    """v4 (one dot, t as a free rhs dim) equals the per-sample folded tail
    for the same pinned masks."""
    from udal_tpu.models.mc_fast import (folded_block0_all_samples,
                                         folded_block0_tail)

    cfg = small_cfg()
    model = EfficientDetNet(cfg)
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(2, 128, 256, 3), jnp.float32)
    variables = init_vars(model)

    x0, x0m = mc_shared_prefix(variables, x, jnp.float32, pack=None)
    b, _, _, c0 = x0.shape
    t = 3
    masks = jnp.asarray((rng.rand(t, b, c0) > 0.05) / 0.95, jnp.float32)

    y_all = folded_block0_all_samples(variables, x0, x0m,
                                      jax.random.PRNGKey(0), 0.05, t,
                                      masks=masks)
    assert y_all.shape[:2] == (b, t)

    x0p = x0.reshape(b, -1, PACK * c0)
    for ti in range(t):
        want = folded_block0_tail(variables, x0p, x0m, jax.random.PRNGKey(0),
                                  0.05, (64, 128), mask=masks[ti])
        np.testing.assert_allclose(np.asarray(y_all[:, ti]),
                                   np.asarray(want), rtol=3e-4, atol=3e-4)


def test_fast_path_exact_on_b1_backbone():
    """d1-class backbones (two e=1 repeats of block 0) use the fold too:
    unit-mask fast path == no-dropout forward."""
    cfg = small_cfg(mc=False)
    cfg.backbone_name = "efficientnet-b1"
    model = EfficientDetNet(cfg)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 128, 256, 3), jnp.float32)
    variables = init_vars(model)

    cls_ref, box_ref = model.apply(variables, x, train=False)

    from udal_tpu.models.mc_fast import folded_block0_all_samples
    x0, x0m = mc_shared_prefix(variables, x, jnp.float32, pack=None)
    c0 = x0.shape[-1]
    y_all = folded_block0_all_samples(
        variables, x0, x0m, jax.random.PRNGKey(0), 0.0, 1,
        masks=jnp.ones((1, 1, c0), jnp.float32))
    cls_fast, box_fast = model.apply(
        variables, y_all[:, 0], False,
        method=EfficientDetNet.forward_from_block1)
    for a, b in zip(list(cls_ref) + list(box_ref),
                    list(cls_fast) + list(box_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_eligibility_on_variants():
    for name, want in [("efficientdet-d1", True),
                       ("efficientdet-lite0", False)]:  # lite: no SE
        cfg = small_cfg()
        cfg.backbone_name = {"efficientdet-d1": "efficientnet-b1",
                             "efficientdet-lite0": "efficientnet-lite0"}[name]
        model = EfficientDetNet(cfg)
        variables = init_vars(model)
        assert fast_mc_eligible(cfg, variables) == want, name
