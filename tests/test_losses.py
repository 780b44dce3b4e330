import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.train import losses as loss_lib


def test_huber_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.RandomState(0)
    t = rng.randn(32, 4).astype(np.float32)
    p = rng.randn(32, 4).astype(np.float32)
    ours = np.asarray(loss_lib.huber(t, p, 0.1))
    h = tf.keras.losses.Huber(0.1, reduction="none")
    # Keras Huber averages the last axis
    ref = h(t[..., None], p[..., None]).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_focal_loss_matches_reference_formula():
    rng = np.random.RandomState(1)
    y = (rng.rand(8, 4, 4, 18) > 0.9).astype(np.float32)
    logits = rng.randn(8, 4, 4, 18).astype(np.float32)
    alpha, gamma, norm = 0.25, 1.5, 10.0
    ours = np.asarray(loss_lib.focal_loss(y, logits, alpha, gamma, norm))

    prob = 1 / (1 + np.exp(-logits))
    p_t = y * prob + (1 - y) * (1 - prob)
    af = y * alpha + (1 - y) * (1 - alpha)
    mod = (1 - p_t) ** gamma
    ce = np.maximum(logits, 0) - logits * y + np.log1p(np.exp(-np.abs(logits)))
    expected = af * mod * ce / norm
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-6)


def test_box_loss_plain_and_attenuated():
    rng = np.random.RandomState(2)
    tgt = rng.randn(2, 4, 4, 36).astype(np.float32)
    tgt[rng.rand(*tgt.shape) < 0.5] = 0.0  # sparsify like real targets
    out = rng.randn(2, 4, 4, 36).astype(np.float32)
    plain = float(loss_lib.box_loss(tgt, out, jnp.asarray(5.0)))
    assert np.isfinite(plain) and plain > 0

    out_att = np.concatenate([out, np.abs(rng.randn(2, 4, 4, 36)) + 0.1],
                             axis=-1).astype(np.float32)
    att = float(loss_lib.box_loss(tgt, out_att, jnp.asarray(5.0),
                                  loss_att=True))
    assert np.isfinite(att)


def test_box_loss_attenuation_reduces_weight_of_large_errors():
    """With a large squared error, higher sigma must attenuate the loss
    (1/sigma^2 error weighting dominates the log penalty)."""
    tgt = np.ones((1, 1, 1, 4), np.float32)
    mu = np.zeros((1, 1, 1, 4), np.float32)
    low_sigma = np.full((1, 1, 1, 4), 0.5, np.float32)
    high_sigma = np.full((1, 1, 1, 4), 2.0, np.float32)
    lo = float(loss_lib.box_loss(tgt, np.concatenate([mu, low_sigma], -1),
                                 jnp.asarray(1.0), loss_att=True,
                                 loss_type="mse"))
    hi = float(loss_lib.box_loss(tgt, np.concatenate([mu, high_sigma], -1),
                                 jnp.asarray(1.0), loss_att=True,
                                 loss_type="mse"))
    assert hi < lo


def test_detection_loss_end_to_end_shapes():
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    rng = np.random.RandomState(3)
    levels = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    cls_outputs = [jnp.asarray(rng.randn(2, h, w, 9 * 8), jnp.float32)
                   for h, w in levels]
    box_outputs = [jnp.asarray(rng.randn(2, h, w, 36), jnp.float32)
                   for h, w in levels]
    labels = {"mean_num_positives": jnp.asarray([3.0, 3.0])}
    for i, (h, w) in enumerate(levels):
        level = i + 3
        ct = rng.randint(-1, 8, (2, h, w, 9))
        labels[f"cls_targets_{level}"] = jnp.asarray(ct, jnp.int32)
        bt = rng.randn(2, h, w, 36) * (rng.rand(2, h, w, 36) > 0.8)
        labels[f"box_targets_{level}"] = jnp.asarray(bt, jnp.float32)
    total, vals = loss_lib.detection_loss(cfg, cls_outputs, box_outputs, labels)
    assert np.isfinite(float(total))
    assert set(vals) >= {"det_loss", "cls_loss", "box_loss"}


def test_csd_consistency_zero_for_consistent_outputs():
    cfg = get_detection_config("efficientdet-d0")
    cfg.num_classes = 8
    cfg.csd_BE = False
    rng = np.random.RandomState(4)
    cls = [jnp.asarray(rng.randn(1, 4, 4, 72), jnp.float32)]
    box = [jnp.asarray(rng.randn(1, 4, 4, 36), jnp.float32)]
    # construct perfectly flip-consistent aug outputs
    cls_aug = [jnp.flip(cls[0], axis=2)]
    sign = jnp.tile(jnp.asarray([1.0, -1.0, 1.0, 1.0]), 9)
    box_aug = [jnp.flip(box[0] * sign, axis=2)]
    u_cls, u_box = loss_lib.csd_consistency_loss(cfg, cls, box, cls_aug, box_aug)
    np.testing.assert_allclose(float(u_cls), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(u_box), 0.0, atol=1e-10)


def test_l2_regularization_excludes_bn_and_bias():
    params = {
        "conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "bn": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
    }
    reg = float(loss_lib.l2_regularization(params, 2.0))
    assert reg == pytest.approx(4.0)  # only conv kernel: 2.0 * 4 / 2


def test_box_loss_strict_parity_mode():
    """strict_parity reproduces the reference's second-half-slice sigma^2/2
    compensation (`train_lib.py:817-845`); default mode compensates the
    true (th, tw) channels. Both modes agree when the same channels are
    selected (A=1: second half == (th, tw))."""
    import jax.numpy as jnp
    import numpy as np

    from udal_tpu.train.losses import box_loss

    rng = np.random.RandomState(0)
    # A=1 anchor: channel layout (ty, tx, th, tw | s_y, s_x, s_h, s_w) —
    # the second half of mu IS (th, tw), so both modes must agree exactly
    t = jnp.asarray(rng.randn(2, 4, 4, 4), jnp.float32)
    o = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    npos = jnp.asarray(3.0)
    a = box_loss(t, o, npos, loss_att=True, loss_type="mse",
                 strict_parity=False)
    b = box_loss(t, o, npos, loss_att=True, loss_type="mse",
                 strict_parity=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    # A=2 anchors: strict slices anchors {1}, default slices coords {2,3}
    t2 = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    o2 = jnp.asarray(rng.randn(2, 4, 4, 16), jnp.float32)
    a2 = box_loss(t2, o2, npos, loss_att=True, loss_type="mse",
                  strict_parity=False)
    b2 = box_loss(t2, o2, npos, loss_att=True, loss_type="mse",
                  strict_parity=True)
    assert abs(float(a2) - float(b2)) > 1e-8

    # strict mode hand-check: mu + [0]*half + sigma^2/2 on second half
    mu, sigma = np.asarray(o2[..., :8]), np.asarray(o2[..., 8:])
    mu_adj = mu.copy()
    mu_adj[..., 4:] += sigma[..., 4:] ** 2 / 2
    mask = (np.asarray(t2) != 0).astype(np.float32)
    nll = ((np.asarray(t2) - mu_adj) ** 2 / sigma ** 2 +
           np.log1p(sigma ** 2))
    expect = 0.25 * np.sum(nll * mask) / (3.0 * 4.0)
    np.testing.assert_allclose(float(b2), expect, rtol=1e-5)


def test_box_loss_beta_nll_gradient_semantics():
    """beta-NLL (la_beta_nll): beta=0 is the reference-parity NLL; beta=1
    makes the mu-gradient identical to the plain (non-attenuated) box-loss
    gradient while sigma still receives a learning signal.

    This is the stabilization for the measured seed-dependent collapse
    (docs/COLLAPSE_ROOTCAUSE.md): plain NLL multiplies mu-gradients by
    1/sigma^2 (1e4x at the 0.01 clip floor), which crushes every other
    gradient under the global-norm clip.
    """
    rng = np.random.RandomState(7)
    tgt = rng.randn(1, 2, 2, 8).astype(np.float32)
    tgt[rng.rand(*tgt.shape) < 0.3] = 0.0
    mu = rng.randn(1, 2, 2, 8).astype(np.float32)
    sigma = (np.abs(rng.randn(1, 2, 2, 8)) * 0.2 + 0.02).astype(np.float32)
    npos = jnp.asarray(3.0)

    def att(mu_, sigma_, beta):
        out = jnp.concatenate([mu_, sigma_], -1)
        return loss_lib.box_loss(tgt, out, npos, loss_att=True,
                                 loss_type="mse", beta_nll=beta)

    # beta=0 must equal the existing (default) attenuated loss exactly.
    base = loss_lib.box_loss(tgt, np.concatenate([mu, sigma], -1), npos,
                             loss_att=True, loss_type="mse")
    assert float(att(mu, sigma, 0.0)) == float(base)

    # beta=1 mu-gradient == plain box-loss mu-gradient evaluated at the
    # compensated mu (the sigma^2/2 hw compensation shifts mu on the
    # (th, tw) channels before the residual; it is sigma-only, so the
    # chain rule through mu is the identity).
    coord = np.arange(mu.shape[-1]) % 4
    hw = (coord >= 2).astype(np.float32)
    mu_comp = mu + hw * np.square(sigma) / 2.0
    g_beta = jax.grad(lambda m: att(m, jnp.asarray(sigma), 1.0))(
        jnp.asarray(mu))
    g_plain = jax.grad(
        lambda m: loss_lib.box_loss(tgt, m, npos, loss_type="mse"))(
        jnp.asarray(mu_comp))
    np.testing.assert_allclose(np.asarray(g_beta), 0.25 * np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)

    # sigma still learns: gradient wrt sigma is non-zero under beta=1.
    g_sigma = jax.grad(lambda s: att(jnp.asarray(mu), s, 1.0))(
        jnp.asarray(sigma))
    assert float(jnp.max(jnp.abs(g_sigma))) > 0
