"""SeparableConv.fuse_full: dense-composed kernel == depthwise+pointwise.

The fused schedule (one kxk dense conv whose kernel is the outer product of
the depthwise and pointwise kernels) must be numerically equivalent and
checkpoint-compatible (identical param tree) with the separable pair it
replaces — it is a serving-time compute-schedule swap, not a different model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from udal_tpu.models.bifpn import SeparableConv


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v.shape
    return out


def test_module_parity_and_param_tree():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 24, 24), jnp.float32)
    sep = SeparableConv(40, 3, use_bias=True)
    fused = SeparableConv(40, 3, use_bias=True, fuse_full=True)
    v = sep.init(jax.random.PRNGKey(0), x)
    v_f = fused.init(jax.random.PRNGKey(0), x)
    assert _tree_paths(v["params"]) == _tree_paths(v_f["params"])
    y_sep = sep.apply(v, x)
    y_fused = fused.apply(v, x)   # same params, fused schedule
    np.testing.assert_allclose(np.asarray(y_sep), np.asarray(y_fused),
                               atol=2e-5, rtol=1e-5)


def test_module_parity_no_bias():
    x = jnp.asarray(np.random.RandomState(1).randn(3, 8, 8, 16), jnp.float32)
    sep = SeparableConv(16, 3, use_bias=False)
    fused = SeparableConv(16, 3, use_bias=False, fuse_full=True)
    v = sep.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(np.asarray(sep.apply(v, x)),
                               np.asarray(fused.apply(v, x)),
                               atol=2e-5, rtol=1e-5)


def test_full_model_parity():
    """Whole-model detections match with `fused_sepconv` flipped on,
    reusing the *same* init params (checkpoint compatibility)."""
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "128x128"
    cfg.num_classes = 4
    cfg.loss_attenuation = True
    cfg.mc_dropout = False
    cfg.is_training_bn = False
    x = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3), jnp.float32)

    model = EfficientDetNet(cfg, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)

    cfg_f = get_detection_config("efficientdet-d0")
    cfg_f.override(cfg.as_dict(), allow_new_keys=True)
    cfg_f.fused_sepconv = True
    model_f = EfficientDetNet(cfg_f, dtype=jnp.float32)
    v_f = model_f.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, train=False)
    assert _tree_paths(v_f["params"]) == _tree_paths(variables["params"])

    cls_a, box_a = model.apply(variables, x, train=False)[:2]
    cls_b, box_b = model_f.apply(variables, x, train=False)[:2]
    for a, b in zip(list(cls_a) + list(box_a), list(cls_b) + list(box_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)
