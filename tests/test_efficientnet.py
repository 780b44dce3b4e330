import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.models.efficientnet import EfficientNet, backbone_spec


def _count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def _shape_init(model, x):
    """Parameter shapes without any compute (fast param counting)."""
    return jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False))


def _init(model, x):
    return jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False))()


# Golden trainable-parameter counts from the reference unit tests
# (`backbone/efficientnet_builder_test.py:46-60`,
#  `efficientnet_lite_builder_test.py:44-62`).
GOLDEN = {
    "efficientnet-b0": 5_288_548,
    "efficientnet-b1": 7_794_184,
    "efficientnet-b2": 9_109_994,
    "efficientnet-b3": 12_233_232,
    "efficientnet-b4": 19_341_616,
    "efficientnet-b5": 30_389_784,
    "efficientnet-b6": 43_040_704,
    "efficientnet-b7": 66_347_960,
    "efficientnet-lite0": 4_652_008,
    "efficientnet-lite1": 5_416_680,
    "efficientnet-lite2": 6_092_072,
    "efficientnet-lite3": 8_197_096,
    "efficientnet-lite4": 13_006_568,
}


@pytest.mark.parametrize("name", list(GOLDEN))
def test_param_count_golden(name):
    act = "relu6" if "lite" in name else "swish"
    model = EfficientNet(backbone_spec(name), act_type=act, include_top=True)
    variables = _shape_init(model, jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert _count_params(variables["params"]) == GOLDEN[name]


def test_feature_endpoints_shapes():
    model = EfficientNet(backbone_spec("efficientnet-b0"))
    x = jnp.zeros((2, 128, 128, 3))
    variables = _init(model, x)
    outs = model.apply(variables, x, train=False)
    # [features, r1(64), r2(32), r3(16), r4(8), r5(4)]
    assert len(outs) == 6
    assert outs[3].shape[:3] == (2, 16, 16)   # stride 8  -> P3 input
    assert outs[4].shape[:3] == (2, 8, 8)     # stride 16 -> P4 input
    assert outs[5].shape[:3] == (2, 4, 4)     # stride 32 -> P5 input


def test_mc_dropout_stochastic_and_seeded():
    model = EfficientNet(backbone_spec("efficientnet-b0"), mc_dropoutrate=0.1)
    x = jnp.ones((1, 64, 64, 3))
    variables = _init(model, x)
    apply = jax.jit(lambda v, x, k: model.apply(v, x, train=False,
                                                rngs={"dropout": k})[3])
    out_a = apply(variables, x, jax.random.PRNGKey(2))
    out_b = apply(variables, x, jax.random.PRNGKey(3))
    out_a2 = apply(variables, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_a2))


def test_no_dropout_is_deterministic_without_rng():
    model = EfficientNet(backbone_spec("efficientnet-b0"))
    x = jnp.ones((1, 64, 64, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert np.all(np.isfinite(np.asarray(out[0])))
