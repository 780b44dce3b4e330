import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.models.ensemble import init_ensemble, ensemble_forward
from udal_tpu.ops.postprocess import postprocess_global


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


def test_ensemble_forward_and_fusion():
    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    model, stacked = init_ensemble(cfg, 3, jax.random.PRNGKey(0), (64, 64))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 100

    cls_s, box_s = jax.jit(lambda v, x: ensemble_forward(model, v, x))(
        stacked, x)
    assert cls_s[0].shape[0] == 3          # member axis
    # members differ
    assert float(jnp.abs(cls_s[0][0] - cls_s[0][1]).max()) > 0

    det = jax.jit(lambda c, b: postprocess_global(cfg, list(c), list(b)))(
        cls_s, box_s)
    assert det.sigma_mc is not None        # epistemic box sigma from members
    assert det.sigma_cls is not None       # class-logit sigma from members
    assert det.boxes.shape == (2, 100, 4)
    sig = np.asarray(det.sigma_mc)
    valid = np.asarray(det.valid_len)
    assert valid.min() >= 0
    assert np.all(np.isfinite(sig))
