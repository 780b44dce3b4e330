import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.config import get_detection_config
from udal_tpu.models.ensemble import init_ensemble, ensemble_forward
from udal_tpu.ops.postprocess import postprocess_global


pytestmark = pytest.mark.slow  # heavy model tier: compile-bound, run nightly


def test_ensemble_product_path_end_to_end(tmp_path):
    """BASELINE config #3 as a product capability: train two tiny members,
    serve them through `ServingDriver.create_ensemble` (CLI
    `inspect --ensemble_dirs`), and produce uncertainty artifacts."""
    from udal_tpu import cli
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.data.synthetic import write_synthetic_dataset

    data = str(tmp_path / "train.tfrecord")
    write_synthetic_dataset(data, num_images=4, height=64, width=64,
                            num_classes=3, seed=0)
    hparams = ("image_size=64,num_classes=4,save_freq=1,"
               "mc_dropout=False,loss_attenuation=False")
    dirs = []
    for m in range(2):
        d = str(tmp_path / f"member{m}")
        cli.main(["train", "--train_file_pattern", data, "--model_dir", d,
                  "--hparams", hparams, "--seed", str(m),
                  "--batch_size", "2", "--num_epochs", "1",
                  "--steps_per_epoch", "2"])
        dirs.append(d)

    cfg = get_detection_config("efficientdet-d0")
    cfg.override(hparams, allow_new_keys=True)
    driver = ServingDriver.create_ensemble(cfg, dirs, batch_size=1)
    assert driver.num_members == 2
    imgs = (np.random.RandomState(0).rand(1, 64, 64, 3) * 255
            ).astype(np.uint8)
    det = driver.serve_detections(imgs)
    assert det.sigma_mc is not None and det.sigma_cls is not None
    assert np.all(np.isfinite(np.asarray(det.sigma_mc)))
    # the two trained members disagree -> non-degenerate epistemic sigma
    assert float(np.abs(np.asarray(det.sigma_mc)).max()) > 0

    # CLI inference mode with --ensemble_dirs writes the artifacts
    out = str(tmp_path / "ens_out")
    cli.main(["inspect", "--mode", "inference", "--model_dir", "_",
              "--hparams", hparams, "--ensemble_dirs", ",".join(dirs),
              "--val_file_pattern", data, "--batch_size", "2",
              "--output_dir", out])
    import os
    assert os.path.exists(os.path.join(out, "prediction_data.txt"))


def test_ensemble_uint8_fast_input_entries():
    """The fast-input serving entries (uint8 / native+warp) flow through the
    same _forward dispatch, so they serve ensembles too."""
    from udal_tpu.apps.serving import ServingDriver

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = 64
    cfg.num_classes = 8
    model, stacked = init_ensemble(cfg, 2, jax.random.PRNGKey(0), (64, 64))
    driver = ServingDriver(cfg, stacked, batch_size=2, ensemble=True)
    u8 = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    out = [np.asarray(t) for t in driver.serve_preprocessed_uint8(u8)]
    # packed boxes carry the epistemic sigma columns: [4 box + sigma...]
    assert out[0].shape[:2] == (2, 100) and out[0].shape[-1] >= 8
    assert np.isfinite(out[0]).all()
    det = driver.serve_detections_preprocessed_uint8(u8)
    assert det.sigma_mc is not None


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
