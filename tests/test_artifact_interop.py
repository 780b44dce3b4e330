"""Artifact interop oracle: repo-written text artifacts consumed by the
REFERENCE's own parsers and scoring code.

SURVEY §7 requires the text artifacts to stay "byte-compatible enough" for
the reference's `ast.literal_eval` consumption paths. These tests run the
repo's InferImages / Validator on synthetic data, then feed the resulting
`prediction_data.txt` / `validate_results.txt` to the live reference code
(read-only import):

* `ActiveLearning.score_image` (`/root/reference/src/active_learning_loop.py:
  528-765`) must parse our prediction_data.txt and reproduce the repo's own
  per-image AL scores across strategies;
* `MainUncertViz._read_predictions` (`/root/reference/src/
  uncertainty_analysis.py:882-919`) must parse our validate_results.txt into
  the same arrays the repo's reader returns.
"""

import os
import sys
import types

import numpy as np
import pytest

from tests.reference_util import REF_ROOT, REF_SRC, stub_reference_deps

pytestmark = pytest.mark.slow  # drives a real (tiny) serving pipeline


@pytest.fixture(scope="module")
def reference_modules():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    cleanup = stub_reference_deps()
    for p in (REF_ROOT, REF_SRC):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        import active_learning_loop
        import uncertainty_analysis
    except Exception as e:  # noqa: BLE001 - import failure → skip
        cleanup()
        pytest.skip(f"reference modules unavailable: {e}")
    yield active_learning_loop, uncertainty_analysis
    cleanup()


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Run the repo's InferImages + Validator on synthetic data."""
    import jax

    from udal_tpu.apps.infer import InferImages
    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.apps.validate import Validator
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.data.synthetic import write_synthetic_dataset

    d = tmp_path_factory.mktemp("interop")
    data = str(d / "val.tfrecord")
    write_synthetic_dataset(data, num_images=10, height=64, width=64,
                            num_classes=3, seed=7)
    from udal_tpu import cli
    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    # mc_dropoutrate>0 activates MC sampling (uncalib_mcbox/mcclass rows);
    # enable_softmax packs logits → entropy — the reference's scoring
    # assumes all of these keys unconditionally. A briefly-TRAINED model is
    # required: untrained backbones collapse to ~1e-11 activations, the
    # logits degenerate to the head bias, and the constant uncertainty
    # columns make the reference's min_max_scaler emit all-NaN.
    hparams = ("image_size=64,num_classes=4,mc_dropout=True,"
               "mc_dropoutsamp=3,mc_dropoutrate=0.1,"
               "loss_attenuation=True,enable_softmax=True,save_freq=1")
    mdir = str(d / "model")
    cli.main(["train", "--train_file_pattern", data, "--model_dir", mdir,
              "--hparams", hparams, "--batch_size", "2", "--num_epochs", "4",
              "--steps_per_epoch", "5"])
    cfg = get_detection_config("efficientdet-d0")
    cfg.override(hparams, allow_new_keys=True)
    _, st, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), 1)
    st, _ = restore_checkpoint(mdir, st)
    driver = ServingDriver(cfg, swap_in_ema(st), batch_size=2)

    infer_dir = str(d / "infer")
    app = InferImages(driver, infer_dir, min_score=-1.0,
                      save_visualizations=False)
    reader = InputReader(data, is_training=False, names=True)
    batches = ((imgs, labels["image_names"], labels["image_scales"])
               for imgs, labels in reader(driver.config, 2))
    rows = app.run(batches)
    assert rows, "no detections produced"

    val_dir = str(d / "validate")
    v = Validator(driver, val_dir)
    reader2 = InputReader(data, is_training=False, names=True)
    val_rows = v.run(reader2(driver.config, 2))
    assert val_rows, "no validate rows produced"
    return infer_dir, val_dir, rows, val_rows


STRATEGIES = ["entropy", "mean_entropy", "alluncert", "mean_epuncert",
              "mean_ental", "sota", "alluncert_highep_lowal",
              "norm_mean_albox", "mean_mcclass", "mean_mcbox"]


def _ref_score(al_mod, path, strategy, opt_params):
    """Call the reference's ActiveLearning.score_image on a namespace."""
    ns = types.SimpleNamespace(
        scoring_strategy=strategy, opt_params=opt_params,
        min_max_scaler=al_mod.ActiveLearning.min_max_scaler,
        z_score_normalization=al_mod.ActiveLearning.z_score_normalization)
    return al_mod.ActiveLearning.score_image(ns, path)


def test_reference_al_scoring_reproduces_ours(reference_modules, artifacts):
    al_mod, _ = reference_modules
    infer_dir, _, rows, _ = artifacts
    from udal_tpu.apps.active_learning import score_images

    path = os.path.join(infer_dir, "prediction_data.txt")
    compared = 0
    for strategy in STRATEGIES:
        ref_scores, _, ref_names = _ref_score(al_mod, path, strategy,
                                              [0.5, 0.5])
        our_scores, _, our_names = score_images(rows, strategy,
                                                opt_params=[0.5, 0.5])
        assert sorted(ref_names.tolist()) == sorted(our_names), strategy
        # both score vectors are in file encounter order (the reference's
        # np.unique name list is sorted separately — its own quirk).
        # Degenerate-term images make the reference's min_max_scaler emit
        # NaN (`active_learning_loop.py:321` divides by zero) where our
        # scaler deliberately returns 0 — compare where the reference is
        # finite.
        ref_arr = np.asarray(ref_scores, np.float64)
        our_arr = np.asarray(our_scores, np.float64)
        finite = np.isfinite(ref_arr)
        if not finite.any():
            continue   # every term constant → reference all-NaN
        compared += 1
        np.testing.assert_allclose(ref_arr[finite], our_arr[finite],
                                   rtol=1e-6, atol=1e-9, err_msg=strategy)
    assert compared >= len(STRATEGIES) - 2, compared


def test_reference_al_combo_scoring(reference_modules, artifacts):
    al_mod, _ = reference_modules
    infer_dir, _, rows, _ = artifacts
    from udal_tpu.apps.active_learning import score_images

    path = os.path.join(infer_dir, "prediction_data.txt")
    ref_scores, _, _ = _ref_score(al_mod, path, "mean_combo", [0.3, 0.7])
    our_scores, _, _ = score_images(rows, "mean_combo",
                                    opt_params=[0.3, 0.7])
    np.testing.assert_allclose(np.asarray(ref_scores),
                               np.asarray(our_scores),
                               rtol=1e-6, atol=1e-9)


def test_reference_reads_validate_results(reference_modules, artifacts):
    """`MainUncertViz._read_predictions` parses our validate_results.txt
    into the same gt/pred/uncertainty arrays the repo's reader returns."""
    _, ua_mod = reference_modules
    _, val_dir, _, val_rows = artifacts
    from udal_tpu.apps.validate import read_validate_results

    ns = types.SimpleNamespace(source_path=val_dir, albox=None, mcbox=None,
                               mcclass=None, entropy=None)
    ns._extract_det = ua_mod.MainUncertViz._extract_det  # staticmethod
    ua_mod.MainUncertViz._read_predictions(ns)

    ours = read_validate_results(os.path.join(val_dir,
                                              "validate_results.txt"))
    assert ours == val_rows  # our own round-trip stays exact
    gt = np.asarray([r["gt_bbox"] for r in ours])
    pred = np.asarray([r["bbox"] for r in ours])
    ious = ua_mod.calc_iou_np(gt, pred)
    keep = ious > 0.0
    np.testing.assert_allclose(ns.gt_boxes, gt[keep], rtol=1e-7)
    np.testing.assert_allclose(ns.pred_boxes, pred[keep], rtol=1e-7)
    if ns.entropy is not None:
        ent = np.asarray([r["entropy"] for r in ours])[keep]
        np.testing.assert_allclose(np.asarray(ns.entropy, np.float64), ent,
                                   rtol=1e-7)
    if ns.albox is not None:
        al = np.asarray([r["uncalib_albox"] for r in ours])[keep]
        np.testing.assert_allclose(np.asarray(ns.albox, np.float64), al,
                                   rtol=1e-7)
