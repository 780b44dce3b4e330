"""Real-data parity runbook: udal_tpu vs the reference on KITTI.

The north-star check (BASELINE.md: mAP and ECE parity on KITTI) needs two
assets absent from the build image: KITTI val TFRecords and a trained
reference checkpoint. This is the one-command table producer for the day
they are mounted:

  udal_tpu parity_kitti --val_tfrecord /data/kitti/val*.tfrecord \
                        --tf_checkpoint /ckpts/d0-kitti/ckpt

Steps: (1) our eval CLI restores the TF checkpoint through the name-mapping
loader and scores AP/ECE; (2) the reference's own model + postprocess
(`/root/reference/src/eval.py:108-151`, imported read-only with absent pip
deps stubbed) scores the same records with the same evaluator class;
(3) the table goes to stdout and docs/PARITY_KITTI.json. Missing assets →
a clear message and exit code 2, nothing simulated.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from types import SimpleNamespace

DEFAULT_HPARAMS = ("image_size=1024x512,num_classes=8,loss_attenuation=True,"
                   "mc_dropout=True,mc_dropoutsamp=10,label_map=kitti")


def run(args) -> dict:
    if not glob.glob(args.val_tfrecord):
        print(f"MISSING ASSET: no TFRecords match {args.val_tfrecord}\n"
              "Mount KITTI val records (udal_tpu.data.dataset_creators."
              "kitti_tfrecords or the reference creators).")
        raise SystemExit(2)
    if not glob.glob(args.tf_checkpoint + "*"):
        print(f"MISSING ASSET: no checkpoint files match "
              f"{args.tf_checkpoint}*\nMount a reference-trained d0 "
              "checkpoint (TF object or TF1 name-based).")
        raise SystemExit(2)

    from udal_tpu import cli

    results = {}
    ours_args = SimpleNamespace(
        model_name="efficientdet-d0", model_dir=None,
        hparams=args.hparams, batch_size=args.batch_size, num_epochs=None,
        val_file_pattern=args.val_tfrecord, config=None,
        tf_checkpoint=args.tf_checkpoint, eval_samples=0, fine_grid=False)
    print("[ours] evaluating...", flush=True)
    results["udal_tpu"] = {k: float(v)
                           for k, v in cli.cmd_eval(ours_args).items()}

    if not getattr(args, "skip_reference", False):
        try:
            results["reference"] = _run_reference_eval(args)
        except Exception as e:  # noqa: BLE001 - report, keep our row
            results["reference_error"] = f"{type(e).__name__}: {e}"
            print(f"[reference] FAILED: {e}")

    out = getattr(args, "out", None) or "docs/PARITY_KITTI.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"wrote {out}")
    return results


def _run_reference_eval(args) -> dict:
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    from udal_tpu.utils.reference_compat import (add_reference_to_path,
                                                 reference_available,
                                                 stub_reference_deps)

    if not reference_available():
        raise FileNotFoundError("reference source tree not available")
    stub_reference_deps()
    add_reference_to_path()

    import numpy as np
    import tensorflow as tf

    import dataloader as ref_dataloader
    import efficientdet_keras as ref_keras
    import hparams_config as ref_hc
    import postprocess as ref_postprocess
    import utils as ref_utils
    import utils_keras as ref_utils_keras

    from udal_tpu.eval.coco import COCOEvaluator

    config = ref_hc.get_detection_config("efficientdet-d0")
    config.override(args.hparams.replace("label_map=kitti", "").strip(","))
    config.image_size = ref_utils.parse_image_size(config.image_size)
    # global-NMS eval path (same as the rebuild's): the reference's pyfunc
    # and graph per-class paths both crash/corrupt under loss attenuation
    # on CPU (see tools/ab_parity.py run_reference notes)
    config.nms_configs.pyfunc = False
    model = ref_keras.EfficientDetNet(config=config)
    model(tf.zeros((1, *config.image_size, 3)), training=False)
    ref_utils_keras.restore_ckpt(model, args.tf_checkpoint,
                                 config.moving_average_decay,
                                 skip_mismatch=False)

    ds = ref_dataloader.InputReader(
        args.val_tfrecord, is_training=False,
        max_instances_per_image=config.max_instances_per_image)(
            config.as_dict(), batch_size=args.batch_size)
    evaluator = COCOEvaluator()
    print("[reference] evaluating...", flush=True)
    for images, labels in ds:
        cls_out, box_out = model(images, training=False)[:2]
        dets = ref_postprocess.generate_detections(
            config, cls_out, box_out, labels["image_scales"],
            labels["source_ids"], per_class_nms=False)
        dets = ref_postprocess.transform_detections(dets)
        gt = np.asarray(labels["groundtruth_data"]).copy()
        gt[..., :4] *= np.asarray(labels["image_scales"])[:, None, None]
        evaluator.update_state(gt, np.asarray(dets))
    return {k: float(v) for k, v in evaluator.result().items()}
