"""Command-line entry points: train / eval / inspector.

Parity with the reference CLIs:
* ``python -m udal_tpu.cli train`` ↔ `python -m train_flags`
  (`/root/reference/src/train_flags.py:50-528`): --model_dir, --hparams
  (yaml or k=v), --batch_size, --num_epochs, TFRecord patterns, resume.
* ``python -m udal_tpu.cli eval`` ↔ `src/eval.py:50-198`: batched COCO
  evaluation with optional MC-dropout forward.
* ``python -m udal_tpu.cli inspect --mode {export,inference,calibrate,
  validate,auto-label,benchmark}`` ↔ `src/inspector.py:44-322` modes 0..6.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional


def _apply_config_file(args) -> None:
    """Fill args from an eval/inference yaml (reference contract:
    `configs/{eval,inference}/*.yaml` with eval_samples / hparams /
    model_dir / val_file_pattern / saved_model_dir / infer_* / video_path —
    `/root/reference/src/inspector.py:76-94`, `src/eval.py:50-96`).
    Explicit CLI values win over the file."""
    if not getattr(args, "config", None):
        return
    import yaml

    with open(args.config) as fp:
        cfg = yaml.safe_load(fp) or {}
    for key, val in cfg.items():
        if getattr(args, key, None) in (None, "", 0):
            setattr(args, key, val)


def _load_config(args) -> "object":
    from udal_tpu.config import get_detection_config

    config = get_detection_config(args.model_name)
    if args.hparams:
        config.override(args.hparams, allow_new_keys=True)
    config.override({"batch_size": args.batch_size}, allow_new_keys=True)
    if args.num_epochs:
        config.num_epochs = args.num_epochs
    return config


def _restore_variables(args, config):
    """Model weights from --tf_checkpoint (reference TF checkpoint via the
    name-mapping loader) or --model_dir (orbax), with EMA swap."""
    import jax

    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    model, state, _, _ = create_train_state(config, jax.random.PRNGKey(0), 1)
    if getattr(args, "tf_checkpoint", None):
        from udal_tpu.utils.tf_checkpoint import (load_reference_weights,
                                                  read_tf_checkpoint)

        weights = read_tf_checkpoint(args.tf_checkpoint)
        return load_reference_weights(state.variables, weights, config)
    state, _ = restore_checkpoint(args.model_dir, state)
    return swap_in_ema(state)


def _fast_reader_flags(args):
    """(fast_input, device_resize) for InputReader — device_resize implies
    fast_input; subcommands without the flags read as (False, False)."""
    dev = getattr(args, "device_resize", False)
    return (getattr(args, "fast_input", False) or dev), dev


def cmd_train(args) -> None:
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.loop import train_and_evaluate

    config = _load_config(args)
    fast, dev_rs = _fast_reader_flags(args)
    reader = InputReader(args.train_file_pattern, is_training=True,
                         use_fake_data=args.use_fake_data,
                         max_instances_per_image=config.max_instances_per_image,
                         fast_input=fast, num_proc=args.input_procs,
                         device_resize=dev_rs)
    steps = args.steps_per_epoch or max(
        1, args.num_examples_per_epoch // args.batch_size)
    train_iter = reader(config, args.batch_size)

    val_iter_fn = None
    val_steps = 0
    if args.val_file_pattern:
        val_reader = InputReader(args.val_file_pattern, is_training=False)
        val_steps = max(1, args.eval_samples // args.batch_size)

        def val_iter_fn():
            return val_reader(config, args.batch_size)

    if getattr(args, "n_model", 1) > 1:
        config.override({"n_model": args.n_model}, allow_new_keys=True)
    os.makedirs(args.model_dir, exist_ok=True)
    config.save_to_yaml(os.path.join(args.model_dir, "config.yaml"))
    import jax

    train_and_evaluate(config, train_iter, steps, args.model_dir,
                       val_iter_fn=val_iter_fn, val_steps=val_steps,
                       rng=jax.random.PRNGKey(args.seed))


def cmd_train_ssl(args) -> None:
    """SSL training driver — parity with `python -m train_flags_SSL`
    (`/root/reference/src/train_flags_SSL.py:74-104,221-603`): zips the
    labeled and (rand-augmented) unlabeled/pseudo readers into one batch
    with a `unlabeled_start` split, and selects the STAC or CSD loss
    branch via the ssl config knobs."""
    from udal_tpu.data.composition import ssl_batch_split, zip_readers
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.loop import train_and_evaluate

    config = _load_config(args)
    labeled_per_batch = ssl_batch_split(config, args.batch_size, args.ratio)
    config.override({
        "unlabeled_start": labeled_per_batch,
        "ssl_method": args.ssl_method,
        "stac_lambda": args.stac_lambda,
        "csd_ramp": args.csd_ramp,
        "csd_BE": args.csd_BE,
        "csd_BE_thr": args.csd_BE_thr,
    }, allow_new_keys=True)

    fast, dev_rs = _fast_reader_flags(args)
    reader_l = InputReader(args.train_file_pattern, is_training=True,
                           max_instances_per_image=
                           config.max_instances_per_image,
                           fast_input=fast, device_resize=dev_rs)
    # the unlabeled/pseudo stream gets RandAugment (`train_flags_SSL.py`
    # stac_randaug) via a policy override on its own reader config
    import copy

    cfg_u = copy.deepcopy(config)
    if args.stac_randaug and args.ssl_method == "stac":
        cfg_u.autoaugment_policy = "randaug"
    reader_u = InputReader(args.unlabeled_file_pattern, is_training=True,
                           max_instances_per_image=
                           config.max_instances_per_image,
                           fast_input=fast, device_resize=dev_rs)

    def make_train_iter():
        it_l = reader_l
        it_u = lambda cfg, bs: reader_u(cfg_u, bs)  # noqa: E731
        return zip_readers(it_l, it_u, config, labeled_per_batch,
                           args.batch_size - labeled_per_batch)

    steps = args.steps_per_epoch or max(
        1, args.num_examples_per_epoch // args.batch_size)
    val_iter_fn = None
    val_steps = 0
    if args.val_file_pattern:
        val_reader = InputReader(args.val_file_pattern, is_training=False)
        val_steps = max(1, (args.eval_samples or 64) // args.batch_size)

        def val_iter_fn():
            return val_reader(config, args.batch_size)

    os.makedirs(args.model_dir, exist_ok=True)
    config.save_to_yaml(os.path.join(args.model_dir, "config.yaml"))
    train_and_evaluate(config, make_train_iter(), steps, args.model_dir,
                       val_iter_fn=val_iter_fn, val_steps=val_steps)


def cmd_eval(args) -> None:
    import numpy as np

    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.data.label_maps import get_label_map
    from udal_tpu.eval.coco import COCOEvaluator

    _apply_config_file(args)
    config = _load_config(args)
    variables = _restore_variables(args, config)
    driver = ServingDriver(config, variables, batch_size=args.batch_size)

    evaluator = COCOEvaluator(label_map=get_label_map(config.label_map),
                              fine_grid=args.fine_grid)
    fast, dev_rs = _fast_reader_flags(args)
    reader = InputReader(args.val_file_pattern, is_training=False,
                         fast_input=fast, device_resize=dev_rs)
    img_id = 0
    conf_correct = []   # (score, hit) pairs for detection-confidence ECE
    from udal_tpu.apps.reader_batches import (groundtruth_from_labels,
                                              serve_reader_batch)

    for images, labels in reader(config, args.batch_size):
        # any reader contract (classic f32 / uint8 / native+warp); scales
        # map detections back to the original-image frame that the scaled
        # GT below lives in
        det = serve_reader_batch(driver, images, labels, structured=True)
        b = images.shape[0]
        ids = np.arange(img_id, img_id + b)
        img_id += b
        y, x1, y2, x2 = [np.asarray(det.boxes)[..., i] for i in range(4)]
        det_rows = np.stack(
            [np.repeat(ids[:, None], det.boxes.shape[1], 1),
             x1, y, x2 - x1, y2 - y, np.asarray(det.scores),
             np.asarray(det.classes)], axis=-1)
        gt = groundtruth_from_labels(labels)
        gt_scaled = gt.copy()
        gt_scaled[..., :4] *= np.asarray(
            labels["image_scales"])[:, None, None]
        evaluator.update_state(gt_scaled, det_rows)
        conf_correct.append(_det_confidence_hits(det, gt_scaled))
    results = evaluator.result()
    if conf_correct:
        pairs = np.concatenate(conf_correct, axis=0)
        results["ECE"] = _expected_calibration_error(pairs[:, 0], pairs[:, 1])
    for k, v in results.items():
        print(f"{k}: {v:.4f}")
    return results


def _det_confidence_hits(det, gt_scaled, iou_thr: float = 0.5,
                         score_thr: float = 0.05):
    """(score, correct) pairs: a detection is correct if it matches a GT of
    its class at IoU >= 0.5 — the standard detection-ECE construction."""
    import numpy as np

    from udal_tpu.ops.boxes import pairwise_iou

    def iou_matrix_np(a, b):
        return np.asarray(pairwise_iou(a, b))

    out = []
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    classes = np.asarray(det.classes)
    for b in range(boxes.shape[0]):
        keep = scores[b] > score_thr
        if not keep.any():
            continue
        gt = gt_scaled[b]
        gt = gt[gt[:, -1] > 0]
        if len(gt) == 0:
            hits = np.zeros(int(keep.sum()), np.float32)
            out.append(np.stack([scores[b][keep], hits], axis=1))
            continue
        ious = iou_matrix_np(boxes[b][keep], gt[:, :4])
        same_cls = classes[b][keep][:, None] == gt[None, :, -1]
        hit = ((ious >= iou_thr) & same_cls).any(axis=1)
        out.append(np.stack([scores[b][keep],
                             hit.astype(np.float32)], axis=1))
    return np.concatenate(out, axis=0) if out else np.zeros((0, 2),
                                                            np.float32)


def _expected_calibration_error(scores, hits, bins: int = 10) -> float:
    import numpy as np

    edges = np.linspace(0.0, 1.0, bins + 1)
    n = len(scores)
    if n == 0:
        return 0.0
    ece = 0.0
    for i in range(bins):
        m = (scores > edges[i]) & (scores <= edges[i + 1])
        if m.any():
            ece += m.sum() / n * abs(hits[m].mean() - scores[m].mean())
    return float(ece)


def cmd_inspect(args) -> None:
    import numpy as np

    from udal_tpu.apps.serving import ServingDriver

    _apply_config_file(args)
    config = _load_config(args)
    if getattr(args, "ensemble_dirs", None):
        # deep-ensemble serving (BASELINE config #3): N member model_dirs
        member_dirs = [d for d in args.ensemble_dirs.split(",") if d]
        driver = ServingDriver.create_ensemble(config, member_dirs,
                                               batch_size=args.batch_size)
    else:
        variables = None
        if getattr(args, "tf_checkpoint", None) or \
                (args.model_dir and args.model_dir != "_"):
            variables = _restore_variables(args, config)
        driver = ServingDriver(config, variables,
                               batch_size=args.batch_size) \
            if variables is not None else \
            ServingDriver.create(args.model_name, batch_size=args.batch_size,
                                 overrides=dict(config.as_dict()))

    if args.mode == "export":
        path = driver.export(args.output_dir or
                             os.path.join(args.model_dir or ".", "export"))
        print(f"exported: {path}")
    elif args.mode == "benchmark":
        h, w = 512, 512
        imgs = np.random.rand(args.batch_size, h, w, 3).astype(np.float32)
        print(driver.benchmark(imgs))
    elif args.mode in ("inference", "auto-label", "ssal", "SSAL"):
        from udal_tpu.apps.infer import InferImages
        from udal_tpu.data.dataloader import InputReader

        # SSAL = semi-supervised auto-labeling: the reference routes it to
        # the same InferImages path with the auto-label gate active
        # (`inspector.py:185-204,314-322`); the pseudo-label artifacts feed
        # apps.ssl.STAC.
        auto = args.mode != "inference"
        fast, dev_rs = _fast_reader_flags(args)
        reader = InputReader(args.val_file_pattern, is_training=False,
                             names=True, fast_input=fast,
                             device_resize=dev_rs)
        app = InferImages(driver, args.output_dir or "infer_out",
                          calib_dir=args.calib_dir,
                          auto_labeling=auto,
                          opt_params=[0.5, 0.5] if auto else None,
                          opt_thrs_path=args.opt_thrs_path,
                          save_visualizations=args.save_visualizations)
        if fast:
            # (images, labels) contract: uint8 batches, normalization (and
            # with device_resize the bilinear resize) on-device
            batches = iter(reader(config, args.batch_size))
        else:
            # reader images are normalized+resized → 3-tuple (preprocessed)
            # contract with the reader's original-frame scales
            batches = ((imgs, labels["image_names"], labels["image_scales"])
                       for imgs, labels in reader(config, args.batch_size))
        rows = app.run(batches)
        print(f"wrote {len(rows)} detections")
    elif args.mode == "video":
        n = run_video_inference(
            driver, args.video_path, output_video=args.output_video,
            frames_dir=args.output_dir,
            max_frames=args.infer_last_frame or None)
        print(f"processed {n} video frames")
    elif args.mode == "validate":
        from udal_tpu.apps.validate import Validator
        from udal_tpu.data.dataloader import InputReader

        fast, dev_rs = _fast_reader_flags(args)
        reader = InputReader(args.val_file_pattern, is_training=False,
                             names=True, fast_input=fast,
                             device_resize=dev_rs)
        v = Validator(driver, args.output_dir or "validate_out",
                      calib_dir=args.calib_dir)
        rows = v.run(reader(config, args.batch_size))
        print(f"validated {len(rows)} ground truths")
    elif args.mode == "calibrate":
        from udal_tpu.apps.calibrate_model import Calibrate
        from udal_tpu.data.dataloader import InputReader

        fast, dev_rs = _fast_reader_flags(args)
        reader = InputReader(args.val_file_pattern, is_training=False,
                             names=True, fast_input=fast,
                             device_resize=dev_rs)
        cal = Calibrate(driver, args.output_dir or "calibration")
        cal.run(reader(config, args.batch_size))
        print("calibrators written")
    else:
        raise SystemExit(f"unknown mode {args.mode}")


def run_video_inference(driver, video_path: str,
                        output_video: Optional[str] = None,
                        frames_dir: Optional[str] = None,
                        min_score: Optional[float] = None,
                        max_frames: Optional[int] = None) -> int:
    """Per-frame video inference with detection overlays.

    Parity: inspector mode 4 (`/root/reference/src/inspector.py:229-306`) —
    reads frames with cv2, serves each through the driver, draws boxes, and
    writes either an output video or per-frame PNGs (no interactive stop).
    """
    import cv2
    import numpy as np

    from udal_tpu.utils.visualize import visualize_boxes_and_labels

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise SystemExit(f"error opening input video: {video_path}")
    out_ptr = None
    if output_video:
        w, h = int(cap.get(3)), int(cap.get(4))
        out_ptr = cv2.VideoWriter(output_video,
                                  cv2.VideoWriter_fourcc(*"mp4v"),
                                  cap.get(5) or 25.0, (w, h))
    if frames_dir:
        os.makedirs(frames_dir, exist_ok=True)
    thr = min_score if min_score is not None else \
        (driver.config.nms_configs.get("score_thresh") or 0.4)
    i = 0
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret or (max_frames and i >= max_frames):
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        det = driver.serve_detections(rgb[None].astype(np.float32))
        boxes = np.asarray(det.boxes[0])
        scores = np.asarray(det.scores[0])
        classes = np.asarray(det.classes[0]).astype(int)
        keep = scores > thr
        vis = visualize_boxes_and_labels(rgb, boxes[keep], classes[keep],
                                         scores[keep])
        bgr = cv2.cvtColor(vis, cv2.COLOR_RGB2BGR)
        if out_ptr is not None:
            out_ptr.write(bgr)
        if frames_dir:
            cv2.imwrite(os.path.join(frames_dir, f"frame_{i}.png"), bgr)
        i += 1
    cap.release()
    if out_ptr is not None:
        out_ptr.release()
    return i


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="udal_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--model_name", default="efficientdet-d0")
        sp.add_argument("--model_dir", default=None)
        sp.add_argument("--compile_cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache directory "
                             "(or env UDAL_COMPILE_CACHE); turns the "
                             "multi-minute cold compile of the serving/"
                             "train programs into a disk read on restart")
        sp.add_argument("--hparams", default="")
        sp.add_argument("--batch_size", type=int, default=8)
        sp.add_argument("--num_epochs", type=int, default=None)
        sp.add_argument("--val_file_pattern", default=None)
        sp.add_argument("--config", default=None,
                        help="eval/inference yaml (configs/{eval,inference})"
                             " filling the args above")
        sp.add_argument("--tf_checkpoint", default=None,
                        help="reference TF checkpoint to load via the "
                             "name-mapping loader (e.g. the public "
                             "efficientdet-d0 ckpt)")
        sp.add_argument("--eval_samples", type=int, default=0)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--train_file_pattern", required=True)
    t.add_argument("--num_examples_per_epoch", type=int, default=1024)
    t.add_argument("--steps_per_epoch", type=int, default=None)
    t.add_argument("--use_fake_data", action="store_true")
    t.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel width of the device mesh "
                        "('model' axis; conv channels shard via GSPMD)")
    t.add_argument("--seed", type=int, default=0,
                   help="init/dropout PRNG seed (vary per deep-ensemble "
                        "member)")
    t.add_argument("--fast_input", action="store_true",
                   help="uint8 H2D + on-device normalize/anchor-labeling "
                        "(cuts host work to decode+augment+resize)")
    t.add_argument("--device_resize", action="store_true",
                   help="implies --fast_input; host ships NATIVE-size uint8"
                        " and the bilinear resize also runs on-device "
                        "(uniform-size datasets, e.g. KITTI/BDD)")
    t.add_argument("--input_procs", type=int, default=0,
                   help="input worker processes (0 = in-process thread)")
    t.set_defaults(fn=cmd_train)

    ts = sub.add_parser("train_ssl")
    common(ts)
    ts.add_argument("--train_file_pattern", required=True)
    ts.add_argument("--unlabeled_file_pattern", required=True)
    ts.add_argument("--num_examples_per_epoch", type=int, default=1024)
    ts.add_argument("--steps_per_epoch", type=int, default=None)
    ts.add_argument("--ratio", type=float, default=0.5,
                    help="labeled fraction of each batch")
    ts.add_argument("--ssl_method", choices=["stac", "csd"], default="stac")
    ts.add_argument("--stac_lambda", type=float, default=1.0)
    ts.add_argument("--stac_randaug", action="store_true")
    ts.add_argument("--csd_ramp", action="store_true")
    ts.add_argument("--csd_BE", action="store_true")
    ts.add_argument("--csd_BE_thr", type=float, default=0.5)
    ts.add_argument("--fast_input", action="store_true",
                   help="uint8 H2D + on-device normalize/anchor-labeling "
                        "for both SSL streams")
    ts.add_argument("--device_resize", action="store_true",
                   help="implies --fast_input; bilinear resize on-device")
    ts.set_defaults(fn=cmd_train_ssl)

    e = sub.add_parser("eval")
    common(e)
    e.add_argument("--fine_grid", action="store_true")
    e.add_argument("--fast_input", action="store_true",
                   help="uint8 reader batches; normalization runs inside "
                        "the jitted serving program (4x less H2D)")
    e.add_argument("--device_resize", action="store_true",
                   help="implies --fast_input; the bilinear resize also "
                        "runs on-device (uniform-size datasets)")
    e.set_defaults(fn=cmd_eval)

    i = sub.add_parser("inspect")
    common(i)
    i.add_argument("--mode", required=True,
                   choices=["export", "inference", "calibrate", "validate",
                            "auto-label", "ssal", "SSAL", "video",
                            "benchmark"])
    i.add_argument("--video_path", default=None)
    i.add_argument("--output_video", default=None)
    i.add_argument("--infer_last_frame", type=int, default=0)
    i.add_argument("--output_dir", default=None)
    i.add_argument("--calib_dir", default=None)
    i.add_argument("--opt_thrs_path", default=None)
    i.add_argument("--save_visualizations", action="store_true",
                   help="write detection + per-uncertainty overlay PNGs and "
                        "uncertainty bucket grids (ref infer_model.py:"
                        "962-1059,476-552)")
    i.add_argument("--ensemble_dirs", default=None,
                   help="comma-separated member model_dirs: serve them as a "
                        "deep ensemble (mean boxes, box-variance epistemic "
                        "sigma, class entropy fusion)")
    i.add_argument("--fast_input", action="store_true",
                   help="uint8 reader batches for inference/validate/"
                        "calibrate modes; normalization runs inside the "
                        "jitted serving program (4x less H2D)")
    i.add_argument("--device_resize", action="store_true",
                   help="implies --fast_input; the bilinear resize also "
                        "runs on-device (uniform-size datasets)")
    i.set_defaults(fn=cmd_inspect)

    a = sub.add_parser("al",
                       help="active-learning acquisition loop over a "
                            "TFRecord pool (ref: python -m "
                            "active_learning_loop)")
    common(a)
    a.add_argument("--pool_file_pattern", required=True,
                   help="TFRecord shards of the labeled pool to acquire "
                        "from")
    a.add_argument("--work_dir", required=True,
                   help="per-iteration artifacts land in "
                        "<work_dir>/iter_<i>/ (selected.txt, "
                        "train.tfrecord, model/); the loop resumes from "
                        "completed iterations")
    a.add_argument("--strategy", default="entropy",
                   help="scoring strategy (reference grammar: random/"
                        "entropy/mcbox/albox/mcclass/combo/ental/alluncert/"
                        "epuncert/sota/highep_lowal + mean/calib/norm/perc/"
                        "bottomk/nee modifiers)")
    a.add_argument("--budgets", default="5,5,5,10,20,30,25",
                   help="percent of the pool added per iteration "
                        "(ref default iteration_budget)")
    a.add_argument("--steps_per_epoch", type=int, default=None,
                   help="default: one pass over the current selection")
    a.add_argument("--opt_params", default=None,
                   help="comma weights for combo strategies (ref "
                        "--opt_params)")
    a.add_argument("--min_score", type=float, default=0.0,
                   help="detection score floor when scoring the pool")
    a.add_argument("--prune_thr", type=int, default=None,
                   help="enable near-duplicate pool pruning at this "
                        "Hamming distance (ref --prune_thr)")
    a.add_argument("--hash_method", default="phash",
                   choices=["phash", "whash"])
    a.add_argument("--warmup_dir", default=None,
                   help="completed iter_0 directory from another strategy "
                        "run to reuse (ref warm-up model reuse)")
    a.add_argument("--out_tfrecord", default=None,
                   help="also write the final selected set as a "
                        "training-ready TFRecord")
    a.add_argument("--seed", type=int, default=0)
    a.set_defaults(fn=cmd_al)

    s = sub.add_parser("ssl",
                       help="STAC/CSD orchestration over TFRecords (ref: "
                            "python -m SSL_stac / SSL_csd); train_ssl is "
                            "the lower-level student trainer")
    common(s)
    s.add_argument("--method", choices=["stac", "csd"], default="stac")
    s.add_argument("--train_file_pattern", required=True,
                   help="labeled TFRecords")
    s.add_argument("--unlabeled_file_pattern", required=True,
                   help="unlabeled pool TFRecords (STAC pseudo-labels "
                        "these; CSD consumes them directly)")
    s.add_argument("--work_dir", required=True)
    s.add_argument("--tau", type=float, default=0.5,
                   help="pseudo-label score threshold (ref SSL_stac tau)")
    s.add_argument("--selection_strategy", default="score",
                   help="score / combo / alluncert / epuncert / ental "
                        "(ref SSL_stac.score_image)")
    s.add_argument("--stac_lambda", type=float, default=1.0)
    s.add_argument("--stac_randaug", action="store_true")
    s.add_argument("--pseudoscore", action="store_true",
                   help="write per-detection pseudo_score weights")
    s.add_argument("--selftrain_rounds", type=int, default=0)
    s.add_argument("--ratio", type=float, default=0.5,
                   help="labeled fraction of each student batch")
    s.add_argument("--csd_ramp", action="store_true")
    s.add_argument("--csd_BE", action="store_true")
    s.add_argument("--csd_BE_thr", type=float, default=0.5)
    s.add_argument("--opt_params", default=None)
    s.add_argument("--min_score", type=float, default=0.0)
    s.add_argument("--steps_per_epoch", type=int, default=None)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_ssl)

    pk = sub.add_parser("parity_kitti",
                        help="real-data mAP/ECE parity table vs the "
                             "reference (see udal_tpu/apps/parity.py)")
    pk.add_argument("--val_tfrecord", required=True)
    pk.add_argument("--tf_checkpoint", required=True)
    pk.add_argument("--hparams", default=None)
    pk.add_argument("--batch_size", type=int, default=8)
    pk.add_argument("--skip_reference", action="store_true")
    pk.add_argument("--out", default=None)
    pk.set_defaults(fn=cmd_parity_kitti)
    return p


def cmd_al(args) -> None:
    from udal_tpu.apps.al_runner import run_al

    run_al(args)


def cmd_ssl(args) -> None:
    from udal_tpu.apps.ssl_runner import run_csd, run_stac

    if args.method == "stac":
        run_stac(args)
    else:
        run_csd(args)


def cmd_parity_kitti(args) -> None:
    from udal_tpu.apps import parity

    if args.hparams is None:
        args.hparams = parity.DEFAULT_HPARAMS
    parity.run(args)


def main(argv=None):
    """Programmatic entry: returns the subcommand's result (e.g. the eval
    metrics dict). Console scripts use `script_main`, which discards the
    result — setuptools wraps the entry point in sys.exit(), and a truthy
    return value would otherwise turn success into exit status 1."""
    args = build_parser().parse_args(argv)
    from udal_tpu.utils.compile_cache import enable_from_env_or_flag
    enable_from_env_or_flag(getattr(args, "compile_cache", None))
    return args.fn(args)


def script_main() -> int:
    main()
    return 0


if __name__ == "__main__":
    sys.exit(script_main())
