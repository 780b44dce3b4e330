"""Production STAC/CSD orchestration over TFRecords (`udal_tpu ssl`).

Reference entry points: ``python -m SSL_stac`` / ``python -m SSL_csd``
(`/root/reference/src/SSL_stac.py:1118-1197`, `SSL_csd.py:237-307`), which
drive teacher training, export, pool inference, pseudo-TFRecord creation
and student training through subprocesses. Here the same stages run
in-process through the `apps.ssl.STAC` loop (crash-resume included):
teacher trains with the standard loop, the unlabeled pool is served
through the jitted MC program (`apps.infer.InferImages` rows feed
`select_pseudo_labels`), the pseudo TFRecord keeps the reference schema
(incl. `image/object/pseudo_score`), and the student trains on zipped
labeled+pseudo batches via the `unlabeled_start` split — the same path as
``udal_tpu train_ssl``. `--method csd` instead trains one model with the
flip-consistency loss on zipped labeled+unlabeled batches.
"""

from __future__ import annotations

import copy
import os
from typing import List, Optional

from udal_tpu.apps.al_runner import PoolIndex
from udal_tpu.apps.ssl import STAC


def _train_once(config, reader_iter, steps: int, model_dir: str, seed: int,
                log) -> None:
    import jax

    from udal_tpu.train.loop import train_and_evaluate

    train_and_evaluate(config, reader_iter, steps, model_dir,
                       rng=jax.random.PRNGKey(seed), log_fn=log)


def run_stac(args, log=print) -> List[str]:
    """Teacher → pseudo-label → student (+ selftrain rounds); returns the
    pseudo-TFRecord paths (one per round)."""
    import jax

    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.apps.infer import InferImages
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.composition import ssl_batch_split, zip_readers
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    config = get_detection_config(args.model_name)
    if args.hparams:
        config.override(args.hparams, allow_new_keys=True)
    config.override({"batch_size": args.batch_size}, allow_new_keys=True)
    if args.num_epochs:
        config.num_epochs = args.num_epochs

    batch = args.batch_size
    labeled_index = PoolIndex(args.train_file_pattern)
    unlabeled_index = PoolIndex(args.unlabeled_file_pattern)
    log(f"[ssl] labeled {len(labeled_index.names)} / unlabeled "
        f"{len(unlabeled_index.names)}")

    def _model_dir(stage: str, round_idx: int) -> str:
        return os.path.join(args.work_dir, "teacher" if stage == "teacher"
                            else f"student_r{round_idx}", "model")

    def train_fn(stage: str, pseudo_path: Optional[str],
                 round_idx: int) -> None:
        model_dir = _model_dir(stage, round_idx)
        if stage == "teacher":
            reader = InputReader(args.train_file_pattern, is_training=True,
                                 seed=args.seed)
            steps = args.steps_per_epoch or max(
                1, len(labeled_index.names) // batch)
            _train_once(config, reader(config, batch), steps, model_dir,
                        args.seed, log)
            return
        # student: zipped labeled+pseudo batches, STAC loss split — the
        # `udal_tpu train_ssl` contract (ref train_flags_SSL.py:273-319)
        cfg_s = config.copy()
        labeled_per_batch = ssl_batch_split(cfg_s, batch, args.ratio)
        cfg_s.override({
            "unlabeled_start": labeled_per_batch,
            "ssl_method": "stac",
            "stac_lambda": args.stac_lambda,
        }, allow_new_keys=True)
        reader_l = InputReader(args.train_file_pattern, is_training=True,
                               seed=args.seed)
        cfg_u = copy.deepcopy(cfg_s)
        if args.stac_randaug:
            cfg_u.autoaugment_policy = "randaug"
        reader_u = InputReader(pseudo_path, is_training=True,
                               seed=args.seed)
        it = zip_readers(reader_l, lambda c, b: reader_u(cfg_u, b), cfg_s,
                         labeled_per_batch, batch - labeled_per_batch)
        steps = args.steps_per_epoch or max(
            1, len(labeled_index.names) // batch)
        _train_once(cfg_s, it, steps, model_dir, args.seed, log)

    def _driver_for_round(round_idx: int) -> ServingDriver:
        # round 0 predicts with the teacher; selftrain round r re-predicts
        # with student r-1 (ref SSL_stac.py:656-768)
        stage = "teacher" if round_idx == 0 else "student"
        mdir = _model_dir(stage, round_idx - 1)
        scfg = config.copy()
        scfg.is_training_bn = False
        model, state, _, _ = create_train_state(scfg, jax.random.PRNGKey(0),
                                                1)
        state, _ = restore_checkpoint(mdir, state)
        return ServingDriver(scfg, swap_in_ema(state), batch_size=batch)

    def infer_fn(round_idx: int):
        drv = _driver_for_round(round_idx)
        rem = os.path.join(args.work_dir, f"pool_round{round_idx}.tfrecord")
        unlabeled_index.write_subset(unlabeled_index.names, rem,
                                     pad_multiple=batch)
        reader = InputReader(rem, is_training=False, names=True,
                             seed=args.seed)
        out_dir = os.path.join(args.work_dir, f"infer_round{round_idx}")
        rows = InferImages(drv, out_dir, min_score=args.min_score).run(
            reader(drv.config, batch))
        return [r for r in rows
                if not str(r["image_name"]).startswith("__pad")]

    def images_fn(names):
        return dict(zip(names, unlabeled_index.decoded_images(names)))

    stac = STAC(args.work_dir, tau=args.tau,
                selection_strategy=args.selection_strategy,
                stac_lambda=args.stac_lambda,
                activate_pseudoscore=args.pseudoscore,
                train_fn=train_fn, infer_fn=infer_fn, images_fn=images_fn,
                opt_params=[float(x) for x in args.opt_params.split(",")]
                if args.opt_params else None,
                selftrain_rounds=args.selftrain_rounds,
                train_done_fn=lambda stage, r: os.path.exists(
                    _model_dir(stage, r)))
    artifacts = stac.run()
    log(f"[ssl] stac done: {len(artifacts)} pseudo rounds -> {artifacts}")
    return artifacts


def run_csd(args, log=print) -> str:
    """CSD: one model, zipped labeled+unlabeled batches, flip-consistency
    loss (ref SSL_csd.py:19-307)."""
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.composition import ssl_batch_split, zip_readers
    from udal_tpu.data.dataloader import InputReader

    config = get_detection_config(args.model_name)
    if args.hparams:
        config.override(args.hparams, allow_new_keys=True)
    config.override({"batch_size": args.batch_size}, allow_new_keys=True)
    if args.num_epochs:
        config.num_epochs = args.num_epochs
    batch = args.batch_size
    labeled_per_batch = ssl_batch_split(config, batch, args.ratio)
    config.override({
        "unlabeled_start": labeled_per_batch,
        "ssl_method": "csd",
        "csd_ramp": args.csd_ramp,
        "csd_BE": args.csd_BE,
        "csd_BE_thr": args.csd_BE_thr,
    }, allow_new_keys=True)
    reader_l = InputReader(args.train_file_pattern, is_training=True,
                           seed=args.seed)
    reader_u = InputReader(args.unlabeled_file_pattern, is_training=True,
                           seed=args.seed)
    it = zip_readers(reader_l, lambda c, b: reader_u(c, b), config,
                     labeled_per_batch, batch - labeled_per_batch)
    n_labeled = len(PoolIndex(args.train_file_pattern).names)
    steps = args.steps_per_epoch or max(1, n_labeled // batch)
    model_dir = os.path.join(args.work_dir, "csd", "model")
    _train_once(config, it, steps, model_dir, args.seed, log)
    log(f"[ssl] csd done -> {model_dir}")
    return model_dir
