"""Production active-learning loop over TFRecord pools (`udal_tpu al`).

Reference entry point: ``python -m active_learning_loop --dataset ...
--selection_mode ...`` (`/root/reference/src/active_learning_loop.py:
994-1141` and its argparse block `:1143-1165`), which drives each stage —
TFRecord creation, training, export, inference — through ``subprocess.run``
and scores ``prediction_data.txt`` dict rows on the host.

Here the whole loop is one process and the scoring path is array-native:
per budget iteration the selected subset is written as a TFRecord
(byte-copied records, no re-encode), a model trains on it via the standard
train loop, the remaining pool is served through the jitted MC-dropout
program, packed into a `DetectionPool` (`apps.al_scoring.collect_pool`),
and the next acquisition batch is selected with `select_pool` — the same
strategy grammar as the reference (`active_learning_loop.py:544-840`).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from udal_tpu.apps import active_learning as alm
from udal_tpu.apps import al_scoring as als


class PoolIndex:
    """name -> (shard, offset, length) over TFRecord shards, so subsets are
    byte-copies instead of decode/re-encode round trips."""

    def __init__(self, file_pattern: str):
        from udal_tpu.data import tfrecord as tfr
        from udal_tpu.data.example_codec import parse_example

        self.paths = sorted(glob.glob(file_pattern))
        if not self.paths:
            raise FileNotFoundError(f"no TFRecords match {file_pattern}")
        self.entries: Dict[str, Tuple[str, int, int]] = {}
        self.names: List[str] = []
        for p in self.paths:
            offs, lens = tfr.scan_tfrecord(p)
            for off, ln in zip(offs.tolist(), lens.tolist()):
                rec = tfr.read_record(p, off, ln)
                f = parse_example(rec)
                name = f.get("image/filename", [b""])[0].decode() or \
                    f.get("image/source_id", [b""])[0].decode()
                self.entries[name] = (p, off, ln)
                self.names.append(name)

    def record(self, name: str) -> bytes:
        from udal_tpu.data import tfrecord as tfr

        p, off, ln = self.entries[name]
        return tfr.read_record(p, off, ln)

    def write_subset(self, names: Sequence[str], out_path: str,
                     pad_multiple: Optional[int] = None) -> int:
        """Byte-copy the named records; with ``pad_multiple``, pad to a
        full final batch with copies of the last record renamed to
        ``__pad<i>__`` so padding can never be mistaken for (or merged
        into) a real pool image downstream."""
        from udal_tpu.data import example_codec as codec
        from udal_tpu.data import tfrecord as tfr

        n_pad = (-len(names)) % pad_multiple if pad_multiple else 0
        with tfr.TFRecordWriter(out_path) as w:
            for n in names:
                w.write(self.record(n))
            if n_pad:
                feats = codec.parse_example(self.record(names[-1]))
                for i in range(n_pad):
                    feats["image/filename"] = [f"__pad{i}__".encode()]
                    w.write(codec.serialize_example(feats))
        return len(names) + n_pad

    def decoded_images(self, names: Sequence[str]) -> List[np.ndarray]:
        import cv2

        from udal_tpu.data.example_codec import parse_example

        out = []
        for n in names:
            f = parse_example(self.record(n))
            buf = np.frombuffer(f["image/encoded"][0], np.uint8)
            out.append(cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR),
                                    cv2.COLOR_BGR2RGB))
        return out


def run_al(args, log=print) -> List[str]:
    """Drive `ActiveLearning.run` end to end from CLI args; returns the
    final selected image names (also written to <work_dir>/selected.txt and,
    when --out_tfrecord is given, as a training-ready TFRecord)."""
    import jax

    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.loop import train_and_evaluate
    from udal_tpu.train.train_lib import create_train_state
    from udal_tpu.utils.checkpoint import restore_checkpoint, swap_in_ema

    config = get_detection_config(args.model_name)
    if args.hparams:
        config.override(args.hparams, allow_new_keys=True)
    config.override({"batch_size": args.batch_size}, allow_new_keys=True)
    if args.num_epochs:
        config.num_epochs = args.num_epochs

    index = PoolIndex(args.pool_file_pattern)
    pool = list(index.names)
    log(f"[al] pool: {len(pool)} images from {args.pool_file_pattern}")

    if args.prune_thr is not None:
        kept = alm.prune_pool(index.decoded_images(pool),
                              max_distance=args.prune_thr,
                              method=args.hash_method)
        log(f"[al] prune ({args.hash_method}, thr={args.prune_thr}): "
            f"{len(pool)} -> {len(kept)}")
        pool = [pool[i] for i in kept]

    batch = args.batch_size
    last_model_dir: List[Optional[str]] = [None]

    def train_fn(selected: Sequence[str], it_dir: str) -> None:
        sub = os.path.join(it_dir, "train.tfrecord")
        index.write_subset(selected, sub)
        reader = InputReader(sub, is_training=True, seed=args.seed)
        steps = args.steps_per_epoch or max(1, len(selected) // batch)
        model_dir = os.path.join(it_dir, "model")
        train_and_evaluate(config, reader(config, batch), steps, model_dir,
                           rng=jax.random.PRNGKey(args.seed), log_fn=log)
        last_model_dir[0] = model_dir

    def _serving_driver() -> ServingDriver:
        scfg = config.copy()
        scfg.is_training_bn = False
        model, state, _, _ = create_train_state(scfg, jax.random.PRNGKey(0),
                                                1)
        state, _ = restore_checkpoint(last_model_dir[0], state)
        return ServingDriver(scfg, swap_in_ema(state), batch_size=batch)

    def infer_fn(remaining: Sequence[str], it_dir: str) -> als.DetectionPool:
        rem = os.path.join(it_dir, "remaining.tfrecord")
        # __pad<i>__ batch padding is dropped by the loop's subset to
        # `remaining`
        index.write_subset(remaining, rem, pad_multiple=batch)
        drv = _serving_driver()
        reader = InputReader(rem, is_training=False, names=True,
                             seed=args.seed)
        batches = ((imgs, labels["image_names"], labels["image_scales"])
                   for imgs, labels in reader(drv.config, batch))
        return als.collect_pool(drv, batches, min_score=args.min_score)

    opt_params = None
    if args.opt_params:
        opt_params = [float(x) for x in args.opt_params.split(",")]
    budgets = [float(x) for x in args.budgets.split(",")]

    loop = alm.ActiveLearning(
        pool, args.work_dir, args.strategy, budget_steps=budgets,
        train_fn=train_fn, infer_fn=infer_fn, opt_params=opt_params,
        warmup_dir=args.warmup_dir, seed=args.seed)
    selected = loop.run()

    with open(os.path.join(args.work_dir, "selected.txt"), "w") as f:
        f.write("\n".join(str(s) for s in selected))
    if args.out_tfrecord:
        index.write_subset(selected, args.out_tfrecord)
        log(f"[al] wrote {len(selected)} selected examples to "
            f"{args.out_tfrecord}")
    log(f"[al] done: {len(selected)}/{len(pool)} selected over "
        f"{len(budgets)} iterations")
    return [str(s) for s in selected]
