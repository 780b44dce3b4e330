"""Epoch-based training loop with checkpointing, eval and COCO callback.

Parity with the reference driver loop (`/root/reference/src/train_flags.py:
214-528`, `train_lib.py:257-677`): epoch loop over a steps_per_epoch-sized
stream, validation every epoch, COCO AP evaluation every `map_freq` epochs,
ModelCheckpoint each `save_freq` epochs with keep-last-N retention, resume
from the latest checkpoint (initial epoch = restored epoch), early stopping
with best-weight restore, loss averaging per epoch.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterator, List, Optional

import jax
import numpy as np

from udal_tpu.parallel.mesh import make_mesh, shard_batch
from udal_tpu.train.train_lib import (create_train_state, eval_step,
                                      make_jitted_train_step)
from udal_tpu.utils.checkpoint import (latest_checkpoint, restore_checkpoint,
                                       save_checkpoint)


class EarlyStopping:
    """Patience-based early stop restoring the best state —
    parity `train_lib.py:257-288`."""

    def __init__(self, patience: int, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = np.inf
        self.best_state = None
        self.count = 0

    def update(self, value: float, state) -> bool:
        """Returns True when training should stop."""
        if value < self.best - self.min_delta:
            self.best = value
            self.best_state = state
            self.count = 0
            return False
        self.count += 1
        return self.patience > 0 and self.count >= self.patience


def train_and_evaluate(config, train_iter: Iterator, steps_per_epoch: int,
                       model_dir: str,
                       val_iter_fn: Optional[Callable[[], Iterator]] = None,
                       val_steps: int = 0,
                       coco_eval_fn: Optional[Callable] = None,
                       mesh=None, rng: Optional[jax.Array] = None,
                       log_fn: Callable[[str], None] = print
                       ) -> Dict[str, List[float]]:
    """Run `config.num_epochs` epochs; returns the metric history."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model, state, tx, schedule = create_train_state(config, rng,
                                                    steps_per_epoch)
    state, start_epoch = restore_checkpoint(model_dir, state)
    n_model = int(config.get("n_model", 1) or 1)
    if mesh is None and jax.device_count() > 1:
        # batch must divide evenly over the data axis
        batch = int(config.get("batch_size", 0) or 0)
        n = jax.device_count() // n_model
        while batch and n > 1 and batch % n != 0:
            n -= 1
        if n * n_model > 1:
            mesh = make_mesh(n_data=n, n_model=n_model,
                             devices=jax.devices()[:n * n_model])
    tensor_parallel = mesh is not None and mesh.shape.get("model", 1) > 1
    if tensor_parallel:
        from udal_tpu.parallel.mesh import shard_state_tp
        with mesh:
            state = shard_state_tp(mesh, state, tx)
    step_fn = make_jitted_train_step(config, model, tx, schedule,
                                     steps_per_epoch, mesh,
                                     tensor_parallel=tensor_parallel)
    # steps_per_execution parity (`/root/reference/src/train_flags.py:173`):
    # scan k steps per XLA call — amortizes per-call dispatch overhead
    exec_k = max(1, int(config.get("steps_per_execution", 1) or 1))
    multi_fn = None
    if exec_k > 1:
        from udal_tpu.train.train_lib import make_jitted_multi_step
        multi_fn = make_jitted_multi_step(config, model, tx, schedule,
                                          steps_per_epoch, exec_k, mesh,
                                          tensor_parallel=tensor_parallel)
    eval_fn = jax.jit(lambda s, i, l: eval_step(config, model, s, i, l))

    stopper = EarlyStopping(config.early_stopping_patience or 0)
    history: Dict[str, List[float]] = {"loss": [], "val_loss": []}
    keep_n = max(2, int(config.get("keep_checkpoint_max", 5) or 5))

    from udal_tpu.utils.metrics_writer import MetricsWriter
    metrics_writer = MetricsWriter(os.path.join(model_dir, "logs"),
                                   use_tensorboard=False)

    if coco_eval_fn is None and val_iter_fn is not None and val_steps > 0 \
            and int(config.get("map_freq", 0) or 0) > 0:
        # default per-epoch COCO callback with the TB image suites
        # (ref `train_lib.py:291-617`)
        from udal_tpu.data.label_maps import get_label_map
        from udal_tpu.train.callbacks import COCOCallback

        try:
            lmap = get_label_map(config.label_map)
        except Exception:  # noqa: BLE001 - unknown label map
            lmap = None
        coco_eval_fn = COCOCallback(config, model, val_iter_fn, val_steps,
                                    os.path.join(model_dir, "logs"),
                                    label_map=lmap)

    # Per-step host syncs serialize dispatch (each float() blocks on the
    # device — and behind the axon relay costs a full ~36 ms round trip).
    # Keep device-scalar references and only touch one result every
    # `sync_every` steps: dispatch runs ahead of the device while in-flight
    # input buffers stay bounded to ~sync_every batches. The epoch mean is
    # fetched with a single device call at epoch end.
    sync_every = max(1, int(config.get("host_sync_every", 8) or 8))

    import jax.numpy as jnp

    def next_batch():
        images, labels = next(train_iter)
        labels = {k: v for k, v in labels.items()
                  if not isinstance(v, list)}
        return images, labels

    for epoch in range(start_epoch, int(config.num_epochs)):
        t0 = time.time()
        losses = []
        weights = []   # steps per recorded loss (exec_k groups report means)
        step = 0
        while step < steps_per_epoch:
            if multi_fn is not None and steps_per_epoch - step >= exec_k:
                group = [next_batch() for _ in range(exec_k)]
                # device-resident iterators stack on device (no D2H)
                stack = jnp.stack if isinstance(group[0][0], jax.Array) \
                    else np.stack
                images = stack([g[0] for g in group])
                labels = {k: stack([g[1][k] for g in group])
                          for k in group[0][1]}
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    sk = NamedSharding(mesh, P(None, "data"))
                    images = jax.device_put(images, sk)
                    labels = {k: jax.device_put(v, sk)
                              for k, v in labels.items()}
                state, vals = multi_fn(state, images, labels, rng)
                step += exec_k
                weights.append(exec_k)
            else:
                images, labels = next_batch()
                if mesh is not None:
                    batch = shard_batch(mesh, {"images": images, **labels})
                    images = batch.pop("images")
                    labels = batch
                state, vals = step_fn(state, images, labels, rng)
                step += 1
                weights.append(1)
            losses.append(vals["loss"])
            if len(losses) % sync_every == 0:
                # bounded-lag throttle: block on a result sync_every calls
                # old (long since computed) instead of the newest one
                float(losses[-sync_every])
        w = jnp.asarray(weights, jnp.float32)
        epoch_loss = float(jnp.sum(jnp.stack(losses) * w) / jnp.sum(w))
        history["loss"].append(epoch_loss)
        msg = (f"epoch {epoch + 1}/{config.num_epochs} "
               f"loss={epoch_loss:.4f} ({time.time() - t0:.1f}s)")

        val_loss = None
        if val_iter_fn is not None and val_steps > 0:
            vlosses = []
            vit = val_iter_fn()
            for _ in range(val_steps):
                images, labels = next(vit)
                labels = {k: v for k, v in labels.items()
                          if not isinstance(v, list)}
                vvals = eval_fn(state, images, labels)
                vlosses.append(vvals["val_det_loss"])
            val_loss = float(jnp.mean(jnp.stack(vlosses)))
            history["val_loss"].append(val_loss)
            msg += f" val_loss={val_loss:.4f}"

        if coco_eval_fn is not None and config.map_freq and \
                (epoch + 1) % int(config.map_freq) == 0:
            try:
                # COCOCallback signature: (epoch, state, writer) — logs the
                # TB image suites (AP-vs-IoU, confusion, ROC, NMS grid)
                ap = coco_eval_fn(epoch + 1, state, metrics_writer)
            except TypeError:
                ap = coco_eval_fn(state)
            history.setdefault("AP", []).append(float(ap))
            msg += f" AP={ap:.4f}"

        log_fn(msg)
        metrics_writer.write(epoch + 1, {
            "loss": epoch_loss,
            **({"val_loss": val_loss} if val_loss is not None else {})})

        if (epoch + 1) % max(1, int(config.save_freq)) == 0:
            save_checkpoint(model_dir, state, epoch + 1, keep_last_n=keep_n)

        if val_loss is not None and stopper.update(val_loss, state):
            log_fn(f"early stopping at epoch {epoch + 1}; restoring best")
            if stopper.best_state is not None:
                state = stopper.best_state
                save_checkpoint(model_dir, state, epoch + 1,
                                keep_last_n=keep_n)
            break

    history["final_state"] = state  # type: ignore[assignment]
    return history
