"""Checkpoint save/restore with EMA handling (orbax).

Parity with the reference checkpoint machinery
(`/root/reference/src/utils_keras.py:125-235`, `train_lib.py:620-677`):
epoch-granularity checkpoints named ckpt-<epoch>, resume from the latest,
EMA shadow weights restorable in place of the raw parameters for serving
("_" as ckpt path means "load nothing", kept for test ergonomics), and a
keep-last-N retention policy.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(model_dir: str, keep_last_n: Optional[int] = None
             ) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep_last_n, create=True, step_prefix="ckpt")
    return ocp.CheckpointManager(os.path.abspath(model_dir), options=options)


def save_checkpoint(model_dir: str, state, epoch: int,
                    keep_last_n: Optional[int] = None) -> None:
    """Save a TrainState at epoch granularity (ckpt-<epoch>)."""
    mgr = _manager(model_dir, keep_last_n)
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_checkpoint(model_dir: str) -> Optional[int]:
    if not os.path.isdir(model_dir):
        return None
    steps = []
    for name in os.listdir(model_dir):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(model_dir: str, state, epoch: Optional[int] = None):
    """Restore a TrainState; `epoch=None` loads the latest.

    Treats model_dir == "_" as "do not load" — parity with
    `utils_keras.py:142-144`.
    """
    if model_dir == "_":
        return state, 0
    if epoch is None:
        epoch = latest_checkpoint(model_dir)
        if epoch is None:
            return state, 0
    mgr = _manager(model_dir)
    try:
        restored = mgr.restore(epoch, args=ocp.args.StandardRestore(state))
    except ValueError as e:
        if "ema_params" not in str(e) or not hasattr(state, "replace"):
            raise
        # EMA presence differs between the saved state and the restore
        # target (e.g. a ckpt trained with moving_average_decay=0 restored
        # into a target built with EMA on, or vice versa). Flip the target's
        # ema_params and retry; serving falls back to raw params when the
        # restored EMA is absent (`swap_in_ema`).
        flipped = (None if state.ema_params is not None
                   else jax.tree.map(lambda x: x, state.params))
        restored = mgr.restore(
            epoch, args=ocp.args.StandardRestore(state.replace(
                ema_params=flipped)))
    mgr.close()
    return restored, epoch


def swap_in_ema(state):
    """Return variables with EMA weights as the live parameters.

    Parity with the reference's EMA restore for serving/eval
    (`utils_keras.py:174-235`): when moving-average weights exist they
    replace the raw parameters.
    """
    params = state.ema_params if state.ema_params is not None else state.params
    return {"params": params, "batch_stats": state.batch_stats}
