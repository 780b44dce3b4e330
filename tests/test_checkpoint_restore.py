"""Checkpoint restore robustness: EMA presence mismatch between the saved
state and the restore target.

A checkpoint trained with ``moving_average_decay=0`` (ema_params=None) must
restore into a target built with EMA enabled, and vice versa — the trained
acquisition checkpoints (tools/al_efficacy.py --save-ckpt) are consumed by
serving harnesses that construct their target from a default config
(`tools/perf_al_scoring.py`). Reference analogue: `utils_keras.py:125-235`
loads name-based ckpts with or without EMA shadow variables.
"""

import jax
import jax.numpy as jnp

from udal_tpu.train.train_lib import TrainState
from udal_tpu.utils.checkpoint import (restore_checkpoint, save_checkpoint,
                                       swap_in_ema)


def _state(ema):
    params = {"w": jnp.full((2, 2), 2.0)}
    return TrainState(step=jnp.zeros(()), params=params,
                      batch_stats={"m": jnp.zeros(2)},
                      opt_state={"mu": params}, ema_params=ema)


def test_restore_no_ema_ckpt_into_ema_target(tmp_path):
    save_checkpoint(str(tmp_path), _state(ema=None), 1)
    target = _state(ema={"w": jnp.zeros((2, 2))})
    restored, epoch = restore_checkpoint(str(tmp_path), target)
    assert epoch == 1
    assert restored.ema_params is None
    # serving falls back to the raw params
    variables = swap_in_ema(restored)
    assert float(variables["params"]["w"].mean()) == 2.0


def test_restore_ema_ckpt_into_no_ema_target(tmp_path):
    save_checkpoint(str(tmp_path), _state(ema={"w": jnp.full((2, 2), 3.0)}),
                    1)
    restored, epoch = restore_checkpoint(str(tmp_path), _state(ema=None))
    assert epoch == 1
    assert float(jax.tree.leaves(restored.ema_params)[0].mean()) == 3.0
