"""Learning-rate schedules and optimizer factory (optax).

Parity with the reference schedules (`/root/reference/src/train_lib.py:
66-254`): stepwise / cosine / polynomial with linear warmup, LR scaled by
batch_size/64, SGD-momentum or Adam, optional parameter EMA
(MovingAverage), gradient clipping handled in the train step.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp
import optax


def _warmup(step, lr_warmup_init, adjusted_lr, warmup_steps):
    return lr_warmup_init + step.astype(jnp.float32) / max(warmup_steps, 1) * \
        (adjusted_lr - lr_warmup_init)


def stepwise_lr(adjusted_lr: float, lr_warmup_init: float, warmup_steps: int,
                first_drop_step: int, second_drop_step: int
                ) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step)
        lr = jnp.where(step < warmup_steps,
                       _warmup(step, lr_warmup_init, adjusted_lr, warmup_steps),
                       adjusted_lr)
        for mult, start in [(1.0, warmup_steps), (0.1, first_drop_step),
                            (0.01, second_drop_step)]:
            lr = jnp.where(step < start, lr, adjusted_lr * mult)
        return lr
    return schedule


def cosine_lr(adjusted_lr: float, lr_warmup_init: float, warmup_steps: int,
              total_steps: int) -> optax.Schedule:
    decay_steps = float(total_steps - warmup_steps)

    def schedule(step):
        step = jnp.asarray(step)
        cos = 0.5 * adjusted_lr * (
            1 + jnp.cos(math.pi * step.astype(jnp.float32) / decay_steps))
        return jnp.where(step < warmup_steps,
                         _warmup(step, lr_warmup_init, adjusted_lr, warmup_steps),
                         cos)
    return schedule


def polynomial_lr(adjusted_lr: float, lr_warmup_init: float, warmup_steps: int,
                  power: float, total_steps: int) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step)
        poly = adjusted_lr * jnp.power(
            1 - step.astype(jnp.float32) / total_steps, power)
        return jnp.where(step < warmup_steps,
                         _warmup(step, lr_warmup_init, adjusted_lr, warmup_steps),
                         poly)
    return schedule


def learning_rate_schedule(config, steps_per_epoch: int) -> optax.Schedule:
    """Resolve the config to a schedule; LR ∝ batch_size/64."""
    batch_size = config.get("batch_size", 64) or 64
    scale = batch_size / 64.0
    adjusted_lr = config.learning_rate * scale
    lr_warmup_init = config.lr_warmup_init * scale
    warmup_steps = int(config.lr_warmup_epoch * steps_per_epoch)
    total_steps = int(config.num_epochs * steps_per_epoch)
    method = config.lr_decay_method
    if method == "stepwise":
        return stepwise_lr(adjusted_lr, lr_warmup_init, warmup_steps,
                           int(config.first_lr_drop_epoch * steps_per_epoch),
                           int(config.second_lr_drop_epoch * steps_per_epoch))
    if method == "cosine":
        return cosine_lr(adjusted_lr, lr_warmup_init, warmup_steps, total_steps)
    if method == "polynomial":
        return polynomial_lr(adjusted_lr, lr_warmup_init, warmup_steps,
                             config.poly_lr_power, total_steps)
    raise ValueError(f"unknown lr_decay_method: {method}")


def make_optimizer(config, steps_per_epoch: int
                   ) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """SGD-momentum / Adam with the configured schedule.

    Gradient clipping (per-tensor + global, `train_lib.py:1792-1799`) is a
    separate transform applied in the train step so the clipped global norm
    can be logged. EMA of parameters is tracked in the TrainState.
    """
    schedule = learning_rate_schedule(config, steps_per_epoch)
    name = config.optimizer.lower()
    if name == "sgd":
        tx = optax.sgd(schedule, momentum=config.momentum)
    elif name == "adam":
        tx = optax.adam(schedule, b1=config.momentum)
    else:
        raise ValueError("optimizer should be adam or sgd")
    return tx, schedule


def clip_gradients(grads, clip_norm: float):
    """Per-tensor clip_by_norm then global clip — parity
    `train_lib.py:1792-1799`. Returns (clipped_grads, global_norm_after)."""
    import jax

    def clip_one(g):
        n = jnp.sqrt(jnp.sum(jnp.square(g)))
        factor = jnp.minimum(1.0, clip_norm / jnp.maximum(n, 1e-12))
        return g * factor

    grads = jax.tree_util.tree_map(clip_one, grads)
    gnorm = optax.global_norm(grads)
    factor = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
    grads = jax.tree_util.tree_map(lambda g: g * factor, grads)
    return grads, optax.global_norm(grads)
