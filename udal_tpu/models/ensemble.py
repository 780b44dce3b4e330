"""Deep-ensemble inference via vmap over stacked parameter pytrees.

The reference contains no deep-ensemble code (its only epistemic estimator
is MC-dropout); this extends the same sample-axis abstraction —
`mc_forward` vmaps over dropout keys, ensembles vmap over member
parameters — reusing the reference's MC aggregation semantics: mean over
samples for boxes/logits, std as the epistemic sigma
(`/root/reference/src/postprocess.py:326-331`, `utils_extra.py:220-244`).

The postprocess pipeline consumes the [T, B, ...] outputs identically for
both estimators, so box-variance / class-entropy fusion comes for free.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from udal_tpu.models.efficientdet import EfficientDetNet


def stack_variables(variable_trees: Sequence[Any]) -> Any:
    """Stack N members' variables on a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *variable_trees)


def ensemble_forward(model: EfficientDetNet, stacked_variables, images,
                     train: bool = False
                     ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Forward all members in one vmapped program.

    Returns per-level lists of [T, B, H, W, C] — the same sample-axis
    contract as `mc_forward`, so `postprocess_global` with
    config.mc_dropout=True reduces them to mean boxes + epistemic sigma.
    """
    def one_member(variables):
        return model.apply(variables, images, train=train)

    return jax.vmap(one_member)(stacked_variables)


def init_ensemble(config, num_members: int, rng: jax.Array,
                  image_shape: Tuple[int, int], dtype=jnp.float32):
    """Initialize N independently-seeded members; returns (model, stacked)."""
    model = EfficientDetNet(config, dtype=dtype)
    h, w = image_shape
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)

    def init_one(key):
        p, d = jax.random.split(key)
        return model.init({"params": p, "dropout": d}, dummy, train=False)

    members = [init_one(k) for k in jax.random.split(rng, num_members)]
    return model, stack_variables(members)
