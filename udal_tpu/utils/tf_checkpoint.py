"""Load reference TF/automl EfficientDet checkpoints into the flax model.

The reference publishes pretrained checkpoints with the classic automl
variable naming (`efficientnet-b0/blocks_0/...`, `fpn_cells/cell_0/...`,
`class_net/class-0/...` — see `utils_keras.restore_ckpt`,
`/root/reference/src/utils_keras.py:125-235`). This module maps those names
onto the flax parameter tree so pretrained weights (and EMA shadow
variables) load directly — the float-tolerance parity bridge between the
two implementations.

Usage:
    weights = read_tf_checkpoint("/path/to/ckpt")          # name -> ndarray
    variables = load_reference_weights(variables, weights, config)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def read_tf_checkpoint(ckpt_path: str, use_ema: bool = True
                       ) -> Dict[str, np.ndarray]:
    """Read a TF checkpoint into {var_name: array}.

    With `use_ema`, ExponentialMovingAverage shadow variables replace their
    base variables when present (parity `utils_keras.py:174-235`).
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    out: Dict[str, np.ndarray] = {}
    for name in shapes:
        if name.endswith("ExponentialMovingAverage") or \
                "/Momentum" in name or name in ("global_step",):
            continue
        key = name
        if use_ema and f"{name}/ExponentialMovingAverage" in shapes:
            out[key] = reader.get_tensor(
                f"{name}/ExponentialMovingAverage")
        else:
            out[key] = reader.get_tensor(name)
    return out


def weights_from_keras_model(model) -> Dict[str, np.ndarray]:
    """{clean_var_name: array} from a live reference Keras model."""
    return {v.name.split(":")[0]: np.asarray(v) for v in model.weights}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"missing {'/'.join(path)} in flax tree at {p}")
        node = node[p]
    leaf = node[path[-1]]
    if tuple(leaf.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{leaf.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.asarray(leaf).dtype)


def _bn_paths(base: Tuple[str, ...], suffix: str
              ) -> Tuple[str, Tuple[str, ...]]:
    """(collection, path) for a BN variable suffix."""
    if suffix == "gamma":
        return "params", base + ("scale",)
    if suffix == "beta":
        return "params", base + ("bias",)
    if suffix == "moving_mean":
        return "batch_stats", base + ("mean",)
    if suffix == "moving_variance":
        return "batch_stats", base + ("var",)
    raise ValueError(suffix)


def _map_backbone(name: str, config) -> Optional[Tuple[str, Tuple[str, ...],
                                                       Optional[str]]]:
    """Map an efficientnet-* variable → (collection, flax path, transform)."""
    from udal_tpu.models.efficientnet import backbone_spec

    m = re.match(r"efficientnet-[^/]+/(.+)", name)
    if not m:
        return None
    rest = m.group(1)

    if rest.startswith("stem/"):
        if "conv2d" in rest:
            return "params", ("backbone", "stem_conv", "kernel"), None
        suffix = rest.split("/")[-1]
        coll, path = _bn_paths(("backbone", "stem_bn", "bn"), suffix)
        return coll, path, None

    bm = re.match(r"blocks_(\d+)/(.+)", rest)
    if bm:
        idx = int(bm.group(1))
        sub = bm.group(2)
        spec = backbone_spec(config.backbone_name)
        # expand per-repeat like the model does, to know expand_ratio per idx
        expanded = []
        for a in spec.blocks:
            expanded.append(a)
            for _ in range(a.num_repeat - 1):
                import dataclasses
                expanded.append(dataclasses.replace(
                    a, input_filters=a.output_filters, strides=(1, 1)))
        has_expand = expanded[idx].expand_ratio != 1
        block = f"blocks_{idx}"

        if sub.startswith("se/"):
            which = "reduce" if re.search(r"conv2d(_\d+)?/", sub) and \
                "_1" not in sub.split("/")[1] else "expand"
            leaf = "kernel" if sub.endswith("kernel") else "bias"
            return "params", ("backbone", block, "se", which, leaf), None
        if "depthwise_conv2d" in sub:
            return ("params",
                    ("backbone", block, "depthwise_conv", "kernel"),
                    "depthwise")
        cm = re.match(r"conv2d(_(\d+))?/kernel", sub)
        if cm:
            n = int(cm.group(2) or 0)
            conv = ("expand_conv" if (has_expand and n == 0) else
                    "project_conv")
            return "params", ("backbone", block, conv, "kernel"), None
        bn = re.match(r"tpu_batch_normalization(_(\d+))?/(\w+)", sub)
        if bn:
            n = int(bn.group(2) or 0)
            names = ["bn0", "bn1", "bn2"] if has_expand else ["bn1", "bn2"]
            coll, path = _bn_paths(("backbone", block, names[n], "bn"),
                                   bn.group(3))
            return coll, path, None
    return None


def _map_fpn(name: str, config) -> Optional[Tuple[str, Tuple[str, ...],
                                                  Optional[str]]]:
    rm = re.match(r"resample_p(\d+)/(.+)", name)
    if rm:
        level, sub = rm.group(1), rm.group(2)
        base = (f"resample_p{level}",)
        if "conv2d" in sub:
            leaf = "kernel" if sub.endswith("kernel") else "bias"
            return "params", base + ("conv1x1", leaf), None
        coll, path = _bn_paths(base + ("bn", "bn"), sub.split("/")[-1])
        return coll, path, None

    fm = re.match(r"fpn_cells/cell_(\d+)/fnode(\d+)/(.+)", name)
    if not fm:
        return None
    cell, fnode, sub = fm.group(1), fm.group(2), fm.group(3)
    base = ("fpn_cells", f"cell_{cell}", f"fnode{fnode}")

    wm = re.match(r"WSM(_(\d+))?$", sub)
    if wm:
        # WSM scalars concatenate into the edge_weights vector; return the
        # index through the transform channel
        idx = int(wm.group(2) or 0)
        return "params", base + ("edge_weights",), f"wsm:{idx}"
    if sub.startswith("op_after_combine"):
        parts = sub.split("/")
        if parts[1] == "conv":
            leaf = parts[2]
            if leaf == "depthwise_kernel":
                return "params", base + ("conv", "depthwise", "kernel"), \
                    "depthwise"
            if leaf == "pointwise_kernel":
                return "params", base + ("conv", "pointwise", "kernel"), None
            return "params", base + ("conv", "pointwise", "bias"), None
        coll, path = _bn_paths(base + ("bn", "bn"), parts[2])
        return coll, path, None
    rm = re.match(r"resample_(\d+)_\d+_\d+/(.+)", sub)
    if rm:
        i, rsub = rm.group(1), rm.group(2)
        rbase = base + (f"resample_{i}",)
        if "conv2d" in rsub:
            leaf = "kernel" if rsub.endswith("kernel") else "bias"
            return "params", rbase + ("conv1x1", leaf), None
        coll, path = _bn_paths(rbase + ("bn", "bn"), rsub.split("/")[-1])
        return coll, path, None
    return None


def _map_head(name: str, config) -> Optional[Tuple[str, Tuple[str, ...],
                                                   Optional[str]]]:
    hm = re.match(r"(class|box)_net/(.+)", name)
    if not hm:
        return None
    head, sub = hm.group(1), hm.group(2)
    net = f"{head}_net"
    prefix = "class" if head == "class" else "box"

    bn = re.match(rf"{prefix}-(\d+)-bn-(\d+)/(\w+)", sub)
    if bn:
        rep, level, suffix = int(bn.group(1)), int(bn.group(2)), bn.group(3)
        l_idx = level - config.min_level
        coll, path = _bn_paths(
            (net, "stack", f"{prefix}-{rep}-bn-{l_idx}", "bn"), suffix)
        return coll, path, None
    cm = re.match(rf"{prefix}-(predict|\d+)/(\w+)", sub)
    if cm:
        which, leaf = cm.group(1), cm.group(2)
        base = (net, f"{prefix}-predict") if which == "predict" else \
            (net, "stack", f"{prefix}-{which}")
        if leaf == "depthwise_kernel":
            return "params", base + ("depthwise", "kernel"), "depthwise"
        if leaf == "pointwise_kernel":
            return "params", base + ("pointwise", "kernel"), None
        if leaf == "bias":
            return "params", base + ("pointwise", "bias"), None
        if leaf == "kernel":       # non-separable heads
            return "params", base + ("kernel",), None
    return None


def load_reference_weights(variables: Any, weights: Dict[str, np.ndarray],
                           config, strict: bool = True) -> Any:
    """Return a new flax variables dict with reference weights loaded."""
    import jax

    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables.get("batch_stats", {}))}))
    # deep-copy into plain nested dicts
    import copy

    def to_dict(d):
        if isinstance(d, dict) or hasattr(d, "items"):
            return {k: to_dict(v) for k, v in d.items()}
        return d

    tree = to_dict(tree)
    wsm_pending: Dict[Tuple[str, ...], Dict[int, float]] = {}
    unmapped = []
    for name, value in weights.items():
        clean = name.split(":")[0]
        mapped = (_map_backbone(clean, config) or _map_fpn(clean, config) or
                  _map_head(clean, config))
        if mapped is None:
            unmapped.append(clean)
            continue
        coll, path, transform = mapped
        if transform == "depthwise":
            value = np.transpose(value, (0, 1, 3, 2))  # [h,w,C,1]→[h,w,1,C]
        if transform and transform.startswith("wsm:"):
            idx = int(transform.split(":")[1])
            wsm_pending.setdefault((coll,) + path, {})[idx] = value
            continue
        _set(tree[coll], path, value)
    for key, items in wsm_pending.items():
        coll, path = key[0], key[1:]
        vec = np.asarray(tree[coll][path[0]][path[1]][path[2]][path[3]])
        new = np.array(vec)
        for idx, v in items.items():
            new[idx] = v
        _set(tree[coll], path, new)
    if strict and unmapped:
        raise ValueError(f"unmapped reference variables: {unmapped[:10]} "
                         f"(+{max(0, len(unmapped) - 10)} more)")
    return tree
