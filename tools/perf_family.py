"""Model-family throughput sweep: 10-pass MC-dropout serving for
efficientdet-d0..d4 (+ lite variants on request) at each model's native
resolution, bf16, on-device uncertainty postprocess — the same measured
path as bench.py, swept across the scaling table.

Purpose: evidence that the framework serves the whole EfficientDet family
the reference ships (`/root/reference/src/hparams_config.py` d0-d7x), not
just the d0 headline. Batch sizes shrink with model size to stay inside
one v5e chip's HBM with the T=10 sample axis.

Writes docs/FAMILY_BENCH.json with one row per model.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mc_batch_fn, _timed_scan

T = 10

# (model, HxW serve resolution, batch, scanned batches per timed call).
# Resolutions follow the reference scaling table aspect (square there;
# KITTI-wide for d0 to match bench.py's headline row).
SWEEP = [
    ("efficientdet-d0", (512, 1024), 8, 24),
    ("efficientdet-d1", (640, 640), 8, 16),
    ("efficientdet-d2", (768, 768), 4, 12),
    ("efficientdet-d3", (896, 896), 4, 8),
    ("efficientdet-d4", (1024, 1024), 2, 6),
    ("efficientdet-d5", (1280, 1280), 1, 4),
]


def build(model_name, dtype):
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet

    cfg = get_detection_config(model_name)
    h, w = dict((m, r) for m, r, _, _ in SWEEP)[model_name]
    cfg.image_size = f"{w}x{h}"
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = T
    cfg.is_training_bn = False
    return cfg, EfficientDetNet(cfg, dtype=dtype)


def measure(model_name, tiny=False):
    cfg, model = build(model_name, jnp.bfloat16)
    h, w = [r for m, r, _, _ in SWEEP if m == model_name][0]
    batch = [b for m, _, b, _ in SWEEP if m == model_name][0]
    k = [k for m, _, _, k in SWEEP if m == model_name][0]
    if tiny:
        cfg.image_size = "128x128"
        h = w = 128
        batch, k = 2, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)
    t0 = time.perf_counter()
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()
    init_s = time.perf_counter() - t0
    t = _timed_scan(_mc_batch_fn(cfg, model, use_pallas_nms=not tiny),
                    variables, x, k, trials=2 if tiny else 3)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    return {
        "model": model_name,
        "resolution": f"{w}x{h}",
        "batch": batch,
        "img_per_s": round(batch * k / t, 2),
        "params_m": round(n_params / 1e6, 2),
        "init_s": round(init_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(m for m, _, _, _ in SWEEP))
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: d0 only at 128px")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.models = "efficientdet-d0"

    rows = []
    for name in args.models.split(","):
        row = measure(name, tiny=args.tiny)
        print(json.dumps(row))
        rows.append(row)

    report = {"metric": "images/sec, 10-pass MC-dropout serving incl. "
                        "on-device uncertainty postprocess (bf16)",
              "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
