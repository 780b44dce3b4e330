"""Measure SeparableConv.fuse_full (dense-composed FPN/head convs) on-chip.

Compares the bench op point (10-pass MC d0 @1024x512, batch 8, bf16,
postprocess included) with `fused_sepconv` off vs on, using the same
K-scanned single-call methodology as bench.py (relay-safe).

Usage: python tools/perf_fused.py [--k 48] [--batch 8]
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses build/_mc_batch_fn/_timed_scan)


def measure(fused: bool, k: int, batch: int):
    cfg, model = bench.build(jnp.bfloat16)
    cfg.fused_sepconv = fused
    from udal_tpu.models.efficientdet import EfficientDetNet
    model = EfficientDetNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 512, 1024, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()
    t = bench._timed_scan(bench._mc_batch_fn(cfg, model), variables, x, k)
    ips = batch * k / t
    print(f"fused={fused} batch={batch}: {ips:.2f} img/s "
          f"({t / k * 1000:.2f} ms/batch)", flush=True)
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fused-only", action="store_true")
    ap.add_argument("--base-only", action="store_true")
    args = ap.parse_args()
    if not args.fused_only:
        base = measure(False, args.k, args.batch)
    if not args.base_only:
        fused = measure(True, args.k, args.batch)
    if not args.fused_only and not args.base_only:
        print(f"speedup: {fused / base:.3f}x")


if __name__ == "__main__":
    main()
