"""Official benchmark for BASELINE config #3: 5-member deep-ensemble
inference with box-variance / class-entropy fusion.

The reference has no ensemble implementation (its only epistemic estimator
is MC-dropout), so the baseline schedule here is what the reference's
design would do: loop the members sequentially as N full predict calls at
batch 1 in f32 (the exact analog of its MC loop,
`/root/reference/src/efficientdet_keras.py:999-1024`, with the member axis
in place of the sample axis). The optimized path is the shipped product
path: `models/ensemble.ensemble_forward` (one vmapped program over the
stacked member pytree, bf16, batch 8) feeding the same `[T,B,...]`
on-device uncertainty postprocess as MC-dropout.

Methodology matches bench.py: one jitted `lax.scan` over K batches with
distinct per-step keys (the relay memoizes repeated calls and adds ~36 ms
per round trip; scanning amortizes it below 1%), throughput = K*batch /
median wall-time over 3 trials.

Writes ONE JSON line and (with --out) a JSON file for docs/.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build, _timed_scan  # same op point + timing harness

N_MEMBERS = 5
BATCH = 8
K_OPT = 24      # scanned batches per timed call (optimized path)
K_REF = 6       # scanned images per timed call (sequential-member path)


def _ensemble_batch_fn(cfg, model, use_pallas_nms=True):
    from udal_tpu.models.ensemble import ensemble_forward
    from udal_tpu.ops.postprocess import postprocess_global

    def one_batch(stacked, images, key):
        # key is unused for compute (deterministic members) but folded into
        # the image tensor so every scan step is distinct work (the relay
        # memoizes identical calls).
        jitter = jax.random.uniform(key, (), images.dtype, 0, 1e-3)
        cls_s, box_s = ensemble_forward(model, stacked, images + jitter)
        det = postprocess_global(cfg, list(cls_s), list(box_s),
                                 image_scales=jnp.ones((images.shape[0],)),
                                 use_pallas_nms=use_pallas_nms)
        return jnp.sum(det.scores) + jnp.sum(det.boxes) + \
            jnp.sum(det.valid_len.astype(jnp.float32))

    return one_batch


def _sequential_member_fn(cfg, model):
    """Reference-style schedule: members as a sequential scan, batch 1."""
    from udal_tpu.ops.postprocess import postprocess_global

    def one_image(stacked, image1, key):
        jitter = jax.random.uniform(key, (), image1.dtype, 0, 1e-3)

        def member_step(carry, member_vars):
            outs = model.apply(member_vars, image1 + jitter, train=False)
            return carry, outs

        _, stacked_outs = jax.lax.scan(member_step, 0.0, stacked)
        cls_s = [c for c in stacked_outs[0]]
        box_s = [b for b in stacked_outs[1]]
        det = postprocess_global(cfg, cls_s, box_s,
                                 image_scales=jnp.ones((1,)))
        return jnp.sum(det.scores) + jnp.sum(det.boxes)

    return one_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write JSON file here")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--members", type=int, default=N_MEMBERS)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: 2 members, 128x128, 2 scan steps "
                         "(correctness of the harness, not a perf number)")
    args = ap.parse_args()

    from udal_tpu.models.ensemble import init_ensemble

    # Ensemble replaces MC-dropout as the epistemic estimator: dropout off,
    # the member axis is the sample axis (mc_dropoutsamp drives the
    # postprocess [T,...] contract).
    cfg, _ = build(jnp.bfloat16)
    cfg.mc_dropout = False
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.members = 2
        cfg.image_size = "128x128"
        cfg.fpn_cell_repeats = 1
        cfg.box_class_repeats = 1
    cfg.mc_dropoutsamp = args.members
    h, w = (128, 128) if args.tiny else (512, 1024)
    k_opt, k_ref, batch = (2, 2, 2) if args.tiny else (K_OPT, K_REF, BATCH)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)

    model, stacked = init_ensemble(
        cfg, args.members, jax.random.PRNGKey(0), (h, w),
        dtype=jnp.bfloat16)

    t_opt = _timed_scan(_ensemble_batch_fn(cfg, model,
                                           use_pallas_nms=not args.tiny),
                        stacked, x, k_opt)
    ips_opt = batch * k_opt / t_opt

    if args.skip_ref:
        ratio = None
        ips_ref = None
    else:
        cfg32, _ = build(jnp.float32)
        cfg32.mc_dropout = False
        cfg32.mc_dropoutsamp = args.members
        if args.tiny:
            cfg32.image_size = "128x128"
            cfg32.fpn_cell_repeats = 1
            cfg32.box_class_repeats = 1
        model32, stacked32 = init_ensemble(
            cfg32, args.members, jax.random.PRNGKey(0), (h, w),
            dtype=jnp.float32)
        t_ref = _timed_scan(_sequential_member_fn(cfg32, model32),
                            stacked32, x[:1], k_ref)
        ips_ref = k_ref / t_ref
        ratio = round(ips_opt / ips_ref, 2)

    result = {
        "metric": f"images/sec, {args.members}-member deep-ensemble "
                  f"efficientdet-d0 @{w}x{h} (BASELINE config #3, incl. "
                  "box-variance/class-entropy on-device postprocess)",
        "value": round(ips_opt, 2),
        "unit": "images/sec",
        "vs_baseline": ratio,
        "baseline_ips": None if ips_ref is None else round(ips_ref, 2),
        "members": args.members,
        "batch": batch,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
