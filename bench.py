"""Benchmark: 10-pass MC-dropout efficientdet-d0 inference throughput.

Headline metric from BASELINE.md: images/sec for MC-dropout (T=10)
efficientdet-d0 at the KITTI operating point (1024x512, 8 classes, loss
attenuation + MC dropout 0.05), including on-device uncertainty
post-processing (decode + soft-NMS + packing).

Methodology: the chip sits behind a relay that (a) adds a large per-call
round-trip and (b) memoizes identical (executable, args) calls, so naive
async timing is invalid. Each measurement is therefore ONE jitted program
that `lax.scan`s over K batches with per-step PRNG keys (distinct work every
step, single round-trip, no host in the loop); throughput = K*batch /
wall-time.

`vs_baseline` compares against a faithful reference-style schedule measured
the same way: batch=1 and the MC axis as a *sequential* scan of T full
forward passes (the reference's Python loop, `efficientdet_keras.py:
999-1024`), f32 compute (the reference default) — but with zero host/launch
overhead, which is GENEROUS to the baseline; the real reference also pays a
per-pass host round trip.

The ACTUAL reference TF program was additionally measured live in round 4
(`tools/perf_reference.py` → `docs/REFERENCE_BENCH.json`, summarized in
BASELINE.md): 0.114 img/s on this host's CPU at the same op point — three
orders of magnitude below this benchmark's TPU number. `vs_baseline` here
deliberately keeps the much stronger same-chip JAX floor as denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

T = 10
BATCH = 8
# The relay adds ~36 ms per *call*; scanning many batches inside one call
# amortizes it below 1% so the reported number is the device rate.
K_OPT = 48     # scanned batches per timed call (optimized path)
K_REF = 12     # scanned images per timed call (reference-style path)


def build(dtype):
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "1024x512"
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = T
    cfg.is_training_bn = False
    model = EfficientDetNet(cfg, dtype=dtype)
    return cfg, model


def _mc_batch_fn(cfg, model, use_pallas_nms=True):
    from udal_tpu.ops.postprocess import postprocess_global

    def one_batch(variables, images, key):
        from udal_tpu.models.efficientdet import mc_forward
        # mc_forward takes the fast path: shared stem+block0 prefix hoisted
        # out of the sample vmap, block-0 tail folded into one packed
        # batched matmul (models/mc_fast.py)
        cls_s, box_s = mc_forward(model, variables, images, key, T)
        # bf16 flows straight into postprocess; only selected candidates are
        # upcast inside the pipeline; NMS runs as the VMEM-resident Pallas
        # kernel
        det = postprocess_global(cfg, list(cls_s), list(box_s),
                                 image_scales=jnp.ones((images.shape[0],)),
                                 use_pallas_nms=use_pallas_nms)
        # reduce to a scalar so the scan carry stays tiny but depends on
        # every output (prevents DCE)
        return jnp.sum(det.scores) + jnp.sum(det.boxes) + \
            jnp.sum(det.valid_len.astype(jnp.float32))

    return one_batch


def _ref_style_fn(cfg, model):
    """Sequential T-pass MC on a single image (reference loop schedule)."""
    from udal_tpu.ops.postprocess import postprocess_global

    def one_image(variables, image1, key):
        keys = jax.random.split(key, T)

        def pass_step(carry, k):
            outs = model.apply(variables, image1, train=False,
                               rngs={"dropout": k})
            return carry, outs

        _, stacked = jax.lax.scan(pass_step, 0.0, keys)  # sequential passes
        cls_s = [c for c in stacked[0]]
        box_s = [b for b in stacked[1]]
        det = postprocess_global(cfg, cls_s, box_s,
                                 image_scales=jnp.ones((1,)))
        return jnp.sum(det.scores) + jnp.sum(det.boxes)

    return one_image


def _timed_scan(fn, variables, images, n_scan, trials=3, calls=1):
    """Jitted scan over n_scan steps with distinct keys.

    Runs `calls` INDEPENDENT measurement calls of `trials` timed executions
    each (the relay and chip clock jitter between calls is the dominant
    variance term — round-4's official number drifted −1.6% with no code
    change on the bench path). Returns (median over all trials,
    min-of-call-medians, max-of-call-medians).
    """

    @jax.jit
    def many(variables, images, key):
        def step(carry, k):
            return carry + fn(variables, images, k), None
        keys = jax.random.split(key, n_scan)
        total, _ = jax.lax.scan(step, 0.0, keys)
        return total

    import os as _os

    def fresh_key():
        # entropy-derived: the relay memoizes repeated (executable, args)
        # pairs across processes, so keys must never repeat
        return jax.random.PRNGKey(int.from_bytes(_os.urandom(4), "little"))

    import sys as _sys

    # NOTE: behind the axon relay, block_until_ready does not reliably wait
    # for remote execution; fetching the scalar VALUE to host does. The
    # result is one float, so the transfer itself is negligible.
    t0 = time.perf_counter()
    float(many(variables, images, fresh_key()))
    print(f"[bench] warmup+compile: {time.perf_counter() - t0:.1f}s",
          file=_sys.stderr)
    all_times, call_medians = [], []
    for c in range(calls):
        times = []
        for _ in range(trials):
            key = fresh_key()
            t0 = time.perf_counter()
            float(many(variables, images, key))
            times.append(time.perf_counter() - t0)
        print(f"[bench] call {c + 1}/{calls} trial times: "
              f"{[round(t, 3) for t in times]}", file=_sys.stderr)
        all_times.extend(times)
        call_medians.append(float(np.median(times)))
    return (float(np.median(all_times)),
            float(min(call_medians)), float(max(call_medians)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--approx-topk", action="store_true",
                    help="opt-in jax.lax.approx_max_k pre-NMS top-k "
                         "(recall>=0.95 at these shapes); OFF for the "
                         "official parity bench — this flag exists to "
                         "measure the opt-in's speedup")
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the reference-style baseline measurement "
                         "(vs_baseline reported as null)")
    args = ap.parse_args()

    # Persistent XLA compile cache (same knob as the CLI's --compile_cache):
    # a re-run of this benchmark skips the ~13-minute cold compile.
    from udal_tpu.utils.compile_cache import enable_from_env_or_flag
    enable_from_env_or_flag(None)

    rng = np.random.RandomState(0)

    # ---- optimized TPU-native path: bf16, vmap MC axis, batch 8 ----------
    cfg, model = build(jnp.bfloat16)
    if args.approx_topk:
        cfg.override({"approx_topk": True}, allow_new_keys=True)
    x = jnp.asarray(rng.rand(BATCH, 512, 1024, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()
    t_opt, t_min, t_max = _timed_scan(_mc_batch_fn(cfg, model), variables,
                                      x, K_OPT, calls=3)
    ips_opt = BATCH * K_OPT / t_opt
    # min/max over the three independent call medians → throughput bounds
    ips_hi = BATCH * K_OPT / t_min
    ips_lo = BATCH * K_OPT / t_max

    if args.skip_ref:
        ratio = None
    else:
        # ---- reference-style schedule: f32, batch 1, sequential MC loop --
        cfg32, model32 = build(jnp.float32)
        v32 = jax.jit(lambda: model32.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x[:1], train=False))()
        t_ref, _, _ = _timed_scan(_ref_style_fn(cfg32, model32), v32, x[:1],
                                  K_REF)
        ips_ref = K_REF / t_ref
        ratio = round(ips_opt / ips_ref, 2)

    metric = ("images/sec, 10-pass MC-dropout efficientdet-d0 @1024x512 "
              "(KITTI op point, incl. on-device uncertainty postprocess)")
    if args.approx_topk:
        metric += " [opt-in approx_topk]"
    result = {
        "metric": metric,
        "value": round(ips_opt, 2),
        "unit": "images/sec",
        "vs_baseline": ratio,
        # variance bound: median of 9 trials across 3 independent timed
        # calls; value_min/max are the worst/best per-call medians
        "value_min": round(ips_lo, 2),
        "value_max": round(ips_hi, 2),
        "n_calls": 3,
        "n_trials_per_call": 3,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
