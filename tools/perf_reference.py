"""Same-host A/B: the LIVE reference TF serving program vs udal_tpu's.

North star (BASELINE.md): >=10x reference images/sec for 10-pass MC-dropout
efficientdet-d0 inference. The reference publishes no numbers and its GPU is
not in this image, so this tool measures the strongest direct comparison
available: both frameworks' full serving programs — T-pass MC network + the
global uncertainty postprocess on pre-resized f32 frames, the exact surface
bench.py times — on the SAME host CPU. That isolates the *architecture* win
(vmapped MC axis + one fused XLA program vs the reference's sequential MC
loop, `/root/reference/src/efficientdet_keras.py:999-1024`, and its
graph-mode per-sample postprocess, `/root/reference/src/postprocess.py:
144-331`) from the TPU *hardware* win, which bench.py measures separately.

Methodology mirrors the reference's own ServingDriver.benchmark
(`/root/reference/src/infer_lib.py:206-224`): tf.function-wrapped predict,
warmup calls, then timed calls; we use the median and force host
materialization of one output element per call. Run with JAX_PLATFORMS=cpu
so the udal_tpu section measures the same silicon; the tool asserts it.

Writes docs/REFERENCE_BENCH.json and prints the table.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timed(call, warmup, bm_runs, label):
    for i in range(warmup):
        t0 = time.perf_counter()
        call()
        print(f"[{label}] warmup {i}: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)
    times = []
    for _ in range(bm_runs):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    print(f"[{label}] timed: {[round(t, 3) for t in times]}", file=sys.stderr)
    return float(np.median(times))


def measure_reference(args):
    """Time the live reference EfficientDetModel serving program on CPU."""
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    from udal_tpu.utils.reference_compat import (add_reference_to_path,
                                                 stub_reference_deps)
    cleanup = stub_reference_deps()
    add_reference_to_path()
    try:
        return _measure_reference_inner(args)
    finally:
        # Drop the stub modules + reference sys.path entry so an in-process
        # pytest session can't be fooled by them afterwards (the stub
        # helper's docstring warns about exactly this).
        if callable(cleanup):
            cleanup()


def _measure_reference_inner(args):
    import tensorflow as tf

    import efficientdet_keras
    import hparams_config as hc

    h, w = args.height, args.width
    cfg = hc.get_efficientdet_config("efficientdet-d0")
    cfg.override(dict(
        image_size=f"{w}x{h}", num_classes=args.num_classes,
        loss_attenuation=True, mc_dropout=True, mc_dropoutrate=0.05,
        mc_dropoutsamp=args.mc_samples, is_training_bn=False,
        # The op-point yaml sets enable_softmax (allclasses_mcdropout_
        # lossatt.yaml:12); with it False the reference's own
        # postprocess_global crashes (`postprocess.py:468` returns
        # list.append(...) == None).
        enable_softmax=True))
    model = efficientdet_keras.EfficientDetModel(config=cfg)
    x = np.random.RandomState(0).rand(args.batch, h, w, 3).astype(np.float32)
    # Build variables with one eager call on the already-resized frame.
    model(tf.constant(x[:1]), training=False, pre_mode=None,
          post_mode="global")

    spec = tf.TensorSpec([args.batch, h, w, 3], tf.float32, name="images")

    @tf.function(input_signature=[spec])
    def serve(images):
        # pre_mode=None: frames are already network-size (bench.py surface);
        # post_mode='global': the reference's full uncertainty postprocess
        # (pre-NMS extraction + decode + NMS + packing).
        return model(images, training=False, pre_mode=None,
                     post_mode="global")

    # Hoist the host->TF conversion out of the timed call so both sections
    # are timed over identical input-handling work (the JAX section also
    # converts its input to a device array once, outside the loop).
    tx = tf.constant(x)

    def call():
        out = serve(tx)
        # Force host materialization of the detections like a real consumer.
        np.asarray(out[0])

    t = _timed(call, args.warmup, args.bm_runs, "reference tf-cpu")
    return {"s_per_batch": round(t, 4),
            "img_per_s": round(args.batch / t, 3)}


def measure_ours(args):
    """Time udal_tpu's jitted MC-serve program (bench.py surface) on CPU."""
    import jax

    # A sitecustomize in this image pins JAX_PLATFORMS=axon (the TPU relay);
    # the A/B is same-silicon by design, so pin back to CPU before first use.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "cpu", (
        "could not pin jax to CPU: the A/B is same-silicon by design")

    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet, mc_forward
    from udal_tpu.ops.postprocess import postprocess_global

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = f"{args.width}x{args.height}"
    cfg.num_classes = args.num_classes
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = args.mc_samples
    cfg.is_training_bn = False
    cfg.enable_softmax = True  # match the reference section (logit output)
    # f32 like the TF section: same precision, same silicon.
    model = EfficientDetNet(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3),
                    jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()

    @jax.jit
    def serve(variables, images, key):
        cls_s, box_s = mc_forward(model, variables, images, key,
                                  args.mc_samples)
        return postprocess_global(cfg, list(cls_s), list(box_s),
                                  image_scales=jnp.ones((images.shape[0],)),
                                  use_pallas_nms=False)

    counter = [0]

    def call():
        counter[0] += 1
        det = serve(variables, x, jax.random.PRNGKey(counter[0]))
        np.asarray(det.scores)  # host materialization, like the TF section

    t = _timed(call, args.warmup, args.bm_runs, "udal_tpu jax-cpu")
    return {"s_per_batch": round(t, 4),
            "img_per_s": round(args.batch / t, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="reference,ours")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--num-classes", type=int, default=8)
    ap.add_argument("--mc-samples", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--bm-runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "REFERENCE_BENCH.json"))
    args = ap.parse_args()

    sections = [s.strip() for s in args.sections.split(",") if s.strip()]
    op_point = (f"efficientdet-d0 @{args.width}x{args.height}, "
                f"{args.num_classes} classes, loss_attenuation, "
                f"mc_dropoutrate 0.05, T={args.mc_samples}, "
                f"batch {args.batch}, f32, network+uncertainty "
                "postprocess on pre-resized frames (bench.py surface)")
    result = {
        "op_point": op_point,
        "hardware": f"same host CPU ({os.cpu_count()} core), both sections",
        "warmup": args.warmup, "bm_runs": args.bm_runs,
    }
    # op_point is also stored per section so a split-run merge can verify
    # both sections were measured at the same settings before recomputing
    # the judged ratio.
    if "reference" in sections:
        result["reference_tf_cpu"] = measure_reference(args)
        result["reference_tf_cpu"]["op_point"] = op_point
    if "ours" in sections:
        result["udal_tpu_jax_cpu"] = measure_ours(args)
        result["udal_tpu_jax_cpu"]["op_point"] = op_point

    def _ratio(report):
        ref = report.get("reference_tf_cpu")
        ours = report.get("udal_tpu_jax_cpu")
        if not (ref and ours):
            return None
        if ref.get("op_point", op_point) != ours.get("op_point", op_point):
            print("WARNING: sections measured at DIFFERENT op points; "
                  "refusing to compute ratio_same_cpu:\n"
                  f"  reference: {ref.get('op_point')}\n"
                  f"  ours:      {ours.get('op_point')}", file=sys.stderr)
            return None
        # Unrounded so downstream checks aren't bitten by 2-dp rounding.
        return ours["img_per_s"] / ref["img_per_s"]

    r = _ratio(result)
    if r is not None:
        result["ratio_same_cpu"] = r

    if args.out:
        existing = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        # Merge so the two sections can be measured in separate runs
        # (keeps the single host core uncontended per section).
        existing.update(result)
        existing.pop("ratio_same_cpu", None)
        r = _ratio(existing)
        if r is not None:
            existing["ratio_same_cpu"] = r
        result = existing
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
