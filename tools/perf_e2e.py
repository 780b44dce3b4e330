"""End-to-end (TFRecord → device) throughput at the operating point.

VERDICT r2 #1: the headline device rate (bench.py) excludes the host input
pipeline; this measures the full path — C++ TFRecord read → JPEG decode →
resize (uint8 fast path) → H2D → on-device normalize/labeling/compute —
for three stages, each with `InputReader.wait_stats()`:

  host-only   : producer throughput with a zero-cost consumer
  serve       : sustained ServingDriver.serve() from TFRecords (eval mode)
  train       : sustained jitted train step from TFRecords (fast_input:
                uint8 H2D + on-device anchor labeling)

Run on the real chip (default platform) or CPU (--cpu). Writes
docs/E2E_PIPELINE.json and prints a summary. The host here has ONE core
(`nproc`=1); --procs>0 exercises the multi-process architecture, and the
report records cores so the per-core scaling math is explicit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_kitti_like_dataset(path: str, n: int, seed: int = 0):
    """KITTI-shaped natural-content JPEGs (1224x370) so decode/resize cost
    is realistic — dense-noise PNG (the test default) decodes ~5x slower
    than real camera JPEGs and misstates the host pipeline's capacity."""
    from udal_tpu.data.synthetic import write_synthetic_dataset

    return write_synthetic_dataset(path, num_images=n, height=370,
                                   width=1224, num_classes=7, seed=seed,
                                   image_format="jpeg", natural=True)


def _drain(reader, it, n_batches, batch, step_fn=None):
    t0 = time.perf_counter()
    out = None
    for i in range(n_batches):
        images, labels = next(it)
        if step_fn is not None:
            out = step_fn(images, labels)
    if out is not None:
        jax_fetch(out)
    dt = time.perf_counter() - t0
    return {"img_per_s": n_batches * batch / dt, "wall_s": dt,
            **reader.wait_stats()}


def jax_fetch(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])  # value fetch (relay-safe sync)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--procs", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--train-steps", type=int, default=12)
    ap.add_argument("--device-resize", action="store_true",
                    help="host ships NATIVE uint8; bilinear resize runs "
                         "on-device (uniform-size datasets)")
    ap.add_argument("--image-size", default="1024x512",
                    help="op-point override (tiny values make a CPU smoke "
                         "of all three stages feasible)")
    ap.add_argument("--tiny-model", action="store_true",
                    help="fpn_cell_repeats=1, box_class_repeats=1 (smoke)")
    # versioned filename: an older cached dataset (the r2 dense-noise PNGs)
    # must never be silently reused under the realistic-JPEG methodology
    ap.add_argument("--data", default="/tmp/e2e_kitti_jpg_v3.tfrecord")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "E2E_PIPELINE.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from udal_tpu.apps.serving import ServingDriver
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    data = args.data
    if not os.path.exists(data):
        make_kitti_like_dataset(data, args.images)

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = args.image_size
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutsamp = 10
    if args.tiny_model:
        cfg.fpn_cell_repeats = 1
        cfg.box_class_repeats = 1
    cfg.override({"batch_size": args.batch}, allow_new_keys=True)

    report = {"platform": jax.devices()[0].platform,
              "host_cores": os.cpu_count(),
              "procs": args.procs, "batch": args.batch,
              "device_resize": args.device_resize}

    def mk_reader():
        # fast-input training reader for every stage: infinite stream of
        # resized (or, with --device-resize, NATIVE) uint8 + compact
        # groundtruth (the minimal host work); normalization/resize run on
        # device via serve_preprocessed_uint8 / train prepare_batch
        return InputReader(data, is_training=True, fast_input=True,
                           num_proc=args.procs, prefetch=3, seed=0,
                           device_resize=args.device_resize)

    # 1) host-only producer rate (zero-cost consumer)
    r = mk_reader()
    it = r(cfg, args.batch)
    next(it)  # warm-up batch excluded
    r._wait_s = r._total_s = 0.0
    host = _drain(r, it, args.batches, args.batch)
    it.close()
    report["host_only"] = host
    print(f"[host-only] {host['img_per_s']:.1f} img/s "
          f"(wait {host['wait_fraction']:.2f})", flush=True)

    # 2) serving from TFRecords
    drv = ServingDriver.create("efficientdet-d0",
                               overrides=dict(cfg.as_dict()),
                               batch_size=args.batch)
    r = mk_reader()
    it = r(cfg, args.batch)
    images, labels0 = next(it)

    def serve_step(images, labels):
        # fast-input contract: resized uint8 + valid_hw/image_scales;
        # normalization (and, with device_resize, the bilinear resize)
        # runs inside the jitted serving program
        return drv.serve_preprocessed_uint8(
            images, labels["valid_hw"], labels["image_scales"],
            warp_scale=labels.get("warp_scale"),
            warp_offset=labels.get("warp_offset"))

    t0 = time.perf_counter()
    jax_fetch(serve_step(images, labels0))
    report["serve_compile_s"] = time.perf_counter() - t0
    r._wait_s = r._total_s = 0.0
    serve = _drain(r, it, args.batches, args.batch, serve_step)
    it.close()
    report["serve_e2e"] = serve
    print(f"[serve-e2e] {serve['img_per_s']:.1f} img/s "
          f"(wait {serve['wait_fraction']:.2f})", flush=True)

    # 3) training from TFRecords (fast_input: on-device labeling)
    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 100)
    rng = jax.random.PRNGKey(1)
    holder = {"state": state}

    def train_step(images, labels):
        labels = {k: jnp.asarray(v) for k, v in labels.items()
                  if not isinstance(v, list)}
        holder["state"], vals = step_fn(holder["state"],
                                        jnp.asarray(images), labels, rng)
        return vals["loss"]

    r = mk_reader()
    it = r(cfg, args.batch)
    images, labels = next(it)
    t0 = time.perf_counter()
    jax_fetch(train_step(images, labels))
    report["train_compile_s"] = time.perf_counter() - t0
    r._wait_s = r._total_s = 0.0
    train = _drain(r, it, args.train_steps, args.batch, train_step)
    it.close()
    report["train_e2e"] = train
    print(f"[train-e2e] {train['img_per_s']:.1f} img/s "
          f"(wait {train['wait_fraction']:.2f})", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
