"""Training-step throughput at the KITTI op point (d0 @1024x512, batch 8,
loss attenuation, bf16 mixed precision) on the attached TPU.

Relay-safe methodology (scanned steps inside one jitted call). Prints one
JSON line: {"train_img_per_sec": ..., "ms_per_step": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K_SCAN = int(os.environ.get("K_SCAN", "16"))
BATCH = 8


def main():
    from udal_tpu.config import get_detection_config
    from udal_tpu.data.labels import build_labels
    from udal_tpu.train.train_lib import create_train_state, train_step

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "1024x512"
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.override({"batch_size": BATCH, "mixed_precision": True},
                 allow_new_keys=True)

    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(BATCH, 512, 1024, 3), jnp.float32)
    gt_boxes = np.tile(
        np.asarray([[40.0, 40.0, 200.0, 300.0], [100.0, 300.0, 380.0, 800.0]],
                   np.float32), (BATCH, 1, 1))
    gt_classes = np.ones((BATCH, 2), np.int32)
    labels = build_labels(cfg, gt_boxes, gt_classes)

    import functools
    step_fn = functools.partial(train_step, cfg, model, tx, schedule, 100)

    @jax.jit
    def many(state, images, labels, key):
        def body(carry, k):
            st, tot = carry
            eps = (jax.random.uniform(k, ()) * 1e-3).astype(images.dtype)
            st, lv = step_fn(st, images + eps, labels, k)
            return (st, tot + lv["loss"]), None
        (state, total), _ = jax.lax.scan(
            body, (state, 0.0), jax.random.split(key, K_SCAN))
        return total

    def fresh_key():
        return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))

    t0 = time.perf_counter()
    float(many(state, images, labels, fresh_key()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(state, images, labels, fresh_key()))
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times)) / K_SCAN
    print(json.dumps({
        "train_img_per_sec": round(BATCH / sec, 2),
        "ms_per_step": round(sec * 1e3, 2),
        "batch": BATCH, "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
