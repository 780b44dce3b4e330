"""Benchmark: 10-pass MC-dropout efficientdet-d0 inference throughput.

Measures the headline metric from BASELINE.md: images/sec for MC-dropout
(T=10) efficientdet-d0 at the KITTI operating point (1024x512, 8 classes,
loss attenuation + MC dropout 0.05), including on-device uncertainty
post-processing (decode + soft-NMS + packing).

`vs_baseline` is measured on the SAME chip against a faithful
reference-style execution: batch=1, a Python loop of 10 separate
forward-pass calls (the reference's MC loop, `efficientdet_keras.py:
999-1024`), host round-trip per pass, post-processing as a separate call —
i.e. the reference's execution schedule with identical math. The optimized
path batches the MC axis via vmap, fuses post-processing, runs bf16, and
batches images.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(dtype):
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "1024x512"
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = 10
    cfg.is_training_bn = False
    model = EfficientDetNet(cfg, dtype=dtype)
    return cfg, model


def timed(fn, *args, warmup=3, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from udal_tpu.ops.postprocess import postprocess_global

    T = 10
    batch = 8

    # ---- optimized TPU-native path: vmap MC axis + fused postprocess ----
    cfg, model = build(jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 512, 1024, 3),
                    jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()

    def optimized(variables, images, key):
        keys = jax.random.split(key, T)
        cls_s, box_s = jax.vmap(
            lambda k: model.apply(variables, images, train=False,
                                  rngs={"dropout": k}))(keys)
        cls_s = [c.astype(jnp.float32) for c in cls_s]
        box_s = [b.astype(jnp.float32) for b in box_s]
        det = postprocess_global(cfg, cls_s, box_s,
                                 image_scales=jnp.ones((images.shape[0],)))
        return det.packed()

    opt_fn = jax.jit(optimized)
    key = jax.random.PRNGKey(7)
    t_opt = timed(opt_fn, variables, x, key)
    ips_opt = batch / t_opt

    # ---- reference-style schedule: batch=1, python MC loop, separate calls --
    cfg32, model32 = build(jnp.float32)
    v32 = jax.jit(lambda: model32.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()
    one_pass = jax.jit(lambda v, im, k: model32.apply(
        v, im, train=False, rngs={"dropout": k}))

    def post_ref(cls_s, box_s):
        det = postprocess_global(cfg32, cls_s, box_s,
                                 image_scales=jnp.ones((1,)))
        return det.packed()

    post_fn = jax.jit(post_ref)

    def reference_style(image1):
        cls_acc, box_acc = None, None
        outs = []
        for t in range(T):
            outs.append(one_pass(v32, image1, jax.random.PRNGKey(t)))
            jax.block_until_ready(outs[-1])       # host sync per pass (loop semantics)
        cls_s = [jnp.stack([o[0][l] for o in outs]) for l in range(5)]
        box_s = [jnp.stack([o[1][l] for o in outs]) for l in range(5)]
        out = post_fn(cls_s, box_s)
        jax.block_until_ready(out)
        return out

    img1 = x[:1]
    t_ref = timed(reference_style, img1, warmup=2, iters=5)
    ips_ref = 1.0 / t_ref

    result = {
        "metric": "images/sec, 10-pass MC-dropout efficientdet-d0 @1024x512 "
                  "(KITTI op point, incl. on-device uncertainty postprocess)",
        "value": round(ips_opt, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips_opt / ips_ref, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
