"""Component-level perf breakdown of the MC-dropout d0 inference pipeline.

Measures each stage of the benchmark program separately on the real chip
using the relay-safe methodology from bench.py (one jitted lax.scan over K
steps with entropy-derived per-step keys; time the fetch of one scalar).

Usage: python tools/perf_breakdown.py [variant ...]
Variants: full fwd backbone features heads post post_nms stem
          full_b16 fwd_b16 fwd_b32
Default: all of the above.

Results print one JSON line per variant:
  {"variant": ..., "batch": B, "sec_per_step": s, "img_per_sec": r}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 10
K = 8


def fresh_key():
    import os
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


def build(batch):
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
    model = EfficientDetNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 512, 1024, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()
    return cfg, model, variables, x


def tree_sum(t):
    leaves = jax.tree_util.tree_leaves(t)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timed(step_fn, variables, x, label, batch):
    @jax.jit
    def many(variables, images, key):
        def step(carry, k):
            return carry + step_fn(variables, images, k), None
        keys = jax.random.split(key, K)
        total, _ = jax.lax.scan(step, 0.0, keys)
        return total

    t0 = time.perf_counter()
    float(many(variables, x, fresh_key()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        k = fresh_key()
        t0 = time.perf_counter()
        float(many(variables, x, k))
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times)) / K
    print(json.dumps({
        "variant": label, "batch": batch, "sec_per_step": round(sec, 5),
        "img_per_sec": round(batch / sec, 2),
        "compile_s": round(compile_s, 1),
        "trials": [round(t / K, 5) for t in times],
    }), flush=True)


def fwd_fn(cfg, model):
    from udal_tpu.models.efficientdet import mc_forward

    def f(variables, images, key):
        cls_s, box_s = mc_forward(model, variables, images, key, T)
        return tree_sum(cls_s) + tree_sum(box_s)
    return f


def fwd_naive_fn(cfg, model):
    def f(variables, images, key):
        keys = jax.random.split(key, T)
        cls_s, box_s = jax.vmap(
            lambda k: model.apply(variables, images, train=False,
                                  rngs={"dropout": k}))(keys)
        return tree_sum(cls_s) + tree_sum(box_s)
    return f


def full_fn(cfg, model):
    from udal_tpu.ops.postprocess import postprocess_global

    def f(variables, images, key):
        keys = jax.random.split(key, T)
        cls_s, box_s = jax.vmap(
            lambda k: model.apply(variables, images, train=False,
                                  rngs={"dropout": k}))(keys)
        det = postprocess_global(cfg, list(cls_s), list(box_s),
                                 image_scales=jnp.ones((images.shape[0],)),
                                 use_pallas_nms=True)
        return jnp.sum(det.scores) + jnp.sum(det.boxes) + \
            jnp.sum(det.valid_len.astype(jnp.float32))
    return f



def full_fast_fn(cfg, model):
    """The bench.py program exactly: mc_forward fast path + postprocess."""
    from udal_tpu.models.efficientdet import mc_forward
    from udal_tpu.ops.postprocess import postprocess_global

    def f(variables, images, key):
        cls_s, box_s = mc_forward(model, variables, images, key, T)
        det = postprocess_global(cfg, list(cls_s), list(box_s),
                                 image_scales=jnp.ones((images.shape[0],)),
                                 use_pallas_nms=True)
        return jnp.sum(det.scores) + jnp.sum(det.boxes) + \
            jnp.sum(det.valid_len.astype(jnp.float32))
    return f


def backbone_fn(cfg, model):
    from udal_tpu.models.efficientdet import EfficientDetNet

    def f(variables, images, key):
        keys = jax.random.split(key, T)

        def one(k):
            return model.apply(
                variables, images, False,
                method=lambda m, im, tr: m.backbone(im, tr),
                rngs={"dropout": k})
        outs = jax.vmap(one)(keys)
        return tree_sum(outs)
    return f


def features_fn(cfg, model):
    from udal_tpu.models.efficientdet import EfficientDetNet

    def f(variables, images, key):
        keys = jax.random.split(key, T)

        def one(k):
            return model.apply(variables, images, False,
                               method=EfficientDetNet.features,
                               rngs={"dropout": k})
        outs = jax.vmap(one)(keys)
        return tree_sum(outs)
    return f


def heads_fn(cfg, model, variables, x):
    """Heads only: features computed once outside the timed region."""
    from udal_tpu.models.efficientdet import EfficientDetNet

    feats = jax.jit(lambda v, im: model.apply(
        v, im, False, method=EfficientDetNet.features,
        rngs={"dropout": jax.random.PRNGKey(0)}))(variables, x)

    def f(variables, _images, key):
        keys = jax.random.split(key, T)

        def one(k):
            return model.apply(variables, feats, False,
                               method=EfficientDetNet.predict_heads,
                               rngs={"dropout": k})
        outs = jax.vmap(one)(keys)
        return tree_sum(outs)
    return f


def post_fn(cfg, model, variables, x, use_pallas=True):
    """Postprocess only, on precomputed head outputs."""
    from udal_tpu.ops.postprocess import postprocess_global

    keys = jax.random.split(jax.random.PRNGKey(0), T)
    cls_s, box_s = jax.jit(lambda v, im: jax.vmap(
        lambda k: model.apply(v, im, train=False, rngs={"dropout": k}))(keys)
    )(variables, x)
    cls_s = jax.tree_util.tree_map(lambda a: a + 0.0, cls_s)

    def f(variables, _images, key):
        # perturb inputs by the key so the relay can't memoize
        eps = jax.random.uniform(key, ()) * 1e-3
        c = [a + eps.astype(a.dtype) for a in cls_s]
        b = [a + eps.astype(a.dtype) for a in box_s]
        det = postprocess_global(cfg, c, b,
                                 image_scales=jnp.ones((x.shape[0],)),
                                 use_pallas_nms=use_pallas)
        return jnp.sum(det.scores) + jnp.sum(det.boxes) + \
            jnp.sum(det.valid_len.astype(jnp.float32))
    return f


def stem_fn(cfg, model):
    def f(variables, images, key):
        keys = jax.random.split(key, T)
        p = variables["params"]["backbone"]
        kern = p["stem_conv"]["kernel"].astype(jnp.bfloat16)

        def one(k):
            eps = jax.random.uniform(k, ())
            return jnp.sum(jax.lax.conv_general_dilated(
                images.astype(jnp.bfloat16) + eps.astype(jnp.bfloat16), kern,
                (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
                .astype(jnp.float32))
        return jnp.sum(jax.vmap(one)(keys))
    return f


def main():
    variants = sys.argv[1:] or [
        "full", "fwd", "backbone", "features", "heads", "post",
        "full_b16", "fwd_b16"]

    built = {}

    def get(batch):
        if batch not in built:
            built[batch] = build(batch)
        return built[batch]

    for v in variants:
        batch = 8
        if v.endswith("_b16"):
            batch, v0 = 16, v[:-4]
        elif v.endswith("_b12"):
            batch, v0 = 12, v[:-4]
        elif v.endswith("_b32"):
            batch, v0 = 32, v[:-4]
        else:
            v0 = v
        cfg, model, variables, x = get(batch)
        if v0 == "full":
            fn = full_fn(cfg, model)
        elif v0 == "fwd":
            fn = fwd_fn(cfg, model)
        elif v0 == "fwd_naive":
            fn = fwd_naive_fn(cfg, model)
        elif v0 == "backbone":
            fn = backbone_fn(cfg, model)
        elif v0 == "features":
            fn = features_fn(cfg, model)
        elif v0 == "heads":
            fn = heads_fn(cfg, model, variables, x)
        elif v0 == "post":
            fn = post_fn(cfg, model, variables, x, use_pallas=True)
        elif v0 == "post_xla":
            fn = post_fn(cfg, model, variables, x, use_pallas=False)
        else:
            print(f"unknown variant {v}", file=sys.stderr)
            continue
        timed(fn, variables, x, v, batch)


if __name__ == "__main__":
    main()
