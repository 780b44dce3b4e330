"""A/B perf experiments for the MC-dropout d0 forward pass on the real chip.

Each experiment patches one implementation detail and times the full-batch
MC forward (relay-safe scan methodology, see tools/perf_breakdown.py).

Usage: python tools/perf_experiments.py [name ...]
Names: base mul_dropout barrier_se b16 b4 t5
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
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


def build(batch, t=T):
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "1024x512"
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = t
    cfg.is_training_bn = False
    model = EfficientDetNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 512, 1024, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))()
    return cfg, model, variables, x


def tree_sum(tr):
    leaves = jax.tree_util.tree_leaves(tr)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def fwd_fn(model, t=T):
    def f(variables, images, key):
        keys = jax.random.split(key, t)
        outs = jax.vmap(
            lambda k: model.apply(variables, images, train=False,
                                  rngs={"dropout": k}))(keys)
        # cheap DCE-guard: one strided element per tensor, not a full reduce
        leaves = jax.tree_util.tree_leaves(outs)
        return sum(jnp.sum(l[..., ::16, ::16, :1].astype(jnp.float32))
                   for l in leaves)
    return f


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
        "experiment": label, "batch": batch, "sec_per_step": round(sec, 5),
        "img_per_sec": round(batch / sec, 2), "compile_s": round(compile_s, 1),
    }), flush=True)


def patch_mul_dropout():
    """spatial dropout as plain multiply by a scaled bf16 mask."""
    from udal_tpu.models import efficientnet as en

    def spatial_dropout(module, x, rate, active):
        if rate <= 0.0 or not active:
            return x
        rng = module.make_rng("dropout")
        keep = 1.0 - rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return x * (mask.astype(x.dtype) / jnp.asarray(keep, x.dtype))

    en.spatial_dropout = spatial_dropout


def patch_barrier_se():
    """optimization_barrier between the depthwise output and the SE mean,
    so XLA cannot fuse the global reduce into the conv."""
    from udal_tpu.models import efficientnet as en
    from flax import linen as nn

    class SqueezeExcite(nn.Module):
        se_filters: int
        output_filters: int
        act: any = None
        dtype: any = jnp.float32

        @nn.compact
        def __call__(self, x):
            xb = jax.lax.optimization_barrier(x)
            se = jnp.mean(xb, axis=(1, 2), keepdims=True)
            se = nn.Conv(self.se_filters, (1, 1), padding="SAME",
                         kernel_init=en.conv_kernel_init, dtype=self.dtype,
                         name="reduce")(se)
            se = self.act(se)
            se = nn.Conv(self.output_filters, (1, 1), padding="SAME",
                         kernel_init=en.conv_kernel_init, dtype=self.dtype,
                         name="expand")(se)
            return jax.nn.sigmoid(se) * x

    en.SqueezeExcite = SqueezeExcite


def main():
    names = sys.argv[1:] or ["base", "mul_dropout", "barrier_se", "b16"]
    for name in names:
        # re-import fresh modules per experiment
        for m in list(sys.modules):
            if m.startswith("udal_tpu"):
                del sys.modules[m]
        batch, t = 8, T
        if name == "mul_dropout":
            patch_mul_dropout()
        elif name == "barrier_se":
            patch_barrier_se()
        elif name == "b16":
            batch = 16
        elif name == "b4":
            batch = 4
        elif name == "t5":
            t = 5
        cfg, model, variables, x = build(batch, t)
        timed(fwd_fn(model, t), variables, x, name, batch)


if __name__ == "__main__":
    main()
