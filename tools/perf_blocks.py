"""Per-block in-situ cost of the MC-dropout d0 backbone.

Times backbone prefixes (stem, +block0, +block1, ...) under the real MC
vmap (T=10, batch 8, bf16) and prints the marginal cost of each block.
Uses the relay-safe scan methodology; K_SCAN high enough that the ~36 ms
per-call round-trip is amortized (see tools/perf_peak.py).

Usage: python tools/perf_blocks.py [start_idx [end_idx]]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from udal_tpu.models.efficientnet import (EfficientNet, MBConvBlock,
                                          backbone_spec)

T = 10
B = 8
K_SCAN = int(os.environ.get("K_SCAN", "32"))


class BackbonePrefix(nn.Module):
    """Stem + the first `n_blocks` MBConv blocks of the d0 backbone."""
    n_blocks: int
    mc_rate: float = 0.05
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        import dataclasses

        from udal_tpu.models.efficientnet import BatchNorm, activation_fn

        spec = backbone_spec("efficientnet-b0")
        act = activation_fn("swish")
        x = nn.Conv(spec.stem_filters, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = act(BatchNorm(spec.bn_momentum, spec.bn_epsilon,
                          dtype=self.dtype, name="stem_bn")(x, train))
        expanded = []
        for a in spec.blocks:
            expanded.append(a)
            for _ in range(a.num_repeat - 1):
                expanded.append(dataclasses.replace(
                    a, input_filters=a.output_filters, strides=(1, 1)))
        for idx, a in enumerate(expanded[:self.n_blocks]):
            x = MBConvBlock(a, "swish", True, spec.bn_momentum,
                            spec.bn_epsilon, None, self.mc_rate,
                            self.dtype, name=f"blocks_{idx}")(x, train, None)
        return x


def fresh_key():
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


def timed(fn, variables, x, label):
    @jax.jit
    def many(variables, images, key):
        def step(carry, k):
            return carry + fn(variables, images, k), None
        total, _ = jax.lax.scan(step, 0.0, jax.random.split(key, K_SCAN))
        return total

    t0 = time.perf_counter()
    float(many(variables, x, fresh_key()))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(variables, x, fresh_key()))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / K_SCAN * 1e3
    print(json.dumps({"prefix": label, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 512, 1024, 3), jnp.float32)

    prev = None
    for n in range(start, end):
        model = BackbonePrefix(n_blocks=n)
        variables = jax.jit(lambda m=model: m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x[:1], train=False))()

        def fn(variables, images, key, m=model):
            keys = jax.random.split(key, T)
            outs = jax.vmap(lambda k: m.apply(
                variables, images, train=False, rngs={"dropout": k}))(keys)
            return jnp.sum(outs[..., ::16, ::16, :1].astype(jnp.float32))

        ms = timed(fn, variables, x, f"stem+{n}blocks")
        if prev is not None:
            print(json.dumps({"block": n - 1,
                              "marginal_ms": round(ms - prev, 3)}),
                  flush=True)
        prev = ms


if __name__ == "__main__":
    main()
