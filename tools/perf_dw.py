"""Microbench: Pallas fused depthwise vs XLA chain on the hot d0 shapes."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from udal_tpu.ops.pallas_dw import fused_depthwise

K_SCAN = int(os.environ.get('K_SCAN', '8'))

# (k, stride, H, W, C_logical) at N=80 (T=10 x B=8), d0 @1024x512.
# The Pallas kernel runs at C padded to the 128-lane width (what the MBConv
# integration feeds it — the HBM tiled layout stores those lanes anyway);
# XLA runs at the logical C it replaces.
SHAPES = [
    (3, 1, 256, 512, 32),    # block1
    (3, 2, 256, 512, 96),    # block2a
    (3, 1, 128, 256, 144),   # block2b
    (5, 2, 128, 256, 144),   # block3a
    (5, 1, 64, 128, 240),    # block3b
    (3, 2, 64, 128, 240),    # block4a
    (3, 1, 32, 64, 480),     # block4b
    (5, 1, 32, 64, 480),     # block5a
    (5, 1, 32, 64, 672),     # block5b
    (5, 2, 32, 64, 672),     # block6a
    (5, 1, 16, 32, 1152),    # block6b
]
N = 80


def pad128(c):
    return -(-c // 128) * 128


def fresh_key():
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


def timed(fn, args, label):
    @jax.jit
    def many(key, *args):
        def step(carry, k):
            eps = (jax.random.uniform(k, ()) * 1e-3).astype(args[0].dtype)
            return carry + fn(args[0] + eps, *args[1:]), None
        total, _ = jax.lax.scan(step, 0.0, jax.random.split(key, K_SCAN))
        return total

    try:
        t0 = time.perf_counter()
        float(many(fresh_key(), *args))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(json.dumps({"case": label, "error": str(e)[:300]}), flush=True)
        return None
    times = []
    for _ in range(3):
        key = fresh_key()
        t0 = time.perf_counter()
        float(many(key, *args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / K_SCAN * 1e3
    print(json.dumps({"case": label, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    total_p = total_x = 0.0
    for (k, s, h, w, c) in SHAPES:
        cp = pad128(c)
        xp = jnp.asarray(rng.randn(N, h, w, cp), jnp.bfloat16)
        kernp = jnp.asarray(rng.randn(k, k, 1, cp) * 0.2, jnp.bfloat16)
        scalep = jnp.asarray(rng.rand(cp) + 0.5, jnp.float32)
        biasp = jnp.asarray(rng.randn(cp) * 0.1, jnp.float32)
        maskp = jnp.asarray((rng.rand(N, cp) > 0.05) / 0.95, jnp.bfloat16)
        x = jnp.asarray(rng.randn(N, h, w, c), jnp.bfloat16)
        kern = jnp.asarray(rng.randn(k, k, 1, c) * 0.2, jnp.bfloat16)
        scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        mask = jnp.asarray((rng.rand(N, c) > 0.05) / 0.95, jnp.bfloat16)

        def pallas_fn(x, kern, scale, bias, mask, _s=s):
            y, m = fused_depthwise(x, kern, scale, bias, mask, stride=_s,
                                   want_mean=True, interpret=False)
            return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32)) + \
                jnp.sum(m)

        def xla_fn(x, kern, scale, bias, mask, _s=s):
            y = jax.lax.conv_general_dilated(
                x, kern, (_s, _s), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            y = y.astype(jnp.float32) * scale + bias
            y = y * jax.nn.sigmoid(y)
            y = (y * mask[:, None, None, :].astype(jnp.float32)).astype(x.dtype)
            m = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32)) + \
                jnp.sum(m)

        label = f"k{k}s{s}_{h}x{w}x{c}"
        mp = timed(pallas_fn, (xp, kernp, scalep, biasp, maskp),
                   f"pallas_k{k}s{s}_{h}x{w}x{cp}")
        mx = timed(xla_fn, (x, kern, scale, bias, mask), "xla_" + label)
        if mp: total_p += mp
        if mx: total_x += mx
    print(json.dumps({"total_pallas_ms": round(total_p, 2),
                      "total_xla_ms": round(total_x, 2)}), flush=True)


if __name__ == "__main__":
    main()
