"""Experiment: MC sample axis folded into channels (grouped convs) vs batch.

Current design runs T MC samples as batch 80 = T*B; small-channel layers
waste lanes (C=24..144 padded to 128/256). Folding T into channels gives
C*T lanes (grouped conv with feature_group_count=T) at batch B=8.
Times an MBConv-like chain (expand 1x1 -> depthwise k3 -> project 1x1)
both ways on the block2 shape.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T, B = 10, 8
K_SCAN = 8


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

    t0 = time.perf_counter()
    float(many(fresh_key(), *args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        k = fresh_key()
        t0 = time.perf_counter()
        float(many(k, *args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / K_SCAN * 1e3
    print(json.dumps({"case": label, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    rng = np.random.RandomState(0)
    H, W, CI, CE = 128, 256, 24, 144    # block2 shape

    # ---- batch-folded (current): x [T*B, H, W, CI] --------------------------
    xb = jnp.asarray(rng.randn(T * B, H, W, CI), jnp.bfloat16)
    we = jnp.asarray(rng.randn(1, 1, CI, CE) * 0.1, jnp.bfloat16)
    wd = jnp.asarray(rng.randn(3, 3, 1, CE) * 0.1, jnp.bfloat16)
    wp = jnp.asarray(rng.randn(1, 1, CE, CI) * 0.1, jnp.bfloat16)

    def mbconv_batch(x, we, wd, wp):
        y = jax.lax.conv_general_dilated(
            x, we, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y * jax.nn.sigmoid(y)
        y = jax.lax.conv_general_dilated(
            y, wd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=CE)
        y = y * jax.nn.sigmoid(y)
        y = jax.lax.conv_general_dilated(
            y, wp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32))

    timed(mbconv_batch, (xb, we, wd, wp), "mbconv_batch80")

    # ---- channel-folded: x [B, H, W, T*CI], grouped convs -------------------
    xc = jnp.asarray(rng.randn(B, H, W, T * CI), jnp.bfloat16)
    we_g = jnp.asarray(np.tile(np.asarray(we, np.float32), (1, 1, 1, T)),
                       jnp.bfloat16)          # wrong tiling only for perf
    wd_g = jnp.asarray(rng.randn(3, 3, 1, T * CE) * 0.1, jnp.bfloat16)
    wp_g = jnp.asarray(np.tile(np.asarray(wp, np.float32), (1, 1, 1, T)),
                       jnp.bfloat16)

    def mbconv_folded(x, we, wd, wp):
        y = jax.lax.conv_general_dilated(
            x, we, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=T)
        y = y * jax.nn.sigmoid(y)
        y = jax.lax.conv_general_dilated(
            y, wd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=T * CE)
        y = y * jax.nn.sigmoid(y)
        y = jax.lax.conv_general_dilated(
            y, wp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=T)
        return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32))

    timed(mbconv_folded, (xc, we_g, wd_g, wp_g), "mbconv_folded_groups10")

    # ---- stem-like: 3->32 s2 at full res ------------------------------------
    xs = jnp.asarray(rng.randn(T * B, 512, 1024, 3), jnp.bfloat16)
    ws = jnp.asarray(rng.randn(3, 3, 3, 32) * 0.1, jnp.bfloat16)

    def stem_batch(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32))

    timed(stem_batch, (xs, ws), "stem_batch80")

    xs2 = jnp.asarray(rng.randn(B, 512, 1024, T * 3), jnp.bfloat16)
    ws2 = jnp.asarray(rng.randn(3, 3, 3, T * 32) * 0.1, jnp.bfloat16)

    def stem_folded(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=T)
        return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32))

    timed(stem_folded, (xs2, ws2), "stem_folded_groups10")


if __name__ == "__main__":
    main()
