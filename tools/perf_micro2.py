"""Microbench round 2: int8 convs, NCHW depthwise, dw-as-shifts.

Cases (hot d0 shapes at N=80 = T10 x B8):
  int8_1x1   : 1x1 expand conv 24->144 @128x256, int8 in/weights (s32 acc)
               vs bf16 — does the TPU int8 path double conv throughput?
  int8_dw    : depthwise k3 @128x256x144 int8 vs bf16
  nchw_dw    : depthwise with NCHW dimension numbers (W on lanes) vs NHWC
  shift_dw   : depthwise expressed as 9 shifted multiply-adds (pad+slice)
               vs lax.conv feature_group_count
Usage: python tools/perf_micro2.py [case ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K_SCAN = int(os.environ.get('K_SCAN', '8'))
N = 80


def fresh_key():
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


def timed(fn, args, label):
    @jax.jit
    def many(key, *args):
        def step(carry, k):
            eps = jax.random.randint(k, (), 0, 2).astype(args[0].dtype)
            return carry + fn(args[0] + eps, *args[1:]), None
        total, _ = jax.lax.scan(step, 0.0, jax.random.split(key, K_SCAN))
        return total

    try:
        t0 = time.perf_counter()
        float(many(fresh_key(), *args))
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(json.dumps({"case": label, "error": str(e)[:300]}), flush=True)
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(fresh_key(), *args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / K_SCAN * 1e3
    print(json.dumps({"case": label, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


def reduce_probe(y):
    return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32))


def main():
    cases = sys.argv[1:] or ["int8_1x1", "int8_dw", "nchw_dw", "shift_dw"]
    rng = np.random.RandomState(0)
    H, W, CI, CE = 128, 256, 24, 144

    if "int8_1x1" in cases:
        x8 = jnp.asarray(rng.randint(-100, 100, (N, H, W, CI)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-100, 100, (1, 1, CI, CE)), jnp.int8)
        xb = jnp.asarray(rng.randn(N, H, W, CI), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(1, 1, CI, CE) * 0.1, jnp.bfloat16)

        def conv_i8(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return reduce_probe(y)

        def conv_bf(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return reduce_probe(y)

        timed(conv_i8, (x8, w8), "int8_1x1")
        timed(conv_bf, (xb, wb), "bf16_1x1")

    if "int8_dw" in cases:
        x8 = jnp.asarray(rng.randint(-100, 100, (N, H, W, CE)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-8, 8, (3, 3, 1, CE)), jnp.int8)
        xb = jnp.asarray(rng.randn(N, H, W, CE), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(3, 3, 1, CE) * 0.1, jnp.bfloat16)

        def dw_i8(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=CE, preferred_element_type=jnp.int32)
            return reduce_probe(y)

        def dw_bf(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=CE)
            return reduce_probe(y)

        timed(dw_i8, (x8, w8), "int8_dw")
        timed(dw_bf, (xb, wb), "bf16_dw")

    if "nchw_dw" in cases:
        xc = jnp.asarray(rng.randn(N, CE, H, W), jnp.bfloat16)
        wc = jnp.asarray(rng.randn(CE, 1, 3, 3) * 0.1, jnp.bfloat16)

        def dw_nchw(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=x.shape[1])
            return jnp.sum(y[..., :1, ::16, ::16].astype(jnp.float32))

        timed(dw_nchw, (xc, wc), "nchw_dw_144x128x256")
        # big-spatial small-C block1 shape too
        xc2 = jnp.asarray(rng.randn(N, 32, 256, 512), jnp.bfloat16)
        wc2 = jnp.asarray(rng.randn(32, 1, 3, 3) * 0.1, jnp.bfloat16)
        timed(dw_nchw, (xc2, wc2), "nchw_dw_32x256x512")
        xb2 = jnp.asarray(rng.randn(N, 256, 512, 32), jnp.bfloat16)
        wb2 = jnp.asarray(rng.randn(3, 3, 1, 32) * 0.1, jnp.bfloat16)

        def dw_nhwc(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            return reduce_probe(y)

        timed(dw_nhwc, (xb2, wb2), "nhwc_dw_32x256x512")

    if "shift_dw" in cases:
        for (h, w_, c) in [(256, 512, 32), (128, 256, 144), (32, 64, 480)]:
            xb = jnp.asarray(rng.randn(N, h, w_, c), jnp.bfloat16)
            wb = jnp.asarray(rng.randn(3, 3, 1, c) * 0.1, jnp.bfloat16)

            def dw_shift(x, w):
                # pad H,W by 1 and accumulate 9 shifted slices; XLA fuses
                # this into one elementwise loop over the output
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                acc = jnp.zeros(x.shape, jnp.float32)
                hh, ww = x.shape[1], x.shape[2]
                for di in range(3):
                    for dj in range(3):
                        acc = acc + (
                            xp[:, di:di + hh, dj:dj + ww, :].astype(jnp.float32)
                            * w[di, dj, 0, :].astype(jnp.float32))
                return reduce_probe(acc.astype(x.dtype))

            def dw_conv(x, w):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=x.shape[-1])
                return reduce_probe(y)

            timed(dw_shift, (xb, wb), f"shift_dw_{h}x{w_}x{c}")
            timed(dw_conv, (xb, wb), f"conv_dw_{h}x{w_}x{c}")


if __name__ == "__main__":
    main()
