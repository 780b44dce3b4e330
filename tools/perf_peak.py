"""Calibrate the attached TPU: peak MXU (bf16 matmul) and HBM bandwidth.

Relay-safe methodology (jitted lax.scan, scalar fetch). Prints JSON lines:
  matmul_NxKxM : achieved TFLOP/s on a large dense bf16 matmul
  copy_bytes   : achieved GB/s on a big HBM->HBM elementwise copy (r+w)
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


def fresh_key():
    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


def timed_sec(fn, args):
    @jax.jit
    def many(key, *args):
        def step(carry, k):
            eps = (jax.random.uniform(k, ()) * 1e-3).astype(args[0].dtype)
            return carry + fn(args[0] + eps, *args[1:]), None
        total, _ = jax.lax.scan(step, 0.0, jax.random.split(key, K_SCAN))
        return total

    float(many(fresh_key(), *args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(fresh_key(), *args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / K_SCAN


def main():
    rng = np.random.RandomState(0)

    # peak MXU: [4096,4096] @ [4096,4096] bf16 = 137 GFLOP, arrays 100 MB
    for dim in (2048, 4096):
        a = jnp.asarray(rng.randn(dim, dim), jnp.bfloat16)
        b = jnp.asarray(rng.randn(dim, dim), jnp.bfloat16)

        def mm(a, b):
            return jnp.sum(jnp.dot(a, b)[::256, :1].astype(jnp.float32))

        sec = timed_sec(mm, (a, b))
        fl = 2 * dim ** 3
        print(json.dumps({"case": f"matmul_{dim}", "ms": round(sec * 1e3, 3),
                          "tflops": round(fl / sec / 1e12, 1)}), flush=True)

    # HBM bandwidth: elementwise on 1 GB (read 1 GB + write 1 GB)
    nbytes = 1 << 30
    x = jnp.asarray(rng.randn(nbytes // 2 // 128, 128), jnp.bfloat16)

    def cp(x):
        y = x * jnp.bfloat16(1.0001)
        return jnp.sum(y[::4096, :1].astype(jnp.float32))

    sec = timed_sec(cp, (x,))
    gbs = 2 * x.size * 2 / sec / 1e9
    print(json.dumps({"case": "hbm_copy", "ms": round(sec * 1e3, 3),
                      "gb_per_s_rw": round(gbs, 1)}), flush=True)


if __name__ == "__main__":
    main()
