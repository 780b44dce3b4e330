"""Microbench: candidate-gather strategies for pre_nms at the d0 op point.

Shapes: T=10, B=8, R=98208 anchors-positions, M=5000 candidates, 8 channels
(mu/sigma x 4 coords). Strategies:
  cur     : flat element gather from [T, B, ch*R] (current pre_nms path)
  sorted  : same but with ascending candidate indices (locality)
  rows    : row gather from an anchor-major [B, R, T*8] relayout (+ its cost)
  rows_pre: row gather only (relayout excluded) — the steady-state cost if
            the heads wrote anchor-major directly
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K_SCAN = int(os.environ.get("K_SCAN", "32"))
T, B, A, RLEN, M = 10, 8, 9, 98208 // 9, 5000
R = A * RLEN  # 98208 flat (anchor, position)
CH = 8


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
        t0 = time.perf_counter()
        float(many(fresh_key(), *args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / K_SCAN * 1e3
    print(json.dumps({"case": label, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    rng = np.random.RandomState(0)
    box_t = jnp.asarray(rng.randn(T, B, CH * RLEN * A), jnp.bfloat16)
    flat_idx = jnp.asarray(
        np.stack([rng.choice(R, M, replace=False) for _ in range(B)]),
        jnp.int32)                                   # [B, M] random (score order)

    rows = flat_idx % RLEN
    anc = flat_idx // RLEN

    def eidx_of(rows, anc):
        s_idx = jnp.arange(2, dtype=jnp.int32)
        c_idx = jnp.arange(4, dtype=jnp.int32)
        ch = (s_idx[None, None, :, None] * A
              + anc[:, :, None, None]) * 4 + c_idx[None, None, None, :]
        return (ch * RLEN + rows[:, :, None, None]).reshape(B, M * CH)

    eidx = eidx_of(rows, anc)

    def cur(box_t, eidx):
        g = jnp.take_along_axis(box_t, eidx[None], axis=-1)
        return jnp.sum(g.astype(jnp.float32))

    timed(cur, (box_t, eidx), "cur_flat_gather")

    order = jnp.argsort(flat_idx, axis=1)
    fs = jnp.take_along_axis(flat_idx, order, axis=1)
    eidx_s = eidx_of(fs % RLEN, fs // RLEN)

    def srt(box_t, eidx_s, order):
        g = jnp.take_along_axis(box_t, eidx_s[None], axis=-1)
        g = g.reshape(T, B, M, CH)
        inv = jnp.argsort(order, axis=1)
        g = jnp.take_along_axis(g, inv[None, :, :, None], axis=2)
        return jnp.sum(g.astype(jnp.float32))

    timed(srt, (box_t, eidx_s, order), "sorted_gather_unpermute")

    # anchor-major relayout [B, R, T*8] then row gather
    src = jnp.asarray(rng.randn(T, B, 2, A, 4, RLEN), jnp.bfloat16)

    def rows_full(src, flat_idx):
        # relayout: [T,B,S,A,4,RLEN] -> [B, A*RLEN, T*S*4]
        t = jnp.transpose(src, (1, 3, 5, 0, 2, 4))   # [B, A, RLEN, T, S, 4]
        t = t.reshape(B, R, T * CH)
        g = jnp.take_along_axis(t, flat_idx[:, :, None], axis=1)
        return jnp.sum(g.astype(jnp.float32))

    timed(rows_full, (src, flat_idx), "rows_gather_incl_relayout")

    pre = jnp.asarray(rng.randn(B, R, T * CH), jnp.bfloat16)

    def rows_pre(pre, flat_idx):
        g = jnp.take_along_axis(pre, flat_idx[:, :, None], axis=1)
        return jnp.sum(g.astype(jnp.float32))

    timed(rows_pre, (pre, flat_idx), "rows_gather_only")

    def rows_pre_sorted(pre, fs, order):
        g = jnp.take_along_axis(pre, fs[:, :, None], axis=1)
        inv = jnp.argsort(order, axis=1)
        g = jnp.take_along_axis(g, inv[:, :, None], axis=1)
        return jnp.sum(g.astype(jnp.float32))

    timed(rows_pre_sorted, (pre, fs, order), "rows_gather_sorted")


if __name__ == "__main__":
    main()
