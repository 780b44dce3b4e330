"""Interpret-mode parity tests for the batch-in-lanes fused MBConv kernel.

The kernel (ops/pallas_mbconv.py) is bit-exact against the reference chain
for all four (kernel, stride) variants. It is kept OFF the hot path: on-chip
it measures ~4x slower than XLA's expand+dw fusions (docs/PERF_ANALYSIS.md,
"pallas attempts" table) — the tests pin down its correctness so the design
space documentation stays verifiable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udal_tpu.ops.pallas_mbconv import fused_expand_dw


def ref_chain(x, we, b0, m1, wd, b1, m2, s, k):
    h, w, cin, n = x.shape
    ce = we.shape[1]
    z = jnp.einsum("hwcn,ce->hwen", x.astype(jnp.float32),
                   we.astype(jnp.float32)) + b0[None, None, :, None]
    z = z * jax.nn.sigmoid(z)
    z = z * m1[None, None].astype(jnp.float32)
    z = z.astype(x.dtype).astype(jnp.float32)   # ring bf16 round-trip
    p = k // 2
    zp = jnp.pad(z, ((p, p), (p, p), (0, 0), (0, 0)))
    a = jnp.zeros((h // s, w // s, ce, n), jnp.float32)
    for dh in range(k):
        for dwv in range(k):
            sl = zp[dh:dh + h:s, dwv:dwv + w:s]
            a = a + sl * wd[dh, dwv].astype(jnp.float32)[None, None, :, None]
    a = a + b1[None, None, :, None]
    a = a * jax.nn.sigmoid(a)
    a = a * m2[None, None].astype(jnp.float32)
    return a.astype(x.dtype), jnp.sum(a, axis=(0, 1))


@pytest.mark.parametrize("s,k", [(1, 3), (2, 3), (1, 5), (2, 5)])
def test_fused_expand_dw_matches_reference(s, k):
    rng = np.random.RandomState(0)
    h, w, cin, ce, n = 16, 32, 8, 24, 16
    x = jnp.asarray(rng.randn(h, w, cin, n) * 0.5, jnp.float32)
    we = jnp.asarray(rng.randn(cin, ce) * 0.3, jnp.float32)
    b0 = jnp.asarray(rng.randn(ce) * 0.1, jnp.float32)
    m1 = jnp.asarray((rng.rand(ce, n) > 0.1) / 0.9, jnp.float32)
    wd = jnp.asarray(rng.randn(k, k, ce) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.randn(ce) * 0.1, jnp.float32)
    m2 = jnp.asarray((rng.rand(ce, n) > 0.1) / 0.9, jnp.float32)

    y, se = fused_expand_dw(x, we, b0, m1, wd, b1, m2, stride=s, ksize=k,
                            wt=8, interpret=True)
    yr, ser = ref_chain(x, we, b0, m1, wd, b1, m2, s, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(se), np.asarray(ser),
                               rtol=1e-3, atol=1e-3)
