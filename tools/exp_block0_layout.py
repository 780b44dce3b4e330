"""Experiment: can reordering the v4 fold's einsum output axes dodge the
1.46 ms [80,256,512,16] layout copy (%copy.1047) the dot output pays
before block-1's expand conv? (docs/NEXT.md "block-0 chain ~1.5 ms of
relayout left".)

Variants (algebraically identical, parity-checked here against v4):
  A  current v4: 'bhwc,btcd->bthwd', vmap over t at axis 1
  B  'bhwc,btcd->tbhwd' — t leading in the dot output, vmap axis 0
  C  'bhwc,tbcd->tbhwd' — drop the wfold swapaxes too

Measured with bench.py's scan timing on the mc_forward path only (the
postprocess is unchanged by the fold).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_scan
from tools.perf_breakdown import build, T

K = 24


def _tree_sum(xs):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)


def make_fwd(variant):
    from udal_tpu.models import mc_fast
    from udal_tpu.models.mc_fast import (backbone_spec, mc_shared_prefix,
                                         _bn_affine, activation_fn)

    def fold(model, variables, images, key, num_samples):
        cfg = model.config
        dtype = model.dtype
        eps = backbone_spec(cfg.backbone_name).bn_epsilon
        x0, x0_mean = mc_shared_prefix(variables, images, dtype, pack=None,
                                       eps=eps)
        k0, k1 = jax.random.split(key)

        p0 = variables["params"]["backbone"]["blocks_0"]
        s0 = variables["batch_stats"]["backbone"]["blocks_0"]
        act = activation_fn("swish")
        b, h, w, c0 = x0.shape
        t = num_samples
        rate = cfg.mc_dropoutrate
        keep = 1.0 - rate
        masks = jax.random.bernoulli(
            k0, keep, (t, b, c0)).astype(jnp.float32) / keep
        se_in = (masks * x0_mean[None]).astype(dtype)
        wr, br = p0["se"]["reduce"]["kernel"], p0["se"]["reduce"]["bias"]
        we, be = p0["se"]["expand"]["kernel"], p0["se"]["expand"]["bias"]
        z = act(se_in @ wr[0, 0].astype(dtype) + br.astype(dtype))
        se = z @ we[0, 0].astype(dtype) + be.astype(dtype)
        sigma = jax.nn.sigmoid(se.astype(jnp.float32)) * masks    # [T,B,C0]
        wp = p0["project_conv"]["kernel"][0, 0].astype(jnp.float32)
        bscale, bbias = _bn_affine(p0["bn2"]["bn"], s0["bn2"]["bn"],
                                   jnp.float32, eps)
        wfold_tb = sigma[..., None] * (wp * bscale[None, :])      # [T,B,C0,Co]

        if variant == "A":
            wf = jnp.swapaxes(wfold_tb, 0, 1).astype(dtype)
            y = jnp.einsum("bhwc,btcd->bthwd", x0, wf,
                           preferred_element_type=jnp.float32)
            y = (y + bbias[None, None, None, None, :]).astype(dtype)
            axis = 1
        elif variant == "B":
            wf = jnp.swapaxes(wfold_tb, 0, 1).astype(dtype)
            y = jnp.einsum("bhwc,btcd->tbhwd", x0, wf,
                           preferred_element_type=jnp.float32)
            y = (y + bbias[None, None, None, None, :]).astype(dtype)
            axis = 0
        elif variant == "C":
            wf = wfold_tb.astype(dtype)
            y = jnp.einsum("bhwc,tbcd->tbhwd", x0, wf,
                           preferred_element_type=jnp.float32)
            y = (y + bbias[None, None, None, None, :]).astype(dtype)
            axis = 0
        else:
            raise ValueError(variant)

        keys = jax.random.split(k1, num_samples)

        def one_pass(x1, k):
            return model.apply(variables, x1, False,
                               method=type(model).forward_from_block1,
                               rngs={"dropout": k})

        return jax.vmap(one_pass, in_axes=(axis, 0))(y, keys)

    def f(cfg, model):
        def g(variables, images, key):
            cls_s, box_s = fold(model, variables, images, key, T)
            return _tree_sum(cls_s) + _tree_sum(box_s)
        return g

    return f


def main():
    cfg, model, variables, x = build(8)

    # parity: all variants produce identical outputs for the same key
    outs = {}
    for v in ("A", "B", "C"):
        fn = make_fwd(v)(cfg, model)
        outs[v] = float(jax.jit(fn)(variables, x, jax.random.PRNGKey(7)))
    print("checksums:", outs, file=sys.stderr)
    assert np.allclose(outs["A"], outs["B"], rtol=1e-5)
    assert np.allclose(outs["A"], outs["C"], rtol=1e-5)

    for v in ("A", "B", "C"):
        fn = make_fwd(v)(cfg, model)
        t = _timed_scan(fn, variables, x, K)
        print(f"variant {v}: {8 * K / t:.2f} img/s  ({t / K * 1000:.2f} "
              f"ms/batch)")


if __name__ == "__main__":
    main()
