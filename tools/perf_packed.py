"""Stage-A microbenches for the packed-layout (lane-full) early-block path.

The thesis (from perf_micro2 + perf_dw): XLA's conv emitters move bytes at
near-roofline but on the *padded* layout — NHWC with C<128 pads the lane
dim to 128, so C=24 costs 5.3x its logical bytes. Packing g=8 spatial
positions into the lane dim ([N, H, W/8, 8*C]) removes the padding; the
price is that pointwise convs become block-diagonal matmuls (g x the MACs
— irrelevant at 7% MXU utilization).

Cases:
  a1_pw    : packed pointwise 24->144 @128x256 N=80 (Pallas tiled matmul
             with block-diag weights) vs the XLA NHWC conv.
  a1_roll  : packed depthwise W-shift via lane rolls — correctness probe +
             timing of rolls on the packed expanded tensor.
Usage: python tools/perf_packed.py [a1_pw|a1_roll|check ...]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_SCAN = int(os.environ.get('K_SCAN', '8'))
N = 80
G = 8  # spatial positions packed into lanes


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
        print(json.dumps({"case": label, "error": str(e)[:400]}), flush=True)
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(fresh_key(), *args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / K_SCAN * 1e3
    print(json.dumps({"case": label, "ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


def block_diag_weight(w, g):
    """[C, D] -> [g*C, g*D] with W on the diagonal blocks."""
    c, d = w.shape
    out = np.zeros((g * c, g * d), w.dtype)
    for j in range(g):
        out[j * c:(j + 1) * c, j * d:(j + 1) * d] = w
    return out


# ---------------------------------------------------------------------------
# a1: packed pointwise conv as a tiled Pallas matmul
# ---------------------------------------------------------------------------

def packed_pointwise(xp, wbd, m_tile=512):
    """xp [M, g*C] @ wbd [g*C, g*D] -> [M, g*D], tiled over M."""
    m, gin = xp.shape
    gout = wbd.shape[1]

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(m // m_tile,),
        in_specs=[
            pl.BlockSpec((m_tile, gin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gin, gout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, gout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, gout), xp.dtype),
    )(xp, wbd)


def case_a1_pw(check=False):
    rng = np.random.RandomState(0)
    H, W, CI, CE = 128, 256, 24, 144
    x = rng.randn(N, H, W, CI).astype(np.float32)
    w = (rng.randn(CI, CE) * 0.1).astype(np.float32)

    # packed form: [N*H*(W//G), G*CI]
    xp = jnp.asarray(
        x.reshape(N * H * (W // G), G * CI), jnp.bfloat16)
    wbd = jnp.asarray(block_diag_weight(w, G), jnp.bfloat16)

    if check:
        got = np.asarray(packed_pointwise(xp, wbd), np.float32)
        got = got.reshape(N, H, W, CE)
        want = x @ w  # [N,H,W,CE]
        err = np.max(np.abs(got - want.astype(np.float32)))
        rel = err / (np.abs(want).max() + 1e-6)
        print(json.dumps({"case": "a1_pw_check", "max_rel_err": float(rel)}),
              flush=True)
        assert rel < 2e-2, rel
        return

    def pallas_fn(xp, wbd):
        y = packed_pointwise(xp, wbd)
        return jnp.sum(y[::64, :1].astype(jnp.float32))

    xb = jnp.asarray(x, jnp.bfloat16)
    wb = jnp.asarray(w.reshape(1, 1, CI, CE), jnp.bfloat16)

    def xla_fn(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y[..., ::16, ::16, :1].astype(jnp.float32))

    timed(pallas_fn, (xp, wbd), f"packed_pw_{H}x{W}x{CI}to{CE}")
    timed(xla_fn, (xb, wb), f"xla_pw_{H}x{W}x{CI}to{CE}")


# ---------------------------------------------------------------------------
# a1_roll: lane-roll W-shift on the packed expanded tensor
# ---------------------------------------------------------------------------

def packed_wshift_kernel(x_ref, o_ref, *, cexp, g, direction):
    """One W-shift of a packed [rows, Wp, g*Cexp] block via lane rolls."""
    x = x_ref[:].astype(jnp.float32)  # Mosaic rotate requires 32-bit data
    ge = g * cexp
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if direction > 0:  # value at w+1
        r_in = pltpu.roll(x, ge - cexp, axis=x.ndim - 1)  # roll by -cexp
        xn = jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])],
                             axis=2)
        r_next = pltpu.roll(xn, (g - 1) * cexp, axis=x.ndim - 1)
        o_ref[:] = jnp.where(lane < (g - 1) * cexp, r_in,
                             r_next).astype(o_ref.dtype)
    else:  # value at w-1
        r_in = pltpu.roll(x, cexp, axis=x.ndim - 1)
        xp_ = jnp.concatenate([jnp.zeros_like(x[:, :, :1]), x[:, :, :-1]],
                              axis=2)
        r_prev = pltpu.roll(xp_, ge - (g - 1) * cexp, axis=x.ndim - 1)
        o_ref[:] = jnp.where(lane >= cexp, r_in,
                             r_prev).astype(o_ref.dtype)


def case_a1_roll(check=False):
    rng = np.random.RandomState(0)
    H, W, CE = 128, 256, 144
    wp = W // G
    ge = G * CE
    x = rng.randn(2 if check else N, H, wp, ge).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)

    def shift(xb, direction):
        f = functools.partial(packed_wshift_kernel, cexp=CE, g=G,
                              direction=direction)
        ht = 8
        return pl.pallas_call(
            f,
            grid=(xb.shape[0], H // ht),
            in_specs=[pl.BlockSpec((1, ht, wp, ge),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ht, wp, ge),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, xb.dtype),
        )(xb)

    if check:
        got = np.asarray(shift(xb, +1), np.float32)
        # reference: unpack, shift W by +1 (zero at right edge), repack
        xs = x.reshape(2, H, wp, G, CE)
        xu = xs.transpose(0, 1, 2, 3, 4).reshape(2, H, W, CE)
        ref = np.zeros_like(xu)
        ref[:, :, :-1] = xu[:, :, 1:]
        refp = ref.reshape(2, H, wp, G * CE)
        err = np.max(np.abs(got - np.asarray(
            jnp.asarray(refp, jnp.bfloat16), np.float32)))
        print(json.dumps({"case": "a1_roll_check", "max_err": float(err)}),
              flush=True)
        assert err < 1e-5, err
        got2 = np.asarray(shift(xb, -1), np.float32)
        ref2 = np.zeros_like(xu)
        ref2[:, :, 1:] = xu[:, :, :-1]
        refp2 = ref2.reshape(2, H, wp, G * CE)
        err2 = np.max(np.abs(got2 - np.asarray(
            jnp.asarray(refp2, jnp.bfloat16), np.float32)))
        print(json.dumps({"case": "a1_roll_check_neg", "max_err": float(err2)}),
              flush=True)
        assert err2 < 1e-5, err2
        return

    def roll_fn(xb):
        y = shift(xb, +1)
        return jnp.sum(y[::16, :, :1, :1].astype(jnp.float32))

    timed(roll_fn, (xb,), f"packed_wshift_{H}x{wp}x{ge}")


# ---------------------------------------------------------------------------
# p1: in-VMEM relayout packed<->natural; p2: static slice-concat lane shift
# ---------------------------------------------------------------------------

def case_p1(check=False):
    """Cost of jnp.reshape [Mp, 8*C] -> [8*Mp, C] inside a kernel."""
    rng = np.random.RandomState(0)
    CI = 24
    mp = 4096 * N // 8  # b1b plane rows packed: 128*32 per sample
    x = rng.randn(mp, G * CI).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)

    def run(xb, tile=512):
        def kernel(x_ref, o_ref):
            nat = x_ref[:].reshape(tile * G, CI)
            o_ref[:] = (nat + jnp.float32(1).astype(nat.dtype)).reshape(
                tile, G * CI)

        return pl.pallas_call(
            kernel,
            grid=(mp // tile,),
            in_specs=[pl.BlockSpec((tile, G * CI), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, G * CI), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, G * CI), xb.dtype),
        )(xb)

    if check:
        got = np.asarray(run(xb[:1024], ), np.float32)[:512]
        want = np.asarray(jnp.asarray(x[:512] + 1, jnp.bfloat16), np.float32)
        print(json.dumps({"case": "p1_check",
                          "max_err": float(np.abs(got - want).max())}),
              flush=True)
        return

    def fn(xb):
        return jnp.sum(run(xb)[::64, :1].astype(jnp.float32))

    def fn_copy(xb):
        # baseline: same kernel without the reshape round-trip
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + jnp.float32(1).astype(x_ref.dtype)
        y = pl.pallas_call(
            kernel,
            grid=(mp // 512,),
            in_specs=[pl.BlockSpec((512, G * CI), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((512, G * CI), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, G * CI), xb.dtype),
        )(xb)
        return jnp.sum(y[::64, :1].astype(jnp.float32))

    timed(fn, (xb,), "p1_reshape_roundtrip")
    timed(fn_copy, (xb,), "p1_copy_baseline")


def case_p2(check=False):
    """k3 depthwise along W fully in packed layout via static lane slices."""
    rng = np.random.RandomState(0)
    H, W, CE = 128, 256, 144
    wp, ge = W // G, G * CE
    n = 2 if check else N
    x = rng.randn(n, H, wp, ge).astype(np.float32)
    k3 = (rng.randn(3, CE) * 0.5).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    # per-lane tap weights tiled over groups: [3, ge]
    kl = jnp.asarray(np.tile(k3[:, None, :], (1, G, 1)).reshape(3, ge),
                     jnp.bfloat16)

    ht = 8

    def kernel(x_ref, k_ref, o_ref):
        xc = x_ref[:]          # [1, ht, wp, ge]
        k = k_ref[:]           # [3, ge]
        # neighbours along w via static lane slices + wp shift
        xn = jnp.concatenate([xc[:, :, 1:], jnp.zeros_like(xc[:, :, :1])],
                             axis=2)
        xp_ = jnp.concatenate([jnp.zeros_like(xc[:, :, :1]), xc[:, :, :-1]],
                              axis=2)
        right = jnp.concatenate([xc[..., CE:], xn[..., :CE]], axis=-1)
        left = jnp.concatenate([xp_[..., ge - CE:], xc[..., :ge - CE]],
                               axis=-1)
        acc = (left.astype(jnp.float32) * k[0].astype(jnp.float32)
               + xc.astype(jnp.float32) * k[1].astype(jnp.float32)
               + right.astype(jnp.float32) * k[2].astype(jnp.float32))
        o_ref[:] = acc.astype(o_ref.dtype)

    def run(xb):
        return pl.pallas_call(
            kernel,
            grid=(xb.shape[0], H // ht),
            in_specs=[
                pl.BlockSpec((1, ht, wp, ge), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, ge), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ht, wp, ge), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xb.shape, xb.dtype),
        )(xb, kl)

    if check:
        got = np.asarray(run(xb), np.float32)
        xs = x.reshape(n, H, W, CE)
        ref = np.zeros_like(xs)
        ref += xs * k3[1]
        ref[:, :, :-1] += xs[:, :, 1:] * k3[2]
        ref[:, :, 1:] += xs[:, :, :-1] * k3[0]
        refp = ref.reshape(n, H, wp, ge)
        err = np.abs(got - refp).max() / (np.abs(refp).max() + 1e-6)
        print(json.dumps({"case": "p2_check", "max_rel_err": float(err)}),
              flush=True)
        return

    def fn(xb):
        return jnp.sum(run(xb)[::16, :, :1, :1].astype(jnp.float32))

    timed(fn, (xb,), f"p2_packed_dwW_{H}x{wp}x{ge}")


def case_a2():
    """Packed pointwise matmul variants: tile size + XLA dot comparison."""
    rng = np.random.RandomState(0)
    H, W, CI, CE = 128, 256, 24, 144
    m = N * H * (W // G)
    xp = jnp.asarray(rng.randn(m, G * CI), jnp.bfloat16)
    wbd = jnp.asarray(block_diag_weight(
        (rng.randn(CI, CE) * 0.1).astype(np.float32), G), jnp.bfloat16)

    for mt in (512, 2048, 4096):
        def fn(xp, wbd, _mt=mt):
            y = packed_pointwise(xp, wbd, m_tile=_mt)
            return jnp.sum(y[::64, :1].astype(jnp.float32))
        timed(fn, (xp, wbd), f"packed_pw_mt{mt}")

    def fn_xla(xp, wbd):
        y = jnp.dot(xp, wbd, preferred_element_type=jnp.float32)
        return jnp.sum(y[::64, :1].astype(jnp.float32))
    timed(fn_xla, (xp, wbd), "packed_pw_xla_dot_f32out")

    def fn_xla16(xp, wbd):
        y = jnp.dot(xp, wbd)
        return jnp.sum(y[::64, :1].astype(jnp.float32))
    timed(fn_xla16, (xp, wbd), "packed_pw_xla_dot_bf16out")


def main():
    cases = sys.argv[1:] or ["a1_pw", "a1_roll"]
    if "check" in cases:
        case_a1_pw(check=True)
        case_a1_roll(check=True)
        case_p2(check=True)
        # case_p1: Mosaic rejects the in-kernel [Mp, g*C] -> [g*Mp, C]
        # reshape ("infer-vector-layout: unsupported shape cast") — the
        # packed path must stay packed; documented finding.
        return
    if "a1_pw" in cases:
        case_a1_pw()
    if "a1_roll" in cases:
        case_a1_roll()
    if "p1" in cases:
        case_p1()
    if "p2" in cases:
        case_p2()
    if "a2" in cases:
        case_a2()


if __name__ == "__main__":
    main()


