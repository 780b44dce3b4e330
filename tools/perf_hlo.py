"""Dump + aggregate optimized HLO for the MC-dropout d0 forward program.

Compiles the benchmark forward (optionally + postprocess) for the attached
TPU and aggregates the optimized HLO by opcode: instruction count and total
output bytes. Large `copy`/`transpose`/`reshape` entries are layout moves —
the "data formatting" time in the profile. Prints the top instructions by
output size for the interesting opcodes.

Usage: python tools/perf_hlo.py [fwd|full] [--dump FILE]
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 10
BATCH = 8

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
               "u16": 2}


def shape_bytes(shape_str):
    """Total bytes of an HLO shape string like 'bf16[80,256,512,32]{3,2,1,0}'.

    Tuples are handled by summing components.
    """
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        b = DTYPE_BYTES.get(dt)
        if b is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * b
    return total


def build_fwd():
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet

    cfg = get_detection_config("efficientdet-d0")
    cfg.image_size = "1024x512"
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = T
    cfg.is_training_bn = False
    model = EfficientDetNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 512, 1024, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    return cfg, model, variables, x


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    dump = None
    if "--dump" in sys.argv:
        dump = sys.argv[sys.argv.index("--dump") + 1]

    cfg, model, variables, x = build_fwd()

    def fwd(variables, images, key):
        keys = jax.random.split(key, T)
        outs = jax.vmap(lambda k: model.apply(
            variables, images, train=False, rngs={"dropout": k}))(keys)
        leaves = jax.tree_util.tree_leaves(outs)
        return sum(jnp.sum(l[..., ::16, ::16, :1].astype(jnp.float32))
                   for l in leaves)

    def full(variables, images, key):
        from udal_tpu.ops.postprocess import postprocess_global
        keys = jax.random.split(key, T)
        cls_s, box_s = jax.vmap(lambda k: model.apply(
            variables, images, train=False, rngs={"dropout": k}))(keys)
        det = postprocess_global(cfg, list(cls_s), list(box_s),
                                 image_scales=jnp.ones((images.shape[0],)),
                                 use_pallas_nms=True)
        return jnp.sum(det.scores) + jnp.sum(det.boxes)

    fn = fwd if mode == "fwd" else full
    lowered = jax.jit(fn).lower(variables, x, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    if dump:
        with open(dump, "w") as f:
            f.write(txt)
        print(f"dumped {len(txt)} chars to {dump}", file=sys.stderr)

    # Aggregate per opcode over all instruction lines
    agg = {}
    biggest = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\S+\[.*?\]\S*) (\w+)\(", ls)
        if not m:
            continue
        shape_str, opcode = m.group(1), m.group(2)
        b = shape_bytes(shape_str)
        ent = agg.setdefault(opcode, [0, 0])
        ent[0] += 1
        ent[1] += b
        if opcode in ("copy", "transpose", "reshape", "convolution",
                      "fusion", "bitcast-convert", "convert", "broadcast"):
            biggest.append((b, opcode, ls[:160]))

    print(json.dumps({"mode": mode, "opcodes": {
        k: {"count": v[0], "mbytes": round(v[1] / 1e6, 1)}
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1][1])}}, indent=1))
    biggest.sort(key=lambda t: -t[0])
    print("\n-- top instructions by output bytes --")
    for b, op, ls in biggest[:40]:
        print(f"{b/1e6:9.1f} MB  {op:12s} {ls}")


if __name__ == "__main__":
    main()
