"""Add MFU / roofline columns to docs/FAMILY_BENCH.json (VERDICT r3 #10).

For each committed family row (d0..d5 at their benchmarked resolution and
batch), compiles the SAME 10-pass MC forward on the hermetic CPU backend
and reads XLA's cost analysis (flops, bytes accessed) — compile-time
properties independent of the executing backend — then combines them with
the committed ON-CHIP img/s:

    achieved_tflops = flops_per_image * img_per_s
    mfu             = achieved_tflops / PEAK_TFLOPS
    hbm_gbps        = bytes_per_image * img_per_s   (upper-bound proxy:
                      XLA 'bytes accessed' counts operand+result traffic
                      per instruction, before fusion-internal reuse)
    bound           = compute | bandwidth (which roofline fraction is
                      larger)

Peak numbers: TPU v5e — 197 TFLOP/s bf16, 819 GB/s HBM (public spec).
"""

import json
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np       # noqa: E402

PEAK_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0
T = 10


def cost_for(model_name, resolution, batch):
    from udal_tpu.config import get_detection_config
    from udal_tpu.models.efficientdet import EfficientDetNet, mc_forward

    cfg = get_detection_config(model_name)
    cfg.image_size = resolution
    cfg.num_classes = 8
    cfg.loss_attenuation = True
    cfg.mc_dropout = True
    cfg.mc_dropoutrate = 0.05
    cfg.mc_dropoutsamp = T
    cfg.is_training_bn = False
    model = EfficientDetNet(cfg, dtype=jnp.bfloat16)
    if "x" in str(resolution):
        w, h = (int(v) for v in str(resolution).split("x"))
    else:
        h = w = int(resolution)
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    def fwd(variables, images, key):
        cls_s, box_s = mc_forward(model, variables, images, key, T)
        return (sum(jnp.sum(c.astype(jnp.float32)) for c in cls_s) +
                sum(jnp.sum(b.astype(jnp.float32)) for b in box_s))

    compiled = jax.jit(fwd).lower(variables, x,
                                  jax.random.PRNGKey(0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    path = os.path.join(REPO, "docs", "FAMILY_BENCH.json")
    with open(path) as f:
        report = json.load(f)
    for row in report["rows"]:
        print(f"cost analysis: {row['model']} @{row['resolution']} "
              f"b{row['batch']} ...", file=sys.stderr, flush=True)
        flops, bytes_acc = cost_for(row["model"], row["resolution"],
                                    row["batch"])
        per_img_flops = flops / row["batch"]
        per_img_bytes = bytes_acc / row["batch"]
        achieved_tflops = per_img_flops * row["img_per_s"] / 1e12
        hbm_gbps = per_img_bytes * row["img_per_s"] / 1e9
        row["gflops_per_img"] = round(per_img_flops / 1e9, 1)
        row["achieved_tflops"] = round(achieved_tflops, 2)
        row["mfu"] = round(achieved_tflops / PEAK_TFLOPS, 4)
        row["hbm_gbps_proxy"] = round(hbm_gbps, 1)
        row["hbm_frac_proxy"] = round(hbm_gbps / PEAK_HBM_GBPS, 3)
        row["bound"] = ("bandwidth" if row["hbm_frac_proxy"] > row["mfu"]
                        else "compute")
        print(json.dumps(row), flush=True)
    report["roofline_note"] = (
        "MFU vs 197 TFLOP/s bf16 (v5e); hbm_gbps_proxy from XLA "
        "'bytes accessed' (operand+result per instruction, an upper bound "
        "on true HBM traffic - fusion-internal reuse not subtracted). "
        "Flops/bytes from CPU-backend compile of the identical program; "
        "img_per_s is the committed on-chip number.")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"updated {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
