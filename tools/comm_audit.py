"""Comm-volume audit of the GSPMD/TP shardings on a virtual 8-device mesh.

Compiles the FULL jitted train step for d0/d4 under (a) 8-way data
parallelism and (b) 4x2 data x tensor parallelism, extracts every
collective from the optimized HLO (all-reduce / all-gather /
reduce-scatter / collective-permute / all-to-all), and reports counts +
total payload bytes per program.

Expectation checked for DP: the dominant all-reduce volume is the gradient
pytree (= trainable-param bytes, f32), plus small cross-replica BN moment
and loss-normalizer psums (`/root/reference/src/utils.py:62-227` analog;
SURVEY §2.7). For TP, all-gather/reduce-scatter volume scales with the
channel-sharded activations instead.

Runs entirely on the hermetic CPU mesh (no TPU needed): collective sizes
are a compile-time property. Image size is kept small — gradient comm is
independent of the spatial dims. Writes docs/COMM_AUDIT.json.
"""

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np                            # noqa: E402

from tools.perf_hlo import shape_bytes        # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def collect_collectives(hlo_text):
    agg = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\S+\[.*?\]\S*) ([\w-]+)\(", ls)
        if not m:
            continue
        shape_str, opcode = m.group(1), m.group(2)
        base = opcode.replace("-start", "").replace("-done", "")
        if base not in COLLECTIVES or opcode.endswith("-done"):
            continue
        ent = agg.setdefault(base, [0, 0])
        ent[0] += 1
        ent[1] += shape_bytes(shape_str)
    return {k: {"count": v[0], "mbytes": round(v[1] / 1e6, 3)}
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1][1])}


def build_step(model_name, image_size, batch, mesh, tensor_parallel):
    from udal_tpu.config import get_detection_config
    from udal_tpu.train.train_lib import (create_train_state,
                                          make_jitted_train_step)

    cfg = get_detection_config(model_name)
    cfg.image_size = image_size
    cfg.num_classes = 7
    cfg.loss_attenuation = True
    cfg.mc_dropout = False
    cfg.enable_softmax = True
    cfg.num_epochs = 10
    cfg.override({"batch_size": batch}, allow_new_keys=True)

    model, state, tx, schedule = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10)
    param_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize
        for p in jax.tree_util.tree_leaves(state.params))
    if tensor_parallel:
        from udal_tpu.parallel.mesh import shard_state_tp

        state = shard_state_tp(mesh, state)
    step_fn = make_jitted_train_step(cfg, model, tx, schedule, 10,
                                     mesh=mesh,
                                     tensor_parallel=tensor_parallel)
    # representative tiny batch for lowering (shapes only matter)
    h, w = (image_size, image_size) if isinstance(image_size, int) else \
        image_size
    images = np.zeros((batch, h, w, 3), np.float32)
    from udal_tpu.data.dataloader import InputReader
    from udal_tpu.data.synthetic import write_synthetic_dataset

    tmp = os.path.join("/tmp", "comm_audit.tfrecord")
    if not os.path.exists(tmp):
        write_synthetic_dataset(tmp, num_images=batch, height=h, width=w,
                                num_classes=7, seed=0)
    reader = InputReader(tmp, is_training=True, seed=0)
    it = reader(cfg, batch)
    images, labels = next(it)
    it.close()
    labels = {k: v for k, v in labels.items() if not isinstance(v, list)}
    lowered = step_fn.lower(state, images, labels, jax.random.PRNGKey(0))
    return lowered.compile().as_text(), param_bytes


def main():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    report = {"n_devices": len(devices), "programs": {}}
    cases = [
        ("efficientdet-d0", 256, 8, "dp8", (8,), ("data",), False),
        ("efficientdet-d0", 256, 8, "dp4_tp2", (4, 2), ("data", "model"),
         True),
        ("efficientdet-d4", 256, 8, "dp8", (8,), ("data",), False),
        ("efficientdet-d4", 256, 8, "dp4_tp2", (4, 2), ("data", "model"),
         True),
    ]
    for model_name, size, batch, tag, shape, axes, tp in cases:
        mesh = Mesh(devices.reshape(shape), axes)
        print(f"compiling {model_name} {tag} ...", file=sys.stderr,
              flush=True)
        hlo, param_bytes = build_step(model_name, size, batch, mesh, tp)
        coll = collect_collectives(hlo)
        entry = {"collectives": coll,
                 "param_mbytes": round(param_bytes / 1e6, 3)}
        if not tp:
            ar = coll.get("all-reduce", {"mbytes": 0})["mbytes"]
            # gradient all-reduce should dominate: volume ~ param bytes
            entry["allreduce_over_params"] = round(
                ar / entry["param_mbytes"], 3) if entry["param_mbytes"] else 0
        report["programs"][f"{model_name}:{tag}"] = entry
        print(json.dumps({f"{model_name}:{tag}": entry}), flush=True)

    out = os.path.join(REPO, "docs", "COMM_AUDIT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
