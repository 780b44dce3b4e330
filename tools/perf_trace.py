"""Device-trace profile of the MC-dropout d0 pipeline, aggregated per XLA op.

Runs the benchmark program under jax.profiler.trace and aggregates the
TPU-side xplane events (via tensorboard_plugin_profile's xplane proto) by
instruction, printing the top ops by total self-time. This is the ground
truth for where the 80 ms step goes.

Usage: python tools/perf_trace.py [fwd|fwd_naive|full] [top_n]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 10
K = 4


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from tools.perf_breakdown import (build, full_fast_fn, full_fn, fwd_fn,
                                  fwd_naive_fn)

    cfg, model, variables, x = build(8)
    fn = {"fwd": fwd_fn, "fwd_naive": fwd_naive_fn, "full": full_fn,
      "full_fast": full_fast_fn}[variant](
        cfg, model)

    @jax.jit
    def many(variables, images, key):
        def step(carry, k):
            return carry + fn(variables, images, k), None
        total, _ = jax.lax.scan(step, 0.0, jax.random.split(key, K))
        return total

    def fresh_key():
        return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))

    # warm up / compile
    float(many(variables, x, fresh_key()))

    trace_dir = "/tmp/jax_trace_" + variant
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        float(many(variables, x, fresh_key()))

    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print(f"trace files: {pbs}", file=sys.stderr)
    if not pbs:
        print(json.dumps({"error": "no xplane produced"}))
        return

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    agg = {}
    total_dur = 0
    for pb in pbs:
        xs = xplane_pb2.XSpace()
        with open(pb, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lname = line.name
                if "XLA Ops" not in lname and "xla" not in lname.lower():
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    # skip async DMA spans and control ops: their durations
                    # overlap compute and poison the aggregation
                    base = name.split(" = ")[0].lstrip("%")
                    op = base.split(".")[0]
                    if op in ("copy-start", "copy-done", "while", "jit_many",
                              "get-tuple-element", "tuple", "parameter",
                              "constant", "after-all", "infeed", "outfeed"):
                        continue
                    if name.startswith("jit_"):
                        continue
                    dur = ev.duration_ps / 1e9
                    ent = agg.setdefault(name, [0, 0.0])
                    ent[0] += 1
                    ent[1] += dur
                    total_dur += dur
    if not agg:
        # dump plane/line names for debugging
        for pb in pbs:
            xs = xplane_pb2.XSpace()
            with open(pb, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                print("plane:", plane.name,
                      [ln.name for ln in plane.lines][:10], file=sys.stderr)
        return
    items = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(json.dumps({"variant": variant, "events_total_ms": round(
        total_dur, 2), "per_step_ms": round(total_dur / K, 2)}))
    for name, (cnt, dur) in items[:top_n]:
        print(f"{dur / K:8.3f} ms/step  x{cnt:4d}  {name[:120]}")


if __name__ == "__main__":
    main()
