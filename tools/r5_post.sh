#!/usr/bin/env bash
# Round-5 post-queue stages: run ONLY after tools/r5_queue.sh has drained
# (the roofline trace needs the chip idle). Aggregates the multi-seed
# evidence, renders the op512 A/B markdown, replaces the roofline proxy
# with measured columns, and re-runs the flagship bench + multichip dryrun.
set -u
cd "$(dirname "$0")/.."
export UDAL_COMPILE_CACHE=/tmp/udal_compile_cache

stage () { echo "=== [$(date -u +%H:%M:%S)] $*" ; }

# ---- 1. AL efficacy multi-seed aggregate (CPU, cheap)
if [ -f docs/al_efficacy_seed1.json ] && [ -f docs/al_efficacy_seed2.json ]; then
  stage "al_efficacy aggregate"
  python tools/al_efficacy_aggregate.py docs/AL_EFFICACY.json \
    docs/al_efficacy_seed1.json docs/al_efficacy_seed2.json \
    --out docs/AL_EFFICACY_MULTISEED.json
fi

# ---- 2. op512 A/B markdown (CPU, cheap) — append to the measured-ref page
if [ -f docs/ab_parity_r5_op512_seed1.json ]; then
  stage "op512 summary"
  { echo; echo "## Measured curves (round 5)"; echo;
    python tools/ab_summarize.py docs/ab_parity_r5_op512_seed*.json \
      | grep -v partial; } >> docs/AB_OP512.md
fi

# ---- 3. measured roofline columns (needs idle chip)
stage "family roofline trace"
python tools/family_roofline_trace.py || true

# ---- 4. flagship bench + dryrun sanity
stage "bench"
timeout 1200 python bench.py | tail -1
stage "dryrun_multichip"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

stage "post-queue done"
