#!/usr/bin/env bash
# Round-5 TPU evidence queue (VERDICT r4 items 1-3). Idempotent: each stage
# is skipped when its output JSON already contains the expected sections,
# so the queue can be relaunched after a crash without redoing work.
# Run detached:  setsid nohup bash tools/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export UDAL_COMPILE_CACHE=/tmp/udal_compile_cache
mkdir -p "$UDAL_COMPILE_CACHE" checkpoints

have_section () {  # have_section FILE SECTION -> 0 when present and non-empty
  python - "$1" "$2" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    sys.exit(0 if d.get(sys.argv[2]) else 1)
except Exception:
    sys.exit(1)
EOF
}

stage () { echo "=== [$(date -u +%H:%M:%S)] $*" ; }

# ---- Stage 1+2: op512 A/B, 2 seeds x {beta=0 (ours_default), beta=1 (ours_beta)}
for SEED in 1 2; do
  OUT=docs/ab_parity_r5_op512_seed${SEED}.json
  SECS=""
  have_section "$OUT" ours_default || SECS="ours_default"
  have_section "$OUT" ours_beta    || SECS="${SECS:+$SECS,}ours_beta"
  if [ -n "$SECS" ]; then
    stage "op512 seed$SEED sections=$SECS"
    python tools/ab_parity.py --tpu --image-size 512 --num-classes 7 \
      --train-images 1024 --val-images 128 --batch 8 --steps 1800 \
      --seed "$SEED" --sections "$SECS" --out "$OUT"
  else
    stage "op512 seed$SEED: complete, skipping"
  fi
done

# ---- Stage 3+4: AL efficacy replication, seeds 1 and 2 (seed 0 = r4 artifact)
for SEED in 1 2; do
  OUT=docs/al_efficacy_seed${SEED}.json
  if have_section "$OUT" arms; then
    stage "al_efficacy seed$SEED: complete, skipping"
  else
    stage "al_efficacy seed$SEED"
    python tools/al_efficacy.py --pool 512 --val 96 --image-size 128 \
      --batch 8 --steps 1200 --iterations 3 --seed-size 32 --per-iter 32 \
      --mc-samples 5 --hard-frac 0.25 --hard-contrast 1.0 --hard-noise 0 \
      --seed-easy-only --beta 1.0 --seed "$SEED" \
      --save-ckpt "checkpoints/al_efficacy_seed${SEED}" --out "$OUT"
  fi
done

# ---- Stage 5: ensemble uncertainty efficacy (5 members vs 10-pass MC)
OUT=docs/ENSEMBLE_BENCH.json
if have_section "$OUT" accuracy; then
  stage "ensemble_efficacy: complete, skipping"
else
  stage "ensemble_efficacy"
  python tools/ensemble_efficacy.py --members 5 --mc-samples 10 \
    --image-size 256 --train-images 256 --val-images 64 --steps 900 \
    --batch 8 --out "$OUT"
fi

# ---- Stage 6: AL scoring bench with a TRAINED checkpoint: official arrays
# pass + the device-staged decomposition (VERDICT r4 #5)
OUT=docs/AL_SCORING_BENCH.json
trained () {  # trained FILE SECTION -> 0 when section exists with a ckpt
  python - "$1" "$2" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    sys.exit(0 if d.get(sys.argv[2], {}).get("ckpt") else 1)
except Exception:
    sys.exit(1)
EOF
}
if [ -d checkpoints/al_efficacy_seed1 ]; then
  trained "$OUT" arrays || {
    stage "al_scoring_bench arrays (trained ckpt)"
    python tools/perf_al_scoring.py --ckpt checkpoints/al_efficacy_seed1 \
      --out "$OUT"; }
  trained "$OUT" arrays_staged || {
    stage "al_scoring_bench device-staged (trained ckpt)"
    python tools/perf_al_scoring.py --ckpt checkpoints/al_efficacy_seed1 \
      --device-staged --out "$OUT"; }
else
  stage "al_scoring_bench: skipped (no trained ckpt yet)"
fi

# ---- Stage 7: SSL strong teacher: 2400-step teacher, tau sweep, pseudo
# score weighting on, label-scarce regime (32 labeled / control saturated)
OUT=docs/SSL_AB_strong_teacher.json
if have_section "$OUT" arms; then
  stage "ssl strong teacher: complete, skipping"
else
  stage "ssl strong teacher"
  python tools/ssl_efficacy.py --pool 512 --labeled 32 --val 64 \
    --image-size 256 --num-classes 4 --batch 8 --teacher-steps 2400 \
    --student-steps 2400 --tau-sweep 0.3,0.4,0.5 --pseudoscore \
    --arms teacher,control,student --seed 0 --out "$OUT"
fi

# ---- Stage 8: collapse-fix replication, second seed + op256 (beta=1)
if [ ! -f docs/collapse_probe_seed2_beta1.json ]; then
  stage "collapse probe seed2 beta1 (op128)"
  python tools/collapse_probe.py --seed 2 --beta 1.0 \
    --out docs/collapse_probe_seed2_beta1.json
fi
if [ ! -f docs/collapse_probe_seed1_op256_beta1.json ]; then
  stage "collapse probe seed1 beta1 op256"
  python tools/collapse_probe.py --seed 1 --beta 1.0 --image-size 256 \
    --out docs/collapse_probe_seed1_op256_beta1.json
fi

stage "queue drained"
