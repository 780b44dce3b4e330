#!/usr/bin/env bash
# Round-5 session helper: block until the evidence queue (tools/r5_queue.sh)
# either drains or lands a new/updated artifact under docs/, then exit so
# the caller can commit the milestone. Pure polling, no TPU/CPU load.
set -u
cd "$(dirname "$0")/.."
SNAP=$(ls -l --time-style=+%s docs/*.json 2>/dev/null | md5sum)
while :; do
  sleep 60
  NOW=$(ls -l --time-style=+%s docs/*.json 2>/dev/null | md5sum)
  if [ "$NOW" != "$SNAP" ]; then
    echo "artifact change detected"
    ls -lt docs/*.json | head -5
    exit 0
  fi
  if ! ps -eo args | grep -v grep | grep -qE "tools/r5_queue\.sh"; then
    echo "queue drained (r5_queue.sh no longer alive)"
    exit 0
  fi
done
