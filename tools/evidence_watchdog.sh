#!/bin/bash
# Babysits the round-3 evidence protocol (tools/evidence_run.py) through TPU
# tunnel outages: waits for the device to answer, runs the checkpointed 50k
# protocol, and restarts from the checkpoint if the run dies mid-way.
# Usage: tools/evidence_watchdog.sh [n_steps] [width] [out_json] [ckpt]
set -u
N_STEPS=${1:-50000}
WIDTH=${2:-800}
OUT=${3:-/root/repo/EVIDENCE_r3.json}
CKPT=${4:-/tmp/evidence_r3_ckpt.msgpack}
LOG=${LOG:-/tmp/evidence_r3.log}

cd /root/repo
for attempt in $(seq 1 400); do
  if [ -s "$OUT" ]; then
    echo "[watchdog] $OUT exists — done" | tee -a "$LOG"
    exit 0
  fi
  if ! timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watchdog] $(date -u +%H:%M:%S) TPU unreachable (attempt $attempt); sleeping 180s" >>"$LOG"
    sleep 180
    continue
  fi
  echo "[watchdog] $(date -u +%H:%M:%S) TPU up — starting evidence run (attempt $attempt)" | tee -a "$LOG"
  timeout 21600 python tools/evidence_run.py "$N_STEPS" "$WIDTH" "$OUT" "$CKPT" >>"$LOG" 2>&1
  rc=$?
  echo "[watchdog] $(date -u +%H:%M:%S) evidence run exited rc=$rc" >>"$LOG"
  [ -s "$OUT" ] && exit 0
  sleep 60
done
echo "[watchdog] gave up after 400 attempts" | tee -a "$LOG"
exit 1
