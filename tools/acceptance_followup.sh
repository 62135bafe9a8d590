#!/bin/bash
# Post-training half of the acceptance flow, decoupled from the (crash-
# supervised) training run: waits for tools/acceptance_supervise.sh to log
# completion, then runs full-sequence inference + mask-IoU report + Chamfer
# vs the subject's ground-truth mesh and the per-stage rate report.
#
#   bash tools/acceptance_followup.sh [DATA_ROOT] [TIMEOUT_H]
#
# Everything is appended to $DATA/followup.log.
set -u
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/srtpu_accept}
TIMEOUT_H=${2:-9}
LOG="$DATA/followup.log"
DEADLINE=$(( $(date +%s) + TIMEOUT_H * 3600 ))

echo "=== followup waiting for training completion $(date -u +%FT%TZ) ===" >> "$LOG"
while true; do
  if grep -q "supervisor: training completed" "$DATA/train.log" 2>/dev/null; then
    break
  fi
  if [ -f /tmp/accept_stop ]; then
    echo "followup: stop requested" >> "$LOG"; exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "followup: timed out waiting for training" >> "$LOG"; exit 1
  fi
  sleep 120
done

echo "=== inference $(date -u +%FT%TZ) ===" >> "$LOG"
START=$(date +%s)
python -u infer.py --rec-root "$DATA/rec" --synthetic-body --nV \
    >> "$LOG" 2>&1
INFER_S=$(( $(date +%s) - START ))
echo "INFER WALL-CLOCK: ${INFER_S}s" >> "$LOG"

echo "=== metrics $(date -u +%FT%TZ) ===" >> "$LOG"
tail -3 "$DATA/rec/errors.txt" >> "$LOG" 2>&1 || true
python tools/compare_meshes.py "$DATA/rec/tmp.ply" "$DATA/gt_mesh.npz" \
    >> "$LOG" 2>&1 || true
python tools/accept_report.py "$DATA" >> "$LOG" 2>&1 || true

# perf measurements at the CONVERGED acceptance state (fine-stage budget)
echo "=== inner pieces: gather bwd $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 2400 python tools/bench_inner_accept.py --data "$DATA" >> "$LOG" 2>&1 || true
echo "=== inner pieces: scatter bwd $(date -u +%FT%TZ) ===" >> "$LOG"
SRTPU_SPLAT_BWD=scatter timeout 2400 python tools/bench_inner_accept.py \
    --data "$DATA" >> "$LOG" 2>&1 || true
echo "=== full step profile $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 2400 python tools/profile_accept.py --data "$DATA" >> "$LOG" 2>&1 || true
echo "=== followup done $(date -u +%FT%TZ) ===" >> "$LOG"
