#!/bin/bash
# Round-5 finish-and-publish orchestrator: the post-training half of the
# acceptance flow PLUS the chip-gated certification queue, in priority order
# (VERDICT r4 next 1,2,3,4,5,7).  Replaces acceptance_followup.sh for the
# round-5 run: waits for tools/acceptance_supervise.sh to log completion,
# then runs
#   1. full-sequence inference (the published wall-clock) + errors.txt
#   2. Chamfer vs ground truth + per-stage rate report
#   3. full-schedule deviation A/B (fine from medium.pkl, medium from
#      coarse.pkl): shipped defaults vs reference-exact settings
#   4. multi-frame splat-cap certification (+ dense-silhouette stress)
#   5. scheduled-path profile after the optimization_barrier fix
#   6. loose-config 512^2 smoke
#   7. splat backward gather-vs-scatter benches + full step profile
# Everything appends to $DATA/followup.log and key artifacts are copied into
# the repo's reports/ dir as they are produced (so an end-of-round commit
# captures them even if the driver session dies).
#
#   bash tools/phase2_followup.sh [DATA_ROOT] [TIMEOUT_H]
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
DATA=${1:-/tmp/srtpu_accept}
TIMEOUT_H=${2:-9}
LOG="$DATA/followup.log"
OUT="$REPO/reports"
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + TIMEOUT_H * 3600 ))
# hard stop for the OPTIONAL certification items: leave the chip free for
# the driver's end-of-round bench.py run (set SRTPU_HARD_STOP to an epoch
# timestamp; default = wait-deadline minus 45 min)
HARD_STOP=${SRTPU_HARD_STOP:-$(( DEADLINE - 2700 ))}
past_hard() {
  if [ "$(date +%s)" -ge "$HARD_STOP" ]; then
    echo "phase2: past hard stop, skipping '$1'" >> "$LOG"; return 0
  fi
  return 1
}

snap() {  # copy the rolling artifacts into the repo
  cp -f "$DATA/rec/errors.txt" "$OUT/errors.txt" 2>/dev/null || true
  cp -f "$LOG" "$OUT/followup.log" 2>/dev/null || true
}

echo "=== phase2 waiting for training completion $(date -u +%FT%TZ) ===" >> "$LOG"
while true; do
  if grep -q "supervisor: training completed" "$DATA/train.log" 2>/dev/null; then
    break
  fi
  if [ -f /tmp/accept_stop ]; then
    echo "phase2: stop requested" >> "$LOG"; exit 0
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "phase2: timed out waiting for training" >> "$LOG"; exit 1
  fi
  sleep 120
done

# ---- 1. inference wall-clock + errors.txt (the acceptance contract) ----
echo "=== inference $(date -u +%FT%TZ) ===" >> "$LOG"
START=$(date +%s)
python -u infer.py --rec-root "$DATA/rec" --synthetic-body --nV \
    --batch-size 4 >> "$LOG" 2>&1
INFER_S=$(( $(date +%s) - START ))
echo "INFER WALL-CLOCK: ${INFER_S}s (batch-size 4)" >> "$LOG"

# ---- 2. metrics: mask IoU + Chamfer + per-stage rates ----
echo "=== metrics $(date -u +%FT%TZ) ===" >> "$LOG"
tail -3 "$DATA/rec/errors.txt" >> "$LOG" 2>&1 || true
python tools/compare_meshes.py "$DATA/rec/tmp.ply" "$DATA/gt_mesh.npz" \
    >> "$LOG" 2>&1 || true
python tools/accept_report.py "$DATA" >> "$LOG" 2>&1 || true
cp -f "$DATA/train.log" "$OUT/train.log" 2>/dev/null || true
snap

# ---- 3. full-schedule deviation A/B at the trained state ----
past_hard "A/B fine" || {
echo "=== A/B fine from medium.pkl $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 3000 python -u tools/ab_stage_resume.py --root "$DATA" \
    --ckpt medium.pkl --stage fine --epochs 1 \
    --variants base ref_exact >> "$LOG" 2>&1 || true
snap
}

# ---- 4. multi-frame splat-cap certification ----
past_hard "splat cert" || {
echo "=== splat cert: 8 spaced frames $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 2400 python -u tools/bench_splat.py --root "$DATA" \
    >> "$LOG" 2>&1 || true
echo "=== splat cert: dense-silhouette stress (focal x1.6) $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1800 python -u tools/bench_splat.py --root "$DATA" \
    --focal-scale 1.6 >> "$LOG" 2>&1 || true
snap
}

# ---- 5. scheduled-path profile after the gather barrier ----
past_hard "sched profile" || {
echo "=== scheduled-path profile $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1800 python -u tools/profile_sched.py --data "$DATA" \
    >> "$LOG" 2>&1 || true
snap
}

# ---- A/B medium (demoted: fine is where acceptance is earned) ----
past_hard "A/B medium" || {
echo "=== A/B medium from coarse.pkl $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 2700 python -u tools/ab_stage_resume.py --root "$DATA" \
    --ckpt coarse.pkl --stage medium --epochs 1 \
    --variants base ref_exact >> "$LOG" 2>&1 || true
snap
}

# ---- 6. loose-config smoke at 512^2 ----
past_hard "loose smoke" || {
echo "=== loose smoke $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 3000 bash tools/loose_smoke.sh /tmp/srtpu_loose 19 >> "$LOG" 2>&1 || true
snap
}

# ---- 7. perf tail: splat backward modes + full step profile ----
past_hard "perf tail" || {
echo "=== inner pieces: gather bwd $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1500 python tools/bench_inner_accept.py --data "$DATA" >> "$LOG" 2>&1 || true
echo "=== inner pieces: scatter bwd $(date -u +%FT%TZ) ===" >> "$LOG"
SRTPU_SPLAT_BWD=scatter timeout 1500 python tools/bench_inner_accept.py \
    --data "$DATA" >> "$LOG" 2>&1 || true
echo "=== full step profile $(date -u +%FT%TZ) ===" >> "$LOG"
timeout 1500 python tools/profile_accept.py --data "$DATA" >> "$LOG" 2>&1 || true
snap
}
echo "=== phase2 done $(date -u +%FT%TZ) ===" >> "$LOG"
