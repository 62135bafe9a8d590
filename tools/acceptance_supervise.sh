#!/bin/bash
# Crash-resuming wrapper around the acceptance training run.
#
# The axon TPU tunnel has measured multi-minute outages and occasional
# "TPU worker process crashed or restarted" faults that kill the training
# process outright (round-3/4 logs).  Training checkpoints latest.pkl every
# epoch and train.py --model resumes exactly, so the right recovery is:
# relaunch, resume, repeat — with a backoff probe so a dead tunnel doesn't
# burn restart attempts.
#
#   bash tools/acceptance_supervise.sh [DATA_ROOT] [MAX_RESTARTS]
#
# Writes the CURRENT child pid to /tmp/accept_r4.pid (kill that to stop a
# run; remove /tmp/accept_stop to allow restarts, touch it to stop the loop).
set -u
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/srtpu_accept}
MAX_RESTARTS=${2:-20}
LOG="$DATA/train.log"
rm -f /tmp/accept_stop

FAST_FAILS=0
for attempt in $(seq 0 "$MAX_RESTARTS"); do
  if [ -f /tmp/accept_stop ]; then
    echo "supervisor: stop requested" | tee -a "$LOG"; break
  fi
  EXTRA=""
  if [ -f "$DATA/rec/latest.pkl" ]; then
    EXTRA="--model $DATA/rec/latest.pkl"
  fi
  # two quick consecutive failures usually mean a code-path problem, not a
  # tunnel fault: fall back to the per-step (non-scheduled) train loop
  if [ "$FAST_FAILS" -ge 2 ]; then
    export SRTPU_NO_SCHED=1
    echo "supervisor: falling back to SRTPU_NO_SCHED=1" >> "$LOG"
  fi
  echo "=== supervisor attempt $attempt $(date -u +%FT%TZ) resume=${EXTRA:-no} ===" >> "$LOG"
  T_LAUNCH=$(date +%s)
  python -u train.py --conf configs/config.conf --data "$DATA" \
      --save-folder rec --synthetic-body $EXTRA >> "$LOG" 2>&1 &
  echo $! > /tmp/accept_r4.pid
  wait $!
  rc=$?
  if [ $rc -ne 0 ] && [ $(( $(date +%s) - T_LAUNCH )) -lt 1200 ]; then
    FAST_FAILS=$(( FAST_FAILS + 1 ))
  else
    FAST_FAILS=0
  fi
  echo "=== supervisor: train exited rc=$rc $(date -u +%FT%TZ) ===" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "supervisor: training completed" | tee -a "$LOG"; break
  fi
  # tunnel-health backoff: don't relaunch (and pay a full recompile) until a
  # trivial device program round-trips; each probe is its own short process
  for probe in $(seq 1 60); do
    if [ -f /tmp/accept_stop ]; then break; fi
    if timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((8,8))@jnp.ones((8,8))).sum()) == 512.0
" 2>/dev/null; then
      echo "supervisor: device healthy after $probe probe(s)" >> "$LOG"; break
    fi
    sleep 60
  done
done
