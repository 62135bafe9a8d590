#!/bin/bash
# Stall watchdog for the supervised acceptance run.
#
# The axon tunnel intermittently drops an in-flight RPC without erroring the
# client: the train process then blocks forever inside a device call (round-5
# log: two ~35 min silent stalls in one hour, process alive at ~10% CPU).
# The supervisor (acceptance_supervise.sh) only recovers from process EXITS,
# so this watchdog turns a hang into an exit: if the train log has not grown
# for STALE_S seconds while a train child exists, kill that child BY PID FILE
# (never by pattern).  Resume is cheap: latest.pkl is written every epoch and
# the remote compile cache makes the relaunch ~3 min.
#
#   bash tools/stall_watchdog.sh [TRAIN_LOG] [PID_FILE] [STALE_S]
set -u
LOG=${1:-/tmp/srtpu_accept/train.log}
PIDF=${2:-/tmp/accept_r4.pid}
STALE_S=${3:-360}

while true; do
  if [ -f /tmp/accept_stop ]; then
    echo "watchdog: stop requested"; exit 0
  fi
  if grep -q "supervisor: training completed" "$LOG" 2>/dev/null; then
    echo "watchdog: training completed"; exit 0
  fi
  if [ -f "$LOG" ] && [ -f "$PIDF" ]; then
    pid=$(cat "$PIDF")
    if kill -0 "$pid" 2>/dev/null; then
      now=$(date +%s)
      mt=$(stat -c %Y "$LOG")
      if [ $(( now - mt )) -ge "$STALE_S" ]; then
        echo "watchdog: log stale $(( now - mt ))s, killing train child $pid" \
          | tee -a "$LOG"
        kill "$pid" 2>/dev/null
        sleep 30   # let the supervisor notice and enter its probe loop
      fi
    fi
  fi
  sleep 60
done
