#!/bin/bash
# Round-5 session tooling: PROGRESS.jsonl shows the round ends ~13:17 UTC
# (12 h from the 01:17 start), not 15:55 — the supervisor's 13:40 deadline
# would leave no end window. Stop the run at zero checkpoint cost right
# after the step-6000 boundary evals: when the supervisor starts the
# 6000->8000 chunk (i.e. the evals are done), touch the stop file — the
# fresh chunk dies while compiling, the checkpoint at 6000 is intact.
set -u
cd "$(dirname "$0")/.."
SUPLOG=workdirs/supervisor_c2_r5.log
WORKDIR=workdirs/run_full1chip_c2
START_LINE=$(wc -l < "$SUPLOG")
DEADLINE=$(( $(date +%s) + 9000 ))

log() { echo "[stop6000 $(date -u +%H:%M:%S)] $*"; }
log "waiting for 'training chunk: step 6000' after line $START_LINE"
while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    log 'deadline; touching stop file anyway'; break
  fi
  if tail -n +"$((START_LINE + 1))" "$SUPLOG" \
      | grep -q 'training chunk: step 6000'; then
    break
  fi
  sleep 15
done
touch "$WORKDIR/SUPERVISOR_STOP"
log 'stop file touched'
# Wait for the supervisor to exit, then clean the stop file so later
# manual runs are unaffected.
for i in $(seq 1 40); do
  if tail -n +"$((START_LINE + 1))" "$SUPLOG" | grep -q 'exiting'; then
    rm -f "$WORKDIR/SUPERVISOR_STOP"
    log 'supervisor exited; stop file removed'
    exit 0
  fi
  sleep 15
done
log 'supervisor did not exit within 10 min (stop file left in place)'
