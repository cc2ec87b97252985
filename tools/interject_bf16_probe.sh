#!/bin/bash
# Round-5 session tooling: in-situ A/B of the bf16 backward-scatter mode
# (VERDICT round-4 item #4) with minimal disruption to the flagship run.
#
# Waits for the supervisor to START the chunk after the step-2000 boundary
# (i.e. the step-2000 held-out evals are done), stops the supervisor at
# zero checkpoint cost (the new chunk is still compiling), then trains one
# 100-step chunk with SNAP_TPU_SCATTER_MODE=bf16 so the trainer's
# automatic xprof window (steps 2003-2008) captures device-op ms/step at
# identical data/shapes to the direct-mode trace from the 05:27 chunk.
# Lessons from ADVICE round-4 item on handoff_heads.sh applied: tail the
# log from this script's start offset, bound every wait with a deadline.
set -u
cd "$(dirname "$0")/.."

SUPLOG=workdirs/supervisor_c2_r5.log
WORKDIR=workdirs/run_full1chip_c2
CFG='snap_tpu/configs/train_localization.py:scale=full1chip,pose_backend=exhaustive,pretrained_mapper=pretrained/loc_full1chip_r4,continue_step=7000'
START_LINE=$(wc -l < "$SUPLOG")
DEADLINE=$(( $(date +%s) + 7200 ))  # give up after 2 h (eval overruns)

log() { echo "[interject $(date -u +%H:%M:%S)] $*"; }

log "waiting for 'training chunk: step 2000' after line $START_LINE"
while true; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    log "deadline waiting for boundary; aborting (supervisor untouched)"
    exit 1
  fi
  if tail -n +"$((START_LINE + 1))" "$SUPLOG" | grep -q 'training chunk: step 2000'; then
    break
  fi
  sleep 15
done

log "chunk 2000-> started; stopping supervisor"
touch "$WORKDIR/SUPERVISOR_STOP"
# Supervisor kills the chunk, backs off 180 s, sees the stop file, logs
# 'exiting' and exits. Watch the log, not process patterns (pattern kills
# are banned; kill -0 by pattern is one typo away).
EXITED=0
for i in $(seq 1 40); do
  if tail -n +"$((START_LINE + 1))" "$SUPLOG" | grep -q 'exiting'; then
    EXITED=1; break
  fi
  sleep 15
done
if [ "$EXITED" != 1 ]; then
  log "supervisor did not exit within 10 min; aborting probe"
  exit 1
fi
sleep 10  # let the supervisor process leave main()
rm -f "$WORKDIR/SUPERVISOR_STOP"
log "supervisor exited; launching bf16 probe chunk (2000 -> 2100)"

SNAP_TPU_SCATTER_MODE=bf16 timeout 2400 python -m snap_tpu.train \
  --config="$CFG" --workdir="$WORKDIR" --stop_at_step=2100 \
  >> workdirs/run_full1chip_c2.bf16probe.log 2>&1
log "bf16 probe chunk rc=$?"
ls "$WORKDIR/plugins/profile/" | tail -3
