#!/bin/bash
# Round-5 session tooling: recovery path for the bf16 in-situ probe.
#
# The 07:51 probe launch hit a tunnel hang (log frozen at 'Folding
# global_step', same signature as the 05:33 stall). This script waits for
# that probe process to die (its `timeout 2400` bounds it), then loops the
# supervisor's preflight until the tunnel answers, retries the probe ONCE
# (bounded), and finally relaunches the supervisor whatever happened —
# training must not wait on a perf experiment. Survives the builder
# session dying (ADVICE round-4 handoff lessons: bounded waits, rc checks,
# explicit log offsets).
set -u
cd "$(dirname "$0")/.."

WORKDIR=workdirs/run_full1chip_c2
CFG='snap_tpu/configs/train_localization.py:scale=full1chip,pose_backend=exhaustive,pretrained_mapper=pretrained/loc_full1chip_r4,continue_step=7000'
PROBE_LOG=workdirs/run_full1chip_c2.bf16probe.log
DEADLINE_TS=1787146800  # 13:40 UTC: reserve the end window for the heads
HARD_END=$(( $(date +%s) + 14400 ))  # give up arming anything after 4 h

log() { echo "[relaunch $(date -u +%H:%M:%S)] $*"; }

# 1. Wait for the current (hung) probe attempt to exit; `timeout 2400`
# bounds it at ~08:31. Poll the pid from the process table via /proc.
CUR_PID=$(cat /tmp/bf16probe.pid 2>/dev/null || true)
if [ -n "${CUR_PID:-}" ] && [ -d "/proc/$CUR_PID" ]; then
  log "waiting for hung probe pid $CUR_PID (timeout-bounded)"
  while [ -d "/proc/$CUR_PID" ]; do
    if [ "$(date +%s)" -gt "$HARD_END" ]; then
      log 'hard end waiting for probe exit'; exit 1
    fi
    sleep 20
  done
fi
log 'probe process gone'

# 2. Did the first attempt actually produce step logs (tunnel came back
# mid-wait)? If it reached step 2100 there is a trace and no retry needed.
if grep -q 'trainer.py:572\] \[21' "$PROBE_LOG" 2>/dev/null; then
  log 'first probe attempt completed after all; no retry'
else
  # 3. Preflight loop: wait for the tunnel to answer (150 s bound each).
  log 'preflight loop until tunnel answers'
  while true; do
    if [ "$(date +%s)" -gt "$HARD_END" ]; then
      log 'hard end in preflight loop; relaunching supervisor anyway'
      break
    fi
    if timeout 170 python - <<'EOF' >/dev/null 2>&1
import jax
jax.devices()
import jax.numpy as jnp
print(float(jnp.ones(()) + 1))
EOF
    then
      log 'preflight ok; retrying bf16 probe once'
      SNAP_TPU_SCATTER_MODE=bf16 timeout 2400 python -m snap_tpu.train \
        --config="$CFG" --workdir="$WORKDIR" --stop_at_step=2100 \
        >> "$PROBE_LOG" 2>&1
      log "bf16 probe retry rc=$?"
      break
    fi
    log 'preflight failed; retry in 120s'
    sleep 120
  done
fi

# 4. Relaunch the supervisor unconditionally. Mode comes from
# results/run_full1chip_c2/scatter_selected.json (builder updates it from
# the traces if bf16 wins; until then it says direct).
log 'relaunching supervisor'
nohup python tools/run_supervisor.py \
  --workdir="$WORKDIR" \
  --config="$CFG" \
  --target_step=13000 --deadline_ts="$DEADLINE_TS" \
  --chunk=2000 --eval_every=2000 --eval_size=256 \
  --results_dir=results/run_full1chip_c2 \
  >> workdirs/supervisor_c2_r5.log 2>&1 &
echo $! > /tmp/supervisor.pid
log "supervisor relaunched pid $(cat /tmp/supervisor.pid)"
