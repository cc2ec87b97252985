#!/bin/bash
# Round-5 final window (fallback, self-contained): waits for the supervised
# run toward local step 13000 (= effective 20000) to finish, then runs the
# final 256-example held-out evals, exports the final params, and re-runs
# both heads on the final mapper — the semantics head now sees the FIXED
# band-partitioned GT labels (commit 8295f09), which should un-zero the
# exclusive-class recalls. Survives builder-session death (window_r5c.sh
# precedent); an interactive builder claims the window by touching
# /tmp/window_r5d_claimed, in which case this script exits untouched.
set -u
cd "$(dirname "$0")/.."
WORKDIR=workdirs/run_full1chip_c2
CKPTS=$WORKDIR/checkpoints
SUPLOG=workdirs/supervisor_c2_r5.log
HARD_END=$(date -u -d '2026-08-20 02:00:00 UTC' +%s)
left() { echo $(( HARD_END - $(date +%s) )); }
log() { echo "[r5d $(date -u +%H:%M:%S)] $*"; }

log 'waiting for the supervisor to finish (target 13000 / deadline / stop)'
while true; do
  [ -e /tmp/window_r5d_claimed ] && { log 'claimed by interactive builder'; exit 0; }
  [ "$(left)" -lt 3600 ] && { log 'hard end near; proceeding with latest step'; break; }
  [ -d "$CKPTS/13000" ] && { log 'target checkpoint present'; break; }
  tail -1 "$SUPLOG" | grep -q 'exiting' && { log 'supervisor exited'; break; }
  sleep 120
done
# Give a still-running final eval pair time to finish before stepping in.
sleep 30
[ -e /tmp/window_r5d_claimed ] && { log 'claimed by interactive builder'; exit 0; }
touch /tmp/window_r5d_claimed   # claim it ourselves: one driver only

S=$(ls "$CKPTS" | grep -E '^[0-9]+$' | sort -n | tail -1)
EFF=$(( S + 7000 ))
log "latest checkpoint: local $S = effective $EFF"

for CITY in zurich oslo; do
  DUMP=$WORKDIR/evaluation/$CITY-synthetic_eval-s$S/results.npz
  if [ -f "$DUMP" ]; then log "final eval $CITY already present"; continue; fi
  [ "$(left)" -lt 900 ] && { log 'out of time before final evals'; break; }
  log "final eval: $CITY @ step $S"
  timeout 1500 python -m snap_tpu.evaluate \
    --config="snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,tag=-s$S" \
    --workdir=$WORKDIR --split=$CITY --checkpoint_step=$S \
    >> workdirs/final_eval_r5d.log 2>&1
  log "final eval $CITY rc=$?"
done

EXPORT=pretrained/loc_full1chip_r5_final
if [ ! -d "$EXPORT" ] && [ "$(left)" -gt 600 ]; then
  log "export: $EXPORT (params only, stamped effective $EFF)"
  timeout 600 python tools/export_pretrained.py $WORKDIR $EXPORT \
    --step=$S --effective-step=$EFF >> workdirs/final_eval_r5d.log 2>&1
  log "export rc=$?"
fi
MAPPER=$EXPORT; [ -d "$EXPORT" ] || MAPPER=pretrained/loc_full1chip_r5

if [ "$(left)" -gt 2400 ]; then
  log "semantics head on FIXED GT labels: 1000 steps on $MAPPER"
  rm -rf workdirs/run_sem_head_r5d
  timeout 2100 python -m snap_tpu.train \
    --config="snap_tpu/configs/train_semantics.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4,log_summary_steps=20" \
    --workdir=workdirs/run_sem_head_r5d --stop_at_step=1000 \
    > workdirs/run_sem_head_r5d.log 2>&1
  log "semantics head rc=$?"
  mkdir -p results/run_sem_head_r5d
  grep -E "trainer.py:(572|606)" workdirs/run_sem_head_r5d.log \
    | grep -oE "\[[0-9]+( eval)?\] \{.*\}" \
    > results/run_sem_head_r5d/train_log_metrics.txt
fi

if [ "$(left)" -gt 1200 ]; then
  log 'offline semantics eval (256, zurich)'
  timeout 1100 python -m snap_tpu.evaluate \
    --config='snap_tpu/configs/eval_semantics.py:evaluation_size=256,batch_size=4' \
    --workdir=workdirs/run_sem_head_r5d --split=zurich \
    > workdirs/run_sem_head_r5d.eval.log 2>&1
  log "semantics eval rc=$?"
  DUMP=$(ls workdirs/run_sem_head_r5d/evaluation/*/results.npz 2>/dev/null | head -1)
  [ -n "$DUMP" ] && cp "$DUMP" results/run_sem_head_r5d/zurich_eval_results.npz
fi

if [ "$(left)" -gt 1800 ]; then
  log "occupancy head on the final mapper: 1000 steps on $MAPPER"
  rm -rf workdirs/run_occ_head_r5d
  timeout 1500 python -m snap_tpu.train \
    --config="snap_tpu/configs/train_occupancy.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4" \
    --workdir=workdirs/run_occ_head_r5d --stop_at_step=1000 \
    > workdirs/run_occ_head_r5d.log 2>&1
  log "occupancy head rc=$?"
  mkdir -p results/run_occ_head_r5d
  grep -E "trainer.py:(572|606)" workdirs/run_occ_head_r5d.log \
    | grep -oE "\[[0-9]+( eval)?\] \{.*\}" \
    > results/run_occ_head_r5d/train_log_metrics.txt
fi

log 'rotation conditional on the final dumps (CPU)'
timeout 600 python tools/rotation_conditional.py \
  $WORKDIR results/run_full1chip_c2/rotation_conditional.json \
  >> workdirs/final_eval_r5d.log 2>&1 || log 'rotation_conditional rc!=0'

touch /tmp/window_r5d_done
log 'window complete'
