#!/bin/bash
# Round-5 end window (12:00-13:10 UTC): the owed capability runs, tightest
# first, every step bounded. Assumes the supervisor already exited at the
# step-6000 boundary (tools/stop_after_6000.sh) and all head/eval graphs
# are AOT warm-compiled. Run: nohup bash tools/window_r5.sh & — the
# builder session commits artifacts between steps; if the session dies the
# script still produces everything on disk for the driver's end-of-round
# commit.
set -u
cd "$(dirname "$0")/.."
WORKDIR=workdirs/run_full1chip_c2
log() { echo "[window $(date -u +%H:%M:%S)] $*"; }

S=$(ls "$WORKDIR/checkpoints" | grep -E '^[0-9]+$' | sort -n | tail -1)
EFF=$((S + 7000))
log "final local step $S (effective $EFF)"

log 'export final mapper (CPU)'
JAX_PLATFORMS=cpu timeout 900 python tools/export_pretrained.py \
  "$WORKDIR" pretrained/loc_full1chip_r5 --step="$S" \
  --effective-step="$EFF" > /tmp/export_r5.log 2>&1
rc=$?
MAPPER=pretrained/loc_full1chip_r5
[ $rc -ne 0 ] && { log "export rc=$rc; fallback s7500"; MAPPER=pretrained/loc_full1chip_r4_s7500; }
log "heads adopt $MAPPER"

log 'semantics head: 1000 steps on the frozen trained mapper'
timeout 2400 python -m snap_tpu.train \
  --config="snap_tpu/configs/train_semantics.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4,log_summary_steps=20" \
  --workdir=workdirs/run_sem_head_r5 --stop_at_step=1000 \
  > workdirs/run_sem_head_r5.log 2>&1
log "semantics head rc=$?"

log 'offline semantics eval (256, zurich)'
timeout 1500 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_semantics.py:evaluation_size=256,batch_size=4' \
  --workdir=workdirs/run_sem_head_r5 --split=zurich \
  > workdirs/run_sem_head_r5.eval.log 2>&1
log "semantics eval rc=$?"

log 'occupancy head: 1000 steps on the frozen trained encoder'
timeout 2400 python -m snap_tpu.train \
  --config="snap_tpu/configs/train_occupancy.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4" \
  --workdir=workdirs/run_occ_head_r5 --stop_at_step=1000 \
  > workdirs/run_occ_head_r5.log 2>&1
log "occupancy head rc=$?"

log 'subcell-refinement A/B (zurich, 256, final checkpoint)'
timeout 1200 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,subcell=1,tag=-subcell' \
  --workdir="$WORKDIR" --split=zurich --checkpoint_step="$S" \
  > workdirs/subcell_ab.log 2>&1
log "subcell A/B rc=$?"

log 'eval-path stage profile'
timeout 1200 python tools/profile_eval.py results/profile_eval_r5 \
  > /tmp/profile_eval_r5.log 2>&1
log "profile_eval rc=$?"

log 'optional: 128-rotation eval (full-scale repeat of the r3 ablation)'
timeout 1200 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,num_rotations=128,tag=-rot128' \
  --workdir="$WORKDIR" --split=zurich --checkpoint_step="$S" \
  > workdirs/rot128_ab.log 2>&1
log "rot128 eval rc=$?"

touch /tmp/window_r5_done
log 'window complete'
