#!/bin/bash
# Round-5 end-window handoff (session tooling): when the relaunched
# supervisor exits at its 13:40 deadline (or target), spend the remaining
# chip window on the owed capability demonstrations, in VERDICT priority
# order: export the final mapper, fine-tune BOTH heads on it (the round-4
# OOM is fixed by point_tile_eval on the adopted mapper config), offline
# semantics eval dump, then the full-scale rotation-fan ablation.
# ADVICE round-4 lessons applied: tail the supervisor log from this
# script's start offset, bound every wait, run dependencies in foreground
# and check rc.
set -u
cd "$(dirname "$0")/.."

SUPLOG=workdirs/supervisor_c2_r5.log
WORKDIR=workdirs/run_full1chip_c2
START_LINE=$(wc -l < "$SUPLOG")
HARD_END=$(date -u -d '2026-08-19 16:20' +%s)

log() { echo "[handoff5 $(date -u +%H:%M:%S)] $*"; }

log "waiting for supervisor exit (log line > $START_LINE)"
while ! tail -n +"$((START_LINE + 1))" "$SUPLOG" | grep -q 'exiting'; do
  if [ "$(date +%s)" -gt "$HARD_END" ]; then
    log 'hard end reached waiting for supervisor; aborting'; exit 1
  fi
  sleep 30
done
sleep 15  # let the supervisor process leave main()

S=$(ls "$WORKDIR/checkpoints" | grep -E '^[0-9]+$' | sort -n | tail -1)
EFF=$((S + 7000))
log "supervisor exited; latest local step $S (effective $EFF)"

log 'exporting final mapper params (CPU)'
JAX_PLATFORMS=cpu timeout 900 python tools/export_pretrained.py \
  "$WORKDIR" pretrained/loc_full1chip_r5 --step="$S" \
  --effective-step="$EFF" > /tmp/export_r5.log 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  log "export rc=$rc — falling back to the committed s7500 export"
  MAPPER=pretrained/loc_full1chip_r4_s7500
else
  MAPPER=pretrained/loc_full1chip_r5
fi
log "heads will adopt $MAPPER"

log 'held-out evals of the FINAL checkpoint first (skipped when the
supervisor already evaluated this step at a boundary)'
for CITY in zurich oslo; do
  if grep -q "\"step\": $S" results/run_full1chip_c2/heldout_curve.json \
      && grep -q "\"city\": \"$CITY\"" results/run_full1chip_c2/heldout_curve.json; then
    log "final eval $CITY already in the curve; skipping"
    continue
  fi
  timeout 1800 python -m snap_tpu.evaluate \
    --config="snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,tag=-s$S" \
    --workdir="$WORKDIR" --split="$CITY" --checkpoint_step="$S" \
    >> workdirs/final_eval.log 2>&1
  log "final eval $CITY rc=$?"
done

log 'semantics head fine-tune (1000 steps, frozen trained mapper)'
timeout 3000 python -m snap_tpu.train \
  --config="snap_tpu/configs/train_semantics.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4,log_summary_steps=20" \
  --workdir=workdirs/run_sem_head_r5 --stop_at_step=1000 \
  > workdirs/run_sem_head_r5.log 2>&1
log "semantics head rc=$?"

log 'offline semantics eval (256 examples)'
timeout 2400 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_semantics.py:evaluation_size=256,batch_size=4' \
  --workdir=workdirs/run_sem_head_r5 --split=zurich \
  > workdirs/run_sem_head_r5.eval.log 2>&1
log "semantics eval rc=$?"

log 'occupancy head fine-tune (1000 steps, frozen trained encoder)'
timeout 3000 python -m snap_tpu.train \
  --config="snap_tpu/configs/train_occupancy.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4" \
  --workdir=workdirs/run_occ_head_r5 --stop_at_step=1000 \
  > workdirs/run_occ_head_r5.log 2>&1
log "occupancy head rc=$?"

log 'eval-path profile (speed-of-light statement, VERDICT #6)'
timeout 2400 python tools/profile_eval.py results/profile_eval_r5 \
  > /tmp/profile_eval_r5.log 2>&1
log "profile_eval rc=$?"

log 'held-out eval of the committed s7500 export (VERDICT #3)'
timeout 1800 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,tag=-s7500export' \
  --workdir=pretrained/loc_full1chip_r4_s7500 --split=zurich \
  --checkpoint_step=7500 > workdirs/s7500_export_eval.log 2>&1
log "s7500 export eval rc=$?"

log 'subcell-refinement A/B on the final checkpoint (zurich, 256)'
timeout 1800 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,subcell=1,tag=-subcell' \
  --workdir="$WORKDIR" --split=zurich --checkpoint_step="$S" \
  > workdirs/subcell_ab.log 2>&1
log "subcell A/B rc=$?"

log 'rotation-fan ablation on the final full-scale checkpoint'
timeout 2700 python tools/rotation_ablation.py "$WORKDIR" zurich 256 4 \
  > /tmp/rotation_ablation_r5.log 2>&1
log "rotation ablation rc=$?"

touch /tmp/handoff_r5_done
log 'handoff complete'
