#!/bin/bash
# Round-5 end window, revised for the 11:25 tunnel stall: final training
# state is checkpoint 5500 (effective 12500). Preflight-loop until the
# tunnel answers, then run the owed demonstrations in VERDICT priority
# order with bounded timeouts, dropping from the bottom as the ~13:10
# hard end approaches. The builder session commits between steps; on
# session death the driver's end-of-round commit picks up the artifacts.
set -u
cd "$(dirname "$0")/.."
WORKDIR=workdirs/run_full1chip_c2
S=5500
EFF=12500
HARD_END=$(date -u -d '2026-08-19 13:12' +%s)
MAPPER=pretrained/loc_full1chip_r5
[ -d "$MAPPER/checkpoints" ] || MAPPER=pretrained/loc_full1chip_r4_s7500

log() { echo "[window $(date -u +%H:%M:%S)] $*"; }
left() { echo $(( HARD_END - $(date +%s) )); }

log 'preflight loop until the tunnel answers'
while true; do
  if [ "$(left)" -lt 300 ]; then log 'no tunnel before hard end'; exit 1; fi
  if timeout 170 python -c "
import jax
jax.config.update('jax_platforms', 'axon')
import jax.numpy as jnp
print(float(jnp.ones(()) + 1))" >/dev/null 2>&1; then
    log 'tunnel answers'; break
  fi
  log 'preflight failed; retry in 90s'
  sleep 90
done

log "final held-out evals at step $S (eff $EFF)"
for CITY in zurich oslo; do
  [ "$(left)" -lt 2700 ] && { log 'skipping remaining final evals (time)'; break; }
  timeout 1500 python -m snap_tpu.evaluate \
    --config="snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,tag=-s$S" \
    --workdir="$WORKDIR" --split="$CITY" --checkpoint_step="$S" \
    >> workdirs/final_eval.log 2>&1
  log "final eval $CITY rc=$?"
done

if [ "$(left)" -gt 2100 ]; then
  log "semantics head: 1000 steps on $MAPPER"
  timeout 2100 python -m snap_tpu.train \
    --config="snap_tpu/configs/train_semantics.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4,log_summary_steps=20" \
    --workdir=workdirs/run_sem_head_r5 --stop_at_step=1000 \
    > workdirs/run_sem_head_r5.log 2>&1
  log "semantics head rc=$?"
fi

if [ "$(left)" -gt 1200 ]; then
  log 'offline semantics eval (256, zurich)'
  timeout 1100 python -m snap_tpu.evaluate \
    --config='snap_tpu/configs/eval_semantics.py:evaluation_size=256,batch_size=4' \
    --workdir=workdirs/run_sem_head_r5 --split=zurich \
    > workdirs/run_sem_head_r5.eval.log 2>&1
  log "semantics eval rc=$?"
fi

if [ "$(left)" -gt 1500 ]; then
  log "occupancy head: 1000 steps on $MAPPER"
  timeout 1500 python -m snap_tpu.train \
    --config="snap_tpu/configs/train_occupancy.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4" \
    --workdir=workdirs/run_occ_head_r5 --stop_at_step=1000 \
    > workdirs/run_occ_head_r5.log 2>&1
  log "occupancy head rc=$?"
fi

if [ "$(left)" -gt 700 ]; then
  log 'subcell A/B (zurich, 256)'
  timeout 700 python -m snap_tpu.evaluate \
    --config='snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,subcell=1,tag=-subcell' \
    --workdir="$WORKDIR" --split=zurich --checkpoint_step="$S" \
    > workdirs/subcell_ab.log 2>&1
  log "subcell A/B rc=$?"
fi

if [ "$(left)" -gt 400 ]; then
  log 'eval-path stage profile'
  timeout 400 python tools/profile_eval.py results/profile_eval_r5 \
    > /tmp/profile_eval_r5.log 2>&1
  log "profile_eval rc=$?"
fi

touch /tmp/window_r5_done
log 'window complete'
