#!/bin/bash
# Round-5 tail window: the 13:04 run_occ_head_r5 trained its head on a
# frozen RANDOM encoder — StreetViewEncoder.__post_init__'s config merge
# let the export's pretrained_path=None clobber the live adoption pointer
# (fixed in streetview_encoder.py the same hour). If the tunnel answers
# again before the round is cut, re-run the occupancy head with the fix
# (adoption now logs 'Updating 167 variable(s)'), then the subcell A/B
# that the 13:12 gate dropped. Bounded; on session death the driver's
# end-of-round commit picks up artifacts.
set -u
cd "$(dirname "$0")/.."
MAPPER=pretrained/loc_full1chip_r5
WORKDIR=workdirs/run_full1chip_c2
S=5500
GIVE_UP=$(( $(date +%s) + 7200 ))

log() { echo "[r5c $(date -u +%H:%M:%S)] $*"; }

log 'preflight loop until the tunnel answers (give up after 2h)'
while true; do
  if [ "$(date +%s)" -gt "$GIVE_UP" ]; then log 'gave up: no tunnel'; exit 1; fi
  if timeout 170 python -c "
import jax
jax.config.update('jax_platforms', 'axon')
import jax.numpy as jnp
print(float(jnp.ones(()) + 1))" >/dev/null 2>&1; then
    log 'tunnel answers'; break
  fi
  sleep 90
done

log "occupancy head (fixed adoption): 1000 steps on $MAPPER"
rm -rf workdirs/run_occ_head_r5b
timeout 1800 python -m snap_tpu.train \
  --config="snap_tpu/configs/train_occupancy.py:scale=small,pretrained_mapper=$MAPPER,batch_size=4" \
  --workdir=workdirs/run_occ_head_r5b --stop_at_step=1000 \
  > workdirs/run_occ_head_r5b.log 2>&1
log "occupancy head rc=$?"
grep -c 'Updating 167' workdirs/run_occ_head_r5b.log >/dev/null \
  && log 'adoption VERIFIED (167 vars)' || log 'adoption line MISSING'
mkdir -p results/run_occ_head_r5b
grep -E "trainer.py:(572|606)" workdirs/run_occ_head_r5b.log \
  | grep -oE "\[[0-9]+( eval)?\] \{.*\}" \
  > results/run_occ_head_r5b/train_log_metrics.txt

log 'subcell A/B (zurich, 256)'
timeout 900 python -m snap_tpu.evaluate \
  --config='snap_tpu/configs/eval_localization.py:evaluation_size=256,batch_size=4,point_tile_eval=288000,subcell=1,tag=-subcell' \
  --workdir="$WORKDIR" --split=zurich --checkpoint_step="$S" \
  > workdirs/subcell_ab.log 2>&1
log "subcell A/B rc=$?"

touch /tmp/window_r5c_done
log 'window complete'
