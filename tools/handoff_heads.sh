#!/bin/bash
# One-shot end-of-round handoff (session tooling, round 4):
# when the supervised c2 chunk finishes (step-500 checkpoint saved), stop the
# supervisor before it starts a held-out eval it cannot finish in the window,
# export the continuation params for the next round's warm start, and spend
# the remaining chip time on the never-exercised heads-on-trained-mapper run
# (VERDICT round-3 item #10).
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chunk exited" workdirs/supervisor_c2.log 2>/dev/null; do
  sleep 10
done
touch workdirs/run_full1chip_c2/SUPERVISOR_STOP
echo "[handoff $(date -u +%H:%M:%S)] supervisor stopped"

# Params-only export on CPU, in parallel with the heads run below.
JAX_PLATFORMS=cpu python tools/export_pretrained.py \
  workdirs/run_full1chip_c2 pretrained/loc_full1chip_r4_s7500 --step=500 \
  > /tmp/export_c2.log 2>&1 &

sleep 15  # let the supervisor's last preflight/eval child die
python -m snap_tpu.train \
  --config='snap_tpu/configs/train_semantics.py:scale=small,pretrained_mapper=pretrained/loc_full1chip_r4,batch_size=4,log_summary_steps=20' \
  --workdir=workdirs/run_sem_head --stop_at_step=100 \
  > workdirs/run_sem_head.log 2>&1
echo "[handoff $(date -u +%H:%M:%S)] heads run rc=$?" | tee /tmp/heads_done
