"""Export a trained run's params as a committable pretrained mini-workdir.

Round 3 lost its full-scale training progress to a VM wipe because model
checkpoints live in the uncommitted ``workdirs/``. This exports the piece
that survives usefully in git: a params-only checkpoint (~1/3 the size of
the full TrainState — no Adam moments) plus the run's ``config.yaml``, in
exactly the layout the pretrained-subtree protocol reads
(``checkpoints.restore_params`` + ``config_load``; reference analogue:
snap/trainer.py:70-120, snap/models/bev_mapper.py:303-315).

A later round warm-starts from it with the existing recipe args, e.g.
  train_localization.py:scale=full1chip,pretrained_mapper=pretrained/<name>
  train_semantics.py:pretrained_mapper=pretrained/<name>

Usage: python tools/export_pretrained.py <workdir> <outdir> [--step=N]
Runs on CPU; does not touch the accelerator.
"""
from __future__ import annotations

import argparse
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
  ap = argparse.ArgumentParser()
  ap.add_argument('workdir')
  ap.add_argument('outdir')
  ap.add_argument('--step', type=int, default=None)
  args = ap.parse_args()

  from snap_tpu.train_lib import checkpoints

  workdir = pathlib.Path(args.workdir)
  outdir = pathlib.Path(args.outdir)
  state = checkpoints.restore_raw(workdir, args.step)
  step = args.step if args.step is not None else checkpoints.latest_step(
      workdir)
  params = state['params']
  if outdir.exists():
    shutil.rmtree(outdir)
  # A params-only dict: restore_params() returns it verbatim (it takes the
  # 'params' key of whatever the checkpoint holds).
  checkpoints.save_checkpoint(outdir, {'params': params}, step, max_to_keep=1)
  shutil.copy(workdir / 'config.yaml', outdir / 'config.yaml')
  n = sum(p.size for p in __import__('jax').tree_util.tree_leaves(params))
  print(f'exported step {step}: {n/1e6:.1f}M params -> {outdir}')


if __name__ == '__main__':
  main()
