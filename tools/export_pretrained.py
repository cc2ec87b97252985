"""Export a trained run's checkpoint as a committable pretrained mini-workdir.

Round 3 lost its full-scale training progress to a VM wipe because model
checkpoints live in the uncommitted ``workdirs/``. This exports the piece
that survives usefully in git, in exactly the layout the pretrained-subtree
protocol reads (``checkpoints.restore_params`` + ``config_load``; reference
analogue: snap/trainer.py:70-120, snap/models/bev_mapper.py:303-315).

Two export flavors:

- **params-only** (default, ~1/3 the size): a later round warm-starts the
  MODEL from it with fresh optimizer state, e.g.
    train_localization.py:scale=full1chip,pretrained_mapper=pretrained/<name>,continue_step=<step>
    train_semantics.py:pretrained_mapper=pretrained/<name>
  A params-only restart re-pays a measured ~1.5-nat InfoNCE transient while
  Adam moments and the learned temperature re-warm (round 4,
  results/run_full1chip_c2/train_curve.json).
- **--full-state**: the complete TrainState (params + Adam moments +
  model_state + rng) saved under the run's step. A later round continues
  EXACTLY by copying the export to a fresh workdir and resuming with the
  ORIGINAL config (no ``continue_step``): the trainer's placed restore picks
  up the step, schedule position, and optimizer moments bit-for-bit
  (reference resume semantics: snap/trainer.py:437-440).

``--effective-step`` renumbers the exported checkpoint (and its
``global_step`` leaf) when the source run's local step differs from the
recipe-schedule step — e.g. a continuation workdir at local step 500 that is
really at effective step 7500 of the 20k recipe. The checkpoint directory
number then matches ``continue_step``, and the config validates the two
against each other instead of silently building the wrong schedule tail.

Every export writes ``export.json`` provenance (source workdir/step,
effective step, flavor).

Usage: python tools/export_pretrained.py <workdir> <outdir>
         [--step=N] [--effective-step=M] [--full-state]
Runs on CPU; does not touch the accelerator.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The axon sitecustomize force-sets jax_platforms='axon,cpu' AFTER env
# vars are read (train.py:25-29 precedent); restore the user's explicit
# JAX_PLATFORMS so a CPU-only export never waits on a (possibly dead)
# device tunnel.
import os  # noqa: E402
import jax  # noqa: E402
if (_platforms := os.environ.get('JAX_PLATFORMS')):
  jax.config.update('jax_platforms', _platforms)


def main() -> None:
  ap = argparse.ArgumentParser()
  ap.add_argument('workdir')
  ap.add_argument('outdir')
  ap.add_argument('--step', type=int, default=None,
                  help='Source checkpoint step (default: latest).')
  ap.add_argument('--effective-step', type=int, default=None,
                  help='Renumber the export to this recipe-schedule step '
                       '(default: the source step).')
  ap.add_argument('--full-state', action='store_true',
                  help='Export the complete TrainState (optimizer moments '
                       'included) for an exact resume-style continuation.')
  args = ap.parse_args()

  import numpy as np

  from snap_tpu.train_lib import checkpoints

  workdir = pathlib.Path(args.workdir)
  outdir = pathlib.Path(args.outdir)
  state = checkpoints.restore_raw(workdir, args.step)
  src_step = (args.step if args.step is not None
              else checkpoints.latest_step(workdir))
  eff_step = (args.effective_step if args.effective_step is not None
              else src_step)

  if args.full_state:
    ckpt = dict(state)
    if 'global_step' in ckpt:
      # The schedule and sampling-rng folds read the state's own step leaf;
      # keep it consistent with the renumbered checkpoint directory.
      ckpt['global_step'] = np.asarray(
          eff_step, np.asarray(ckpt['global_step']).dtype)
  else:
    # A params-only dict: restore_params() returns it verbatim (it takes
    # the 'params' key of whatever the checkpoint holds).
    ckpt = {'params': state['params']}

  if outdir.exists():
    shutil.rmtree(outdir)
  checkpoints.save_checkpoint(outdir, ckpt, eff_step, max_to_keep=1)
  shutil.copy(workdir / 'config.yaml', outdir / 'config.yaml')

  import jax
  n = sum(p.size for p in jax.tree_util.tree_leaves(state['params']))
  (outdir / 'export.json').write_text(json.dumps(dict(
      source_workdir=str(workdir),
      source_step=int(src_step),
      effective_step=int(eff_step),
      full_state=bool(args.full_state),
      params_millions=round(n / 1e6, 2),
      exported_utc=time.strftime('%Y-%m-%d %H:%M:%S', time.gmtime()),
  ), indent=1))
  kind = 'full TrainState' if args.full_state else 'params only'
  print(f'exported step {src_step} (as {eff_step}, {kind}): '
        f'{n/1e6:.1f}M params -> {outdir}')


if __name__ == '__main__':
  main()
