"""Rotation-recall ablation on a trained checkpoint (round-2 verdict #3).

Runs the offline evaluator on the same checkpoint under three dense-backend
rotation configurations and reports recall@{0.5,1,2}° / @{0.5,1,2} m:

- ``fan5``: 64 coarse rotations + a single ±5° fan (0.25° step) — the
  default; a wrong coarse bin (5.625° bins) is unrecoverable.
- ``two_stage``: 64 rotations + a re-centered two-stage fan
  (±11° @ 1° then ±1.25° @ 0.125°) — reaches ±2 coarse bins.
- ``rot128``: 128 coarse rotations (2.8125° bins) + the single fan.

Measured outcome on the 20k-step run_small checkpoint
(results/run_small/rotation_ablation.json, recorded under the old labels
r2fan/default=two-stage/rot128): all three are statistically identical —
rotation outliers are wrong-mode score-landscape failures, not coarse-bin
quantization, so the fast single fan is the shipped default.

Reference refinement budget: snap/models/pose_estimation.py:168-205.

Usage:
  python tools/rotation_ablation.py [workdir] [cities] [eval_size] [batch]
  # defaults: workdirs/run_small zurich,oslo 256 8
Writes results/<workdir_name>/rotation_ablation.json.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, '.')

VARIANTS = {
    # Stages pinned explicitly: '' would inherit the *workdir's recorded*
    # stages (evaluator merge: experiment config > library default), which
    # for runs launched under the old two-stage default would mislabel the
    # variant AND overwrite the headline dump with a non-single-fan run.
    'fan5': dict(num_rotations=0, refinement_stages='5x0.25'),
    'two_stage': dict(
        num_rotations=0, refinement_stages='11x1+1.25x0.125'),
    'rot128': dict(num_rotations=128, refinement_stages=''),
}
DEG_THRESHOLDS = (0.5, 1.0, 2.0)
M_THRESHOLDS = (0.5, 1.0, 2.0)


def summarize(results) -> dict:
  deg = np.asarray(results['error_max_deg'])
  met = np.asarray(results['error_max_meter'])
  out = {}
  for t in DEG_THRESHOLDS:
    out[f'recall_{t}deg'] = round(float((deg < t).mean()) * 100, 2)
  for t in M_THRESHOLDS:
    out[f'recall_{t}m'] = round(float((met < t).mean()) * 100, 2)
  out['median_deg'] = round(float(np.median(deg)), 3)
  out['mean_deg'] = round(float(np.mean(deg)), 3)
  out['median_m'] = round(float(np.median(met)), 3)
  out['num_examples'] = int(deg.shape[0])
  return out


def main():
  workdir = sys.argv[1] if len(sys.argv) > 1 else 'workdirs/run_small'
  cities = (sys.argv[2] if len(sys.argv) > 2 else 'zurich,oslo').split(',')
  eval_size = int(sys.argv[3]) if len(sys.argv) > 3 else 256
  batch = int(sys.argv[4]) if len(sys.argv) > 4 else 8

  from snap_tpu import evaluator
  from snap_tpu.configs import eval_localization

  report = {'workdir': workdir, 'eval_size': eval_size, 'variants': {}}
  for name, overrides in VARIANTS.items():
    args = f'evaluation_size={eval_size},batch_size={batch}'
    if overrides['num_rotations']:
      args += f",num_rotations={overrides['num_rotations']}"
    if overrides['refinement_stages']:
      args += f",refinement_stages={overrides['refinement_stages']}"
    config = eval_localization.get_config(args)
    with config.unlocked():
      config.workdir = workdir
      config.data.split = ','.join(cities)
      # fan5 is the shipped default config -> it doubles as the headline
      # ('' tag) dump; the others are tagged ablation dumps.
      config.tag = '' if name == 'fan5' else f'-rotabl-{name}'
      # The headline ('') dump may predate this checkpoint; force recompute
      # so every variant evaluates the same (latest) step.
      config.overwrite = True
    per_city = {}
    for city, (results, dump_config) in evaluator.run(config).items():
      per_city[city] = summarize(results)
      per_city[city]['checkpoint_step'] = dump_config.get(
          'eval_checkpoint_step')
    report['variants'][name] = dict(config=overrides, cities=per_city)
    print(json.dumps({name: per_city}), flush=True)

  out_dir = pathlib.Path('results') / pathlib.Path(workdir).name
  out_dir.mkdir(parents=True, exist_ok=True)
  out_path = out_dir / 'rotation_ablation.json'
  out_path.write_text(json.dumps(report, indent=2))
  print(f'wrote {out_path}')


if __name__ == '__main__':
  main()
