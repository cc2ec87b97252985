"""Conditional rotation-recall analysis over held-out eval dumps.

Round-3 established (results/run_small/rotation_failure_analysis.json) that
rotation outliers are joint wrong-mode localizations, not a rotation-specific
estimation failure: eval-side refinement ablations (finer fans, 128 coarse
rotations) moved nothing. This tool quantifies the training-side view of the
same effect on a run's held-out dumps: rotation recall *conditioned on the
position being right* vs unconditional. If P(rot<=t | pos<=1m) is high and
rising while the unconditional P(rot<=t) is low, the rotation gap is the
localization mode-selection gap — closing recall@1m closes recall@1deg.

Usage: python tools/rotation_conditional.py <workdir> [out.json]
Scans <workdir>/evaluation/*-s<step>/results.npz (the supervisor's
step-qualified held-out dumps) and prints/writes one row per (step, city).

Metric definitions match the reference (snap/models/bev_localizer.py:262-277):
error_max_meter / error_max_deg are the position/rotation errors of the
best-scoring pose.
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

import numpy as np


def analyze_dump(npz_path: pathlib.Path) -> dict:
  d = np.load(npz_path, allow_pickle=True)
  em = np.asarray(d['error_max_meter'], dtype=np.float64)
  ed = np.asarray(d['error_max_deg'], dtype=np.float64)
  pos_ok = em <= 1.0
  out = {
      'num_examples': int(em.shape[0]),
      'num_pos_1m': int(pos_ok.sum()),
      'recall_pos_1m': float(pos_ok.mean()),
  }
  for t in (1.0, 5.0):
    out[f'recall_rot_{t:g}deg'] = float((ed <= t).mean())
    out[f'recall_rot_{t:g}deg_given_pos_1m'] = (
        float((ed[pos_ok] <= t).mean()) if pos_ok.any() else None)
    out[f'recall_rot_{t:g}deg_given_pos_gt5m'] = (
        float((ed[em > 5.0] <= t).mean()) if (em > 5.0).any() else None)
  return out


def main() -> None:
  workdir = pathlib.Path(sys.argv[1])
  rows = []
  pat = re.compile(r'^(?P<city>.+?)-[^-]+-s(?P<step>\d+)$')
  for dump_dir in sorted((workdir / 'evaluation').glob('*-s*')):
    m = pat.match(dump_dir.name)
    npz = dump_dir / 'results.npz'
    if not m or not npz.exists():
      continue
    rows.append({'step': int(m.group('step')), 'city': m.group('city'),
                 **analyze_dump(npz)})
  rows.sort(key=lambda r: (r['step'], r['city']))
  text = json.dumps(rows, indent=1)
  if len(sys.argv) > 2:
    pathlib.Path(sys.argv[2]).write_text(text)
  print(text)


if __name__ == '__main__':
  main()
