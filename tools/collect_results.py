"""Distill a training run into small committable artifacts.

Usage: python tools/collect_results.py <workdir> <outdir>

Writes to <outdir>:
  train_curve.json  — per-summary training metrics parsed from the log
                      (step, loss, recall@{0.5,1,2,5}m/deg, steps/sec).
  eval_curve.json   — the trainer's periodic held-out eval summaries.
  <city>_eval.json  — per-city offline evaluator results: metric means +
                      recall curves recomputed from the npz dump.
"""
import ast
import json
import pathlib
import re
import sys

import numpy as np


def parse_log(log_path: pathlib.Path):
  train, evals = [], []
  pat = re.compile(r'\[(\d+)( eval)?\] (\{.*\})\s*$')
  for line in log_path.read_text().splitlines():
    if 'trainer.py' not in line:
      continue
    m = pat.search(line)
    if not m:
      continue
    step, is_eval, payload = int(m.group(1)), bool(m.group(2)), m.group(3)
    try:
      d = ast.literal_eval(payload)
    except (ValueError, SyntaxError):
      continue
    d['step'] = step
    (evals if is_eval else train).append(d)
  return train, evals


def summarize_npz(npz_path: pathlib.Path):
  d = np.load(npz_path, allow_pickle=True)
  out = {'num_examples': int(next(iter(d.values())).shape[0]) if d else 0}
  for k in d.files:
    v = d[k]
    if v.dtype.kind == 'b':
      out[f'{k}_rate'] = float(np.mean(v))
    elif v.dtype.kind in 'fi':
      out[f'{k}_mean'] = float(np.mean(v))
      out[f'{k}_median'] = float(np.median(v))
  err = d['error_max_meter'] if 'error_max_meter' in d.files else None
  if err is not None:
    out['recall_at_m'] = {
        str(t): float(np.mean(err <= t)) for t in (0.5, 1.0, 2.0, 5.0)}
  err_r = d['error_max_deg'] if 'error_max_deg' in d.files else None
  if err_r is not None:
    out['recall_at_deg'] = {
        str(t): float(np.mean(err_r <= t)) for t in (0.5, 1.0, 2.0, 5.0)}
  return out


def main():
  workdir = pathlib.Path(sys.argv[1])
  outdir = pathlib.Path(sys.argv[2])
  outdir.mkdir(parents=True, exist_ok=True)

  log = workdir.with_suffix('.log')
  if not log.exists():
    log = workdir / 'train.log'
  if log.exists():
    train, evals = parse_log(log)
    (outdir / 'train_curve.json').write_text(json.dumps(train, indent=1))
    (outdir / 'eval_curve.json').write_text(json.dumps(evals, indent=1))
    print(f'{len(train)} train summaries, {len(evals)} eval summaries')

  for city_dir in sorted((workdir / 'evaluation').glob('*')):
    npz = city_dir / 'results.npz'
    if npz.exists():
      out = summarize_npz(npz)
      (outdir / f'{city_dir.name}.json').write_text(json.dumps(out, indent=1))
      print(f'{city_dir.name}: {out.get("recall_at_m")}')


if __name__ == '__main__':
  main()
