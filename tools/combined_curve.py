"""Combined held-out curve across the original run and its continuations.

Merges results/run_full1chip/heldout_curve.json (round 4, from-scratch,
steps are schedule steps) with results/run_full1chip_c2/heldout_curve.json
(round 5, params-only warm start at 7000; entries carry effective_step)
into one effective-step-ordered table — the honest view of the full-scale
schedule including the measured warm-start transient.

Usage: python tools/combined_curve.py [--json out.json]   (also prints md)
"""
from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
SOURCES = (
    ('run_full1chip (r4, from scratch)', 'results/run_full1chip/heldout_curve.json', 0),
    ('run_full1chip_c2 (r5, warm start @7000)', 'results/run_full1chip_c2/heldout_curve.json', 7000),
)


def main() -> None:
  rows = []
  for run, rel, default_off in SOURCES:
    p = REPO / rel
    if not p.exists():
      continue
    for e in json.loads(p.read_text()):
      eff = e.get('effective_step', e['step'] + default_off)
      rows.append({'run': run, 'effective_step': eff, **e})
  rows.sort(key=lambda r: (r['effective_step'], r['city']))

  if '--json' in sys.argv:
    out = pathlib.Path(sys.argv[sys.argv.index('--json') + 1])
    out.write_text(json.dumps(rows, indent=1))
    print(f'wrote {out}', file=sys.stderr)

  print('| eff. step | city | r@0.5m | r@1m | r@2m | r@5m | med err | '
        'rot@1° | rot@5° | run |')
  print('|---|---|---|---|---|---|---|---|---|---|')
  for r in rows:
    print(f"| {r['effective_step']} | {r['city']} "
          f"| {r['recall_0.5m']:.1%} | {r['recall_1.0m']:.1%} "
          f"| {r['recall_2.0m']:.1%} | {r['recall_5.0m']:.1%} "
          f"| {r['median_err_m']:.2f} m "
          f"| {r['recall_1.0deg']:.1%} | {r['recall_5.0deg']:.1%} "
          f"| {'r4' if 'r4' in r['run'] else 'r5'} |")


if __name__ == '__main__':
  main()
