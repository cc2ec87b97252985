"""Per-step category breakdown of a jax.profiler trace (TPU device lane).

Unlike tools/parse_trace.py (flat op histogram over every device track,
which double-counts program- and while-wrapper spans), this reads only the
'XLA Ops' lane, drops `while` wrapper spans (their bodies are recorded as
siblings on the same lane), normalizes by the number of real steps (Steps
lane, spans > 1 s), and buckets leaf ops into model-stage categories with
both device time and HBM bytes_accessed — the two axes that decide whether
a step is compute- or bandwidth-bound (v5e: ~197 bf16 TFLOP/s, ~819 GB/s).

Usage: python tools/analyze_train_trace.py <profile_dir> [top_fusions]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

CATEGORIES = (
    ('fft', r'^fft'),
    ('convolution', r'convolution|^conv'),
    ('matmul', r'^dot'),
    ('gather/scatter', r'gather|scatter|dynamic-slice|dynamic-update'),
    ('sort/topk', r'^sort|top-k'),
    ('copy/layout', r'^copy|transpose|bitcast|^reshape|^pad($|\.)|^slice'),
    ('reduce', r'reduce(?!-scatter)'),
    ('allreduce/collective', r'all-reduce|all-gather|reduce-scatter|collective'),
    ('rng', r'rng|threefry'),
)


def load_events(root):
  paths = sorted(
      glob.glob(os.path.join(root, '**', '*.trace.json.gz'), recursive=True),
      key=os.path.getmtime)
  if not paths:
    sys.exit(f'no trace under {root}')
  with gzip.open(paths[-1], 'rt') as f:
    return paths[-1], json.load(f)['traceEvents']


def main():
  root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/profile_train'
  top_fusions = int(sys.argv[2]) if len(sys.argv) > 2 else 15
  path, events = load_events(root)

  tpu_pids = {
      e['pid'] for e in events
      if e.get('ph') == 'M' and e.get('name') == 'process_name'
      and 'TPU' in e['args'].get('name', '')}
  lanes = {
      (e['pid'], e['tid']): e['args']['name'] for e in events
      if e.get('ph') == 'M' and e.get('name') == 'thread_name'
      and e['pid'] in tpu_pids}
  op_lanes = {k for k, v in lanes.items() if v == 'XLA Ops'}
  step_lanes = {k for k, v in lanes.items() if v == 'Steps'}

  steps = [e['dur'] for e in events
           if e.get('ph') == 'X' and (e.get('pid'), e.get('tid')) in step_lanes
           and e['dur'] > 1e6]  # full train steps only (> 1 s)
  n_steps = max(len(steps), 1)

  cat_dur = collections.Counter()
  cat_bytes = collections.Counter()
  fus_dur = collections.Counter()
  fus_shape = {}
  total_dur = 0.0
  total_bytes = 0
  for e in events:
    if e.get('ph') != 'X' or (e.get('pid'), e.get('tid')) not in op_lanes:
      continue
    name = e.get('name', '')
    if name.startswith('while'):
      continue  # wrapper: body ops are siblings on this lane
    dur = e.get('dur', 0)
    args = e.get('args', {})
    nbytes = int(args.get('bytes_accessed', 0) or 0)
    total_dur += dur
    total_bytes += nbytes
    for cat, pat in CATEGORIES:
      if re.search(pat, name):
        cat_dur[cat] += dur
        cat_bytes[cat] += nbytes
        break
    else:
      cat_dur['elementwise-fusion/other'] += dur
      cat_bytes['elementwise-fusion/other'] += nbytes
      base = args.get('deduplicated_name') or re.sub(r'[.\d]+$', '', name)
      fus_dur[base] += dur
      if base not in fus_shape:
        long = args.get('long_name', '')
        m = re.match(r'%\S+ = (\S+)', long)
        fus_shape[base] = m.group(1)[:48] if m else ''

  print(f'trace: {path}')
  print(f'{len(steps)} full steps, mean {sum(steps)/n_steps/1e6:.3f} s; '
        f'device-op time {total_dur/1e3/n_steps:.0f} ms/step; '
        f'HBM traffic {total_bytes/n_steps/2**30:.1f} GiB/step '
        f'= {total_bytes/1e9/(sum(steps)/1e6 or 1):.0f} GB/s effective')
  print(f'{"category":28s} {"ms/step":>9s} {"share":>6s} {"GiB/step":>9s}')
  for cat, dur in cat_dur.most_common():
    print(f'{cat:28s} {dur/1e3/n_steps:9.1f} {dur/total_dur*100:5.1f}% '
          f'{cat_bytes[cat]/n_steps/2**30:9.2f}')
  print(f'\ntop uncategorized fusions (ms/step, output shape):')
  for base, dur in fus_dur.most_common(top_fusions):
    print(f'  {dur/1e3/n_steps:8.1f}  {base[:40]:40s} {fus_shape[base]}')


if __name__ == '__main__':
  main()
