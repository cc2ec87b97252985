"""Aggregate device op durations from a jax.profiler trace directory.

Usage: python tools/parse_trace.py /tmp/profile_eval [top_n]
Reads the newest *.trace.json.gz under the dir, sums durations of XLA-op
events on TPU device tracks, groups by fusion/op name prefix, prints the
top entries with total ms and share.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def main():
  root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/profile_eval'
  top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
  paths = sorted(
      glob.glob(os.path.join(root, '**', '*.trace.json.gz'), recursive=True),
      key=os.path.getmtime)
  if not paths:
    sys.exit(f'no trace under {root}')
  path = paths[-1]
  with gzip.open(path, 'rt') as f:
    data = json.load(f)
  events = data.get('traceEvents', [])

  # Identify device-thread pids: process names containing 'TPU' / 'device'.
  proc_names = {}
  for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
      proc_names[e['pid']] = e['args'].get('name', '')
  device_pids = {
      pid for pid, name in proc_names.items()
      if re.search(r'TPU|/device|Device', name) and 'host' not in name.lower()
  }

  tot = collections.Counter()
  cnt = collections.Counter()
  wall = 0.0
  for e in events:
    if e.get('ph') != 'X' or e.get('pid') not in device_pids:
      continue
    dur = e.get('dur', 0)
    name = e.get('name', '')
    wall += dur
    # Strip uniquifying suffixes: fusion.123 -> fusion, keep hlo op category.
    base = re.sub(r'[.\d]+$', '', name)
    tot[base] += dur
    cnt[base] += 1

  print(f'trace: {path}')
  print(f'total device-op time: {wall/1e3:.1f} ms (sum over tracks)')
  print(f'{"op":58s} {"ms":>9s} {"share":>6s} {"count":>6s}')
  for name, dur in tot.most_common(top_n):
    print(f'{name[:58]:58s} {dur/1e3:9.2f} {dur/wall*100:5.1f}% {cnt[name]:6d}')


if __name__ == '__main__':
  main()
