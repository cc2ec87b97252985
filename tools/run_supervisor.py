"""Resilient single-chip training supervisor for a shared/flaky TPU tunnel.

Round 3 lost ~5 h of its full-scale training run to a tunnel outage (the
training client hung and nothing restarted it). This supervisor makes the
run self-healing: it trains in resumable chunks and survives both outages
and hangs.

Per iteration:
  1. preflight — a tiny jitted matmul in a bounded subprocess; a dead
     tunnel fails in seconds instead of hanging a 50-minute chunk;
  2. train one chunk — ``snap_tpu.train --stop_at_step=<boundary>`` in a
     fresh process (HBM-tight steps need one; see docs/PERFORMANCE.md),
     watched by a log-growth watchdog that SIGKILLs the process group on
     stall (blocked tunnel clients ignore SIGTERM);
  3. held-out offline evals at eval-cadence boundaries, each dumped under
     a step-qualified tag so cadence evals never collide, and summarized
     into ``<results>/heldout_curve.json``.

Stop early by touching ``<workdir>/SUPERVISOR_STOP`` (the current chunk is
killed; checkpoints bound the loss to <checkpoint_steps steps). All child
processes run in their own process group and are killed by pgid only —
never by name pattern.

Usage:
  python tools/run_supervisor.py --workdir=workdirs/run_full1chip \
    --config='snap_tpu/configs/train_localization.py:scale=full1chip,pose_backend=exhaustive' \
    --target_step=20000 --deadline_ts=<epoch seconds>
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

PREFLIGHT_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((512, 512), jnp.bfloat16);"
    "(x @ x).block_until_ready();"
    "print('preflight ok', jax.devices()[0])"
)


def log(msg: str) -> None:
  print(f'[supervisor {time.strftime("%H:%M:%S")}] {msg}', flush=True)


def kill_group(proc: subprocess.Popen) -> None:
  try:
    os.killpg(proc.pid, signal.SIGKILL)
  except ProcessLookupError:
    pass
  proc.wait()


def run_watched(cmd: list[str], log_path: pathlib.Path, *,
                stall_secs: float, hard_timeout: float,
                stop_file: pathlib.Path, deadline: float) -> int:
  """Run cmd in its own process group; kill on log stall/stop/deadline.

  Returns the exit code, or -9 if killed. Progress = the log file growing
  (summaries appear every log_summary_steps; stall_secs must cover the
  first-step XLA compile).
  """
  with log_path.open('ab') as f:
    f.write(f'\n===== supervisor: {" ".join(cmd)} =====\n'.encode())
    f.flush()
    proc = subprocess.Popen(
        cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
        start_new_session=True)
  start = time.monotonic()
  last_size, last_growth = -1, time.monotonic()
  while True:
    rc = proc.poll()
    if rc is not None:
      return rc
    now = time.monotonic()
    size = log_path.stat().st_size
    if size != last_size:
      last_size, last_growth = size, now
    reason = None
    if stop_file.exists():
      reason = 'stop file'
    elif time.time() > deadline:
      reason = 'deadline'
    elif now - last_growth > stall_secs:
      reason = f'log stalled {stall_secs:.0f}s'
    elif now - start > hard_timeout:
      reason = f'hard timeout {hard_timeout:.0f}s'
    if reason:
      log(f'killing pgid {proc.pid}: {reason}')
      kill_group(proc)
      return -9
    time.sleep(20)


def preflight(timeout: float = 150.0) -> bool:
  try:
    proc = subprocess.Popen(
        [sys.executable, '-c', PREFLIGHT_SRC], cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    try:
      return proc.wait(timeout=timeout) == 0
    except subprocess.TimeoutExpired:
      kill_group(proc)
      return False
  except OSError as e:
    log(f'preflight failed to launch: {e}')
    return False


def latest_step(workdir: pathlib.Path) -> int:
  ckpt = workdir / 'checkpoints'
  if not ckpt.is_dir():
    return 0
  steps = [int(p.name) for p in ckpt.iterdir()
           if p.name.isdigit() and (p / 'default').exists()]
  return max(steps, default=0)


def summarize_dump(npz_path: pathlib.Path) -> dict:
  import numpy as np
  d = np.load(npz_path, allow_pickle=True)
  out = {'num_examples': int(next(iter(d.values())).shape[0])}
  for key, name in (('error_max_meter', 'm'), ('error_max_deg', 'deg')):
    if key in d.files:
      err = d[key]
      out[f'median_err_{name}'] = float(np.median(err))
      out[f'mean_err_{name}'] = float(np.mean(err))
      for t in (0.5, 1.0, 2.0, 5.0):
        out[f'recall_{t}{name}'] = float(np.mean(err <= t))
  if 'recall_top1' in d.files:
    out['recall_top1'] = float(np.mean(d['recall_top1']))
  return out


def main() -> None:
  ap = argparse.ArgumentParser()
  ap.add_argument('--workdir', required=True)
  ap.add_argument('--config', required=True)
  ap.add_argument('--target_step', type=int, required=True)
  ap.add_argument('--deadline_ts', type=float, required=True)
  ap.add_argument('--chunk', type=int, default=1000)
  ap.add_argument('--eval_every', type=int, default=2000)
  ap.add_argument('--eval_size', type=int, default=256)
  ap.add_argument('--eval_batch', type=int, default=4)
  ap.add_argument('--eval_cities', default='zurich,oslo')
  ap.add_argument('--point_tile_eval', type=int, default=288_000)
  ap.add_argument('--eval_config',
                  default='snap_tpu/configs/eval_localization.py')
  ap.add_argument('--results_dir', default='results/run_full1chip')
  ap.add_argument('--train_stall_secs', type=float, default=1800.0)
  ap.add_argument('--retry_secs', type=float, default=180.0)
  args = ap.parse_args()

  workdir = REPO / args.workdir
  results_dir = REPO / args.results_dir
  results_dir.mkdir(parents=True, exist_ok=True)
  stop_file = workdir / 'SUPERVISOR_STOP'
  train_log = workdir.parent / f'{workdir.name}.log'
  curve_path = results_dir / 'heldout_curve.json'
  curve = json.loads(curve_path.read_text()) if curve_path.exists() else []
  evaluated = {(e['step'], e['city']) for e in curve}

  def eval_boundary_due(step: int) -> list[int]:
    return [s for s in range(args.eval_every, step + 1, args.eval_every)
            if any((s, c) not in evaluated
                   for c in args.eval_cities.split(','))]

  def run_evals(step: int) -> None:
    for city in args.eval_cities.split(','):
      if (step, city) in evaluated:
        continue
      if time.time() > args.deadline_ts or stop_file.exists():
        return
      cfg = (f'{args.eval_config}:evaluation_size={args.eval_size},'
             f'batch_size={args.eval_batch},'
             f'point_tile_eval={args.point_tile_eval},tag=-s{step}')
      cmd = [sys.executable, '-m', 'snap_tpu.evaluate', f'--config={cfg}',
             f'--workdir={workdir}', f'--split={city}',
             f'--checkpoint_step={step}']
      eval_log = workdir.parent / f'{workdir.name}.eval.log'
      log(f'eval step={step} city={city}')
      rc = run_watched(cmd, eval_log, stall_secs=1200.0, hard_timeout=3600.0,
                       stop_file=stop_file, deadline=args.deadline_ts)
      dump = (workdir / 'evaluation' / f'{city}-synthetic_eval-s{step}'
              / 'results.npz')
      if rc == 0 and dump.exists():
        entry = {'step': step, 'city': city, **summarize_dump(dump)}
        curve.append(entry)
        curve.sort(key=lambda e: (e['step'], e['city']))
        curve_path.write_text(json.dumps(curve, indent=1))
        evaluated.add((step, city))
        log(f'eval done: {entry}')
      else:
        log(f'eval failed rc={rc} (step={step}, {city}); will retry later')

  log(f'supervising {workdir} -> step {args.target_step}, deadline '
      f'{time.strftime("%H:%M:%S", time.localtime(args.deadline_ts))}')
  while True:
    if stop_file.exists():
      log('stop file present; exiting')
      return
    if time.time() > args.deadline_ts:
      log('deadline reached; exiting')
      return
    if not preflight():
      log(f'preflight failed (tunnel down?); retry in {args.retry_secs:.0f}s')
      time.sleep(args.retry_secs)
      continue
    step = latest_step(workdir)
    # Catch up any missed eval boundaries first (e.g. after an outage).
    for s in eval_boundary_due(step):
      run_evals(s)
    if step >= args.target_step:
      log(f'target step {args.target_step} reached; exiting')
      return
    boundaries = [((step // args.chunk) + 1) * args.chunk,
                  ((step // args.eval_every) + 1) * args.eval_every,
                  args.target_step]
    stop_at = min(boundaries)
    log(f'training chunk: step {step} -> {stop_at}')
    cmd = [sys.executable, '-m', 'snap_tpu.train', f'--config={args.config}',
           f'--workdir={workdir}', f'--stop_at_step={stop_at}']
    rc = run_watched(cmd, train_log, stall_secs=args.train_stall_secs,
                     hard_timeout=6 * 3600.0, stop_file=stop_file,
                     deadline=args.deadline_ts)
    new_step = latest_step(workdir)
    log(f'chunk exited rc={rc}, checkpoint at step {new_step}')
    if rc != 0 and new_step <= step:
      # No forward progress: back off before retrying.
      time.sleep(args.retry_secs)


if __name__ == '__main__':
  main()
