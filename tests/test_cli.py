"""End-to-end CLI contract tests: ``python -m snap_tpu.train`` /
``python -m snap_tpu.evaluate`` mains on the smoke configs.

Locks the user-facing entry-point contract (reference:
snap/train.py:87-88, snap/evaluate.py:24-35): config-file flag parsing,
workdir layout (config.yaml, orbax checkpoints), resume-with-seed-folding,
and the evaluator's cached npz dumps.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_module(module, config, workdir):
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
  # Share the session compile cache so warm runs are fast.
  env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
  return subprocess.run(
      [sys.executable, '-m', module, f'--config={config}',
       f'--workdir={workdir}'],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)


@pytest.mark.slow
def test_train_and_evaluate_cli(tmp_path):
  workdir = str(tmp_path / 'run')

  result = _run_module(
      'snap_tpu.train', 'snap_tpu/configs/smoke_localization.py', workdir)
  assert result.returncode == 0, result.stderr[-4000:]
  assert os.path.exists(os.path.join(workdir, 'config.yaml'))
  steps = sorted(os.listdir(os.path.join(workdir, 'checkpoints')))
  assert steps, 'no checkpoints written'
  # Training logged loss summaries.
  assert 'loss/total' in result.stderr

  # Resume: a second invocation restores the final step and folds it into
  # the data seed (reference: snap/train.py:50-67).
  result = _run_module(
      'snap_tpu.train', 'snap_tpu/configs/smoke_localization.py', workdir)
  assert result.returncode == 0, result.stderr[-4000:]
  assert 'Folding global_step' in result.stderr

  result = _run_module(
      'snap_tpu.evaluate', 'snap_tpu/configs/smoke_eval_localization.py',
      workdir)
  assert result.returncode == 0, result.stderr[-4000:]
  eval_dirs = os.listdir(os.path.join(workdir, 'evaluation'))
  assert len(eval_dirs) == 1
  dump = os.path.join(workdir, 'evaluation', eval_dirs[0], 'results.npz')
  results = np.load(dump, allow_pickle=True)
  assert 'error_max_meter' in results
  assert np.isfinite(results['error_max_meter']).all()

  # Second evaluate run hits the cached dump instead of recomputing.
  result = _run_module(
      'snap_tpu.evaluate', 'snap_tpu/configs/smoke_eval_localization.py',
      workdir)
  assert result.returncode == 0, result.stderr[-4000:]
  assert 'cached' in result.stderr.lower()


@pytest.mark.slow
@pytest.mark.parametrize('config', [
    'snap_tpu/configs/smoke_semantics.py',
    'snap_tpu/configs/smoke_occupancy.py',
])
def test_head_train_cli(tmp_path, config):
  """The fine-tuning-head smoke configs must run on the 8-device mesh
  (smoke_semantics once shipped a batch size the mesh could not shard)."""
  workdir = str(tmp_path / 'run')
  result = _run_module('snap_tpu.train', config, workdir)
  assert result.returncode == 0, result.stderr[-4000:]
  assert 'loss/total' in result.stderr
  assert os.listdir(os.path.join(workdir, 'checkpoints'))
