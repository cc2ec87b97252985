"""Unit tests for the training supervisor's pure logic.

The supervisor (tools/run_supervisor.py) is the round's resilience layer:
it resumes the full-scale run across tunnel outages, selects the on-chip
backward-scatter mode, and accumulates the held-out eval curve. Its chip
side can only be exercised on hardware; this covers the decision logic.
"""

import importlib.util
import json
import pathlib

import numpy as np


def _load_supervisor():
  root = pathlib.Path(__file__).resolve().parent.parent
  spec = importlib.util.spec_from_file_location(
      'run_supervisor', root / 'tools' / 'run_supervisor.py')
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


sup = _load_supervisor()


def _make_ckpt(workdir: pathlib.Path, step: int, complete: bool = True):
  d = workdir / 'checkpoints' / str(step)
  (d / 'default').mkdir(parents=True) if complete else d.mkdir(parents=True)


def test_latest_step_empty(tmp_path):
  assert sup.latest_step(tmp_path) == 0


def test_latest_step_ignores_incomplete_and_junk(tmp_path):
  _make_ckpt(tmp_path, 500)
  _make_ckpt(tmp_path, 1000)
  # An in-flight orbax save has no 'default' item yet — must not count.
  _make_ckpt(tmp_path, 1500, complete=False)
  (tmp_path / 'checkpoints' / 'tmp_12ab').mkdir()
  assert sup.latest_step(tmp_path) == 1000


def test_summarize_dump_recalls(tmp_path):
  npz = tmp_path / 'results.npz'
  np.savez(
      npz,
      error_max_meter=np.array([0.1, 0.4, 1.5, 8.0]),
      error_max_deg=np.array([0.2, 0.9, 3.0, 90.0]),
      recall_top1=np.array([True, True, False, False]),
  )
  out = sup.summarize_dump(npz)
  assert out['num_examples'] == 4
  assert out['recall_0.5m'] == 0.5
  assert out['recall_1.0m'] == 0.5
  assert out['recall_2.0m'] == 0.75
  assert out['recall_1.0deg'] == 0.5
  assert out['recall_top1'] == 0.5
  assert out['median_err_m'] == 0.95


def _fake_bench(tables):
  """Build a run_capture stub emitting one JSON row per candidate."""
  calls = []

  def run_capture(cmd, timeout):
    calls.append(cmd)
    shape = next(a for a in cmd if a.startswith('--shape=')).split('=')[1]
    rows = tables[shape]
    return 0, '\n'.join(json.dumps(r) for r in rows)

  return run_capture, calls


def test_select_scatter_mode_prefers_fastest_exact(tmp_path, monkeypatch):
  lift, template = (sup.SCATTER_SHAPES['lift'],
                    sup.SCATTER_SHAPES['template'])
  fake, _ = _fake_bench({
      lift: [
          {'name': 'current', 'ms': 500.0, 'max_rel_err': 0.0},
          {'name': 'sorted_tap', 'ms': 120.0, 'max_rel_err': 1e-6},
      ],
      template: [
          {'name': 'current', 'ms': 100.0, 'max_rel_err': 0.0},
          {'name': 'sorted_tap', 'ms': 40.0, 'max_rel_err': 1e-6},
      ],
  })
  monkeypatch.setattr(sup, 'run_capture', fake)
  assert sup.select_scatter_mode(tmp_path) == 'sorted_tap'
  sel = json.loads((tmp_path / 'scatter_selected.json').read_text())
  assert sel['selected'] == 'sorted_tap'
  assert sel['weighted_ms'] == 160.0


def test_select_scatter_mode_rejects_inexact_rows(tmp_path, monkeypatch):
  lift, template = (sup.SCATTER_SHAPES['lift'],
                    sup.SCATTER_SHAPES['template'])
  fake, _ = _fake_bench({
      lift: [
          {'name': 'current', 'ms': 500.0, 'max_rel_err': 0.0},
          # Faster but numerically off: must not be selected.
          {'name': 'sorted_tap', 'ms': 120.0, 'max_rel_err': 0.1},
      ],
      template: [
          {'name': 'current', 'ms': 100.0, 'max_rel_err': 0.0},
          {'name': 'sorted_tap', 'ms': 40.0, 'max_rel_err': 1e-6},
      ],
  })
  monkeypatch.setattr(sup, 'run_capture', fake)
  assert sup.select_scatter_mode(tmp_path) == 'direct'


def test_select_scatter_mode_cached_and_demotion(tmp_path, monkeypatch):
  (tmp_path / 'scatter_selected.json').write_text(
      json.dumps({'selected': 'sorted_tap'}))
  # Cached selection short-circuits (no bench run).
  monkeypatch.setattr(
      sup, 'run_capture',
      lambda *a, **k: (_ for _ in ()).throw(AssertionError('benched')))
  assert sup.select_scatter_mode(tmp_path) == 'sorted_tap'
  # Demotion pins 'direct' and records provenance; selection honors it.
  sup.demote_scatter_mode(tmp_path, '2 no-progress chunks')
  sel = json.loads((tmp_path / 'scatter_selected.json').read_text())
  assert sel['selected'] == 'direct'
  assert sel['demoted_from'] == 'sorted_tap'
  assert sup.select_scatter_mode(tmp_path) == 'direct'


def test_select_scatter_mode_bench_failure_defaults(tmp_path, monkeypatch):
  monkeypatch.setattr(sup, 'run_capture', lambda *a, **k: (-9, ''))
  assert sup.select_scatter_mode(tmp_path) == 'direct'
  sel = json.loads((tmp_path / 'scatter_selected.json').read_text())
  assert sel['selected'] == 'direct'
  assert 'rc=-9' in sel['reason']


def test_rotation_conditional_analyze_dump(tmp_path):
  root = pathlib.Path(__file__).resolve().parent.parent
  spec = importlib.util.spec_from_file_location(
      'rotation_conditional', root / 'tools' / 'rotation_conditional.py')
  rc = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(rc)
  # 4 examples: 2 well-localized (1 with good rotation), 2 far off.
  np.savez(tmp_path / 'results.npz',
           error_max_meter=np.array([0.3, 0.8, 7.0, 12.0]),
           error_max_deg=np.array([0.5, 20.0, 90.0, 3.0]))
  out = rc.analyze_dump(tmp_path / 'results.npz')
  assert out['num_examples'] == 4
  assert out['recall_pos_1m'] == 0.5
  assert out['recall_rot_1deg'] == 0.25
  assert out['recall_rot_1deg_given_pos_1m'] == 0.5
  assert out['recall_rot_5deg_given_pos_gt5m'] == 0.5
