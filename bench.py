"""Benchmark: eval-scale BEV localization throughput on one TPU chip.

Prints ONE JSON line whose headline is the number of pose hypotheses scored
per second per chip, with the end-to-end rates it derives from as explicit
extras (a skeptic can recompute the headline from them):

- ``localization_queries_per_sec``: full end-to-end localization queries
  (query mapper + dense pose volume + fine refinement) per second — the
  honest end-to-end rate.
- ``poses_scored_per_query``: the *reference eval budget* per query under
  the sampled-path interpretation (20k RANSAC samples + 41^3 = 68,921
  grid-refinement offsets, snap/configs/eval_localization.py:40-42) — NOT
  the dense-volume cell count, which would inflate the headline ~40x.
- headline value = localization_queries_per_sec x poses_scored_per_query,
  vs_baseline against the 1k poses/s/chip floor.
- ``bev_maps_per_sec``: neural-map construction rate (20 views, R50, FPN,
  lift + fusion + matching head) at the reference scene scale.
- ``train_step_sec``/``train_examples_per_sec``: full-scale training step
  (forward+backward+adam, dense backend) at the per-chip batch; the
  reference's global batch 32 (README.md:41-43) maps to 16 data-parallel
  v5e chips x this per-chip shard of 2 (batch 4/chip exceeds v5e HBM,
  see TRAIN_BATCH below).

Scales follow the reference eval protocol (SURVEY.md §6): 120x160x60 voxel
grid at 0.2 m, 20 views/scene, query frustum depth 16 m.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# Reuse compiled executables across runs (first compile of the eval-scale
# graph is expensive, especially through remote-compile tunnels).
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

EVAL_BATCH = 4  # The reference eval protocol batch
# (snap/configs/eval_localization.py:26-28). With the eval-side lift tiling
# (POINT_TILE_EVAL below) this needs 6.91G of 15.75G HBM and is the
# measured throughput sweet spot: 3.96 q/s vs 3.87 (batch 2, untiled)
# and 3.54 (batch 8, 13.57G); untiled batch 4 was a compile-time OOM at
# 15.79G (probed 2026-08-17, tools/probe_eval_hbm.py).
POINT_TILE_EVAL = 288_000  # Bounds the lift's gather transient at eval.
TRAIN_BATCH = 2  # Per-chip shard: reference global batch 32 = 16 v5e chips
# x 2 (batch 4/chip needs 19.3G > 15.75G HBM; the reference trained on
# larger-HBM chips).
NUM_ITERS = 10
NUM_ROTATIONS = 64
# Reference sampled-path eval budget per localization query.
POSES_PER_QUERY = 20_000 + 41 * 41 * 41


def build_config(batch_size: int, point_tile_eval: int = 0):
  from snap_tpu.configs import defaults

  config = defaults.base()
  config.model_name = 'bev_localizer'
  config.model = defaults.bev_localizer()
  # Dense (exhaustive) pose backend: the TPU-native path — one chunked FFT
  # correlation per example over the full rotation x translation volume,
  # plus a fine-angle windowed MXU refinement. Scattered-gather scoring
  # (the reference's sampled path) runs ~70M random reads/s on TPU and is
  # kept for parity, not performance.
  config.model.pose_backend = 'exhaustive'
  config.model.num_rotations = NUM_ROTATIONS
  config.model.filter_points_in_fov = False
  config.model.clip_negative_scores = False
  config.model.do_grid_refinement = True
  config.model.bev_mapper = defaults.bev_mapper(('streetview', 'aerial'))
  if point_tile_eval:
    # Must be set before model construction (static module attribute).
    config.model.bev_mapper.streetview_encoder.point_tile_eval = (
        point_tile_eval)
  config.dtype_str = 'bfloat16'
  config.batch_size = batch_size

  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training='bench-city'),
          mode='pair_scene_view',
          voxel_size=0.2,
          add_images=True,
          add_rasters=True,
          evaluation_size=batch_size,
          num_views=20,
          image_size=(180, 240),
      )
  )
  return config


def build(batch_size: int, point_tile_eval: int = 0):
  from snap_tpu.data import loader as data_loader
  from snap_tpu.models import bev_localizer

  config = build_config(batch_size, point_tile_eval)
  dataset = data_loader.get_dataset(
      batch_size=batch_size,
      eval_batch_size=batch_size,
      dataset_configs=config.data,
  )
  dtype = getattr(jnp, config.dtype_str)
  model = bev_localizer.BEVLocalizerModel(
      config.model, dataset.meta_data, dtype)
  batch = dataset.meta_data['get_dummy_batch_fn']()
  batch.pop('_host', None)
  return config, model, batch, dataset


def time_fn(fn, *args, iters: int = NUM_ITERS) -> float:
  """Pipelined per-call seconds: dispatch all iters, one sync at the end.

  A production eval loop keeps the device queue full (async dispatch), so
  per-call cost excludes the host/tunnel round-trip; outputs are reduced to
  scalars and the final float() is the sync fence (block_until_ready does
  not reliably synchronize through remote-execution tunnels).
  """
  float(fn(*args))  # warmup / compile
  t0 = time.perf_counter()
  outs = [fn(*args) for _ in range(iters)]
  float(outs[-1])
  for o in outs[:-1]:
    float(o)
  return (time.perf_counter() - t0) / iters


def bench_eval():
  """End-to-end localization + map construction at eval scale."""
  _, model, batch, _ = build(EVAL_BATCH, point_tile_eval=POINT_TILE_EVAL)
  rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)}
  variables = jax.jit(
      lambda b: model.flax_model.init(rngs, b, train=False))(batch)

  @jax.jit
  def localize(variables, batch):
    pred = model.flax_model.apply(
        variables, batch, train=False,
        rngs={'sampling': jax.random.PRNGKey(2)})
    return pred['scores_poses'].sum() + pred['map_t_query'].t.sum()

  @jax.jit
  def build_map(variables, batch):
    pred = model.flax_model.apply(
        variables, batch['map'], train=False,
        rngs={'sampling': jax.random.PRNGKey(2)},
        method=lambda m, d, train: m.bev_mapper(d, train=train))
    return pred['bev_matching'].features.sum()

  batch = jax.device_put(batch)
  dt_localize = time_fn(localize, variables, batch)
  dt_map = time_fn(build_map, variables, batch)
  return EVAL_BATCH / dt_localize, EVAL_BATCH / dt_map


def bench_train_step():
  """Full-scale train step (fwd+bwd+adam, dense backend) per-chip shard."""
  from snap_tpu.parallel import mesh as mesh_lib
  from snap_tpu.train_lib import lr_schedules
  from snap_tpu.train_lib import optimizers
  from snap_tpu.train_lib import trainer

  config, model, batch, _ = build(TRAIN_BATCH)
  # 4 unrolled lift tiles: the measured compile/HBM sweet spot at batch 2
  # (tools/probe_train_compile.py: compiles ~4 min, runs 2.9 s/step; the
  # untiled step needs 21.6G > 15.75G, lax.map tiling stalls the compiler).
  config.model.bev_mapper.streetview_encoder.point_tile = 288_000
  from snap_tpu.models import bev_localizer
  model = bev_localizer.BEVLocalizerModel(
      config.model, model.dataset_meta_data, jnp.bfloat16)
  config.lr_configs.base_learning_rate = 1e-4
  mesh = mesh_lib.make_mesh(None)
  rng = jax.random.PRNGKey(0)
  params, model_state, _ = trainer.initialize_model(
      model_def=model.flax_model, dummy_input=dict(batch), rng=rng,
      backend=None)  # on-accelerator init: the 1-core host CPU cannot
  # compile+run the full-scale forward in bounded time (round-2 timeout).
  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=params)
  repl = mesh_lib.replicated(mesh)
  state = trainer.TrainState(
      global_step=jax.device_put(jnp.zeros((), jnp.int32), repl),
      params=jax.device_put(params, repl),
      opt_state=jax.device_put(jax.jit(tx.init, backend='cpu')(params), repl),
      model_state=jax.device_put(model_state, repl),
      rng=jax.device_put(jax.random.PRNGKey(1), repl),
      tx=tx,
  )
  step = jax.jit(
      functools.partial(
          trainer.train_step,
          flax_model=model.flax_model,
          loss_metrics_fn=model.loss_metrics_function,
          lr_fn=lr_fn,
          has_model_state=False,
      ),
      donate_argnums=(0,),
  )
  batch = jax.device_put(batch)

  state, metrics, _ = step(state, dict(batch))  # warmup/compile
  float(metrics['loss/total'][0])
  t0 = time.perf_counter()
  for _ in range(NUM_ITERS):
    state, metrics, _ = step(state, dict(batch))
  float(metrics['loss/total'][0])  # sync fence: in-order execution
  times = [(time.perf_counter() - t0) / NUM_ITERS]
  hbm_gb = None
  try:
    mem = step.lower(state, dict(batch)).compile().memory_analysis()
    hbm_gb = round(
        (mem.temp_size_in_bytes + mem.argument_size_in_bytes
         + mem.output_size_in_bytes) / 2**30, 2)
  except Exception:  # pylint: disable=broad-except
    pass
  return times[len(times) // 2], hbm_gb


_REPO = pathlib.Path(__file__).resolve().parent
# Newest successful capture first; committed round-3 numbers as the floor.
_FALLBACK_PATHS = (
    _REPO / 'results' / 'BENCH_latest_local.json',
    _REPO / 'results' / 'BENCH_round3_local.json',
)

_PREFLIGHT_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((512, 512), jnp.bfloat16);"
    "(x @ x).block_until_ready();"
    "print('ok', jax.devices()[0])"
)


def _load_fallback():
  """Most recent committed local bench numbers, for failure artifacts."""
  for p in _FALLBACK_PATHS:
    try:
      d = json.loads(p.read_text())
      d['source'] = str(p.relative_to(_REPO))
      return d
    except (OSError, json.JSONDecodeError):
      continue
  return None


def _save_latest_local(out: dict) -> None:
  try:
    p = _FALLBACK_PATHS[0]
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps({**out, 'captured_unix': int(time.time())}))
  except OSError:
    pass


def preflight_backend(timeout: float = 90.0, retries: int = 2,
                      retry_wait: float = 45.0):
  """Cheap backend check: a tiny jitted matmul in a bounded subprocess.

  A dead device tunnel makes jax calls hang forever and ignore SIGTERM
  (observed 2026-08-17/18) — run the probe in its own process group and
  SIGKILL the group on timeout, so a dead backend costs seconds, not the
  whole capture budget (round 3's BENCH artifact was rc=124 with nothing
  parseable). Returns None when healthy, else a short error string.
  """
  err = 'preflight never ran'
  for attempt in range(retries):
    if attempt:
      time.sleep(retry_wait)
    proc = subprocess.Popen(
        [sys.executable, '-c', _PREFLIGHT_SRC],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        start_new_session=True)
    try:
      out, _ = proc.communicate(timeout=timeout)
      if proc.returncode == 0:
        return None
      tail = out.strip().splitlines()[-2:]
      err = f'preflight rc={proc.returncode}: {" | ".join(tail)}'
    except subprocess.TimeoutExpired:
      try:
        os.killpg(proc.pid, signal.SIGKILL)
      except ProcessLookupError:
        pass
      proc.wait()
      err = f'preflight hang >{timeout:.0f}s (tunnel unresponsive)'
  return err


def _release_chip_from_supervisor(wait: float = 120.0) -> None:
  """Ask a running training supervisor (tools/run_supervisor.py) to stop.

  The bench and the supervised single-chip training run share the one TPU;
  a 15.75G-HBM train step plus the bench cannot coexist. The supervisor
  watches for <workdir>/SUPERVISOR_STOP every 20 s and SIGKILLs its child.
  """
  workdirs = _REPO / 'workdirs'
  if not workdirs.is_dir():
    return
  recent = time.time() - 1800
  active = [p for p in workdirs.glob('*.log') if p.stat().st_mtime > recent]
  if not active:
    return
  stopped = []
  for d in workdirs.iterdir():
    if d.is_dir() and (d / 'checkpoints').is_dir():
      try:
        (d / 'SUPERVISOR_STOP').touch()
        stopped.append(d.name)
      except OSError:
        pass
  if stopped:
    print(f'# waiting {wait:.0f}s for supervised runs to release the chip: '
          f'{stopped}', file=sys.stderr)
    deadline = time.time() + wait
    while time.time() < deadline:
      time.sleep(10)
      if not any(p.stat().st_mtime > time.time() - 15
                 for p in workdirs.glob('*.log')):
        break


def _error_output(stage: str, err: str, extras: dict | None = None) -> dict:
  out = {
      'metric': 'pose_queries_per_sec_per_chip',
      'value': 0.0,
      'unit': 'poses/s',
      'vs_baseline': 0.0,
      'error': f'{stage}: {err}'[:300],
  }
  if extras:
    out.update(extras)
  if (fb := _load_fallback()) is not None:
    out['fallback_local'] = fb
  return out


def _bench_train_step_subprocess():
  """Run bench_train_step in a fresh process and parse its result.

  The full-scale step fits 15.75G HBM with no slack; residual buffers from
  the eval section (measured: RESOURCE_EXHAUSTED when sharing the process)
  and a same-process device client would break it. A clean process also
  bounds cold-compile time without poisoning the eval headline.
  """
  import subprocess
  import sys

  try:
    proc = subprocess.run(
        [sys.executable, __file__, '--train-only'],
        capture_output=True, text=True, timeout=1800,
    )  # cold: ~390 s on-TPU init + ~250 s compile + timing
  except subprocess.TimeoutExpired:
    print('# train-step bench failed: timeout')
    return None, None
  # Parse the LAST json-looking stdout line (runtime chatter may also start
  # with '{'); a parse failure falls through to the failure report rather
  # than aborting the eval headline.
  for line in reversed(proc.stdout.splitlines()):
    if line.startswith('{'):
      try:
        d = json.loads(line)
      except json.JSONDecodeError:
        continue
      return d.get('train_step_sec'), d.get('train_hbm_gb')
  tail = (proc.stderr or proc.stdout or '').strip().splitlines()[-3:]
  print(f'# train-step bench failed (rc={proc.returncode}): {" | ".join(tail)}')
  return None, None


def main():
  if '--train-only' in sys.argv:
    train_step_sec, train_hbm_gb = bench_train_step()
    print(json.dumps(
        {'train_step_sec': train_step_sec, 'train_hbm_gb': train_hbm_gb}))
    return

  # The one chip may be held by a supervised training run — release it, then
  # verify the backend is actually alive BEFORE spending the capture budget.
  # A dead tunnel now yields a parseable error artifact (with the last local
  # numbers attached) in ~3 minutes instead of an rc=124 timeout after 80.
  _release_chip_from_supervisor()
  if (err := preflight_backend()) is not None:
    print(json.dumps(_error_output('backend preflight failed', err)))
    return

  # Train first: the parent's jax backend initializes lazily, so the chip
  # is exclusively the subprocess's until it exits; then eval runs here.
  train_step_sec, train_hbm_gb = _bench_train_step_subprocess()

  train_extras = {}
  if train_step_sec is not None:
    train_extras['train_step_sec_full_scale'] = round(train_step_sec, 3)
  if train_step_sec is None:
    # The train section burned its budget or died; recheck the backend so a
    # mid-capture tunnel death fails fast instead of also burning the eval
    # alarm budget.
    if (err := preflight_backend(retries=1)) is not None:
      print(json.dumps(
          _error_output('backend died during train bench', err)))
      return

  # Watchdog: a dead device tunnel makes jax calls hang forever (observed
  # 2026-08-17: a ~5h tunnel outage where even a 256x256 matmul blocked
  # indefinitely and ignored SIGTERM). Emit an explicit, parseable error
  # line rather than hanging the capture.
  def _alarm(signum, frame):
    raise TimeoutError('eval bench exceeded its time budget')

  signal.signal(signal.SIGALRM, _alarm)
  signal.alarm(3000)
  try:
    queries_per_sec, maps_per_sec = bench_eval()
  except Exception as e:  # pylint: disable=broad-except
    print(json.dumps(_error_output(
        'eval bench failed', f'{type(e).__name__}: {e}', train_extras)))
    return
  finally:
    signal.alarm(0)

  pose_hypotheses_per_sec = queries_per_sec * POSES_PER_QUERY
  out = {
      'metric': 'pose_queries_per_sec_per_chip',
      'value': round(pose_hypotheses_per_sec, 1),
      'unit': 'poses/s',
      'vs_baseline': round(pose_hypotheses_per_sec / 1000.0, 3),
      # Definition: value = localization_queries_per_sec x
      # poses_scored_per_query (reference sampled eval budget per query);
      # the dense backend scores a full 64-rotation volume whose cell count
      # is ~40x larger, but the headline deliberately does NOT count cells.
      'poses_scored_per_query': POSES_PER_QUERY,
      'localization_queries_per_sec': round(queries_per_sec, 3),
      'bev_maps_per_sec': round(maps_per_sec, 3),
      'eval_batch_size': EVAL_BATCH,
      'num_timing_iters': NUM_ITERS,
      'device': str(jax.devices()[0]),
  }
  # Eval-path ceiling vs achieved (VERDICT r4 #6): written by the round-5
  # stage profile (tools/profile_eval.py -> docs/PERFORMANCE.md analysis).
  ceiling_path = _REPO / 'results' / 'eval_ceiling.json'
  if ceiling_path.exists():
    try:
      ceiling = json.loads(ceiling_path.read_text())
      out['eval_ceiling'] = ceiling
    except (json.JSONDecodeError, OSError):
      pass
  if train_step_sec is not None:
    out['train_step_sec_full_scale'] = round(train_step_sec, 3)
    out['train_examples_per_sec'] = round(TRAIN_BATCH / train_step_sec, 3)
    out['train_batch_per_chip'] = TRAIN_BATCH
    out['train_note'] = ('reference global batch 32 = 16 data-parallel v5e '
                         'chips x this per-chip shard')
    if train_hbm_gb is not None:
      out['train_step_hbm_gb'] = train_hbm_gb
  _save_latest_local(out)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
