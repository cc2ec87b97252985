"""Probe: compile the eval-scale localize step at a chosen batch size.

Round-2 measured batch 4 eval at 15.79G of 15.75G HBM (compile-time OOM);
this probes whether eval-side lift tiling (point_tile_eval) fits the
reference's batch-4 protocol (snap/configs/eval_localization.py:26-28).

Usage: python tools/probe_eval_hbm.py [batch] [point_tile_eval]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main():
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
  tile_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 0
  iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

  sys.path.insert(0, '.')
  import bench
  import jax.numpy as jnp
  from snap_tpu.models import bev_localizer

  config, model, batch_data, _ = bench.build(batch)
  config.model.bev_mapper.streetview_encoder.point_tile_eval = tile_eval
  model = bev_localizer.BEVLocalizerModel(
      config.model, model.dataset_meta_data, jnp.bfloat16)

  rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)}
  variables = jax.jit(
      lambda b: model.flax_model.init(rngs, b, train=False))(batch_data)

  @jax.jit
  def localize(variables, batch):
    pred = model.flax_model.apply(
        variables, batch, train=False,
        rngs={'sampling': jax.random.PRNGKey(2)})
    return pred['scores_poses'].sum() + pred['map_t_query'].t.sum()

  batch_data = jax.device_put(dict(batch_data))
  t0 = time.perf_counter()
  compiled = localize.lower(variables, batch_data).compile()
  print(f'compile: {time.perf_counter() - t0:.1f}s', flush=True)
  mem = compiled.memory_analysis()
  hbm = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
         + mem.output_size_in_bytes) / 2**30
  print(f'hbm: {hbm:.2f} GiB (temp {mem.temp_size_in_bytes/2**30:.2f})',
        flush=True)

  float(compiled(variables, batch_data))  # warmup
  t0 = time.perf_counter()
  outs = [compiled(variables, batch_data) for _ in range(iters)]
  float(outs[-1])
  for o in outs[:-1]:
    float(o)
  dt = (time.perf_counter() - t0) / iters
  print(f'localize: {dt*1e3:.0f} ms -> {batch/dt:.3f} queries/s '
        f'(batch={batch}, point_tile_eval={tile_eval})', flush=True)


if __name__ == '__main__':
  main()
