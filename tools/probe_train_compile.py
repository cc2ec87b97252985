"""Probe: compile (and optionally run) the full-scale train step on TPU.

Round-2 gap #3 (STATUS.md): the 0.2 m / R50 / 20-view train step at per-chip
batch 2 died in the XLA compiler under the tiled lift (lax.map x remat x
grad). This probe compiles the step under a chosen ``point_tile`` (0 =
untiled) and reports compile time + HBM from memory_analysis, then times a
few steps.

Usage: python tools/probe_train_compile.py [point_tile] [batch]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main():
  point_tile = int(sys.argv[1]) if len(sys.argv) > 1 else 0
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
  num_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

  sys.path.insert(0, '.')
  import bench
  from snap_tpu.parallel import mesh as mesh_lib
  from snap_tpu.train_lib import lr_schedules
  from snap_tpu.train_lib import optimizers
  from snap_tpu.train_lib import trainer

  config, model, batch_data, _ = bench.build(batch)
  config.model.bev_mapper.streetview_encoder.point_tile = point_tile
  # Rebuild the model with the updated config.
  from snap_tpu.models import bev_localizer
  model = bev_localizer.BEVLocalizerModel(
      config.model, model.dataset_meta_data, jnp.bfloat16)
  config.lr_configs.base_learning_rate = 1e-4

  rng = jax.random.PRNGKey(0)
  t0 = time.perf_counter()
  params, model_state, _ = trainer.initialize_model(
      model_def=model.flax_model, dummy_input=dict(batch_data), rng=rng,
      backend=None)  # 1-core host: CPU init of a full-scale fwd takes ages
  print(f'init: {time.perf_counter() - t0:.1f}s', flush=True)

  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=params)
  mesh = mesh_lib.make_mesh(None)
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
  batch_data = jax.device_put(dict(batch_data))

  t0 = time.perf_counter()
  lowered = step.lower(state, batch_data)
  print(f'lower: {time.perf_counter() - t0:.1f}s', flush=True)
  t0 = time.perf_counter()
  compiled = lowered.compile()
  print(f'compile: {time.perf_counter() - t0:.1f}s', flush=True)
  try:
    mem = compiled.memory_analysis()
    hbm_gb = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
              + mem.output_size_in_bytes) / 2**30
    print(f'hbm: {hbm_gb:.2f} GiB (temp {mem.temp_size_in_bytes/2**30:.2f})',
          flush=True)
  except Exception as e:  # pylint: disable=broad-except
    print(f'memory_analysis failed: {e}', flush=True)

  state, metrics, _ = compiled(state, batch_data)
  loss = float(metrics['loss/total'][0])
  print(f'first step loss sum: {loss:.4f}', flush=True)
  t0 = time.perf_counter()
  for _ in range(num_steps):
    state, metrics, _ = compiled(state, batch_data)
  float(metrics['loss/total'][0])
  dt = (time.perf_counter() - t0) / num_steps
  print(f'step: {dt*1e3:.0f} ms  ({batch/dt:.2f} ex/s)  '
        f'point_tile={point_tile} batch={batch}', flush=True)


if __name__ == '__main__':
  main()
