"""Compile-only HBM probe for full-scale train-step variants.

Unlike probe_train_compile.py this never touches chip memory: params/opt
state come from ``jax.eval_shape`` and the step is lowered from abstract
``ShapeDtypeStruct``s, so the AOT compile runs entirely on the relay's
compile helper while a training run keeps the chip. Use it to answer
"does variant X fit in HBM?" (e.g. a backward-scatter mode x point-tile
sweep) without pausing training.

Usage:
  SNAP_TPU_SCATTER_MODE=sorted_tap \
    python tools/probe_compile_hbm.py <point_tile> [batch]

Prints one JSON line: {point_tile, batch, scatter_mode, compile_s,
hbm_gib, temp_gib, ok} (ok=false + error on compile OOM/failure).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main():
  point_tile = int(sys.argv[1]) if len(sys.argv) > 1 else 0
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
  mode = os.environ.get('SNAP_TPU_SCATTER_MODE', 'direct')

  import bench
  from snap_tpu.models import bev_localizer
  from snap_tpu.train_lib import lr_schedules
  from snap_tpu.train_lib import optimizers
  from snap_tpu.train_lib import trainer

  config, model, batch_data, _ = bench.build(batch)
  config.model.bev_mapper.streetview_encoder.point_tile = point_tile
  model = bev_localizer.BEVLocalizerModel(
      config.model, model.dataset_meta_data, jnp.bfloat16)
  config.lr_configs.base_learning_rate = 1e-4

  abstract = lambda t: jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), t)
  batch_abs = abstract(dict(batch_data))
  del batch_data

  rngs = dict(zip(('params', 'sampling'), jax.random.split(
      jax.random.PRNGKey(0), 2)))
  variables = jax.eval_shape(
      lambda r, b: model.flax_model.init(r, b, train=False), rngs, batch_abs)
  variables = dict(variables)
  params = variables.pop('params')
  model_state = variables

  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=params)
  state = trainer.TrainState(
      global_step=jax.ShapeDtypeStruct((), jnp.int32),
      params=params,
      opt_state=jax.eval_shape(tx.init, params),
      model_state=model_state,
      rng=abstract(jax.random.PRNGKey(1)),
      tx=tx,
  )
  step = jax.jit(
      functools.partial(
          trainer.train_step,
          flax_model=model.flax_model,
          loss_metrics_fn=model.loss_metrics_function,
          lr_fn=lr_fn,
          has_model_state=bool(model_state),
      ),
      donate_argnums=(0,),
  )

  dump_path = None
  for a in sys.argv[1:]:
    if a.startswith('--dump_hlo='):
      dump_path = a.split('=', 1)[1]

  out = {'point_tile': point_tile, 'batch': batch, 'scatter_mode': mode}
  t0 = time.perf_counter()
  try:
    compiled = step.lower(state, batch_abs).compile()
    out['compile_s'] = round(time.perf_counter() - t0, 1)
    if dump_path:
      # Optimized (post-fusion) HLO: the relay helper scrubs xla_dump_to,
      # but the AOT executable carries its module text — the only way to
      # map trace fusion names (e.g. the 911 ms 'fusion') back to ops.
      with open(dump_path, 'w') as f:
        f.write(compiled.as_text())
      out['hlo_chars'] = os.path.getsize(dump_path)
    mem = compiled.memory_analysis()
    hbm = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
           + mem.output_size_in_bytes)
    out['hbm_gib'] = round(hbm / 2**30, 2)
    out['temp_gib'] = round(mem.temp_size_in_bytes / 2**30, 2)
    out['ok'] = True
  except Exception as e:  # pylint: disable=broad-except
    out['compile_s'] = round(time.perf_counter() - t0, 1)
    out['ok'] = False
    msg = str(e)
    marker = 'Ran out of memory'
    out['error'] = (msg[msg.index(marker):msg.index(marker) + 120]
                    if marker in msg else msg[:300])
  print(json.dumps(out), flush=True)


if __name__ == '__main__':
  main()


# Cited reference behavior: the point-tile knob bounds the lift transient
# the same way the reference bounds fusion memory by looping over points
# (see /root/reference/snap/models/streetview_encoder.py:80-178); here the
# tile count trades XLA program size for peak HBM.
