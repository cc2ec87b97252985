"""AOT warm-compile of a training config's train/eval steps (zero chip).

Mirrors the trainer's exact jit construction — donate_argnums, ambient
mesh, sharded abstract state — so the persistent compilation cache entry
matches what the real run will look up, then lowers from abstract shapes
(the compile runs on the relay helper while a training chunk owns the
chip). Use before an end-of-window head fine-tune so its first step pays
seconds, not a 10–20 min fresh-HLO compile.

Usage: python tools/warm_train_cache.py '<config.py>[:args]'
"""
from __future__ import annotations

import functools
import importlib
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main():
  spec = sys.argv[1]
  path, _, args = spec.partition(':')
  mod = importlib.import_module(
      path.replace('/', '.').removesuffix('.py'))
  config = mod.get_config(args or None)

  from snap_tpu import models
  from snap_tpu.data import loader as data_loader
  from snap_tpu.parallel import mesh as mesh_lib
  from snap_tpu.train_lib import lr_schedules
  from snap_tpu.train_lib import optimizers
  from snap_tpu.train_lib import trainer

  mesh = mesh_lib.make_mesh(config.get('mesh'))
  dataset = data_loader.get_dataset(
      batch_size=config.batch_size,
      eval_batch_size=config.get('eval_batch_size') or config.batch_size,
      dataset_configs=config.data,
  )
  dtype = getattr(jnp, config.dtype_str)
  model_cls = models.get_model(config.model_name)
  model = model_cls(config.model, dataset.meta_data, dtype)

  abstract = lambda t: jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), t)
  dummy = dataset.meta_data['get_dummy_batch_fn']()
  dummy.pop('_host', None)
  batch_abs = abstract(dict(dummy))
  del dummy

  rngs = dict(zip(('params', 'sampling'),
                  jax.random.split(jax.random.PRNGKey(0), 2)))
  variables = dict(jax.eval_shape(
      lambda r, b: model.flax_model.init(r, b, train=False),
      rngs, batch_abs))
  params = variables.pop('params')
  model_state = variables
  has_model_state = bool(
      jax.tree_util.tree_leaves(model_state.get('batch_stats', {})))

  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=params)

  repl = mesh_lib.replicated(mesh)
  param_shardings = mesh_lib.infer_param_shardings(
      params, mesh, min_dim=config.get('tp_min_dim') or 256)
  host_state = dict(
      global_step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=jax.eval_shape(tx.init, params),
      model_state=model_state,
      rng=jax.random.PRNGKey(1),
  )
  state_shardings = {
      k: (param_shardings if k == 'params'
          else jax.tree_util.tree_map(lambda _: repl, v))
      for k, v in host_state.items()
  }
  state_abs = jax.tree_util.tree_map(
      lambda x, s: jax.ShapeDtypeStruct(
          jnp.shape(x), jnp.result_type(x), sharding=s),
      host_state, state_shardings)
  state = trainer.TrainState(tx=tx, **state_abs)

  train_step_jit = jax.jit(
      functools.partial(
          trainer.train_step,
          flax_model=model.flax_model,
          loss_metrics_fn=model.loss_metrics_function,
          lr_fn=lr_fn,
          has_model_state=has_model_state,
      ),
      donate_argnums=(0, 1),
  )
  eval_step_jit = jax.jit(
      functools.partial(
          trainer.eval_step,
          flax_model=model.flax_model,
          loss_metrics_fn=model.loss_metrics_function,
      ),
      donate_argnums=(1,),
  )

  # The in-loop eval may run at a different batch (config.eval_batch_size,
  # trainer.py:483): rebuild the abstract batch with the eval leading dim.
  eval_bs = config.get('eval_batch_size') or config.batch_size
  eval_batch_abs = jax.tree_util.tree_map(
      lambda s: jax.ShapeDtypeStruct(
          (eval_bs, *s.shape[1:]) if s.shape else s.shape, s.dtype),
      batch_abs)

  rng_abs = abstract(jax.random.PRNGKey(2))
  with jax.set_mesh(mesh):
    for name, step, a in (('train_step', train_step_jit, (state, batch_abs)),
                          ('eval_step', eval_step_jit,
                           (state, eval_batch_abs, rng_abs))):
      t0 = time.monotonic()
      try:
        compiled = step.lower(*a).compile()
        mem = compiled.memory_analysis()
        tot = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
               + mem.output_size_in_bytes) / 2**30
        print(f'{name}: compiled {time.monotonic()-t0:.0f}s, '
              f'{tot:.2f} GiB scheduler total', flush=True)
      except Exception as e:  # pylint: disable=broad-except
        print(f'{name}: FAILED after {time.monotonic()-t0:.0f}s: '
              f'{type(e).__name__}: {str(e)[:300]}', flush=True)


if __name__ == '__main__':
  main()
