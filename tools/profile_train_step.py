"""Full-scale train-step stage breakdown on one TPU chip.

The eval path has a stage-by-stage cost table (docs/PERFORMANCE.md); this
produces the train-side equivalent: per-stage seconds for the forward
(map/query mappers, pose volume), the backward (grad minus forward), and
the optimizer, plus an op-level xprof trace of the whole step for
tools/parse_trace.py. Prints one JSON line.

Usage: python tools/profile_train_step.py [--trace]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('XLA_PYTHON_CLIENT_MEM_FRACTION', '0.9')

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import bench
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import lr_schedules
from snap_tpu.train_lib import optimizers
from snap_tpu.train_lib import trainer

ITERS = 5


def timed(fn, *args, iters=ITERS):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  outs = [fn(*args) for _ in range(iters)]
  jax.block_until_ready(outs[-1])
  for o in outs[:-1]:
    jax.block_until_ready(o)
  return (time.perf_counter() - t0) / iters


def main():
  config, model, batch, _ = bench.build(bench.TRAIN_BATCH)
  config.model.bev_mapper.streetview_encoder.point_tile = 288_000
  from snap_tpu.models import bev_localizer
  model = bev_localizer.BEVLocalizerModel(
      config.model, model.dataset_meta_data, jnp.bfloat16)
  config.lr_configs.base_learning_rate = 1e-4
  rng = jax.random.PRNGKey(0)
  params, model_state, _ = trainer.initialize_model(
      model_def=model.flax_model, dummy_input=dict(batch), rng=rng,
      backend=None)
  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=params)
  opt_state = jax.jit(tx.init, backend='cpu')(params)
  batch = jax.device_put(batch)
  params = jax.device_put(params)
  opt_state = jax.device_put(opt_state)
  srng = jax.random.PRNGKey(2)

  def apply_loss(params, batch):
    pred = model.flax_model.apply(
        {'params': params}, batch, train=True, rngs={'sampling': srng})
    losses, _ = model.loss_metrics_function(pred, batch, params)
    return losses['total'].mean(where=batch['batch_mask'] > 0)

  @jax.jit
  def fwd_map_mapper(params, batch):
    out = model.flax_model.apply(
        {'params': params}, batch['map'], train=True,
        rngs={'sampling': srng},
        method=lambda m, d, train: m.bev_mapper(d, train=train))
    return out['bev_matching'].features.sum()

  @jax.jit
  def fwd_loss(params, batch):
    return apply_loss(params, batch)

  @jax.jit
  def fwd_bwd(params, batch):
    loss, grad = jax.value_and_grad(apply_loss)(params, batch)
    return loss, jax.tree_util.tree_map(lambda g: g.sum(), grad)

  @jax.jit
  def opt_update(grads, opt_state, params):
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda a, b: (a + b).sum(), params, updates)
    return new_params, jax.tree_util.tree_map(lambda x: 0, new_opt)

  grads = jax.jit(
      lambda p, b: jax.grad(apply_loss)(p, b))(params, batch)
  jax.block_until_ready(grads)

  out = {'batch': bench.TRAIN_BATCH}
  stages = []
  for name, fn, args in (
      ('fwd_map_mapper', fwd_map_mapper, (params, batch)),
      ('fwd_loss_total', fwd_loss, (params, batch)),
      ('fwd_bwd_total', fwd_bwd, (params, batch)),
      ('opt_update', opt_update, (grads, opt_state, params)),
  ):
    try:
      dt = timed(fn, *args)
      out[f'{name}_sec'] = round(dt, 4)
      stages.append((name, dt))
    except Exception as e:  # pylint: disable=broad-except
      out[f'{name}_error'] = f'{type(e).__name__}: {e}'[:160]
  if 'fwd_bwd_total_sec' in out and 'fwd_loss_total_sec' in out:
    out['bwd_only_sec'] = round(
        out['fwd_bwd_total_sec'] - out['fwd_loss_total_sec'], 4)
  if 'fwd_loss_total_sec' in out and 'fwd_map_mapper_sec' in out:
    out['fwd_nonmap_sec'] = round(
        out['fwd_loss_total_sec'] - out['fwd_map_mapper_sec'], 4)

  if '--trace' in sys.argv:
    # Full train-step op trace for tools/parse_trace.py.
    step = jax.jit(functools.partial(
        trainer.train_step,
        flax_model=model.flax_model,
        loss_metrics_fn=model.loss_metrics_function,
        lr_fn=lr_fn,
        has_model_state=False,
    ))
    repl_state = trainer.TrainState(
        global_step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt_state, model_state={},
        rng=jax.random.PRNGKey(1), tx=tx)
    repl_state, metrics, _ = step(repl_state, dict(batch))
    float(metrics['loss/total'][0])
    outdir = '/tmp/profile_train'
    jax.profiler.start_trace(outdir)
    for _ in range(2):
      repl_state, metrics, _ = step(repl_state, dict(batch))
    float(metrics['loss/total'][0])
    jax.profiler.stop_trace()
    out['trace_dir'] = outdir
  print(json.dumps(out))


if __name__ == '__main__':
  main()
