"""DP-vs-TP numerical parity: one train step, model=1 vs model=2.

The multichip dryrun proves the tensor-parallel step *runs*; this proves it
*computes the same thing*: identical params, batch, and rng through a
{data:8} mesh and a {data:4, model:2} mesh must produce the same loss,
gradient norm, and updated parameters to floating-point tolerance (XLA
SPMD only changes reduction layouts, not mathematics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.heavy

import helpers
from snap_tpu.configs import defaults
from snap_tpu.models import bev_localizer
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import lr_schedules
from snap_tpu.train_lib import optimizers
from snap_tpu.train_lib import trainer

# Low enough that the tiny test model's Dense kernels (widths 32/64)
# actually shard over model=2 — the production default (TP_MIN_DIM=256)
# targets real widths.
TP_MIN_DIM_TEST = 16


def _one_step(mesh_cfg, host_batch, host_params, config, model):
  mesh = mesh_lib.make_mesh(mesh_cfg)
  lr_fn = lr_schedules.get_learning_rate_fn(config)
  tx = optimizers.get_optimizer(config, lr_fn, params=host_params)
  shardings = mesh_lib.infer_param_shardings(
      host_params, mesh, min_dim=TP_MIN_DIM_TEST)
  repl = mesh_lib.replicated(mesh)
  state = trainer.TrainState(
      global_step=jax.device_put(jnp.zeros((), jnp.int32), repl),
      params=jax.device_put(host_params, shardings),
      opt_state=jax.device_put(tx.init(host_params), repl),
      model_state={},
      rng=jax.device_put(jax.random.PRNGKey(7), repl),
      tx=tx,
  )
  step = jax.jit(functools.partial(
      trainer.train_step,
      flax_model=model.flax_model,
      loss_metrics_fn=model.loss_metrics_function,
      lr_fn=lr_fn,
      has_model_state=False,
  ))
  batch = jax.device_put(dict(host_batch), mesh_lib.data_sharding(mesh))
  with jax.set_mesh(mesh):
    state, metrics, logs = step(state, batch)
  metrics = jax.device_get(metrics)
  out = {k: s / max(c, 1.0) for k, (s, c) in metrics.items()}
  out['l2_grads'] = float(jax.device_get(logs['l2_grads']))
  out['l2_new_params'] = float(jax.device_get(optax.global_norm(
      jax.tree_util.tree_map(
          lambda p: p.astype(jnp.float32), state.params))))
  return out, jax.device_get(state.params)


def test_dp_vs_tp_one_step_parity():
  assert len(jax.devices()) >= 8, 'conftest provides the 8-device CPU mesh'
  config = defaults.base()
  config.model_name = 'bev_localizer'
  config.model = helpers.tiny_localizer()
  config.data = helpers.tiny_dataset_config()
  config.batch_size = 8
  config.lr_configs.base_learning_rate = 1e-3
  config.max_grad_norm = 1.0
  config.dtype_str = 'float32'

  from snap_tpu.data import loader as data_loader
  dataset = data_loader.get_dataset(
      batch_size=config.batch_size,
      eval_batch_size=config.batch_size,
      dataset_configs=config.data,
  )
  model = bev_localizer.BEVLocalizerModel(
      config.model, dataset.meta_data, jnp.float32)
  host_batch = jax.device_get(dataset.meta_data['get_dummy_batch_fn']())
  host_batch.pop('_host', None)
  host_params, model_state, _ = trainer.initialize_model(
      model_def=model.flax_model, dummy_input=host_batch,
      rng=jax.random.PRNGKey(0))
  assert not jax.tree_util.tree_leaves(model_state.get('batch_stats', {}))

  dp, params_dp = _one_step(
      {'data': 8, 'model': 1}, host_batch, host_params, config, model)
  tp, params_tp = _one_step(
      {'data': 4, 'model': 2}, host_batch, host_params, config, model)

  # The TP mesh must actually shard something, or this test is DP vs DP.
  tp_mesh = mesh_lib.make_mesh({'data': 4, 'model': 2})
  n_sharded = sum(
      int(s.spec != jax.sharding.PartitionSpec())
      for s in jax.tree_util.tree_leaves(mesh_lib.infer_param_shardings(
          host_params, tp_mesh, min_dim=TP_MIN_DIM_TEST)))
  assert n_sharded > 0, 'no tensor-sharded params; lower TP_MIN_DIM_TEST'

  assert np.isfinite(dp['loss/total'])
  np.testing.assert_allclose(
      dp['loss/total'], tp['loss/total'], rtol=1e-4,
      err_msg='DP and TP losses diverge')
  np.testing.assert_allclose(dp['l2_grads'], tp['l2_grads'], rtol=1e-3)
  np.testing.assert_allclose(
      dp['l2_new_params'], tp['l2_new_params'], rtol=1e-4)
  for key in ('loc/err_max_position', 'loc/recall_max_1m'):
    np.testing.assert_allclose(
        dp[key], tp[key], rtol=1e-3, atol=1e-5,
        err_msg=f'metric {key} diverges between DP and TP')
  # Per-leaf parameter parity after the optimizer update. Adam at step 1
  # emits +-lr per element (m/sqrt(v) = sign(g)), so elements whose tiny
  # gradients straddle zero across the two reduction layouts differ by up
  # to 2*lr — measured max diff is exactly 1.998e-3 at lr=1e-3. Anything
  # beyond that envelope is a real divergence (e.g. a missed all-reduce,
  # which would also blow the loss/l2 checks above).
  lr = config.lr_configs.base_learning_rate
  flat_dp = jax.tree_util.tree_leaves(params_dp)
  flat_tp = jax.tree_util.tree_leaves(params_tp)
  for a, b in zip(flat_dp, flat_tp):
    assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 2.5 * lr
