"""End-to-end trainer smoke tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
from ml_collections import config_dict
import numpy as np
import pytest

import helpers
from snap_tpu.configs import defaults
from snap_tpu.models import bev_localizer
from snap_tpu.parallel import mesh as mesh_lib
from snap_tpu.train_lib import checkpoints
from snap_tpu.train_lib import lr_schedules
from snap_tpu.train_lib import optimizers
from snap_tpu.train_lib import trainer


def tiny_train_config(**overrides) -> config_dict.ConfigDict:
  config = defaults.base()
  config.model_name = 'bev_localizer'
  config.model = helpers.tiny_localizer()
  config.data = helpers.tiny_dataset_config()
  config.batch_size = 4
  config.num_training_steps = 3
  config.log_summary_steps = 2
  config.log_eval_steps = 3
  config.checkpoint_steps = 3
  config.steps_per_eval = 1
  config.lr_configs.base_learning_rate = 1e-4
  config.max_grad_norm = 1.0
  config.dtype_str = 'float32'
  for k, v in overrides.items():
    setattr(config, k, v)
  return config


def test_lr_schedule_compound():
  config = defaults.base()
  config.lr_configs.base_learning_rate = 1e-3
  config.lr_configs.factors = 'constant * cosine_decay'
  config.lr_configs.start_decay_step = 100
  config.lr_configs.steps_per_cycle = 100
  lr_fn = lr_schedules.get_learning_rate_fn(config)
  np.testing.assert_allclose(lr_fn(0), 1e-3, rtol=1e-6)
  np.testing.assert_allclose(lr_fn(50), 1e-3, rtol=1e-6)
  np.testing.assert_allclose(lr_fn(150), 5e-4, rtol=1e-5)
  np.testing.assert_allclose(lr_fn(200), 0.0, atol=1e-9)


def test_freeze_mask():
  params = {'bev_mapper': {'dense': {'kernel': np.zeros(2)}},
            'head': {'kernel': np.zeros(2)}}
  mask = optimizers.make_freeze_mask(params, r'bev_mapper/')
  assert mask['bev_mapper']['dense']['kernel'] is True
  assert mask['head']['kernel'] is False


def test_frozen_params_not_updated():
  config = defaults.base()
  config.lr_configs.base_learning_rate = 1.0
  config.lr_configs.factors = 'constant'
  config.optimizer_configs.freeze_params_reg_exp = r'frozen/'
  lr_fn = lr_schedules.get_learning_rate_fn(config)
  params = {'frozen': {'w': jnp.ones(3)}, 'free': {'w': jnp.ones(3)}}
  tx = optimizers.get_optimizer(config, lr_fn, params=params)
  state = tx.init(params)
  grads = jax.tree_util.tree_map(jnp.ones_like, params)
  updates, _ = tx.update(grads, state, params)
  np.testing.assert_allclose(updates['frozen']['w'], 0.0)
  assert float(jnp.abs(updates['free']['w']).sum()) > 0


def _opt_state_array_bytes(state) -> int:
  return sum(
      x.size * x.dtype.itemsize
      for x in jax.tree_util.tree_leaves(state)
      if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating))


def test_frozen_state_not_allocated_when_disabled():
  """allocate_frozen_state=False: no Adam moments for frozen subtrees."""
  config = defaults.base()
  config.lr_configs.base_learning_rate = 1.0
  config.lr_configs.factors = 'constant'
  config.optimizer_configs.freeze_params_reg_exp = r'frozen/'
  config.max_grad_norm = 1.0
  lr_fn = lr_schedules.get_learning_rate_fn(config)
  big = jnp.ones((64, 64))
  params = {'frozen': {'w': big}, 'free': {'w': jnp.ones(3)}}

  tx_fat = optimizers.get_optimizer(config, lr_fn, params=params)
  config.optimizer_configs.allocate_frozen_state = False
  tx_lean = optimizers.get_optimizer(config, lr_fn, params=params)

  fat_bytes = _opt_state_array_bytes(tx_fat.init(params))
  lean_bytes = _opt_state_array_bytes(tx_lean.init(params))
  # Adam keeps 2 moments: the lean state must drop ~2x the frozen bytes.
  assert fat_bytes - lean_bytes >= 2 * big.size * big.dtype.itemsize

  # Semantics unchanged: frozen updates zero, trainable params still move.
  grads = jax.tree_util.tree_map(jnp.ones_like, params)
  state = tx_lean.init(params)
  updates, _ = tx_lean.update(grads, state, params)
  np.testing.assert_allclose(updates['frozen']['w'], 0.0)
  assert float(jnp.abs(updates['free']['w']).sum()) > 0


def test_mesh_construction():
  mesh = mesh_lib.make_mesh({'data': -1, 'model': 2})
  assert mesh.shape['model'] == 2
  assert mesh.shape['data'] == len(jax.devices()) // 2


@pytest.mark.slow
def test_train_checkpoint_resume(tmp_path):
  """3 training steps on an 8-device mesh, checkpoint, resume, eval."""
  config = tiny_train_config()
  dataset = helpers.tiny_dataset(batch_size=4)
  mesh = mesh_lib.make_mesh({'data': -1, 'model': 1})
  # Pre-shard the loader output like the real pipeline does.
  dataset_sharded = dataset
  workdir = str(tmp_path / 'exp')

  state, train_summary, eval_summary = trainer.train(
      rng=jax.random.PRNGKey(0),
      config=config,
      model_cls=bev_localizer.BEVLocalizerModel,
      dataset=dataset_sharded,
      workdir=workdir,
      mesh=mesh,
  )
  assert int(jax.device_get(state.global_step)) == 3
  assert np.isfinite(train_summary['loss/total'])
  assert np.isfinite(eval_summary['loss/total'])
  assert checkpoints.latest_step(workdir) == 3

  # Resume for 2 more steps from the checkpoint.
  config.num_training_steps = 5
  state2, _, _ = trainer.train(
      rng=jax.random.PRNGKey(1),
      config=config,
      model_cls=bev_localizer.BEVLocalizerModel,
      dataset=dataset_sharded,
      workdir=workdir,
      mesh=mesh,
  )
  assert int(jax.device_get(state2.global_step)) == 5
  assert checkpoints.latest_step(workdir) == 5


@pytest.mark.slow
def test_train_fp16_dynamic_scale(tmp_path):
  """fp16 training runs with a dynamic loss scale in the state."""
  config = tiny_train_config(dtype_str='float16', num_training_steps=2,
                             log_summary_steps=2, log_eval_steps=2,
                             checkpoint=False)
  dataset = helpers.tiny_dataset(batch_size=4)
  mesh = mesh_lib.make_mesh({'data': -1, 'model': 1})
  state, train_summary, _ = trainer.train(
      rng=jax.random.PRNGKey(0),
      config=config,
      model_cls=bev_localizer.BEVLocalizerModel,
      dataset=dataset,
      workdir=str(tmp_path / 'fp16'),
      mesh=mesh,
  )
  assert state.dynamic_scale is not None
  assert float(jax.device_get(state.dynamic_scale.scale)) >= 256.0
  assert np.isfinite(train_summary['loss/total'])


def test_resnet_npz_pretrained_loading(tmp_path):
  """BiT-format .npz weights load into the ResNet via the subtree protocol."""
  import numpy as np
  from ml_collections import config_dict
  from snap_tpu.configs import defaults
  from snap_tpu.models import resnet

  cfg = defaults.resnet('tiny')
  model = resnet.ResNetV2(cfg, jnp.float32)
  x = jnp.zeros((1, 32, 32, 3))
  variables = model.init(jax.random.PRNGKey(0), x)
  params = variables['params']

  # Write a big_vision-style flat npz matching a couple of param paths.
  flat = {}
  kernel = np.asarray(params['root_block']['conv_root']['kernel']) * 0 + 0.5
  flat['root_block/conv_root/kernel'] = kernel
  scale = np.asarray(params['block1']['unit01']['gn1']['scale']) * 0 + 2.0
  flat['block1/unit01/gn1/scale'] = scale
  path = str(tmp_path / 'bit.npz')
  np.savez(path, **flat)

  cfg2 = config_dict.ConfigDict(cfg.to_dict())
  cfg2.pretrained_path = path
  model2 = resnet.ResNetV2(cfg2.lock(), jnp.float32)
  loaded = model2.apply(
      variables, method=lambda m: m.load_pretrained_variables())
  assert loaded is not None
  np.testing.assert_allclose(
      loaded['params']['root_block']['conv_root']['kernel'], kernel)
  np.testing.assert_allclose(
      loaded['params']['block1']['unit01']['gn1']['scale'], scale)

  # End-to-end through the trainer's update_pretrained_variables.
  updated = trainer.update_pretrained_variables(model2, variables)
  np.testing.assert_allclose(
      updated['params']['root_block']['conv_root']['kernel'], kernel)
