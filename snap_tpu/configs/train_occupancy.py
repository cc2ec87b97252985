"""Occupancy network training config (reference:
snap/configs/train_occupancy.py)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config."""
  del args_str
  config = defaults.base()
  config.model_name = 'occupancy_net'
  config.model = defaults.occupancy_net()
  config.model.occupancy_mlp.layers = (128, 256, 1)

  config.optimizer_configs.freeze_params_reg_exp = r'streetview_encoder/'
  # The frozen encoder is most of the model: skip its Adam moments.
  config.optimizer_configs.allocate_frozen_state = False

  cities = defaults.DATA_SPLITS_CITIES['train']
  locations = ','.join(f'{c}-synthetic' for c in cities)
  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training=locations),
          mode='single_scene',
          voxel_size=0.2,
          add_lidar_rays=True,
          num_rays=10_000,
          evaluation_size=4_096,
          training_size_per_builder=5_000_000,
          num_views=20,
      )
  )
  config.batch_size = 1
  config.lr_configs.base_learning_rate = 5e-5
  config.num_training_steps = 50_000
  config.checkpoint_steps = 10_000
  config.log_summary_steps = 1_000
  config.log_eval_steps = 5_000
  config.dtype_str = 'bfloat16'
  return config
