"""Tiny occupancy config for CPU smoke runs.

Lidar-supervised 3D occupancy on the shared BEV mapper (reference:
snap/configs/train_occupancy.py at toy scale). Pass ``pretrained=<workdir>``
to adopt a localization run's streetview encoder via the pretrained-subtree
protocol.
"""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  args = dict(kv.split('=') for kv in (args_str or '').split(',') if kv)

  config = defaults.base()
  config.model_name = 'occupancy_net'
  config.model = defaults.occupancy_net()
  config.model.occupancy_mlp.layers = (16, 1)
  config.model.num_samples_per_ray = 16

  dim = 32
  sv = config.model.streetview_encoder
  sv.image_encoder.encoder = defaults.resnet('tiny')
  sv.image_encoder.output_dim = dim
  sv.feature_dim = dim
  sv.fusion.layers = (dim * 2, dim)
  sv.num_scale_bins = 8
  sv.top_k_view_selection = 2

  if 'pretrained' in args:
    sv.pretrained_path = args['pretrained']
    config.optimizer_configs.freeze_params_reg_exp = r'streetview_encoder/'

  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training='smoke-city'),
          mode='single_scene',
          voxel_size=1.0,
          add_images=True,
          add_lidar_rays=True,
          num_rays=512,
          evaluation_size=4,
          num_views=3,
          image_size=(36, 48),
      )
  )

  config.batch_size = 8  # divides the 8-virtual-device CPU test mesh
  config.num_training_steps = 4
  config.log_summary_steps = 2
  config.log_eval_steps = 4
  config.checkpoint_steps = 4
  config.steps_per_eval = 1
  config.lr_configs.base_learning_rate = 1e-3
  config.dtype_str = 'float32'
  return config
