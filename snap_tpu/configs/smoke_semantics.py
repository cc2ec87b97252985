"""Tiny semantic-segmentation config for CPU smoke runs.

Exercises the fine-tuning path: pass ``pretrained=<workdir>`` in the config
args to adopt the bev_mapper subtree of a localization experiment
(reference: snap/configs/train_semantics.py + the pretrained-subtree
protocol of snap/trainer.py:70-120).
"""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  args = dict(kv.split('=') for kv in (args_str or '').split(',') if kv)

  config = defaults.base()
  config.model_name = 'semantic_net'
  config.model = defaults.semantic_net()
  config.model.apply_random_flip = True
  config.model.decoder_dim = 16
  config.model.bev_mapper = defaults.bev_mapper(('streetview', 'aerial'))

  dim = 32
  sv = config.model.bev_mapper.streetview_encoder
  sv.image_encoder.encoder = defaults.resnet('tiny')
  sv.image_encoder.output_dim = dim
  sv.feature_dim = dim
  sv.fusion.layers = (dim * 2, dim)
  sv.num_scale_bins = 8
  sv.top_k_view_selection = 2
  aerial = config.model.bev_mapper.aerial_encoder
  aerial.encoder = defaults.resnet('tiny')
  aerial.encoder.skip_root_block = True
  aerial.output_dim = dim
  config.model.bev_mapper.matching_dim = 16

  if 'pretrained' in args:
    config.model.bev_mapper.pretrained_path = args['pretrained']
    config.optimizer_configs.freeze_params_reg_exp = r'bev_mapper/'

  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training='smoke-city'),
          mode='single_scene',
          voxel_size=1.0,
          add_images=True,
          add_rasters=True,
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
