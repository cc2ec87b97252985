"""Semantic segmentation fine-tuning config (reference:
snap/configs/train_semantics.py; upstream has an args-before-assignment
NameError at line 32 — fixed here by parsing args first)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config."""
  config = defaults.base()
  config.model_name = 'semantic_net'
  config.model = defaults.semantic_net()
  config.model.apply_random_flip = True
  config.model.decoder_dim = 256
  config.model.decoder_type = 'resnet_stage'
  config.model.resnet_num_units = 2

  args = defaults.parse_argument_string(args_str)
  map_modalities = args['modalities'].split('+')
  config.model.bev_mapper = defaults.bev_mapper(map_modalities)
  if config.model.bev_mapper.streetview_encoder is not None:
    config.model.bev_mapper.streetview_encoder.max_view_distance = 20.0
  config.optimizer_configs.freeze_params_reg_exp = r'bev_mapper/'
  # The whole mapper is frozen: skip its Adam moments (~2x mapper bytes of
  # HBM back at R152x2 scale; the head checkpoint stays self-consistent).
  config.optimizer_configs.allocate_frozen_state = False

  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(
              training='train-synthetic-semantics',
              evaluation='val-synthetic-semantics',
          ),
          mode='single_scene',
          voxel_size=0.2,
          add_images=True,
          add_rasters=True,
          evaluation_size=1_024,
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
