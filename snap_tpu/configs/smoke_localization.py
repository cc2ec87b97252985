"""Tiny localization config for CPU smoke runs and CLI verification.

Driver config #1 analogue: one synthetic scene type, tiny encoder, random
init — runs in minutes on CPU (set JAX_PLATFORMS=cpu) or seconds on TPU.
"""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  args = defaults.parse_argument_string(args_str, pose_backend='ransac')
  config = defaults.base()
  config.model_name = 'bev_localizer'
  config.model = defaults.bev_localizer()
  config.model.filter_points_in_fov = True
  config.model.num_pose_samples = 64
  config.model.num_pose_sampling_retries = 2
  # 'pose_backend=exhaustive' smoke-drives the dense FFT volume (and the
  # dense refinement / subcell estimator at eval) at tiny scale.
  config.model.pose_backend = str(args['pose_backend'])
  if config.model.pose_backend == 'exhaustive':
    config.model.num_rotations = 16
    # The dense volume correlates the full rectangular query grid; the
    # in-FoV point filter produces a sparse point list (ransac-only).
    config.model.filter_points_in_fov = False
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

  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training='smoke-city'),
          mode='pair_scene_view',
          voxel_size=1.0,
          add_images=True,
          add_rasters=True,
          evaluation_size=4,
          num_views=3,
          image_size=(36, 48),
      )
  )

  config.batch_size = 8  # divides the 8-virtual-device CPU test mesh
  config.num_training_steps = 8
  config.log_summary_steps = 2
  config.log_eval_steps = 8
  config.checkpoint_steps = 4
  config.steps_per_eval = 1
  config.lr_configs.base_learning_rate = 1e-3
  config.max_grad_norm = 1.0
  config.dtype_str = 'float32'
  return config
