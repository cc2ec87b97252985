"""Occupancy network training config (reference:
snap/configs/train_occupancy.py)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults
from snap_tpu.utils import configs as config_utils


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config.

  Args DSL (beyond the reference, snap/configs/train_occupancy.py:21-54):
  ``pretrained_mapper=<workdir>`` freezes THAT experiment's trained
  StreetViewEncoder (config taken verbatim so adopted params match);
  ``scale=small`` is a short single-chip schedule at the run_small scene
  scale.
  """
  config = defaults.base()
  config.model_name = 'occupancy_net'
  config.model = defaults.occupancy_net()
  config.model.occupancy_mlp.layers = (128, 256, 1)

  args = defaults.parse_argument_string(
      args_str, scale='full', pretrained_mapper='',
      # 0 keeps the per-scale default. A full-scale encoder (0.2 m / 20
      # views) needs a smaller batch than the small-scale default even
      # with the backward cut at the encoder output.
      batch_size=0)

  config.optimizer_configs.freeze_params_reg_exp = r'streetview_encoder/'
  # The frozen encoder is most of the model: skip its Adam moments and cut
  # the backward at its output (exact — only the occupancy MLP trains).
  config.optimizer_configs.allocate_frozen_state = False
  config.model.stop_encoder_gradients = True

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

  if args['pretrained_mapper']:
    workdir = str(args['pretrained_mapper'])
    pretrained = config_utils.config_load(workdir)
    sv = config_dict.ConfigDict(
        pretrained.model.bev_mapper.streetview_encoder)
    with sv.unlocked():
      sv.pretrained_path = workdir
      # Bound the eval-side (train=False) lift like the training step:
      # without point_tile_eval the eval lift is untiled and OOMs at full
      # scale (round-4 run_sem_head precedent on the semantics twin).
      sv.point_tile_eval = sv.get('point_tile') or 288_000
    config.model.streetview_encoder = sv
    # Frozen features are only meaningful on the mapper's training
    # distribution: follow its scene geometry.
    config.data.voxel_size = float(pretrained.data.voxel_size)
    config.data.num_views = int(pretrained.data.num_views)
    if pretrained.data.get('image_size') is not None:
      config.data.image_size = tuple(pretrained.data.image_size)
    # A trained encoder is usually full-scale: CPU-backend init forward
    # takes minutes there (see train_localization.py init_backend note).
    config.init_backend = 'device'
    # The eval step trilinearly reads the full 3D feature volume per
    # example: at the full scale + batch 4 it schedules at 15.73 of
    # 15.75 GiB (warm_train_cache probe) — the same red zone that OOMed
    # the round-4 semantics in-loop eval at runtime. Halve the eval
    # batch unless explicitly overridden.
    config.eval_batch_size = 2

  if args['scale'] == 'small':
    config.data.evaluation_size = 128
    config.data.num_rays = 4_000
    config.batch_size = 4
    config.lr_configs.base_learning_rate = 2e-4
    config.num_training_steps = 3_000
    config.checkpoint_steps = 500
    config.log_summary_steps = 100
    config.log_eval_steps = 500
    config.steps_per_eval = 8
  else:
    config.batch_size = 1
    config.lr_configs.base_learning_rate = 5e-5
    config.num_training_steps = 50_000
    config.checkpoint_steps = 10_000
    config.log_summary_steps = 1_000
    config.log_eval_steps = 5_000
  if int(args['batch_size']):
    config.batch_size = int(args['batch_size'])
  config.dtype_str = 'bfloat16'
  return config
