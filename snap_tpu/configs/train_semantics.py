"""Semantic segmentation fine-tuning config (reference:
snap/configs/train_semantics.py; upstream has an args-before-assignment
NameError at line 32 — fixed here by parsing args first)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults
from snap_tpu.utils import configs as config_utils


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config.

  Args DSL adds two keys over the reference's
  (snap/configs/train_semantics.py:22-36):
  - ``pretrained_mapper=<workdir>``: fine-tune the head on that
    experiment's FROZEN trained mapper — the mapper config is taken
    verbatim from the workdir (so adopted params match exactly) and the
    data geometry (voxel size, views, image size) follows the mapper's
    training distribution.
  - ``scale=small``: a short single-chip schedule sized for the
    run_small-scale mapper instead of the reference's 50k-step ramp.
  """
  config = defaults.base()
  config.model_name = 'semantic_net'
  config.model = defaults.semantic_net()
  config.model.apply_random_flip = True
  config.model.decoder_dim = 256
  config.model.decoder_type = 'resnet_stage'
  config.model.resnet_num_units = 2

  args = defaults.parse_argument_string(
      args_str,
      modalities='streetview+aerial',
      scale='full',
      pretrained_mapper='',
      # 0 keeps the per-scale default. A full-scale mapper (0.2 m / 20
      # views) needs a smaller batch than the small-scale default even
      # with the backward cut at the mapper output.
      batch_size=0,
      # 0 keeps the per-scale default. Short supervised head runs (a few
      # hundred steps on a shared chip) need a denser loss curve than the
      # recipe's 100-step cadence.
      log_summary_steps=0,
  )
  map_modalities = args['modalities'].split('+')
  config.model.bev_mapper = defaults.bev_mapper(map_modalities)
  if config.model.bev_mapper.streetview_encoder is not None:
    config.model.bev_mapper.streetview_encoder.max_view_distance = 20.0
  config.optimizer_configs.freeze_params_reg_exp = r'bev_mapper/'
  # The whole mapper is frozen: skip its Adam moments (~2x mapper bytes of
  # HBM back at R152x2 scale; the head checkpoint stays self-consistent)
  # and cut the backward at the mapper output (exact for a fully frozen
  # mapper; XLA drops the mapper backward + residuals).
  config.optimizer_configs.allocate_frozen_state = False
  config.model.stop_mapper_gradients = True

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

  if args['pretrained_mapper']:
    workdir = str(args['pretrained_mapper'])
    pretrained = config_utils.config_load(workdir)
    mapper = config_dict.ConfigDict(pretrained.model.bev_mapper)
    with mapper.unlocked():
      mapper.pretrained_path = workdir
      if mapper.get('streetview_encoder') is not None:
        # The in-loop eval runs the lift with train=False, which reads
        # point_tile_eval (not the training point_tile); without it the
        # eval-side lift is untiled and OOMs at full scale — the round-4
        # run_sem_head crash (trainer.py in-loop eval, TPU
        # RESOURCE_EXHAUSTED). Bound it with the same tile the training
        # step fits with (eval_localization.py precedent).
        mapper.streetview_encoder.point_tile_eval = (
            mapper.streetview_encoder.get('point_tile') or 288_000)
    config.model.bev_mapper = mapper
    # Frozen features are only meaningful on the distribution the mapper
    # was trained on: follow its scene geometry.
    config.data.voxel_size = float(pretrained.data.voxel_size)
    config.data.num_views = int(pretrained.data.num_views)
    if pretrained.data.get('image_size') is not None:
      config.data.image_size = tuple(pretrained.data.image_size)
    # A trained mapper is usually full-scale: the init forward pass on the
    # CPU backend takes minutes there (the full1chip recipe hit the same;
    # train_localization.py init_backend note).
    config.init_backend = 'device'

  small = args['scale'] == 'small'
  if small:
    config.data.evaluation_size = 128
    config.batch_size = 8
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
  if int(args['log_summary_steps']):
    config.log_summary_steps = int(args['log_summary_steps'])
  config.dtype_str = 'bfloat16'
  return config
