"""BEV localization training config (reference:
snap/configs/train_localization.py)."""

from __future__ import annotations

from ml_collections import config_dict

from snap_tpu.configs import defaults


def get_config(args_str: None | str = None) -> config_dict.ConfigDict:
  """Return the config. args: image_encoder=R50|R152x2|R101|R26|tiny,
  modalities=streetview+aerial[+semantic], pose_backend=ransac|exhaustive,
  scale=full|small.

  ``scale=small`` is the from-scratch convergence recipe on synthetic data:
  the same model and loss at a reduced scene resolution (0.4 m voxels,
  10 views, 90x120 images), batch 8, and a warmup+cosine schedule sized for
  tens of thousands of steps instead of the reference's 400k
  (reference scale: snap/configs/train_localization.py:73-93).
  """
  config = defaults.base()
  config.model_name = 'bev_localizer'
  config.model = defaults.bev_localizer()
  config.model.filter_points_in_fov = True
  config.model.num_pose_samples = 10_000
  config.model.num_pose_sampling_retries = 8

  args = defaults.parse_argument_string(
      args_str,
      image_encoder='R50',
      modalities='streetview+aerial',
      pose_backend='ransac',
      scale='full',
      # Path to a big_vision-format BiT .npz: warm-starts every ResNet
      # trunk, matching the reference's pretrained ramp
      # (snap/models/resnet.py:223-233). Empty = from scratch.
      pretrained_resnet='',
      # bev_net=1 inserts the residual conv stage over the fused plane
      # (beyond-reference: upstream declared the slot but raised
      # NotImplementedError, snap/models/bev_mapper.py:141-142).
      bev_net=0,
      # Training-time lift tile size override (points per tile; 0 keeps the
      # per-scale default). Smaller tiles bound the lift transient — the
      # knob that lets HBM-hungrier backward-scatter modes fit
      # (tools/probe_compile_hbm.py sweeps this compile-only).
      point_tile=0,
      # Workdir (or tools/export_pretrained.py mini-workdir) whose trained
      # bev_mapper subtree warm-starts this run's mapper — the cross-round
      # continuation path for checkpoints exported to git. Empty = scratch.
      pretrained_mapper='',
      # Effective step the pretrained_mapper export was taken at. When set
      # (full1chip only), the schedule continues the 20k-step recipe's tail
      # instead of re-running warmup+cosine from scratch: a 100-step
      # re-warmup (fresh Adam moments) up to the original schedule's LR at
      # that step, then cosine to zero over the remaining steps. The data
      # shuffle seed is folded with the step so the continuation does not
      # replay the examples the original run already consumed.
      continue_step=0,
  )
  cs = int(args['continue_step'])
  if cs:
    # Fail fast on silently-wrong continuations (ADVICE r4): the schedule
    # tail below is only defined for the full1chip 20k recipe and needs a
    # params export to continue from.
    if not args['pretrained_mapper']:
      raise ValueError('continue_step requires pretrained_mapper=<export>')
    if args['scale'] != 'full1chip':
      raise ValueError(
          f'continue_step is only defined for scale=full1chip, '
          f'got scale={args["scale"]}')
    if not 0 < cs < 20_000:
      raise ValueError(f'continue_step must be in (0, 20000), got {cs}')
    # An export records its effective step as the checkpoint directory
    # number (tools/export_pretrained.py --effective-step); a mismatched
    # continue_step would silently build the wrong schedule tail.
    import pathlib

    ckdir = pathlib.Path(args['pretrained_mapper']) / 'checkpoints'
    if ckdir.is_dir():
      steps = sorted(int(p.name) for p in ckdir.iterdir()
                     if p.name.isdigit())
      if steps and cs not in steps:
        raise ValueError(
            f'continue_step={cs} does not match the export checkpoint '
            f'step(s) {steps} in {ckdir.parent}; pass the matching step or '
            f're-export with tools/export_pretrained.py --effective-step')

  image_encoder = defaults.resnet(args['image_encoder'])
  if args['pretrained_resnet']:
    image_encoder.pretrained_path = str(args['pretrained_resnet'])

  config.model.pose_backend = args['pose_backend']
  if args['pose_backend'] == 'exhaustive':
    # Dense voting needs the full query grid and linear (un-clipped) scores.
    config.model.filter_points_in_fov = False
    config.model.clip_negative_scores = False

  map_modalities = args['modalities'].split('+')
  config.model.bev_mapper = defaults.bev_mapper(map_modalities)
  if int(args['bev_net']):
    config.model.bev_mapper.bev_net = config_dict.ConfigDict(
        dict(num_units=2, checkpoint_units=True))
  if args['pretrained_mapper']:
    config.model.bev_mapper.pretrained_path = str(args['pretrained_mapper'])

  if defaults.MapModalities.STREETVIEW in map_modalities:
    config.model.bev_mapper.streetview_encoder.image_encoder.encoder = (
        image_encoder
    )
  else:
    # Query scenes are always street-level: give them their own mapper.
    mapper_query = defaults.bev_mapper(
        modalities=(defaults.MapModalities.STREETVIEW,)
    )
    mapper_query.streetview_encoder.image_encoder.encoder = image_encoder
    dim = mapper_query.streetview_encoder.feature_dim
    mapper_query.streetview_encoder.fusion.layers = (dim * 2, dim * 2, dim)
    config.model.bev_mapper_query = mapper_query

  cities = defaults.DATA_SPLITS_CITIES['train']
  locations = ','.join(f'{c}-synthetic' for c in cities)
  small = args['scale'] == 'small'
  # 'full1chip': the reference scene scale (0.2 m voxels, R50, 20 views)
  # with the per-chip shard of the reference's global batch 32 — what one
  # v5e chip can run by itself (16 data-parallel chips recover the paper
  # recipe; bench.py TRAIN_BATCH documents the HBM envelope).
  one_chip = args['scale'] == 'full1chip'
  config.data = defaults.streetview_singlescene()
  config.data.update(
      dict(
          locations=dict(training=locations),
          mode='pair_scene_view',
          voxel_size=0.4 if small else 0.2,
          add_images=defaults.MapModalities.STREETVIEW in map_modalities,
          add_rasters=(
              (defaults.MapModalities.AERIAL in map_modalities)
              or (defaults.MapModalities.SEMANTIC in map_modalities)
          ),
          evaluation_size=64 if small else (32 if one_chip else 8_192),
          training_size_per_builder=5_000_000,
          num_views=10 if small else 20,
          num_workers=8 if small else 2,
      )
  )
  if small:
    config.data.image_size = (90, 120)
  config.batch_size = 8 if small else (2 if one_chip else 32)

  if one_chip:
    # Single-chip full-scale schedule: frequent checkpoints (the chip is
    # shared with benchmarks), warmup for the small batch, accelerator init.
    if defaults.MapModalities.STREETVIEW in map_modalities:
      # 4 unrolled lift tiles: the measured HBM/compile sweet spot at
      # batch 2 (tools/probe_train_compile.py; docs/PERFORMANCE.md).
      config.model.bev_mapper.streetview_encoder.point_tile = (
          int(args['point_tile']) or 288_000)
    config.checkpoint_steps = 500
    config.log_summary_steps = 100
    config.log_eval_steps = 2_000
    config.steps_per_eval = 8
    config.num_training_steps = 20_000
    config.lr_configs.warmup_steps = 1_000
    config.lr_configs.start_decay_step = 4_000
    config.lr_configs.base_learning_rate = 2e-4
    config.lr_configs.factors = 'constant * linear_warmup * cosine_decay'
    config.lr_configs.steps_per_cycle = config.get_ref(
        'num_training_steps'
    ) - config.lr_configs.get_ref('start_decay_step')
    config.max_grad_norm = 1.0
    config.dtype_str = 'bfloat16'
    config.init_backend = 'device'
    if cs > 0:
      # Continue the original schedule's EXACT tail from a params-only
      # export (ADVICE r4): keep the original base LR and 16k cosine cycle
      # and shift the decay origin back by cs, so lr(local step s) equals
      # the original schedule's lr(cs + s) — the cosine clip handles a
      # negative start_decay_step when cs > 4000. A 100-step linear
      # re-warmup (fresh Adam moments from a params-only export) layers on
      # top and is exact past local step 100 whenever cs >= 1000 (past the
      # original warmup).
      config.num_training_steps = 20_000 - cs
      config.lr_configs.warmup_steps = 100
      config.lr_configs.start_decay_step = 4_000 - cs
      config.lr_configs.steps_per_cycle = 16_000
      config.shuffle_seed = 1234567 + cs
    return config

  if int(args['point_tile']) and (
      defaults.MapModalities.STREETVIEW in map_modalities):
    config.model.bev_mapper.streetview_encoder.point_tile = (
        int(args['point_tile']))

  if small:
    # From-scratch convergence on synthetic data: short schedule, higher lr.
    # Checkpoint often: single-chip runs share the chip with benchmarks and
    # resume from the latest step after a pause.
    config.checkpoint_steps = 1_000
    config.log_summary_steps = 100
    config.log_eval_steps = 2_000
    config.steps_per_eval = 8
    config.num_training_steps = 20_000
    config.lr_configs.warmup_steps = 1_000
    config.lr_configs.start_decay_step = 4_000
    config.lr_configs.base_learning_rate = 5e-4
    config.lr_configs.factors = 'constant * linear_warmup * cosine_decay'
    config.lr_configs.steps_per_cycle = config.get_ref(
        'num_training_steps'
    ) - config.lr_configs.get_ref('start_decay_step')
    config.max_grad_norm = 1.0
    config.dtype_str = 'bfloat16'
    return config

  if args['image_encoder'] == 'R152x2':
    config.checkpoint_steps = 2_000
    config.log_summary_steps = 500
    config.log_eval_steps = 4_000
    config.num_training_steps = 200_000
  else:
    config.checkpoint_steps = 10_000
    config.log_summary_steps = 1_000
    config.log_eval_steps = 5_000
    config.num_training_steps = 400_000

  config.lr_configs.start_decay_step = config.get_ref('num_training_steps') // 2
  config.lr_configs.base_learning_rate = 5e-5
  config.lr_configs.factors = 'constant * cosine_decay'
  config.lr_configs.steps_per_cycle = config.get_ref(
      'num_training_steps'
  ) - config.lr_configs.get_ref('start_decay_step')
  # bfloat16 on TPU: no dynamic loss scaling needed (fp16 remains supported).
  config.dtype_str = 'bfloat16'
  return config
