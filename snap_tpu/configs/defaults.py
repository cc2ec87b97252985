"""Default configs for modules, datasets, and training.

Capability parity with the reference config library
(snap/configs/defaults.py), adapted for the TPU-native stack:

- default compute dtype is bfloat16 (no loss-scale needed on TPU; float16 +
  dynamic scaling remains available as a capability),
- a ``mesh`` section describes the device mesh (data/model axes) used by the
  jit/NamedSharding trainer instead of pmap,
- the localizer exposes a selectable ``pose_backend`` ('ransac' or
  'exhaustive'); the reference shipped exhaustive voting as dead code
  (snap/models/pose_exhaustive_voting.py) — here it is a live backend.
"""

from __future__ import annotations

import enum
from typing import Any, Iterable

from ml_collections import config_dict

DATA_SPLITS_CITIES = dict(
    train=[
        'barcelona', 'london', 'paris',
        'manhattan', 'sanfrancisco', 'brooklyn',
        'manila', 'singapore', 'taiwan', 'tokyo1',
        'rio', 'sydney',
    ],
    test=['osaka', 'amsterdam', 'mexico', 'melbourne', 'saopaulo', 'seattle'],
)


class MapModalities(str, enum.Enum):
  STREETVIEW = 'streetview'
  AERIAL = 'aerial'
  SEMANTIC = 'semantic'


def parse_argument_string(
    args_str: None | str, **default_args: Any
) -> dict[str, Any]:
  """Parse 'image_encoder=R50,modalities=streetview+aerial' argument DSL.

  The accepted keys are the training defaults unless the caller supplies
  its own ``default_args`` (e.g. eval configs accept eval-shaped args).
  """
  args = dict(kv.split('=') for kv in (args_str or '').split(',') if kv)
  default_args = default_args or dict(
      image_encoder='R50',
      modalities='streetview+aerial',
      pose_backend='ransac',
      scale='full',
  )
  if unknown_args := (set(args) - set(default_args)):
    raise ValueError(f'Unknown args: {unknown_args}')
  return default_args | args


def base() -> config_dict.ConfigDict:
  """Base training config (reference: snap/configs/defaults.py:62-94)."""
  return config_dict.ConfigDict(
      dict(
          model_name=config_dict.placeholder(str),
          model=config_dict.placeholder(config_dict.ConfigDict),
          data=config_dict.placeholder(config_dict.ConfigDict),
          # training
          batch_size=1,
          eval_batch_size=config_dict.placeholder(int),
          rng_seed=0,
          shuffle_seed=1234567,
          data_dtype_str='float32',
          dtype_str='bfloat16',
          lr_configs=dict(
              learning_rate_schedule='compound',
              factors='constant',
              base_learning_rate=config_dict.placeholder(float),
              warmup_steps=0,
              start_decay_step=0,
              steps_per_cycle=config_dict.placeholder(int),
          ),
          optimizer_configs=dict(
              optimizer='adam',
              weight_decay=0.0,
              freeze_params_reg_exp=config_dict.placeholder(str),
              # False skips allocating optimizer state (Adam moments) for
              # frozen subtrees — ~2x the frozen params' bytes back in HBM
              # for head fine-tuning at R152x2 scale — at the cost of an
              # opt-state checkpoint structure that differs from the
              # unfrozen run's (resume stays self-consistent either way).
              allocate_frozen_state=True,
          ),
          max_grad_norm=config_dict.placeholder(float),
          num_training_steps=config_dict.placeholder(int),
          num_training_epochs=config_dict.placeholder(int),
          checkpoint=True,
          checkpoint_steps=config_dict.placeholder(int),
          max_checkpoints_to_keep=10,
          # 'cpu' (reference behavior: host-side init, no double device
          # alloc) or 'device' for the default accelerator backend — on
          # 1-core hosts a full-scale CPU init takes tens of minutes.
          init_backend='cpu',
          # device mesh: axis sizes; -1 means "all remaining devices".
          mesh=dict(data=-1, model=1),
          # smallest last-dim size eligible for tensor-parallel sharding
          tp_min_dim=256,
          # logging
          log_eval_steps=1000,
          steps_per_eval=config_dict.placeholder(int),
          write_summary=True,
          log_summary_steps=config_dict.placeholder(int),
          xprof=True,
          debug_train=False,
          debug_eval=False,
      )
  ).lock()


def streetview_singlescene() -> config_dict.ConfigDict:
  """Dataset config (reference: snap/configs/defaults.py:97-119).

  The upstream TFDS builder is unreleased; our loader substitutes a
  procedural synthetic-scene generator with the same batch schema
  (snap_tpu/data). ``locations`` seeds the generator per pseudo-city.
  """
  return config_dict.ConfigDict(
      dict(
          name='streetview_singlescene',
          version=config_dict.placeholder(str),
          data_dir=config_dict.placeholder(str),
          dirname='synthetic_streetview',
          locations=dict(
              training=config_dict.placeholder(str),
              evaluation=config_dict.placeholder(str),
          ),
          training_size_per_builder=config_dict.placeholder(int),
          evaluation_size=1024,
          voxel_size=config_dict.placeholder(float),
          add_images=True,
          add_lidar_rays=False,
          num_rays=config_dict.placeholder(int),
          mode=config_dict.placeholder(str),
          add_rasters=False,
          # synthetic-scene generation knobs
          num_views=10,
          image_size=(180, 240),  # (h, w); kept modest for the rig of views
          raster_size=config_dict.placeholder(tuple),
          prefetch_buffer_size=2,
          num_workers=2,
          # None = auto: generate batches on the accelerator unless the
          # default backend is CPU (tests) / the run is multi-process.
          on_device_generation=config_dict.placeholder(bool),
      )
  ).lock()


def mlp() -> config_dict.ConfigDict:
  return config_dict.ConfigDict(
      dict(
          activation='relu',
          layers=config_dict.placeholder(tuple),
          apply_input_activation=False,
      )
  ).lock()


def resnet(name: str = 'R50') -> config_dict.ConfigDict:
  """BiT-ResNet encoder config (reference: snap/configs/defaults.py:132-171)."""
  fields = dict(
      width=1,
      depth=50,  # 26/50/101/152/200, or a tuple of per-stage block counts
      limit_num_blocks=4,
      skip_root_block=False,
      checkpoint_blocks=False,
      checkpoint_units=False,
      pretrained_path=config_dict.placeholder(str),
  )
  match name:
    case 'R50':
      pass
    case 'R152x2':
      fields.update(width=2, depth=152, limit_num_blocks=3,
                    checkpoint_blocks=True, checkpoint_units=True)
    case 'R101':
      fields.update(depth=101, limit_num_blocks=4,
                    checkpoint_blocks=True, checkpoint_units=True)
    case 'R26':
      fields.update(depth=26)
    case 'tiny':
      # Small config for tests / CPU smoke runs.
      fields.update(depth=(1, 1), limit_num_blocks=2)
    case _:
      raise ValueError(f'Unknown ResNet name: {name}')
  return config_dict.ConfigDict(fields).lock()


def image_encoder() -> config_dict.ConfigDict:
  return config_dict.ConfigDict(
      dict(
          encoder_name='resnet',
          encoder=resnet(),
          output_dim=128,
          num_pyr_levels=config_dict.placeholder(int),
      )
  ).lock()


def aerial_encoder() -> config_dict.ConfigDict:
  encoder = image_encoder()
  encoder.encoder.skip_root_block = True
  return encoder


def semantic_raster_encoder() -> config_dict.ConfigDict:
  encoder = image_encoder()
  encoder.encoder.skip_root_block = True
  encoder.encoder.depth = 26
  encoder.encoder.width = 2
  encoder.encoder.pretrained_path = None
  encoder.encoder.limit_num_blocks = 4
  return config_dict.ConfigDict(dict(encoder=encoder, embedding_dim=8)).lock()


def streetview_encoder() -> config_dict.ConfigDict:
  """3D lifting encoder (reference: snap/configs/defaults.py:201-223)."""
  feature_dim = 128
  fusion = mlp()
  fusion.layers = (feature_dim * 2, feature_dim)
  proj = mlp()
  proj.apply_input_activation = True
  return config_dict.ConfigDict(
      dict(
          image_encoder=image_encoder(),
          feature_dim=feature_dim,
          fusion=fusion,
          proj_mlp=proj,
          depth_mlp=config_dict.placeholder(config_dict.ConfigDict),
          do_weighted_fusion=True,
          num_scale_bins=32,
          top_k_view_selection=4,
          depth_min_max=(1.0, 32.0),
          fusion_add_minmax=False,
          fusion_use_variance=True,
          max_view_distance=config_dict.placeholder(float),
          pretrained_path=config_dict.placeholder(str),
          # 'gather': reference-parity top-k gather ([N, K, D] working set;
          #           OOMs at eval scale);
          # 'scan': per-view scan, O(point_tile x D) memory, reads all views;
          # 'stream': top-k streamed row gathers, O(N x D) memory, reads only
          #           the k selected views (TPU-preferred).
          pooling_impl='stream',
          point_tile=131072,
          # Eval-time lift tiling (0 = untiled peak-throughput): bounds the
          # [B, N, 2, 2, C] gather transient for large eval batches.
          point_tile_eval=0,
      )
  ).lock()


def vertical_pooling() -> config_dict.ConfigDict:
  feature_dim = 128
  fusion = mlp()
  fusion.layers = (feature_dim * 2, feature_dim)
  return config_dict.ConfigDict(
      dict(
          pooling='max',
          mlp=fusion,  # Only used for pooling == 'mlp'.
      )
  ).lock()


def bev_mapper(
    modalities: Iterable[str] = (MapModalities.STREETVIEW, MapModalities.AERIAL)
) -> config_dict.ConfigDict:
  """Multi-modal BEV mapper (reference: snap/configs/defaults.py:238-270)."""
  config = config_dict.ConfigDict(
      dict(
          streetview_encoder=config_dict.placeholder(config_dict.ConfigDict),
          scene_z_offset=4.0,
          scene_z_offset_range=(-2, 2),
          scene_z_height=12.0,
          pooling=vertical_pooling(),
          aerial_encoder=config_dict.placeholder(config_dict.ConfigDict),
          semantic_encoder=config_dict.placeholder(config_dict.ConfigDict),
          modality_fusion=vertical_pooling(),
          bev_net=config_dict.placeholder(config_dict.ConfigDict),
          matching_dim=32,
          normalize_matching_features=True,
          add_confidence=False,
          apply_modality_dropout=True,
          pretrained_path=config_dict.placeholder(str),
      )
  )
  for m in modalities:
    match MapModalities(m):
      case MapModalities.STREETVIEW:
        config.streetview_encoder = streetview_encoder()
      case MapModalities.AERIAL:
        config.aerial_encoder = aerial_encoder()
      case MapModalities.SEMANTIC:
        config.semantic_encoder = semantic_raster_encoder()
  return config.lock()


def occupancy_net() -> config_dict.ConfigDict:
  predictor = mlp()
  predictor.layers = (128, 1)
  return config_dict.ConfigDict(
      dict(
          num_samples_per_ray=100,
          ray_margin=0.2,
          streetview_encoder=streetview_encoder(),
          occupancy_mlp=predictor,
          # Cut the backward at the encoder output — exact iff the whole
          # encoder is frozen (see semantic_net.stop_mapper_gradients).
          stop_encoder_gradients=False,
      )
  ).lock()


def semantic_net() -> config_dict.ConfigDict:
  """Semantic BEV head (reference: snap/configs/defaults.py:286-340)."""
  return config_dict.ConfigDict(
      dict(
          bev_mapper=bev_mapper(),
          decoder_type='mlp',
          decoder_dim=128,
          mlp_num_layers=2,
          resnet_num_units=8,
          apply_random_flip=False,
          # Cut the backward at the mapper output. Exact iff every mapper
          # parameter is frozen (freeze_params_reg_exp covers bev_mapper/):
          # XLA then drops the whole mapper backward and its saved
          # residuals — fine-tuning fits a bigger batch and skips ~the
          # mapper's share of the step.
          stop_mapper_gradients=False,
          area_classes=(
              'crosswalk', 'sidewalk', 'road', 'terrain', 'building',
          ),
          area_frequencies=(
              ('crosswalk', 0.036434),
              ('sidewalk', 0.226553),
              ('road', 0.446990),
              ('terrain', 0.085374),
              ('building', 0.204649),
          ),
          object_classes_exclusive=('fence', 'pole', 'tree'),
          object_classes_independent=(
              'traffic_sign', 'traffic_light', 'street_light',
          ),
          object_frequencies=(
              ('fence', 0.006257),
              ('pole', 0.001172),
              ('tree', 0.001924),
              ('traffic_sign', 0.000960),
              ('traffic_light', 0.000559),
              ('street_light', 0.000738),
              ('void', 0.988391),
          ),
      )
  ).lock()


def bev_localizer() -> config_dict.ConfigDict:
  """3-DoF localizer (reference: snap/configs/defaults.py:343-361)."""
  return config_dict.ConfigDict(
      dict(
          bev_mapper=bev_mapper(),
          bev_mapper_query=config_dict.placeholder(config_dict.ConfigDict),
          add_confidence_query=False,
          add_confidence_map=False,
          mask_score_out_of_bounds=False,
          clip_negative_scores=True,
          add_temperature=True,
          init_temperature=2.0,
          num_pose_samples=config_dict.placeholder(int),
          num_pose_sampling_retries=1,
          query_frustum_depth=16.0,
          filter_points_in_fov=False,
          threshold_remove_accurate_poses=config_dict.placeholder(tuple),
          do_grid_refinement=False,
          # 'ransac' (sampled 2-pt Kabsch) or 'exhaustive' (dense trans x rot
          # correlation; the dense-MXU-friendly backend).
          pose_backend='ransac',
          num_rotations=64,  # exhaustive backend only
          # Dense-refinement (range_deg, delta_deg) fans, each re-centered
          # on the previous best. Default: one ±5° fan (the reference's
          # refinement budget, pose_estimation.py:178-184). A wide+narrow
          # two-stage schedule (e.g. ((11,1),(1.25,0.125))) reaches ±2
          # coarse rotation bins, but the measured ablation
          # (results/run_small/rotation_ablation.json) shows rotation
          # outliers are wrong-mode failures that wider eval fans do not
          # recover, so the faster single fan stays the default.
          dense_refinement_stages=((5.0, 0.25),),
          # Sub-bin parabolic peak fit on the final fan's score volume:
          # recovers the fractional (angle, x, y) peak below the fan-step /
          # cell-size quantization at negligible cost. Eval-time-only
          # estimator change (does not affect the training loss).
          subcell_refinement=False,
      )
  ).lock()


def get_config() -> config_dict.ConfigDict:
  """Dummy get_config for config-smoke tests."""
  return base()
