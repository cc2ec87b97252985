"""Shared test fixtures: tiny model configs + synthetic batches."""

from __future__ import annotations

from typing import Sequence

from ml_collections import config_dict

from snap_tpu.configs import defaults
from snap_tpu.data import loader as data_loader


def tiny_image_encoder(output_dim: int = 32,
                       skip_root: bool = False) -> config_dict.ConfigDict:
  cfg = defaults.image_encoder()
  cfg.encoder = defaults.resnet('tiny')
  cfg.encoder.skip_root_block = skip_root
  cfg.output_dim = output_dim
  return cfg


def tiny_streetview_encoder(dim: int = 32) -> config_dict.ConfigDict:
  cfg = defaults.streetview_encoder()
  cfg.image_encoder = tiny_image_encoder(dim)
  cfg.feature_dim = dim
  cfg.fusion.layers = (dim * 2, dim)
  cfg.num_scale_bins = 8
  cfg.top_k_view_selection = 2
  return cfg


def tiny_bev_mapper(
    modalities: Sequence[str] = ('streetview', 'aerial'),
    dim: int = 32,
) -> config_dict.ConfigDict:
  cfg = defaults.bev_mapper(modalities)
  if cfg.streetview_encoder is not None:
    cfg.streetview_encoder = tiny_streetview_encoder(dim)
  if cfg.aerial_encoder is not None:
    cfg.aerial_encoder = tiny_image_encoder(dim, skip_root=True)
  if cfg.semantic_encoder is not None:
    cfg.semantic_encoder.encoder = tiny_image_encoder(dim, skip_root=True)
    cfg.semantic_encoder.embedding_dim = 4
  cfg.matching_dim = 16
  return cfg


def tiny_localizer(
    modalities: Sequence[str] = ('streetview', 'aerial'),
    **overrides,
) -> config_dict.ConfigDict:
  cfg = defaults.bev_localizer()
  cfg.bev_mapper = tiny_bev_mapper(modalities)
  cfg.num_pose_samples = 32
  cfg.num_pose_sampling_retries = 2
  cfg.filter_points_in_fov = True
  for k, v in overrides.items():
    setattr(cfg, k, v)
  return cfg


def tiny_dataset_config(**overrides) -> config_dict.ConfigDict:
  cfg = defaults.streetview_singlescene()
  cfg.voxel_size = 1.0
  cfg.mode = 'pair_scene_view'
  cfg.num_views = 3
  cfg.image_size = (36, 48)
  cfg.evaluation_size = 4
  cfg.add_rasters = True
  for k, v in overrides.items():
    setattr(cfg, k, v)
  return cfg


def tiny_dataset(batch_size: int = 2, mesh=None,
                 **overrides) -> data_loader.Dataset:
  return data_loader.get_dataset(
      batch_size=batch_size,
      eval_batch_size=batch_size,
      dataset_configs=tiny_dataset_config(**overrides),
      mesh=mesh,
  )
