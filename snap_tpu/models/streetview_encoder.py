"""Lift a rig of posed images into a 3D feature volume at query points.

Reference behavior: snap/models/streetview_encoder.py. TPU-first changes:

- views are folded into the batch axis for the CNN (one large conv batch on
  the MXU) instead of ``nn.vmap`` over views;
- the project/select/sample/pool pipeline is the broadcast-native gather
  formulation in snap_tpu/ops/view_fusion.py (Pallas-replaceable);
- parameters are float32, compute dtype configurable (bfloat16 on TPU).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

from absl import logging
import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

from snap_tpu.models import base
from snap_tpu.models import image_encoder
from snap_tpu.models import layers
from snap_tpu.models import types
from snap_tpu.ops import view_fusion
from snap_tpu.ops import view_scan
from snap_tpu.utils import configs as config_utils
from snap_tpu.utils import misc

Array = jax.Array


class StreetViewEncoder(nn.Module):
  """Encode a set of posed images into a 3D feature grid."""

  config: ml_collections.ConfigDict
  dtype: jnp.dtype = jnp.float32

  def __post_init__(self):
    if (workdir := self.config.get('pretrained_path')) is not None:
      pretrained_config = config_utils.config_load(workdir)
      merged = config_utils.configs_merge(
          self.config,
          pretrained_config.model.bev_mapper.streetview_encoder,
      )
      # The merge is "export wins" so adopted params match the export's
      # architecture — but the export's own encoder subtree carries
      # pretrained_path=None (a localization run warm-starts at the
      # *mapper* level), which would clobber the very pointer that
      # triggered this merge and silently skip adoption in
      # load_pretrained_variables (round-5 run_occ_head_r5 failure:
      # 1000 head steps on a frozen random encoder, no 'Updating N
      # variable(s)' line). Adoption-control keys stay live.
      with merged.unlocked():
        merged.pretrained_path = workdir
        for key in ('point_tile_eval', 'point_tile'):
          if (live := self.config.get(key)) is not None:
            merged[key] = live
      self.config = merged
    super().__post_init__()

  def setup(self):
    self.image_encoder = image_encoder.ImageEncoder(
        self.config.image_encoder, self.dtype
    )
    self.fusion_mlp = nn.remat(layers.MLP)(self.config.fusion, self.dtype)

    if self.config.do_weighted_fusion:
      # One linear layer emits fused features + per-depth-bin scores.
      proj_config = copy.deepcopy(self.config.proj_mlp)
      proj_config.layers = (
          self.config.feature_dim + self.config.num_scale_bins,
      )
      self.proj_mlp = layers.MLP(proj_config, self.dtype)
    elif self.config.depth_mlp is not None:
      self.depth_mlp = nn.remat(layers.MLP)(self.config.depth_mlp, self.dtype)

  def encode_images(self, images: Array, train: bool):
    """Run the image encoder with views folded into the batch axis."""
    b, v = images.shape[:2]
    flat = images.reshape(b * v, *images.shape[2:])
    pyr = self.image_encoder(flat, train=train)
    features = [f.reshape(b, v, *f.shape[1:]) for f in pyr.features]
    return types.FeatureImagePyramid(features=features, strides=pyr.strides)

  def __call__(
      self, data: base.Batch, train: bool = False
  ) -> base.Predictions:
    if (f_image_pyr := data.get('image_feature_pyr')) is None:
      images = data['images'].astype(self.dtype)
      f_image_pyr = self.encode_images(images, train)

    f_images = f_image_pyr.features[-1]  # [B, V, h, w, D] finest level
    stride_ij = f_image_pyr.strides[-1]
    # Cameras are expressed in (x, y); strides are (i, j) = (row, col).
    cameras = data['camera'].scale(
        jnp.asarray([1.0 / stride_ij[1], 1.0 / stride_ij[0]])
    )
    scene_t_view = data['T_view2scene']
    pred: Dict[str, Any] = {'image_feature_pyramid': f_image_pyr}

    if self.config.do_weighted_fusion:
      f_images = self.proj_mlp(f_images, train)
      pred['scores_images'] = f_images[..., -self.config.num_scale_bins:]

    xyz = data['xyz_query']  # [B, *grid_shape, 3]
    xyz_flat = xyz.reshape(xyz.shape[0], -1, 3)

    impl = self.config.get('pooling_impl') or 'gather'
    if impl in ('scan', 'stream') and self.config.depth_mlp is None:
      return self._call_scan(
          pred, f_images, cameras, scene_t_view, xyz, xyz_flat, train, impl)

    p2d_views, visible, depth, _rays = view_fusion.project_points_to_views(
        scene_t_view, cameras, xyz_flat
    )

    num_views = f_images.shape[1]
    k_vs = self.config.top_k_view_selection
    if k_vs and num_views > k_vs:
      view_indices, min_distance = view_fusion.view_selection(
          xyz_flat, scene_t_view, visible, k_vs
      )
      p2d_views = view_fusion.gather_observations(p2d_views, view_indices)
      visible = view_fusion.gather_observations(visible, view_indices)
      depth = view_fusion.gather_observations(depth, view_indices)
      if not self.config.do_weighted_fusion and (
          self.config.depth_mlp is not None):
        _rays = view_fusion.gather_observations(_rays, view_indices)
      f_proj = view_fusion.interpolate_views_selective(
          f_images, p2d_views, view_indices
      )
    else:
      f_proj = view_fusion.interpolate_views_all(f_images, p2d_views)
      min_distance = None

    if self.config.do_weighted_fusion:
      f_proj, scores_scales = jnp.split(
          f_proj, [self.config.feature_dim], axis=-1
      )
      scores_proj = view_fusion.interpolate_depth_score(
          scores_scales, depth, tuple(self.config.depth_min_max)
      )
    else:
      scores_proj = None
      if self.config.depth_mlp is not None:
        log_depth = jnp.log10(depth.clip(min=0.1, max=100))
        rays = jnp.where(visible[..., None], _rays, 0)
        f_proj_depth = jnp.concatenate(
            [f_proj, log_depth[..., None].astype(f_proj.dtype),
             rays.astype(f_proj.dtype)], -1)
        f_proj = f_proj + self.depth_mlp(f_proj_depth, train)

    f_pooled, valid = view_fusion.pool_multiview_features(
        f_proj,
        visible,
        scores_proj,
        self.config.fusion_add_minmax,
        self.config.fusion_use_variance,
    )
    if (
        self.config.get('max_view_distance') is not None
        and min_distance is not None
    ):
      valid = valid & (min_distance <= self.config.max_view_distance)

    f_grid = self.fusion_mlp(f_pooled, train)
    f_grid = jnp.where(valid[..., None], f_grid, 0)
    grid_shape = (-1, *xyz.shape[-4:-1])
    f_grid = f_grid.reshape(*grid_shape, f_grid.shape[-1])
    valid = valid.reshape(grid_shape)
    pred['feature_volume'] = types.FeatureVolume(features=f_grid, valid=valid)
    return pred

  def _call_scan(
      self, pred, f_images, cameras, scene_t_view, xyz, xyz_flat, train,
      impl: str = 'scan',
  ) -> base.Predictions:
    """Fused streaming paths (ops/view_scan.py): O(N x D) working set."""
    if self.config.do_weighted_fusion:
      f_maps, score_maps = jnp.split(
          f_images, [self.config.feature_dim], axis=-1)
    else:
      f_maps, score_maps = f_images, None
    kwargs = dict(
        top_k=self.config.top_k_view_selection or 0,
        depth_min_max=tuple(self.config.depth_min_max),
        add_minmax=self.config.fusion_add_minmax,
        use_variance=self.config.fusion_use_variance,
    )
    if impl == 'stream':
      # Training tiles the points so the backward's per-tile patch
      # transients stay bounded; eval defaults to untiled for peak
      # throughput, with point_tile_eval available to trade a little
      # throughput for the [B, N, 2, 2, C] gather transient (enables the
      # reference's batch-4 eval protocol on a 16 GB chip).
      if train:
        tile = self.config.get('point_tile')
        # 0 = untiled: with the fused bilinear_patch_combine VJP the
        # backward transients are bounded without tiling (ops/view_scan.py).
        kwargs['point_tile'] = 131072 if tile is None else tile
      elif (tile_eval := self.config.get('point_tile_eval')):
        kwargs['point_tile'] = tile_eval
      # Rematerialize the lifting: the gather/accumulate intermediates are
      # recomputed in the backward pass instead of persisting in HBM.
      lift = jax.checkpoint(
          lambda fm, sm, tfm, cam, pts: view_scan.pool_views_stream(
              fm, sm, tfm, cam, pts, **kwargs))
      out = lift(f_maps, score_maps, scene_t_view, cameras, xyz_flat)
    else:
      out = view_scan.pool_views_scan(
          f_maps, score_maps, scene_t_view, cameras, xyz_flat,
          point_tile=self.config.get('point_tile') or 131072, **kwargs)
    valid = out.valid
    if self.config.get('max_view_distance') is not None:
      valid = valid & (out.min_distance <= self.config.max_view_distance)
    f_grid = self.fusion_mlp(out.stats.astype(self.dtype))
    f_grid = jnp.where(valid[..., None], f_grid, 0)
    grid_shape = (-1, *xyz.shape[-4:-1])
    f_grid = f_grid.reshape(*grid_shape, f_grid.shape[-1])
    valid = valid.reshape(grid_shape)
    pred['feature_volume'] = types.FeatureVolume(features=f_grid, valid=valid)
    return pred

  def load_pretrained_variables(self) -> None | Dict[str, Any]:
    if (path := self.config.get('pretrained_path')) is None:
      return None
    from snap_tpu.train_lib import checkpoints  # avoid circular import
    state = checkpoints.restore_params(path)
    params = misc.find_nested_dict(state, 'streetview_encoder')
    if params is None:
      raise ValueError(f'No parameters for {type(self).__name__} in {path}')
    logging.info('Loaded pretrained weights for %s from %s.',
                 type(self).__name__, path)
    return {'params': params}
