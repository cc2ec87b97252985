"""Multi-modal Bird's-Eye-View neural map builder.

Reference behavior: snap/models/bev_mapper.py. Streetview volumes are pooled
vertically into a plane, aerial / semantic rasters are encoded directly, and
modalities are fused (with train-time modality dropout) into one plane with a
matching head.
"""

from __future__ import annotations

import math
import pprint
from typing import Any, Dict, List, Optional

from absl import logging
import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

from snap_tpu.models import base
from snap_tpu.models import image_encoder
from snap_tpu.models import layers
from snap_tpu.models import resnet
from snap_tpu.models import semantic_raster_encoder
from snap_tpu.models import streetview_encoder
from snap_tpu.models import types
from snap_tpu.utils import configs as config_utils
from snap_tpu.utils import grids
from snap_tpu.utils import misc

Array = jax.Array


class VerticalPooling(nn.Module):
  """Flatten a 3D volume into a 2D BEV by pooling the last spatial axis.

  Also reused for modality fusion by stacking planes as a pseudo-z axis
  (reference: snap/models/bev_mapper.py:40-88).
  """

  config: ml_collections.ConfigDict
  dtype: jnp.dtype = jnp.float32

  def setup(self):
    if self.config.pooling in ('weighted', 'softmax'):
      self.confidence_head = nn.Dense(
          1, dtype=self.dtype, param_dtype=jnp.float32)
    elif self.config.pooling == 'mlp':
      self.fusion_mlp = layers.MLP(self.config.mlp, self.dtype)
    elif self.config.pooling not in ('max', 'sum', 'mean'):
      raise NotImplementedError(self.config.pooling)

  def _statistic_pool(self, features: Array, valid: Array,
                      has_data: Array) -> Array:
    """Masked max / sum / mean over the column axis (-2).

    Columns with no valid cell produce an arbitrary finite value here; the
    caller zeroes them. ``masked_mean`` / the mask-flip guard keep both the
    value and its gradient finite on empty columns.
    """
    mode = self.config.pooling
    cell_mask = valid[..., None]
    if mode == 'sum':
      return jnp.sum(features * cell_mask, axis=-2)
    if mode == 'mean':
      return layers.masked_mean(features, cell_mask, axis=-2)
    # max: an empty `where=` with initial=-inf poisons gradients, so pretend
    # empty columns are fully valid (their output is discarded anyway).
    guard = jnp.where(has_data[..., None], valid, True)[..., None]
    return jnp.max(features, axis=-2, where=guard, initial=-jnp.inf)

  def _confidence_pool(self, features: Array, valid: Array,
                       pred: Dict[str, Any]) -> Array:
    """Convex combination of column cells, weighted by a learned score."""
    logits = self.confidence_head(features)[..., 0].astype(jnp.float32)
    if self.config.pooling == 'weighted':
      # Per-cell independent confidence in [-inf, 0].
      logits = jax.nn.log_sigmoid(logits)
    pred['scores'] = logits
    weights = layers.masked_softmax(logits, valid, axis=-1)
    weights = pred['weights'] = jnp.where(valid, weights, 0.0)
    pooled = jnp.sum(features * weights[..., None].astype(self.dtype), axis=-2)
    return pooled.astype(features.dtype)

  def __call__(self, feature_volume: types.FeatureVolume) -> base.Predictions:
    features, valid = feature_volume.features, feature_volume.valid
    has_data = valid.any(-1)  # Columns with at least one observed cell.

    pred: Dict[str, Any] = {}
    if self.config.pooling in ('weighted', 'softmax'):
      plane = self._confidence_pool(features, valid, pred)
    elif self.config.pooling == 'mlp':
      column = jnp.where(valid[..., None], features, 0)
      plane = self.fusion_mlp(column.reshape(*column.shape[:-2], -1))
    else:
      plane = self._statistic_pool(features, valid, has_data)
    plane = jnp.where(has_data[..., None], plane, 0)
    pred['plane'] = types.FeaturePlane(features=plane, valid=has_data)
    return pred


class BEVMapper(nn.Module):
  """Encode a set of scene inputs into a 2D neural map."""

  config: ml_collections.ConfigDict
  grid: grids.Grid2D
  semantic_map_classes: Optional[tuple] = None
  dtype: jnp.dtype = jnp.float32

  def __post_init__(self):
    if (workdir := self.config.get('pretrained_path')) is not None:
      pretrained_config = config_utils.config_load(workdir)
      pretrained_config = pretrained_config.model.bev_mapper
      diff = config_utils.config_diff(self.config, pretrained_config)
      if diff:
        logging.warning(
            'Found differences between configs:\n%s', pprint.pformat(diff)
        )
    super().__post_init__()

  def setup(self):
    feature_dimensions = []
    self.streetview_encoder = None
    self.aerial_encoder = None
    self.semantic_encoder = None
    if self.config.streetview_encoder is not None:
      self.streetview_encoder = streetview_encoder.StreetViewEncoder(
          self.config.streetview_encoder, self.dtype
      )
      self.vertical_pooling = VerticalPooling(self.config.pooling, self.dtype)
      feature_dimensions.append(self.config.streetview_encoder.feature_dim)
    if self.config.aerial_encoder is not None:
      self.aerial_encoder = image_encoder.ImageEncoder(
          self.config.aerial_encoder, self.dtype
      )
      feature_dimensions.append(self.config.aerial_encoder.output_dim)
    if self.config.semantic_encoder is not None:
      self.semantic_encoder = semantic_raster_encoder.SemanticRasterEncoder(
          self.config.semantic_encoder, self.semantic_map_classes, self.dtype
      )
      feature_dimensions.append(self.config.semantic_encoder.encoder.output_dim)
    if not feature_dimensions:
      raise ValueError('Need to create at least one input encoder.')
    elif len(feature_dimensions) > 1:
      if not all(d == feature_dimensions[0] for d in feature_dimensions):
        raise ValueError(
            f'Encoders have different output dimensions: {feature_dimensions}'
        )
      self.modality_fusion = VerticalPooling(
          self.config.modality_fusion, self.dtype
      )

    self.bev_net = None
    if self.config.bev_net is not None:
      # Small same-resolution residual conv stack over the fused plane —
      # spatial context before the matching head. The reference declared
      # this slot but never implemented it
      # (snap/models/bev_mapper.py:141-142 raises NotImplementedError).
      self.bev_net = resnet.ResNetStage(
          block_size=int(self.config.bev_net.get('num_units', 2)),
          nmid=self.config.bev_net.get('nmid'),
          checkpoint_units=bool(
              self.config.bev_net.get('checkpoint_units', False)),
          dtype=self.dtype,
      )
    if self.config.matching_dim is not None:
      # Initialize so matched dot products have unit variance.
      self.matching_proj = nn.Dense(
          self.config.matching_dim,
          kernel_init=jax.nn.initializers.variance_scaling(
              1 / jnp.sqrt(self.config.matching_dim),
              'fan_in',
              'truncated_normal',
          ),
          dtype=self.dtype,
          param_dtype=jnp.float32,
      )
    if self.config.add_confidence:
      self.confidence_head = nn.Dense(
          1, dtype=self.dtype, param_dtype=jnp.float32)

  def build_xyz_query(
      self, data: base.Batch, train: bool, is_query: bool
  ) -> Array:
    """BEV grid xy ⊗ a z-column anchored below the median camera height.

    Reference: snap/models/bev_mapper.py:159-196.
    """
    batch = len(data['T_view2scene'].t)
    cell = self.grid.cell_size

    xy = data.get('xy_bev')
    if xy is None:
      xy = self.grid.index_to_xyz(self.grid.grid_index())
    if xy.ndim != 4:  # Add batch dimension: [B, X, Y(or 1), 2].
      xy = jnp.broadcast_to(xy[None], (batch, *xy.shape))

    # The column floor sits a fixed distance below the median camera height
    # (the cameras are the only absolute-height anchor the scene carries).
    z_floor = data.get('z_offset')
    if z_floor is None:
      camera_z = data['T_view2scene'].t[..., -1]
      z_floor = jnp.median(camera_z, axis=-1) - self.config.get(
          'scene_z_offset', 4.0)
      jitter = self.config.get('scene_z_offset_range')
      if train and is_query and jitter is not None:
        z_floor += jax.random.uniform(
            self.make_rng('sampling'), z_floor.shape,
            minval=jitter[0], maxval=jitter[1])

    # ceil preserves the reference's arange(0, h, cell) level count for
    # heights that do not divide the cell size (e.g. 12.0 / 0.35 -> 35
    # levels, where round() would silently drop one; ADVICE r2).
    num_z = math.ceil(self.config.get('scene_z_height', 12.0) / cell - 1e-9)
    z_levels = (jnp.arange(num_z) + 0.5) * cell  # Voxel centers, floor-based.
    z = z_floor[:, None] + z_levels[None]  # [B, Z]

    # Assemble [B, X, Y, Z, 3] = every (xy cell) x (z level) per example.
    shape = (batch, *xy.shape[1:3], num_z)
    return jnp.concatenate([
        jnp.broadcast_to(xy[:, :, :, None, :], shape + (2,)),
        jnp.broadcast_to(z[:, None, None, :, None], shape + (1,)),
    ], axis=-1)

  def encode_streetview(
      self, data: base.Batch, train: bool, is_query: bool
  ) -> base.Predictions:
    if 'xyz_query' not in data:
      data = dict(data)
      data['xyz_query'] = self.build_xyz_query(data, train, is_query)
    pred = self.streetview_encoder(data, train=train)
    pred['vertical_pooling'] = self.vertical_pooling(pred['feature_volume'])
    pred['feature_plane'] = pred['vertical_pooling'].pop('plane')
    return pred

  def encode_aerial(
      self, aerial_rgb: Array, train: bool = False
  ) -> base.Predictions:
    aerial_pyramid = self.aerial_encoder(aerial_rgb, train=train)
    aerial_features = aerial_pyramid.features[-1]
    plane = types.FeaturePlane(
        features=aerial_features,
        valid=jnp.ones(aerial_features.shape[:-1], dtype=bool),
    )
    return {'feature_plane': plane}

  def encode_semantics(
      self, semantic_raster: Array, train: bool = False
  ) -> base.Predictions:
    pyramid = self.semantic_encoder(semantic_raster, train=train)
    features = pyramid.features[-1]
    plane = types.FeaturePlane(
        features=features,
        valid=jnp.ones(features.shape[:-1], dtype=bool),
    )
    return {'feature_plane': plane}

  def fuse_neural_maps(
      self, planes: List[types.FeaturePlane], train: bool = False
  ) -> types.FeaturePlane:
    if not planes:
      raise ValueError('No feature plane given.')
    elif len(planes) == 1:
      return planes[0]

    if train and self.config.apply_modality_dropout:
      # Independently keep each (modality, example) with p=0.5, but never
      # drop every modality of an example — that would zero its supervision.
      keep = jax.random.bernoulli(
          self.make_rng('sampling'),
          shape=(len(planes), len(planes[0].features)))
      keep = keep | ~keep.any(axis=0)
      planes = [
          p.replace(valid=p.valid & k[:, None, None])
          for p, k in zip(planes, keep)
      ]
    # Treat modalities as a pseudo-z column and reuse the vertical pooling.
    stacked = types.FeatureVolume(
        features=jnp.stack([p.features for p in planes], axis=-2),
        valid=jnp.stack([p.valid for p in planes], axis=-1),
    )
    return self.modality_fusion(stacked)['plane']

  def __call__(
      self,
      data: base.Batch,
      train: bool = False,
      debug: bool = False,
      is_query: bool = False,
  ) -> base.Predictions:
    del debug
    pred: Dict[str, Any] = {}
    feature_planes = []
    if self.streetview_encoder is not None:
      pred['streetview'] = self.encode_streetview(
          data, train=train, is_query=is_query
      )
      feature_planes.append(pred['streetview']['feature_plane'])
    if self.aerial_encoder is not None and 'rasters' in data:
      # There is no aerial raster for query scenes.
      pred['aerial'] = self.encode_aerial(data['rasters']['rgb'], train=train)
      feature_planes.append(pred['aerial']['feature_plane'])
    if self.semantic_encoder is not None and 'rasters' in data:
      pred['semantic'] = self.encode_semantics(
          data['rasters']['semantics'], train=train
      )
      feature_planes.append(pred['semantic']['feature_plane'])
    if not feature_planes:
      raise ValueError('No map encoder given.')
    pred['bev_features'] = plane = self.fuse_neural_maps(feature_planes, train)
    if self.bev_net is not None:
      if self.config.bev_net.get('nmid') is None:
        # ResidualUnit(nmid=None) widens to 4*(C//4): a non-multiple-of-4
        # plane would silently change width and replace the identity
        # residual with a projection, defeating the same-resolution intent.
        assert plane.features.shape[-1] % 4 == 0, (
            f'bev_net needs a fused plane width divisible by 4 (got '
            f'{plane.features.shape[-1]}); pass bev_net.nmid explicitly.')
      f_net, _ = self.bev_net(plane.features)
      # Convs smear into the invalid band; re-mask so downstream consumers
      # (matching, confidence) keep the validity contract.
      f_net = jnp.where(plane.valid[..., None], f_net, 0)
      pred['bev_features'] = plane = plane.replace(features=f_net)

    if self.config.matching_dim is not None:
      f_matching = self.matching_proj(plane.features)
      if self.config.normalize_matching_features:
        f_matching = layers.normalize(f_matching)
      f_matching = jnp.where(plane.valid[..., None], f_matching, 0)
      pred['bev_matching'] = types.FeaturePlane(
          features=f_matching, valid=plane.valid
      )
    if self.config.add_confidence:
      scores = self.confidence_head(plane.features).squeeze(-1)
      conf = jax.nn.log_sigmoid(scores.astype(jnp.float32))
      pred['bev_confidence'] = jnp.where(plane.valid, conf, 0)
    return pred

  def load_pretrained_variables(self) -> None | Dict[str, Any]:
    if (path := self.config.get('pretrained_path')) is None:
      return None
    from snap_tpu.train_lib import checkpoints  # avoid circular import
    state = checkpoints.restore_params(path)
    params = misc.find_nested_dict(state, 'bev_mapper')
    if params is None:
      raise ValueError(f'No parameters for {type(self).__name__} in {path}')
    logging.info('Loaded pretrained weights for %s from %s.',
                 type(self).__name__, path)
    return {'params': params}
