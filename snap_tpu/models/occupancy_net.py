"""3D occupancy prediction supervised by lidar rays.

Reference behavior: snap/models/occupancy_net.py (note: the upstream release
crashes on a ``SteetViewEncoder`` typo at snap/models/occupancy_net.py:74;
behavior reconstructed from the surrounding code). Per ray, one occupied hit
point and (n-1) free-space points are sampled; the StreetViewEncoder volume
is trilinearly interpolated at the samples and decoded to logits; the loss is
a class-balanced BCE over points visible to at least one view.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

from snap_tpu.configs import defaults as default_configs
from snap_tpu.models import base
from snap_tpu.models import layers
from snap_tpu.models import streetview_encoder
from snap_tpu.models import types
from snap_tpu.utils import grids

Array = jax.Array


def sample_queries_from_rays(
    hits: Array,
    origins: Array,
    valid: Array,
    num_samples: int,
    margin: float,
) -> types.LidarRaySamples:
  """1 occupied hit + (num_samples - 1) free-space points per ray.

  Batched over leading axes; the ray axis is -2 of ``hits``/``origins``.
  """
  hits = hits[..., None, :, :]  # add sample axis
  origins = origins[..., None, :, :]
  direction = hits - origins
  distance = jnp.linalg.norm(direction, axis=-1, keepdims=True)
  direction = direction * ((distance - margin) / distance.clip(min=1))
  num_neg = num_samples - 1
  steps = jnp.linspace(0, 1, num_neg)
  samples_neg = steps[:, None, None] * direction + origins
  samples = jnp.concatenate([hits, samples_neg], axis=-3)
  labels = jnp.concatenate(
      [jnp.ones(1, bool), jnp.zeros(num_neg, bool)])
  labels = jnp.broadcast_to(labels[:, None], samples.shape[-3:-1])
  labels = jnp.broadcast_to(labels, samples.shape[:-1])
  valid = jnp.broadcast_to(valid[..., None, :], samples.shape[:-1])
  # Flatten (samples, rays).
  batch = samples.shape[:-3]
  samples = samples.reshape(*batch, -1, 3)
  labels = labels.reshape(*batch, -1)
  valid = valid.reshape(*batch, -1)
  return types.LidarRaySamples(points=samples, labels=labels, valid=valid)


class OccupancyNet(nn.Module):
  """Per-point occupancy from the multi-view feature volume."""

  config: ml_collections.ConfigDict
  grid: grids.Grid3D
  dtype: jnp.dtype = jnp.float32

  def setup(self):
    self.streetview_encoder = streetview_encoder.StreetViewEncoder(
        self.config.streetview_encoder, self.dtype
    )
    self.mlp_out = layers.MLP(self.config.occupancy_mlp, self.dtype)

  def __call__(
      self, data: base.Batch, train: bool = False, debug: bool = False
  ) -> base.Predictions:
    if 'map' in data:
      data = data['map']
    xyz_grid = self.grid.index_to_xyz(self.grid.grid_index())
    xyz_grid = jnp.broadcast_to(
        xyz_grid[None], (len(data['images']), *xyz_grid.shape))
    pred = self.streetview_encoder(data | dict(xyz_query=xyz_grid), train)
    if self.config.get('stop_encoder_gradients', False):
      # Exact when the whole streetview_encoder/ subtree is frozen (the
      # train_occupancy recipes): only the occupancy MLP needs gradients,
      # so the encoder backward is dead code to XLA.
      pred = jax.lax.stop_gradient(pred)
    volume = pred['feature_volume']

    queries = data.get('occupancy_queries')
    if queries is None:
      if 'lidar_rays' not in data:
        raise ValueError('No points or rays given in the data dict.')
      rays = data['lidar_rays']
      pred['ray_samples'] = samples = sample_queries_from_rays(
          rays['points'],
          rays['origins'],
          rays['mask'],
          self.config.num_samples_per_ray,
          self.config.ray_margin,
      )
      queries = samples.points

    # Trilinear interpolation of the volume at the query points.
    indices = queries / self.grid.cell_size
    features, valid = jax.vmap(grids.interpolate_nd)(
        volume.features, indices, volume.valid
    )
    logits = self.mlp_out(features, train).squeeze(-1).astype(jnp.float32)
    occupancy = types.OccupancySamples(
        values=jax.nn.sigmoid(logits), valid=valid, logits=logits
    )
    return {**pred, 'occupancy': occupancy}


class OccupancyNetModel(base.BaseModel):
  """Trainer-facing wrapper for the OccupancyNet."""

  def build_flax_model(self) -> nn.Module:
    return OccupancyNet(self.config, self.dataset_meta_data['grid'], self.dtype)

  @classmethod
  def default_flax_model_config(cls) -> ml_collections.ConfigDict:
    return default_configs.occupancy_net()

  def loss_metrics_function(
      self,
      pred: base.Predictions,
      data: base.Batch,
      model_params=None,
  ) -> base.LossMetricsTuple:
    # Contract-parity port of snap/models/occupancy_net.py:137-165 (class-
    # balanced BCE averaged over pos/neg separately), pinned by
    # tests/test_heads.py. Note: the reference labels the negative-class
    # recall 'precision' (it is actually TNR/specificity); the key is kept
    # for metric-name compatibility.
    labels = pred['ray_samples'].labels
    logits = pred['occupancy'].logits
    occ = logits > 0
    # Only points visible to at least one view contribute.
    mask = pred['occupancy'].valid & pred['ray_samples'].valid

    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    bce_per_sample = -jnp.where(labels, log_p, log_not_p)
    bce_pos = layers.masked_mean(bce_per_sample, mask & labels, 1)
    bce_neg = layers.masked_mean(bce_per_sample, mask & (~labels), 1)
    bce = (bce_pos + bce_neg) / 2
    losses = {'occupancy_bce': bce, 'total': bce}

    correct = occ == labels
    metrics = {
        'occupancy/accuracy': layers.masked_mean(correct, mask, 1),
        'occupancy/recall': layers.masked_mean(correct, mask & labels, 1),
        'occupancy/precision': layers.masked_mean(correct, mask & (~labels), 1),
    }
    return losses, metrics
