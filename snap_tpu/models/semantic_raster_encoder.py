"""Encode boolean semantic map rasters into a neural map.

Reference behavior: snap/models/semantic_raster_encoder.py. Mutually
exclusive "surfel road" classes become one multiclass embedding; independent
classes each get a 2-way (absent/present) embedding. Note: the reference has
a latent index-collision bug (`arange(N) + raster` instead of
``arange(N) * 2 + raster``, snap/models/semantic_raster_encoder.py:70-72);
we implement the intended non-colliding indexing.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

from snap_tpu.data import types as data_types
from snap_tpu.models import image_encoder
from snap_tpu.models import types

Array = jax.Array


class SemanticRasterEncoder(nn.Module):
  """Encode 2D semantic rasters into a feature pyramid."""

  config: ml_collections.ConfigDict
  raster_classes: tuple
  dtype: jnp.dtype = jnp.float32

  def __post_init__(self):
    self.indices_surfel_road = []
    self.indices_other_classes = []
    for i, c in enumerate(self.raster_classes):
      (
          self.indices_surfel_road
          if c in data_types.SURFEL_ROAD_CLASSES
          else self.indices_other_classes
      ).append(i)
    super().__post_init__()

  def setup(self):
    self.encoder = image_encoder.ImageEncoder(self.config.encoder, self.dtype)
    self.embeddings_surfel_road = nn.Embed(
        max(len(self.indices_surfel_road), 1),
        self.config.embedding_dim,
        dtype=self.dtype,
        param_dtype=jnp.float32,
    )
    self.embeddings_other_classes = nn.Embed(
        max(len(self.indices_other_classes), 1) * 2,  # labels 0 or 1 per class
        self.config.embedding_dim,
        dtype=self.dtype,
        param_dtype=jnp.float32,
    )

  def __call__(
      self, rasters: Array, train: bool = False
  ) -> types.FeatureImagePyramid:
    assert rasters.shape[-1] == len(self.raster_classes)
    parts = []
    if self.indices_surfel_road:
      rasters_sr = rasters[..., jnp.asarray(self.indices_surfel_road)]
      label_sr = jnp.argmax(rasters_sr, axis=-1)
      parts.append(self.embeddings_surfel_road(label_sr))
    if self.indices_other_classes:
      rasters_others = rasters[..., jnp.asarray(self.indices_other_classes)]
      n = rasters_others.shape[-1]
      labels_others = jnp.arange(n) * 2 + rasters_others.astype(jnp.int32)
      f_others = self.embeddings_other_classes(labels_others)
      parts.append(f_others.reshape(*f_others.shape[:-2], -1))
    f_rasters = jnp.concatenate(parts, axis=-1)
    return self.encoder(f_rasters, train=train)
