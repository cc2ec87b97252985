"""Typed containers for model outputs (reference: snap/models/types.py).

Implemented as ``flax.struct`` dataclasses so they are pytrees and can cross
jit / shard_map boundaries with sharding annotations attached per leaf.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from flax import struct
import jax

Array = jax.Array


@struct.dataclass
class FeatureVolume:
  """A 3D volume of features with validity mask ([..., X, Y, Z, D])."""

  features: Array
  valid: Optional[Array] = None


@struct.dataclass
class FeaturePlane:
  """A 2D plane of features with validity mask ([..., X, Y, D])."""

  features: Array
  valid: Optional[Array] = None


@struct.dataclass
class FeatureImagePyramid:
  """Multi-scale image features with per-level strides w.r.t. the input.

  ``strides`` are static (host-side) values: they derive from encoder
  architecture, not data, so they are stored as aux data to keep jit happy.
  """

  features: List[Array]
  strides: Sequence[tuple] = struct.field(pytree_node=False)


@struct.dataclass
class LidarRaySamples:
  """Points sampled along lidar rays."""

  points: Array  # [..., 3]
  labels: Array  # [...] bool
  valid: Array  # [...] bool


@struct.dataclass
class OccupancySamples:
  """Occupancy values at given sample 3D points."""

  values: Array
  valid: Array
  logits: Array
