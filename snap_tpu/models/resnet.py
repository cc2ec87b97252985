"""Big-Transfer-style ResNetV2 backbone (weight-standardized convs + GroupNorm).

TPU-native re-implementation of the encoder family used by SNAP
(reference: snap/models/resnet.py, itself derived from big_vision's
``bit_paper`` model). Behavioral contract kept for pretrained-weight
compatibility:

- convolution kernels are weight-standardized over (h, w, in) with eps=1e-10,
- GroupNorm standardizes over (spatial..., in-group channels) with a
  biased-variance formula computed in float32 (reference notes this exact
  variance matters when loading BiT weights, snap/models/resnet.py:44-45),
- inputs are rescaled from [0, 1] to [-1, 1],
- per-stage outputs are returned as a dict of dicts (stage -> unit -> array).

TPU adaptations: parameters are stored in float32 and cast to the compute
``dtype`` (bfloat16 by default) inside each layer, and rematerialization is
config-selectable per stage/unit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

Array = jax.Array


def standardize(x: Array, axis, eps: float) -> Array:
  dtype = x.dtype
  x = x.astype(jnp.float32)
  x = x - jnp.mean(x, axis=axis, keepdims=True)
  x = x / jnp.sqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)
  return x.astype(dtype)


class GroupNorm(nn.Module):
  """Group normalization with BiT-compatible variance (biased, f32)."""

  ngroups: int = 32
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    input_shape = x.shape
    ngroups = min(self.ngroups, input_shape[-1])
    group_shape = x.shape[:-1] + (ngroups, x.shape[-1] // ngroups)
    x = x.reshape(group_shape)
    # Standardize along spatial dims and the within-group channel dim. The
    # spatial dims are all dims except (batch, group, channel-in-group).
    axes = tuple(range(1, x.ndim - 2)) + (x.ndim - 1,)
    x = standardize(x, axis=axes, eps=1e-5)
    x = x.reshape(input_shape)

    param_shape = (1,) * (x.ndim - 1) + (input_shape[-1],)
    scale = self.param('scale', nn.initializers.ones, param_shape, jnp.float32)
    bias = self.param('bias', nn.initializers.zeros, param_shape, jnp.float32)
    return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class StdConv(nn.Conv):
  """Convolution with weight-standardized kernel."""

  def param(self, name, *args, **kwargs):
    p = super().param(name, *args, **kwargs)
    if name == 'kernel':
      p = standardize(p, axis=[0, 1, 2], eps=1e-10)
    return p


class RootBlock(nn.Module):
  """7x7-s2 conv + 3x3-s2 max-pool stem."""

  width: int
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = StdConv(
        self.width, (7, 7), (2, 2),
        padding=[(3, 3), (3, 3)],
        use_bias=False,
        name='conv_root',
        dtype=self.dtype,
        param_dtype=jnp.float32,
    )(x)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class ResidualUnit(nn.Module):
  """Pre-activation bottleneck unit."""

  nmid: Optional[int] = None
  strides: Sequence[int] = (1, 1)
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    nmid = self.nmid or x.shape[-1] // 4
    nout = nmid * 4
    conv = functools.partial(
        StdConv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
    norm = functools.partial(GroupNorm, dtype=self.dtype)

    residual = x
    x = norm(name='gn1')(x)
    x = nn.relu(x)
    if x.shape[-1] != nout or tuple(self.strides) != (1, 1):
      residual = conv(nout, (1, 1), self.strides, name='conv_proj')(x)
    x = conv(nmid, (1, 1), name='conv1')(x)
    x = norm(name='gn2')(x)
    x = nn.relu(x)
    x = conv(nmid, (3, 3), self.strides, padding=[(1, 1), (1, 1)],
             name='conv2')(x)
    x = norm(name='gn3')(x)
    x = nn.relu(x)
    x = conv(nout, (1, 1), name='conv3')(x)
    return x + residual


class ResNetStage(nn.Module):
  """A sequence of same-resolution bottleneck units."""

  block_size: int
  nmid: Optional[int] = None
  first_stride: Sequence[int] = (1, 1)
  checkpoint_units: bool = False
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array):
    out = {}
    unit = functools.partial(ResidualUnit, nmid=self.nmid, dtype=self.dtype)
    if self.checkpoint_units:
      unit = nn.remat(unit)
    x = out['unit01'] = unit(strides=self.first_stride, name='unit01')(x)
    for i in range(1, self.block_size):
      x = out[f'unit{i + 1:02d}'] = unit(name=f'unit{i + 1:02d}')(x)
    return x, out


def get_block_desc(depth) -> list:
  if isinstance(depth, (list, tuple)):
    return list(depth)
  return {
      26: [2, 2, 2, 2],
      50: [3, 4, 6, 3],
      101: [3, 4, 23, 3],
      152: [3, 8, 36, 3],
      200: [3, 24, 36, 3],
  }[depth]


class ResNetV2(nn.Module):
  """BiT-variant ResNet returning per-stage feature dicts."""

  config: ml_collections.ConfigDict
  dtype: jnp.dtype = jnp.float32

  def __post_init__(self):
    blocks = get_block_desc(self.config.depth)
    if self.config.limit_num_blocks is not None:
      blocks = blocks[: self.config.limit_num_blocks]
    self.blocks = blocks
    self.level_names = [f'stage{i + 1}' for i in range(len(blocks))]
    super().__post_init__()

  @nn.compact
  def __call__(self, image: Array, *, train: bool = False) -> Dict[str, Any]:
    del train  # No batch statistics in this architecture.
    width = int(64 * self.config.width)

    root_block = functools.partial(RootBlock, dtype=self.dtype)
    stage = functools.partial(
        ResNetStage,
        dtype=self.dtype,
        checkpoint_units=self.config.checkpoint_units,
    )
    if self.config.checkpoint_blocks:
      root_block = nn.remat(root_block)
      if not self.config.checkpoint_units:
        stage = nn.remat(stage)

    out = {}
    x = image.astype(self.dtype) * 2 - 1  # normalize [0, 1] -> [-1, 1]
    if self.config.skip_root_block:
      # Stride-1 stem used for BEV-aligned rasters (aerial / semantics) so the
      # output grid matches the map resolution.
      x = StdConv(
          width, (3, 3),
          padding=[(1, 1)] * 2,
          use_bias=False,
          name='conv_root',
          dtype=self.dtype,
          param_dtype=jnp.float32,
      )(x)
    else:
      x = out['stem'] = root_block(width=width, name='root_block')(x)
    x, out['stage1'] = stage(self.blocks[0], nmid=width, name='block1')(x)
    for i, block_size in enumerate(self.blocks[1:], 1):
      x, out[f'stage{i + 1}'] = stage(
          block_size, width * 2**i, first_stride=(2, 2), name=f'block{i + 1}'
      )(x)
    return out

  def load_pretrained_variables(self) -> None | Dict[str, Any]:
    """Load BiT weights from a big_vision-format .npz checkpoint."""
    path = self.config.pretrained_path
    if path is None:
      return None
    with open(path, 'rb') as f:
      flat = dict(np.load(f, allow_pickle=False))
    params: Dict[str, Any] = {}
    for key, value in flat.items():
      # big_vision stores flat keys like 'block1/unit01/conv1/kernel'.
      tree = params
      parts = key.replace('standardized_conv2d', 'kernel').split('/')
      parts = [p for p in parts if p not in ('', 'resnet')]
      for part in parts[:-1]:
        tree = tree.setdefault(part, {})
      tree[parts[-1]] = value
    return {'params': params}
