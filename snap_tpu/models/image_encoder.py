"""Image backbone: CNN trunk + top-down feature pyramid.

Capability parity with the reference's trunk->FPN wrapper
(snap/models/image_encoder.py:42-144): multi-scale features with static
stride metadata, input padded up to the coarsest stride and outputs cropped
back. The decoder is expressed as two explicit passes (lateral heads, then
a top-down accumulation) instead of one interleaved loop; the parameter
tree it produces ('decoder/{i}_skip_norm', 'decoder/{i}_skip_conv' under an
'encoder'/'decoder' split) is the checkpoint contract, pinned by
tests/test_image_encoder.py::test_param_tree_pinned.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import flax.linen as nn
import jax
from jax.nn import initializers
import jax.numpy as jnp
import ml_collections
import numpy as np

from snap_tpu.models import resnet
from snap_tpu.models import types

Array = jax.Array


def pad_to_multiple(images: Array, stride: int) -> Array:
  """Pad H/W (the two dims before channels) up to a multiple of stride."""
  shape = images.shape[-3:-1]
  pad = (-np.array(shape)) % stride
  pad_width = [(0, 0)] * (images.ndim - 3) + [(0, pad[0]), (0, pad[1]), (0, 0)]
  return jnp.pad(images, pad_width)


def _upsample_to(coarse: Array, like: Array) -> Array:
  """Bilinear x2 upsampling of `coarse` onto `like`'s spatial grid."""
  target_hw = like.shape[-3:-1]
  if tuple(target_hw) != (coarse.shape[-3] * 2, coarse.shape[-2] * 2):
    raise ValueError(
        f'Pyramid levels must be octaves: {coarse.shape} -> {like.shape}.')
  new_shape = coarse.shape[:-3] + tuple(target_hw) + coarse.shape[-1:]
  return jax.image.resize(coarse, new_shape, 'bilinear')


class FPNDecoder(nn.Module):
  """Top-down pyramid decoder.

  Each trunk level gets a lateral head (activation -> norm -> 1x1
  projection to a shared width); the pyramid is then built coarse-to-fine
  by adding each lateral to the x2-upsampled running output.
  """

  output_dim: int
  num_levels: int
  activation: str = 'relu'
  norm: Optional[str] = 'bit_resnet'
  kernel_init: Callable[..., Any] = initializers.lecun_normal()
  bias_init: Callable[..., Any] = initializers.zeros
  dtype: jnp.dtype = jnp.float32

  def _norm(self, name: str, train: bool) -> Callable[[Array], Array]:
    match self.norm:
      case None:
        return lambda x: x
      case 'bit_resnet':
        return resnet.GroupNorm(dtype=self.dtype, name=name)
      case 'batch_norm':
        return nn.BatchNorm(
            use_running_average=not train, axis=-1, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
      case _:
        raise ValueError(f'Unknown norm: {self.norm!r}')

  def _lateral(self, level: int, f: Array, train: bool) -> Array:
    f = getattr(nn, self.activation)(f)
    f = self._norm(f'{level}_skip_norm', train)(f)
    return nn.Conv(
        self.output_dim, (1, 1),
        use_bias=self.norm is None,
        kernel_init=self.kernel_init,
        bias_init=self.bias_init,
        dtype=self.dtype,
        param_dtype=jnp.float32,
        name=f'{level}_skip_conv',
    )(f)

  @nn.compact
  def __call__(
      self, trunk_features: List[Array], train: bool = False
  ) -> List[Array]:
    if len(trunk_features) != self.num_levels:
      raise ValueError(
          f'Expected {self.num_levels} levels, got {len(trunk_features)}.')
    laterals = [
        self._lateral(i, f, train) for i, f in enumerate(trunk_features)
    ]
    pyramid = laterals[:1]
    for lateral in laterals[1:]:
      pyramid.append(lateral + _upsample_to(pyramid[-1], like=lateral))
    return pyramid


class ImageEncoder(nn.Module):
  """Trunk + FPNDecoder, returning a FeatureImagePyramid with strides."""

  config: ml_collections.ConfigDict
  dtype: jnp.dtype = jnp.float32

  def _build_trunk(self) -> resnet.ResNetV2:
    if self.config.encoder_name != 'resnet':
      raise ValueError(f'Unknown trunk: {self.config.encoder_name!r}')
    return resnet.ResNetV2(self.config.encoder, self.dtype, name='encoder')

  @nn.compact
  def __call__(
      self, image: Array, train: bool = False
  ) -> types.FeatureImagePyramid:
    trunk = self._build_trunk()
    num_levels = self.config.num_pyr_levels or len(trunk.level_names)
    # Total downsampling: the 7x7-s2 root block + its pool contribute two
    # octaves (zero when replaced by the stride-1 raster stem), then one
    # octave per stage past the first.
    root_octaves = 0 if self.config.encoder.skip_root_block else 2
    max_stride = 2 ** (root_octaves + num_levels - 1)

    image = image.astype(self.dtype)
    input_hw = np.array(image.shape[-3:-1])
    padded = pad_to_multiple(image, max_stride)
    padded_hw = np.array(padded.shape[-3:-1])

    stage_outputs = trunk(padded, train=train)
    # Deepest unit of each kept stage, coarsest level first (unit keys are
    # zero-padded, so lexicographic max is the last unit).
    skips = []
    for stage_name in reversed(trunk.level_names[:num_levels]):
      units = stage_outputs[stage_name]
      skips.append(units[max(units)])

    pyramid = FPNDecoder(
        self.config.output_dim, num_levels, dtype=self.dtype, name='decoder'
    )(skips, train=train)

    # Strides are exact on the padded extent; crop the padding back off so
    # each level covers ceil(input/stride) cells of the original image.
    features: List[Array] = []
    strides: List[Sequence[int]] = []
    for f in pyramid:
      stride = tuple(int(s) for s in padded_hw // np.array(f.shape[-3:-1]))
      h, w = (-(-input_hw // np.array(stride))).astype(int)
      features.append(f[..., :h, :w, :])
      strides.append(stride)
    return types.FeatureImagePyramid(
        features=features, strides=tuple(strides))
