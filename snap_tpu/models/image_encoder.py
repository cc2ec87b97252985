"""Image encoder: ResNet trunk + FPN decoder -> multi-scale feature pyramid.

Reference behavior: snap/models/image_encoder.py. Input is padded to the
largest stride, per-stage features are decoded coarse-to-fine with 1x1 skip
convs and bilinear x2 upsampling, and outputs are cropped back to the input
extent. Strides are static metadata carried next to the features.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional

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


class FPNDecoder(nn.Module):
  """Feature-Pyramid-Network-like decoder (coarse-to-fine)."""

  output_dim: int
  num_levels: int
  activation: str = 'relu'
  norm: Optional[str] = 'bit_resnet'
  kernel_init: Callable[..., Any] = initializers.lecun_normal()
  bias_init: Callable[..., Any] = initializers.zeros
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(
      self, input_features: List[Array], train: bool = False
  ) -> List[Array]:
    assert len(input_features) == self.num_levels
    activation = getattr(nn, self.activation)
    norm = None
    if self.norm == 'bit_resnet':
      norm = functools.partial(resnet.GroupNorm, dtype=self.dtype)
    elif self.norm == 'batch_norm':
      norm = functools.partial(
          nn.BatchNorm,
          use_running_average=not train,
          axis=-1,
          dtype=self.dtype,
          param_dtype=jnp.float32,
      )
    elif self.norm is not None:
      raise ValueError(self.norm)
    skip_conv = functools.partial(
        nn.Conv,
        features=self.output_dim,
        kernel_size=(1, 1),
        use_bias=norm is None,
        kernel_init=self.kernel_init,
        bias_init=self.bias_init,
        dtype=self.dtype,
        param_dtype=jnp.float32,
    )

    out_features = []
    f_prev = None
    for level, f_skip in enumerate(input_features):
      f = activation(f_skip)
      if norm is not None:
        f = norm(name=f'{level}_skip_norm')(f)
      f = skip_conv(name=f'{level}_skip_conv')(f)
      if f_prev is not None:
        assert f.shape[-3] == f_prev.shape[-3] * 2, "Heights don't match."
        assert f.shape[-2] == f_prev.shape[-2] * 2, "Widths don't match."
        new_shape = f_prev.shape[:-3] + f.shape[-3:-1] + f_prev.shape[-1:]
        f_prev = jax.image.resize(f_prev, new_shape, 'bilinear')
        f = f + f_prev
      f_prev = f
      out_features.append(f)
    return out_features


class ImageEncoder(nn.Module):
  """Trunk + FPN wrapper returning a FeatureImagePyramid."""

  config: ml_collections.ConfigDict
  dtype: jnp.dtype = jnp.float32

  def setup(self):
    num_pyr_levels = self.config.num_pyr_levels
    if self.config.encoder_name == 'resnet':
      self.encoder = resnet.ResNetV2(self.config.encoder, self.dtype)
      if num_pyr_levels is None:
        num_pyr_levels = len(self.encoder.level_names)
      # log2 of the stride of the coarsest pyramid level: the root block
      # contributes 4x (2 octaves), each later stage doubles.
      self.max_stride = (
          (not self.config.encoder.skip_root_block) * 2 + num_pyr_levels - 1
      )
    else:
      raise ValueError(self.config.encoder_name)
    self.level_names = self.encoder.level_names[:num_pyr_levels][::-1]
    self.decoder = FPNDecoder(
        self.config.output_dim, num_pyr_levels, dtype=self.dtype
    )

  def __call__(
      self, image: Array, train: bool = False
  ) -> types.FeatureImagePyramid:
    image = image.astype(self.dtype)
    input_shape = np.array(image.shape[-3:-1])
    image_padded = pad_to_multiple(image, 2**self.max_stride)
    padded_shape = np.array(image_padded.shape[-3:-1])
    encoder_features = self.encoder(image_padded, train=train)

    skip_features = []
    for layer_name in self.level_names:
      _, f = sorted(encoder_features[layer_name].items())[-1]
      skip_features.append(f)

    out_features = self.decoder(skip_features, train=train)
    strides = [
        tuple(padded_shape // np.array(f.shape[-3:-1])) for f in out_features
    ]
    out_features_crop = []
    for s, f in zip(strides, out_features):
      h, w = np.ceil(input_shape / np.array(s)).astype(int)
      out_features_crop.append(f[..., :h, :w, :])
    return types.FeatureImagePyramid(
        features=out_features_crop, strides=tuple(strides)
    )
