"""ImageEncoder pyramid contract: shapes, strides, padding, param tree.

The param-tree test pins the checkpoint contract: trained checkpoints
(workdirs/run_small, workdirs/run_full1chip) address FPN parameters as
decoder/{i}_skip_{norm,conv} under an encoder/decoder split — any rewrite
of image_encoder.py must keep producing exactly these paths.
"""

from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snap_tpu.models import image_encoder
from tests import helpers


def _init(cfg, image):
  model = image_encoder.ImageEncoder(cfg)
  variables = model.init(jax.random.PRNGKey(0), image)
  return model, variables


def test_pyramid_shapes_and_strides():
  cfg = helpers.tiny_image_encoder(output_dim=16)
  image = jnp.ones((2, 48, 64, 3))
  model, variables = _init(cfg, image)
  pyr = model.apply(variables, image)
  # Coarse-to-fine, strides halving, all at output_dim channels.
  assert len(pyr.features) == len(pyr.strides)
  for f, s in zip(pyr.features, pyr.strides):
    assert f.shape[-1] == 16
    assert f.shape[-3] == int(np.ceil(48 / s[0]))
    assert f.shape[-2] == int(np.ceil(64 / s[1]))
  sh = [s[0] for s in pyr.strides]
  assert sh == sorted(sh, reverse=True)
  assert pyr.strides[-1] == (4, 4)  # root block = 2 octaves


def test_non_multiple_input_is_padded_and_cropped():
  cfg = helpers.tiny_image_encoder(output_dim=8)
  image = jnp.ones((1, 45, 61, 3))  # not a multiple of any stride
  model, variables = _init(cfg, image)
  pyr = model.apply(variables, image)
  for f, s in zip(pyr.features, pyr.strides):
    assert f.shape[-3] == int(np.ceil(45 / s[0]))
    assert f.shape[-2] == int(np.ceil(61 / s[1]))


def test_skip_root_block_keeps_resolution():
  cfg = helpers.tiny_image_encoder(output_dim=8, skip_root=True)
  image = jnp.ones((1, 32, 32, 3))
  model, variables = _init(cfg, image)
  pyr = model.apply(variables, image)
  assert pyr.strides[-1] == (1, 1)  # stride-1 raster stem


def test_param_tree_pinned():
  """Checkpoint contract: FPN params live at decoder/{i}_skip_{norm,conv}."""
  cfg = helpers.tiny_image_encoder(output_dim=16)
  image = jnp.ones((1, 32, 32, 3))
  _, variables = _init(cfg, image)
  paths = {
      '/'.join(k) for k in
      flax.traverse_util.flatten_dict(variables['params']).keys()
  }
  top = {p.split('/')[0] for p in paths}
  assert top == {'encoder', 'decoder'}
  decoder_paths = sorted(p for p in paths if p.startswith('decoder/'))
  levels = {p.split('/')[1] for p in decoder_paths}
  # One skip_norm (scale, bias) + one skip_conv (kernel) per pyramid level.
  for i in range(len(levels) // 2):
    assert f'decoder/{i}_skip_conv/kernel' in paths
    assert f'decoder/{i}_skip_norm/scale' in paths
    assert f'decoder/{i}_skip_norm/bias' in paths
  # bit_resnet norm replaces the conv bias.
  assert not any(p.endswith('_skip_conv/bias') for p in paths)
  # The trunk keeps its BiT-format names (npz loading contract).
  assert any(p.startswith('encoder/block1/') for p in paths)


def test_upsample_to_requires_octaves():
  coarse = jnp.ones((1, 4, 4, 8))
  like = jnp.ones((1, 9, 8, 8))
  with pytest.raises(ValueError, match='octave'):
    image_encoder._upsample_to(coarse, like)


def test_wrong_level_count_raises():
  dec = image_encoder.FPNDecoder(output_dim=8, num_levels=3)
  feats = [jnp.ones((1, 4, 4, 8)), jnp.ones((1, 8, 8, 8))]
  with pytest.raises(ValueError, match='levels'):
    dec.init(jax.random.PRNGKey(0), feats)
