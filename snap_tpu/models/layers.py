"""Common model building blocks (reference: snap/models/layers.py).

All masked reductions keep the "double-where" structure so gradients stay
finite when a mask is empty — this is load-bearing for recall parity
(see SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

from snap_tpu.parallel import mesh as mesh_lib

Array = jax.Array
Axis = Union[None, int, Sequence[int]]


# The three masked-numerics guards below are deliberate bit-parity ports of
# snap/models/layers.py:31-52 (canonical empty-mask / double-where idioms):
# recall parity silently degrades if their NaN-gradient semantics drift.
# Pinned by tests/test_models.py + tests/test_view_scan.py parity suites.


def masked_mean(x: Array, mask: Array, axis: Axis) -> Array:
  """Like ``jnp.mean(x, where=mask)`` but returns zero for empty masks.

  Bit-parity port of snap/models/layers.py:31-34.
  """
  div = jnp.sum(jnp.where(mask.any(axis, keepdims=True), mask, True), axis)
  return jnp.sum(x * mask, axis) / div


def masked_softmax(x: Array, mask: Array, axis: Axis) -> Array:
  """Softmax over masked values with always-finite outputs and gradients.

  Bit-parity port of snap/models/layers.py:37-42.
  """
  valid = mask.any(axis=axis, keepdims=True)
  mask = jnp.where(valid, mask, True)
  x = jnp.where(mask, x, -jnp.inf)
  return jax.nn.softmax(x, axis=axis)


def normalize(x: Array, axis: Axis = -1, eps: float = 1e-5) -> Array:
  """L2-normalize with zero output (and finite gradient) for zero vectors.

  Bit-parity port of snap/models/layers.py:45-52 (double-where zero guard).
  """
  x_ = x.astype(jnp.float32)
  norm = jnp.linalg.norm(x_, axis=axis, keepdims=True)
  invalid = norm < eps
  y = jnp.where(invalid, eps, x_)
  z = x_ / jnp.linalg.norm(y, axis=axis, keepdims=True)
  return jnp.where(invalid, 0, z.astype(x.dtype))


class MLP(nn.Module):
  """Config-driven MLP (reference: snap/models/layers.py:55-83)."""

  config: ml_collections.ConfigDict
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, input_feats: Array, train: bool = False) -> Array:
    # Params stay float32 (master weights); compute runs in self.dtype so the
    # MXU sees bf16 operands without fp16 loss-scaling machinery.
    dense_layer = functools.partial(
        nn.Dense,
        kernel_init=jax.nn.initializers.glorot_uniform(),
        dtype=self.dtype,
        param_dtype=jnp.float32,
    )
    activation = getattr(nn, self.config.activation)
    x = input_feats
    for i, d in enumerate(self.config.layers):
      if i > 0 or self.config.apply_input_activation:
        x = activation(x)
      x = dense_layer(d)(x)
      # TP: wide hidden activations live sharded over the 'model' axis next
      # to their column-sharded kernels (no-op off-mesh / under pure DP).
      # Threshold matches the parameter-sharding rule (mesh_lib.TP_MIN_DIM).
      if d >= mesh_lib.TP_MIN_DIM:
        x = mesh_lib.constrain(x, 'model')
    return x
