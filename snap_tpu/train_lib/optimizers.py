"""Optimizer construction with freeze-by-regex masking.

Capability parity with scenic's optimizer layer as used by the reference:
``optimizer_configs.optimizer`` selects the optax transform and
``freeze_params_reg_exp`` freezes matching parameter paths (used to freeze
``bev_mapper/`` or ``streetview_encoder/`` during head fine-tuning,
snap/configs/train_semantics.py:35-36, train_occupancy.py:27-28).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import flax
import jax
import optax

from snap_tpu.train_lib import lr_schedules


def make_freeze_mask(params: Any, regex: str) -> Any:
  """True where the '/'-joined param path matches ``regex`` (frozen)."""
  pattern = re.compile(regex)
  flat = flax.traverse_util.flatten_dict(params)
  mask = {k: bool(pattern.search('/'.join(map(str, k)) + '/'))
          for k in flat}
  return flax.traverse_util.unflatten_dict(mask)


def get_optimizer(
    config: Any,
    lr_fn: lr_schedules.LrFn,
    params: Optional[Any] = None,
) -> optax.GradientTransformation:
  """Build the optax chain from ``config.optimizer_configs``."""
  opt_cfg = config.optimizer_configs
  name = opt_cfg.get('optimizer', 'adam')
  weight_decay = opt_cfg.get('weight_decay') or 0.0
  match name:
    case 'adam':
      if weight_decay:
        tx = optax.adamw(lr_fn, weight_decay=weight_decay)
      else:
        tx = optax.adam(lr_fn)
    case 'adamw':
      tx = optax.adamw(lr_fn, weight_decay=weight_decay)
    case 'sgd':
      tx = optax.sgd(lr_fn, momentum=opt_cfg.get('momentum') or 0.9)
    case _:
      raise NotImplementedError(name)

  if config.get('max_grad_norm') is not None:
    tx = optax.chain(optax.clip_by_global_norm(config.max_grad_norm), tx)

  freeze_regex = opt_cfg.get('freeze_params_reg_exp')
  if freeze_regex:
    assert params is not None, 'params needed to build the freeze mask'
    frozen = make_freeze_mask(params, freeze_regex)
    if opt_cfg.get('allocate_frozen_state', True):
      # Default: zero frozen updates after the full transform. The optimizer
      # state keeps every leaf (Adam moments for frozen params too), so the
      # checkpoint structure is identical to an unfrozen run's.
      tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    else:
      # Memory-lean fine-tuning: run the transform only over trainable
      # leaves, so frozen subtrees never allocate moments (saves ~2x the
      # frozen params' bytes — the whole bev_mapper during semantics
      # fine-tuning). Gradient clipping then normalizes over trainable
      # grads only, which is the more faithful clipping semantics anyway.
      trainable = jax.tree_util.tree_map(lambda m: not m, frozen)
      tx = optax.chain(
          optax.masked(tx, trainable),
          optax.masked(optax.set_to_zero(), frozen),
      )
  return tx
