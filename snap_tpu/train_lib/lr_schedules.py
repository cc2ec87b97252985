"""Learning-rate schedules (compound-factor style, scenic-compatible configs).

The reference delegates to scenic's ``lr_schedules`` (snap/trainer.py:408)
with configs like ``factors='constant * cosine_decay'``,
``start_decay_step``, ``steps_per_cycle`` (snap/configs/
train_localization.py:87-92). This module re-implements that factor algebra.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import ml_collections

LrFn = Callable[[jnp.ndarray], jnp.ndarray]


def get_learning_rate_fn(config: ml_collections.ConfigDict) -> LrFn:
  """Build an lr(step) function from ``config.lr_configs``."""
  cfg = config.lr_configs
  schedule = cfg.get('learning_rate_schedule', 'compound')
  if schedule != 'compound':
    raise NotImplementedError(schedule)
  factors = [f.strip() for f in cfg.factors.split('*')]
  base = cfg.base_learning_rate
  warmup = cfg.get('warmup_steps') or 0
  start_decay = cfg.get('start_decay_step') or 0
  steps_per_cycle = cfg.get('steps_per_cycle')

  def lr_fn(step):
    step = jnp.asarray(step, jnp.float32)
    lr = jnp.asarray(1.0, jnp.float32)
    for factor in factors:
      match factor:
        case 'constant':
          lr = lr * base
        case 'linear_warmup':
          lr = lr * jnp.minimum(1.0, step / jnp.maximum(warmup, 1))
        case 'cosine_decay':
          progress = (step - start_decay) / jnp.maximum(steps_per_cycle, 1)
          progress = jnp.clip(progress, 0.0, 1.0)
          lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        case 'linear_decay':
          progress = (step - start_decay) / jnp.maximum(steps_per_cycle, 1)
          lr = lr * (1.0 - jnp.clip(progress, 0.0, 1.0))
        case 'rsqrt_decay':
          lr = lr / jnp.sqrt(jnp.maximum(step, jnp.maximum(warmup, 1.0)))
        case _:
          raise NotImplementedError(f'Unknown lr factor: {factor}')
    return lr

  return lr_fn
