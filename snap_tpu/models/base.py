"""Model wrapper protocol shared by all tasks (reference: snap/models/base.py)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

Batch = Dict[str, Any]
Predictions = Dict[str, Any]
LossDict = Dict[str, jax.Array]
MetricsDict = Dict[str, jax.Array]
LossMetricsTuple = Tuple[LossDict, MetricsDict]
LossMetricsFn = Callable[
    [Predictions, Batch, Optional[Any]], LossMetricsTuple
]


class BaseModel:
  """Holds config + dataset metadata, builds the flax model, declares losses.

  Every loss/metric function returns per-example vectors; aggregation across
  the batch/mesh happens in the trainer (masked, finite-filtered mean).
  """

  def __init__(
      self,
      config: ml_collections.ConfigDict,
      dataset_meta_data: Dict[str, Any],
      dtype: jnp.dtype = jnp.float32,
  ):
    self.config = config
    self.dataset_meta_data = dataset_meta_data
    self.dtype = dtype
    self.flax_model = self.build_flax_model()

  def loss_metrics_function(
      self,
      pred: Predictions,
      batch: Batch,
      model_params: Optional[Any] = None,
  ) -> LossMetricsTuple:
    raise NotImplementedError('Subclasses must implement metrics.')

  def build_flax_model(self) -> nn.Module:
    raise NotImplementedError('Subclasses must implement build_flax_model().')

  @classmethod
  def default_flax_model_config(cls) -> ml_collections.ConfigDict:
    raise NotImplementedError(
        'Subclasses must implement default_flax_model_config().'
    )
