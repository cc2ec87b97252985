"""Semantic BEV segmentation head on top of a (frozen) BEVMapper.

Reference behavior: snap/models/semantic_net.py — MLP or Dense+ResNet-stage
decoder over the fused plane, random-flip augmentation, class-frequency-
balanced multiclass CE for area classes plus (exclusive multiclass + binary
independent)/2 for objects, and PCM label transfer for building/tree.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import optax

from snap_tpu.configs import defaults as default_configs
from snap_tpu.models import base
from snap_tpu.models import bev_mapper
from snap_tpu.models import layers
from snap_tpu.models import resnet
from snap_tpu.models import types
from snap_tpu.utils import grids

Array = jax.Array


def balancing_weights(
    frequencies: dict,
    classes: Sequence[str],
    binary: bool = False,
    eps: float = 1e-3,
):
  """Inverse-frequency class weights; a uniform distribution maps to all-1.

  Multiclass: the listed frequencies are renormalized to a distribution.
  Binary: each class is its own two-way problem, so positive and negative
  rates get separate weight vectors. Rates are floored at ``eps`` so nearly
  absent classes don't produce unbounded weights.
  """
  inv_count = 1.0 / len(classes)
  rate = np.asarray([frequencies[c] for c in classes], dtype=np.float64)
  if binary:
    pos = rate.clip(min=eps)
    return (jnp.asarray(inv_count / pos),
            jnp.asarray(inv_count / (1.0 - pos).clip(min=eps)))
  rate = (rate / rate.sum()).clip(min=eps)
  return jnp.asarray(inv_count / rate)


def _per_class_recall(correct: Array, in_class: Array, valid: Array,
                      classes: Sequence[str], namespace: Optional[str]
                      ) -> dict:
  """Recall metrics: fraction of valid in-class cells predicted correctly."""
  recall = layers.masked_mean(
      correct, valid[..., None] & in_class, axis=(1, 2))
  suffix = f'/{namespace}' if namespace else ''
  out = {f'recall/average{suffix}': recall.mean(-1)}
  out.update({f'recall/{c}': recall[..., i] for i, c in enumerate(classes)})
  return out


def multiclass_crossentropy_metrics(
    logits: Array,
    labels: Array,
    valid: Array,
    classes: Sequence[str],
    frequencies,
    namespace: Optional[str] = None,
) -> Tuple[Array, dict]:
  """Class-balanced multiclass CE + accuracy/recall metrics (per example)."""
  cell_nll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
  if frequencies:
    cell_nll *= balancing_weights(dict(frequencies), classes)[labels]
    assert cell_nll.ndim == 3  # [B, H, W]
  nll = layers.masked_mean(cell_nll, valid, axis=(1, 2))

  predicted_ok = jnp.argmax(logits, axis=-1) == labels
  gt_one_hot = labels[..., None] == jnp.arange(logits.shape[-1])
  suffix = f'/{namespace}' if namespace else ''
  metrics = {
      f'accuracy{suffix}': layers.masked_mean(predicted_ok, valid, (1, 2)),
      **_per_class_recall(
          predicted_ok[..., None], gt_one_hot, valid, classes, namespace),
  }
  return nll, metrics


def binary_crossentropy_metrics(
    logits: Array,
    gt_mask: Array,
    valid: Array,
    classes: Sequence[str],
    frequencies,
    namespace: Optional[str] = None,
) -> Tuple[Array, dict]:
  """Class-balanced binary CE + recall metrics (per example)."""
  cell_nll = optax.sigmoid_binary_cross_entropy(logits, gt_mask)
  if frequencies:
    w_pos, w_neg = balancing_weights(dict(frequencies), classes, binary=True)
    cell_nll *= jnp.where(gt_mask, w_pos, w_neg)
    assert cell_nll.ndim == 4  # [B, H, W, N]
  nll = layers.masked_mean(cell_nll.mean(-1), valid, axis=(1, 2))

  predicted_ok = (logits > 0) == gt_mask  # sigmoid(x) > .5  <=>  x > 0
  metrics = _per_class_recall(predicted_ok, gt_mask, valid, classes,
                              namespace)
  return nll, metrics


@jax.vmap
def batched_raster_flip(raster: Array, flip_mask: Array) -> Array:
  """Flip the two leading spatial dims of a raster per flip_mask."""
  for i in range(2):
    raster = jnp.where(flip_mask[i], jnp.flip(raster, axis=i), raster)
  return raster


class SemanticNet(nn.Module):
  """Predict semantic rasters from a BEV neural map."""

  config: ml_collections.ConfigDict
  grid: grids.Grid2D
  dtype: jnp.dtype = jnp.float32

  def setup(self):
    self.bev_mapper = bev_mapper.BEVMapper(
        config=self.config.bev_mapper,
        grid=self.grid,
        dtype=self.dtype,
    )

    num_classes = len(self.config.area_classes)
    self.object_classes = (
        tuple(self.config.object_classes_exclusive)
        + tuple(self.config.object_classes_independent)
    )
    if self.object_classes:
      num_classes += len(self.object_classes) + 1  # + void

    dim = self.config.decoder_dim
    match self.config.decoder_type:
      case 'mlp':
        mlp_config = default_configs.mlp()
        mlp_config.layers = (dim,) * self.config.mlp_num_layers + (num_classes,)
        self.decoder = layers.MLP(mlp_config, self.dtype)
      case 'resnet_stage':
        mlp_config = default_configs.mlp()
        mlp_config.layers = (dim, num_classes)
        self.decoder = nn.Sequential([
            nn.Dense(
                dim,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=jax.nn.initializers.glorot_uniform(),
            ),
            resnet.ResNetStage(self.config.resnet_num_units, dtype=self.dtype),
            lambda out, _: out,  # ResNetStage returns (x, unit dict)
            layers.MLP(mlp_config, self.dtype),
        ])
      case _:
        raise ValueError(f'Unknown {self.config.decoder_type}')

  def __call__(
      self, data: base.Batch, train: bool = False, debug: bool = False
  ) -> base.Predictions:
    if 'map' in data:
      data = data['map']
    pred = self.bev_mapper(data, train)
    if self.config.get('stop_mapper_gradients', False):
      # Exact when the whole mapper is frozen (the train_semantics
      # recipes freeze bev_mapper/): no parameter upstream of this cut
      # needs a gradient, so the mapper backward is dead code to XLA.
      pred = jax.lax.stop_gradient(pred)
    neural_map = pred['bev_features']

    flips = None
    if train and self.config.apply_random_flip:
      flips = jax.random.bernoulli(
          self.make_rng('sampling'),
          shape=(len(neural_map.features), 2),  # batch x spatial axes
      )
      neural_map = types.FeaturePlane(
          features=batched_raster_flip(neural_map.features, flips),
          valid=batched_raster_flip(neural_map.valid, flips),
      )
    logits = self.decoder(neural_map.features).astype(jnp.float32)
    logits = jnp.where(neural_map.valid[..., None], logits, 0)
    if flips is not None:
      logits = batched_raster_flip(logits, flips)
    pred['logits_areas'], logits = jnp.split(
        logits, [len(self.config.area_classes)], axis=-1
    )
    if self.object_classes:
      excl, indep = jnp.split(
          logits, [len(self.config.object_classes_exclusive) + 1], axis=-1
      )
      pred['logits_objects_exclusive'] = excl
      pred['logits_objects_independent'] = indep
    return pred


class SemanticNetModel(base.BaseModel):
  """Trainer-facing wrapper for the SemanticNet."""

  def build_flax_model(self) -> nn.Module:
    return SemanticNet(
        self.config,
        self.dataset_meta_data['grid'].bev(),
        self.dtype,
    )

  @classmethod
  def default_flax_model_config(cls) -> ml_collections.ConfigDict:
    return default_configs.semantic_net()

  @property
  def gt_indices(self) -> dict:
    gt_classes = self.dataset_meta_data['semantic_classes_gt']
    return {c: i for i, c in enumerate(gt_classes)}

  def transfer_labels_from_pcm(self, masks: Array, masks_pcm: Array) -> Array:
    """Overwrite building/tree GT layers from the semantic-map rasters."""
    indices_gt = self.gt_indices
    indices_pcm = {
        c: i
        for i, c in enumerate(self.dataset_meta_data['semantic_map_classes'])
    }
    for name_gt, name_pcm in (('building', 'buildings_raw'), ('tree', 'tree')):
      if name_gt in indices_gt and name_pcm in indices_pcm:
        mask_pcm = masks_pcm[..., indices_pcm[name_pcm]]
        masks = masks.at[..., indices_gt[name_gt]].set(mask_pcm)
    return masks

  def _create_exclusive_labels(
      self,
      masks_all: Array,
      classes: Sequence[str],
      add_void: bool = False,
  ) -> Tuple[Array, Array]:
    gt_indices = self.gt_indices
    indices = [gt_indices[c] for c in classes]
    masks = masks_all[..., jnp.asarray(indices)]

    # Group all line labels into a single class.
    if 'line' in classes:
      mask_line = masks_all[..., gt_indices['line']]
      for c in ('stopline', 'otherlanemarking'):
        if c in gt_indices and c not in classes:
          mask_line = mask_line | masks_all[..., gt_indices[c]]
      masks = masks.at[..., list(classes).index('line')].set(mask_line)
    valid = masks.any(axis=-1)
    labels = jnp.argmax(masks, axis=-1)
    if add_void:
      labels = jnp.where(valid, labels, len(classes))
    return labels, valid

  def create_area_labels(self, masks_all: Array) -> Tuple[Array, Array]:
    return self._create_exclusive_labels(masks_all, self.config.area_classes)

  def create_object_labels(self, masks: Array) -> Tuple[Array, Array]:
    labels_excl, _ = self._create_exclusive_labels(
        masks, self.config.object_classes_exclusive, add_void=True
    )
    gt_indices = self.gt_indices
    indices_indep = [
        gt_indices[c] for c in self.config.object_classes_independent
    ]
    masks_indep = masks[..., jnp.asarray(indices_indep)]
    return labels_excl, masks_indep

  def _loss_metrics_areas(self, pred, masks):
    labels, valid = self.create_area_labels(masks)
    valid = pred['bev_features'].valid & valid
    return multiclass_crossentropy_metrics(
        pred['logits_areas'],
        labels,
        valid,
        self.config.area_classes,
        dict(self.config.area_frequencies or []),
    )

  def _loss_metrics_objects(self, pred, masks):
    labels_excl, masks_indep = self.create_object_labels(masks)
    nll_excl, metrics_excl = multiclass_crossentropy_metrics(
        pred['logits_objects_exclusive'],
        labels_excl,
        pred['bev_features'].valid,
        (*self.config.object_classes_exclusive, 'void'),
        dict(self.config.object_frequencies or []),
        namespace='excl',
    )
    nll_indep, metrics_indep = binary_crossentropy_metrics(
        pred['logits_objects_independent'],
        masks_indep,
        pred['bev_features'].valid,
        self.config.object_classes_independent,
        dict(self.config.object_frequencies or []),
        namespace='indep',
    )
    return nll_excl, nll_indep, metrics_excl | metrics_indep

  def loss_metrics_function(
      self,
      pred: base.Predictions,
      data: base.Batch,
      model_params=None,
  ) -> base.LossMetricsTuple:
    if 'map' in data:
      data = data['map']
    masks = jnp.asarray(data['rasters']['gt_semantics'])
    masks = self.transfer_labels_from_pcm(
        masks, jnp.asarray(data['rasters']['semantics']))
    nll_areas, metrics = self._loss_metrics_areas(pred, masks)
    losses = {'nll_areas': nll_areas}
    total = nll_areas

    if 'logits_objects_exclusive' in pred:
      nll_excl, nll_indep, metrics_objects = self._loss_metrics_objects(
          pred, masks
      )
      total = (total + (nll_excl + nll_indep) / 2) / 2
      losses['nll_objects_exclusive'] = nll_excl
      losses['nll_objects_indep'] = nll_indep
      metrics |= metrics_objects

    losses['total'] = total
    metrics = {f'semantics/{k}': v for k, v in metrics.items()}
    return losses, metrics

  def pack_evaluation_metrics(
      self,
      training_metrics: base.MetricsDict,
      losses: base.LossDict,
      data: base.Batch,
      pred: base.Predictions,
  ) -> base.MetricsDict:
    if 'map' in data:
      data = data['map']
    gt_classes = self.dataset_meta_data['semantic_classes_gt']
    gt_counts = data['rasters']['gt_semantics'].sum(axis=(-3, -2))
    gt_counts = {
        f'gt_counts/{c}': gt_counts[..., i] for i, c in enumerate(gt_classes)
    }
    return training_metrics | dict(loss=losses['total']) | gt_counts
