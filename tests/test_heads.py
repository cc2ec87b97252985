"""Tests for the SemanticNet and OccupancyNet heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from snap_tpu.configs import defaults
from snap_tpu.models import occupancy_net
from snap_tpu.models import semantic_net


@pytest.fixture(scope='module')
def dataset():
  return helpers.tiny_dataset(
      batch_size=2, mode='single_scene', add_lidar_rays=True, num_rays=64)


@pytest.fixture(scope='module')
def batch(dataset):
  b = dataset.meta_data['get_dummy_batch_fn']()
  b.pop('_host', None)
  return b


def init_and_apply(model, batch, train=False):
  rngs = {'params': jax.random.PRNGKey(0),
          'sampling': jax.random.PRNGKey(1)}
  variables = jax.jit(
      lambda b: model.flax_model.init(rngs, b, train=False))(batch)
  pred = jax.jit(
      lambda v, b: model.flax_model.apply(
          v, b, train=train, rngs={'sampling': jax.random.PRNGKey(2)}),
  )(variables, batch)
  return variables, pred


class TestSemanticNet:

  def make_model(self, dataset, **overrides):
    config = defaults.semantic_net()
    config.bev_mapper = helpers.tiny_bev_mapper(('streetview', 'aerial'))
    config.decoder_dim = 16
    for k, v in overrides.items():
      setattr(config, k, v)
    return semantic_net.SemanticNetModel(config, dataset.meta_data,
                                         jnp.float32)

  def test_forward_and_loss(self, dataset, batch):
    model = self.make_model(dataset)
    variables, pred = init_and_apply(model, batch)
    grid = dataset.meta_data['grid'].bev()
    n_areas = len(model.config.area_classes)
    assert pred['logits_areas'].shape == (2, *grid.extent, n_areas)
    assert 'logits_objects_exclusive' in pred
    losses, metrics = model.loss_metrics_function(pred, batch)
    assert losses['total'].shape == (2,)
    assert bool(jnp.isfinite(losses['total']).all())
    assert 'semantics/accuracy' in metrics

  def test_random_flip_train(self, dataset, batch):
    model = self.make_model(dataset, apply_random_flip=True)
    _, pred = init_and_apply(model, batch, train=True)
    losses, _ = model.loss_metrics_function(pred, batch)
    assert bool(jnp.isfinite(losses['total']).all())

  def test_resnet_stage_decoder(self, dataset, batch):
    model = self.make_model(dataset, decoder_type='resnet_stage',
                            resnet_num_units=1)
    _, pred = init_and_apply(model, batch)
    losses, _ = model.loss_metrics_function(pred, batch)
    assert bool(jnp.isfinite(losses['total']).all())

  def test_pack_evaluation_metrics(self, dataset, batch):
    model = self.make_model(dataset)
    _, pred = init_and_apply(model, batch)
    losses, metrics = model.loss_metrics_function(pred, batch)
    packed = model.pack_evaluation_metrics(metrics, losses, batch, pred)
    assert 'loss' in packed
    assert any(k.startswith('gt_counts/') for k in packed)


class TestOccupancyNet:

  def make_model(self, dataset):
    config = defaults.occupancy_net()
    config.streetview_encoder = helpers.tiny_streetview_encoder()
    config.num_samples_per_ray = 5
    config.occupancy_mlp.layers = (16, 1)
    return occupancy_net.OccupancyNetModel(config, dataset.meta_data,
                                           jnp.float32)

  def test_forward_and_loss(self, dataset, batch):
    model = self.make_model(dataset)
    _, pred = init_and_apply(model, batch)
    num_rays = batch['lidar_rays']['points'].shape[1]
    assert pred['occupancy'].logits.shape == (2, num_rays * 5)
    assert pred['ray_samples'].labels.shape == (2, num_rays * 5)
    losses, metrics = model.loss_metrics_function(pred, batch)
    assert losses['total'].shape == (2,)
    assert bool(jnp.isfinite(losses['total']).all())
    assert 'occupancy/accuracy' in metrics

  def test_ray_sampling_labels(self):
    hits = jnp.array([[[0.0, 0.0, 0.0]]])
    origins = jnp.array([[[0.0, 0.0, 5.0]]])
    valid = jnp.ones((1, 1), bool)
    samples = occupancy_net.sample_queries_from_rays(
        hits, origins, valid, num_samples=4, margin=0.2)
    # 1 hit (occupied) + 3 free-space points per ray.
    assert samples.points.shape == (1, 4, 3)
    np.testing.assert_array_equal(
        samples.labels[0], [True, False, False, False])
    # Free-space samples stay short of the hit by the margin.
    dists = np.linalg.norm(
        np.asarray(samples.points[0]) - np.asarray(origins[0]), axis=-1)
    assert dists[1] == 0.0  # at the origin
    assert dists[-1] <= 5.0 - 0.2 + 1e-5
