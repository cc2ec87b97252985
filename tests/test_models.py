"""Integration tests: tiny models over synthetic batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from snap_tpu.models import bev_localizer
from snap_tpu.utils import misc


@pytest.fixture(scope='module')
def dataset():
  return helpers.tiny_dataset(batch_size=2)


@pytest.fixture(scope='module')
def batch(dataset):
  b = dataset.meta_data['get_dummy_batch_fn']()
  b.pop('_host', None)
  return b


def build_localizer(dataset, modalities=('streetview', 'aerial'), **overrides):
  config = helpers.tiny_localizer(modalities, **overrides)
  meta = dataset.meta_data
  return bev_localizer.BEVLocalizerModel(config, meta, jnp.float32)


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


class TestBEVLocalizer:

  def test_forward_and_loss(self, dataset, batch):
    model = build_localizer(dataset)
    variables, pred = init_and_apply(model, batch)

    grid = dataset.meta_data['grid']
    h, w = grid.bev().extent
    assert pred['map']['bev_matching'].features.shape == (2, h, w, 16)
    # Scores: GT pose + num_pose_samples.
    assert pred['scores_poses'].shape == (2, 1 + 32)
    assert pred['map_t_query'].shape == (2,)

    losses, metrics = model.loss_metrics_function(
        pred, batch, variables['params'])
    assert losses['total'].shape == (2,)
    assert bool(jnp.isfinite(losses['total']).all())
    for key in ('loc/err_max_position', 'loc/recall_max_1m',
                'loc/recall_top1'):
      assert metrics[key].shape == (2,)

  def test_bev_net_runs_and_keeps_contract(self, dataset, batch):
    """bev_net (residual conv stack over the fused plane) preserves the
    matching-plane shape/validity contract and produces finite grads.
    Beyond-reference: upstream declared but never implemented it
    (snap/models/bev_mapper.py:141-142)."""
    from ml_collections import config_dict

    model = build_localizer(dataset)
    model.config.bev_mapper.bev_net = config_dict.ConfigDict(
        dict(num_units=2))
    variables, pred = init_and_apply(model, batch)
    assert any('bev_net' in k for k in variables['params']['bev_mapper'])
    grid = dataset.meta_data['grid']
    h, w = grid.bev().extent
    assert pred['map']['bev_matching'].features.shape == (2, h, w, 16)
    feats = pred['map']['bev_features']
    assert bool(jnp.isfinite(feats.features).all())
    # Invalid cells stay zeroed after the convs.
    masked = np.asarray(feats.features)[~np.asarray(feats.valid)]
    np.testing.assert_array_equal(masked, 0)
    losses, _ = model.loss_metrics_function(pred, batch, variables['params'])
    assert bool(jnp.isfinite(losses['total']).all())
    model.config.bev_mapper.bev_net = None

  def test_train_mode_runs(self, dataset, batch):
    model = build_localizer(dataset)
    _, pred = init_and_apply(model, batch, train=True)
    assert bool(jnp.isfinite(pred['scores_poses']).all())

  def test_aerial_only_with_query_mapper(self, dataset, batch):
    """Aerial-only map + streetview query mapper (driver config #2 shape)."""
    config = helpers.tiny_localizer(modalities=('aerial',))
    mapper_query = helpers.tiny_bev_mapper(modalities=('streetview',))
    config.bev_mapper_query = mapper_query
    model = bev_localizer.BEVLocalizerModel(
        config, dataset.meta_data, jnp.float32)
    _, pred = init_and_apply(model, batch)
    losses, _ = model.loss_metrics_function(pred, batch)
    assert bool(jnp.isfinite(losses['total']).all())

  def test_grid_refinement(self, dataset, batch):
    model = build_localizer(dataset, do_grid_refinement=True)
    _, pred = init_and_apply(model, batch)
    assert 'scores_grid_refine' in pred
    assert pred['map_t_query'].shape == (2,)

  @pytest.mark.heavy
  def test_gradients_finite(self, dataset, batch):
    model = build_localizer(dataset)
    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1)}
    variables = model.flax_model.init(rngs, batch, train=False)

    def loss_fn(params):
      pred = model.flax_model.apply(
          {'params': params}, batch, train=True,
          rngs={'sampling': jax.random.PRNGKey(2)})
      losses, _ = model.loss_metrics_function(pred, batch, params)
      return losses['total'].mean()

    grads = jax.grad(loss_fn)(variables['params'])
    finite = jax.tree_util.tree_map(
        lambda g: bool(jnp.isfinite(g).all()), grads)
    assert all(jax.tree_util.tree_leaves(finite)), misc.filter_dict(
        jax.tree_util.tree_map(
            lambda g: float(jnp.abs(g).max()), grads),
        lambda k, v: not np.isfinite(v))


class TestBatchSchema:

  def test_batch_shapes(self, dataset, batch):
    assert batch['map']['images'].shape[:2] == (2, 3)
    assert batch['query']['images'].shape[:2] == (2, 1)
    assert batch['map']['T_view2scene'].shape == (2, 3)
    assert batch['map']['camera'].shape == (2, 3)
    assert batch['T_query2map'].shape == (2,)
    assert batch['batch_mask'].shape == (2,)
    grid = dataset.meta_data['grid']
    h, w = grid.bev().extent
    assert batch['map']['rasters']['rgb'].shape == (2, h, w, 3)

  def test_images_in_range(self, batch):
    for scene in ('map', 'query'):
      imgs = batch[scene]['images']
      assert imgs.min() >= 0.0 and imgs.max() <= 1.0

  def test_multiview_consistency(self, dataset, batch):
    """Ground points project to pixels with (approximately) equal colors in
    different views — the property the mapper exploits."""
    cam = batch['map']['camera'][0]
    t_view2scene = batch['map']['T_view2scene'][0]
    images = batch['map']['images'][0]
    # A ground point near the middle of two camera positions.
    positions = np.asarray(t_view2scene.t)
    point = np.array([*(positions[:2, :2].mean(0)), 0.0])

    colors = []
    for v in range(2):
      tfm = t_view2scene[v]
      cam_v = cam[v]
      p_cam = np.asarray(tfm.inv @ point[None, :])[0]
      if p_cam[2] < 0.5:
        pytest.skip('point behind camera for this draw')
      p2d, valid = cam_v.world2image(jnp.asarray(p_cam)[None])
      if not bool(valid[0]):
        pytest.skip('point outside image for this draw')
      x, y = np.asarray(p2d[0]).astype(int)
      colors.append(images[v, y, x])
    colors = np.stack(colors)
    # Same ground point, two views: colors agree up to the distance fade.
    assert np.abs(colors[0] - colors[1]).max() < 0.35


class TestConfidenceQuery:

  @pytest.mark.parametrize('backend', ['ransac', 'exhaustive'])
  def test_confidence_weighting_runs(self, dataset, batch, backend):
    overrides = dict(add_confidence_query=True)
    if backend == 'exhaustive':
      overrides.update(pose_backend='exhaustive', filter_points_in_fov=False,
                       clip_negative_scores=False, num_rotations=8)
    model = build_localizer(dataset, **overrides)
    variables, pred = init_and_apply(model, batch)
    assert 'bev_confidence' in pred['query']
    losses, _ = model.loss_metrics_function(pred, batch, variables['params'])
    assert bool(jnp.isfinite(losses['total']).all())

  def test_confidence_affects_dense_volume(self, dataset, batch):
    """The confidence head must influence the dense scores (regression:
    conf_q was silently dropped by the exhaustive backend)."""
    model = build_localizer(
        dataset, add_confidence_query=True, pose_backend='exhaustive',
        filter_points_in_fov=False, clip_negative_scores=False,
        num_rotations=8)
    variables, pred = init_and_apply(model, batch)

    def vol_sum(params):
      out = model.flax_model.apply(
          {'params': params}, batch, train=False,
          rngs={'sampling': jax.random.PRNGKey(2)})
      vol = out['scores_pose_volume']
      return jnp.where(jnp.isfinite(vol), vol, 0.0).sum()

    grads = jax.jit(jax.grad(vol_sum))(variables['params'])
    conf_grad = grads['bev_mapper_query']['confidence_head'] if (
        'bev_mapper_query' in grads and 'confidence_head' in grads.get(
            'bev_mapper_query', {})) else grads['bev_mapper'].get(
                'confidence_head')
    assert conf_grad is not None
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(conf_grad))
    assert total > 0.0
