"""Tests for the SemanticNet and OccupancyNet heads."""

import flax
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


@pytest.mark.heavy
class TestStopMapperGradients:
  """stop_mapper_gradients: exact for the decoder, zero for the mapper."""

  def _loss_fn(self, model, batch):
    def loss(variables):
      pred = model.flax_model.apply(
          variables, batch, train=True,
          rngs={'sampling': jax.random.PRNGKey(2)})
      losses, _ = model.loss_metrics_function(pred, batch)
      return losses['total'].mean()
    return loss

  def test_exact_decoder_grads_zero_mapper_grads(self, dataset, batch):
    config = defaults.semantic_net()
    config.bev_mapper = helpers.tiny_bev_mapper(('streetview', 'aerial'))
    config.decoder_dim = 16
    config.apply_random_flip = False

    def build(stop):
      cfg = config.copy_and_resolve_references()
      with cfg.unlocked():
        cfg.stop_mapper_gradients = stop
      return semantic_net.SemanticNetModel(cfg, dataset.meta_data,
                                           jnp.float32)

    model_ref, model_cut = build(False), build(True)
    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda b: model_ref.flax_model.init(rngs, b, train=False))(batch)

    loss_ref, grads_ref = jax.value_and_grad(
        self._loss_fn(model_ref, batch))(variables)
    loss_cut, grads_cut = jax.value_and_grad(
        self._loss_fn(model_cut, batch))(variables)

    # Same forward -> same loss.
    np.testing.assert_allclose(float(loss_cut), float(loss_ref), rtol=1e-6)

    flat_ref = flax.traverse_util.flatten_dict(grads_ref['params'], sep='/')
    flat_cut = flax.traverse_util.flatten_dict(grads_cut['params'], sep='/')
    assert flat_ref.keys() == flat_cut.keys()
    n_mapper = n_head = 0
    for k in flat_ref:
      if k.startswith('bev_mapper/'):
        # The cut zeroes exactly the frozen subtree.
        assert float(jnp.abs(flat_cut[k]).max()) == 0.0, k
        n_mapper += 1
      else:
        # ...and leaves every decoder gradient bit-unchanged (the cut sits
        # strictly upstream of the decoder).
        np.testing.assert_array_equal(
            np.asarray(flat_cut[k]), np.asarray(flat_ref[k]), err_msg=k)
        n_head += 1
    assert n_mapper > 0 and n_head > 0
    # The reference run must actually have nonzero mapper grads, or the
    # zero-check above is vacuous.
    assert any(
        float(jnp.abs(flat_ref[k]).max()) > 0
        for k in flat_ref if k.startswith('bev_mapper/'))

  def test_stop_encoder_gradients_exact(self, dataset, batch):
    def build(stop):
      config = defaults.occupancy_net()
      config.streetview_encoder = helpers.tiny_streetview_encoder()
      config.num_samples_per_ray = 5
      config.occupancy_mlp.layers = (16, 1)
      with config.unlocked():
        config.stop_encoder_gradients = stop
      return occupancy_net.OccupancyNetModel(config, dataset.meta_data,
                                             jnp.float32)

    model_ref, model_cut = build(False), build(True)
    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda b: model_ref.flax_model.init(rngs, b, train=False))(batch)

    def loss_fn(model):
      def loss(v):
        pred = model.flax_model.apply(
            v, batch, train=True, rngs={'sampling': jax.random.PRNGKey(2)})
        losses, _ = model.loss_metrics_function(pred, batch)
        return losses['total'].mean()
      return loss

    loss_ref, grads_ref = jax.value_and_grad(loss_fn(model_ref))(variables)
    loss_cut, grads_cut = jax.value_and_grad(loss_fn(model_cut))(variables)
    np.testing.assert_allclose(float(loss_cut), float(loss_ref), rtol=1e-6)
    flat_ref = flax.traverse_util.flatten_dict(grads_ref['params'], sep='/')
    flat_cut = flax.traverse_util.flatten_dict(grads_cut['params'], sep='/')
    enc = [k for k in flat_ref if k.startswith('streetview_encoder/')]
    head = [k for k in flat_ref if not k.startswith('streetview_encoder/')]
    assert enc and head
    assert all(float(jnp.abs(flat_cut[k]).max()) == 0.0 for k in enc)
    assert any(float(jnp.abs(flat_ref[k]).max()) > 0 for k in enc)
    for k in head:
      np.testing.assert_array_equal(
          np.asarray(flat_cut[k]), np.asarray(flat_ref[k]), err_msg=k)


class TestEncoderAdoptionFromExport:
  """Round-5 regression (run_occ_head_r5): a localization export's saved
  encoder subtree carries ``pretrained_path: None`` (that run warm-starts
  at the *mapper* level), and StreetViewEncoder.__post_init__'s
  export-wins config merge let that None clobber the live adoption
  pointer — update_pretrained_variables then gathered nothing and the
  occupancy head silently trained on a frozen random encoder. The merge
  must keep adoption-control keys live."""

  def test_merge_keeps_pointer_and_adopts_params(
      self, dataset, batch, tmp_path):
    from ml_collections import config_dict
    from snap_tpu.train_lib import checkpoints
    from snap_tpu.train_lib import trainer
    from snap_tpu.utils import configs as config_utils

    enc_cfg = helpers.tiny_streetview_encoder()
    assert 'pretrained_path' in enc_cfg  # the clobber source must exist
    assert enc_cfg.pretrained_path is None

    # Fake localization export: config (encoder subtree under
    # model.bev_mapper) + a params checkpoint with recognizable values.
    export_cfg = config_dict.ConfigDict(
        {'model': {'bev_mapper': {'streetview_encoder': enc_cfg.to_dict()}}})
    config_utils.config_save(tmp_path, export_cfg)

    occ_cfg = defaults.occupancy_net()
    occ_cfg.streetview_encoder = config_dict.ConfigDict(enc_cfg)
    occ_cfg.num_samples_per_ray = 5
    occ_cfg.occupancy_mlp.layers = (16, 1)
    model = occupancy_net.OccupancyNetModel(
        occ_cfg, dataset.meta_data, jnp.float32)
    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda b: model.flax_model.init(rngs, b, train=False))(batch)

    enc_params = flax.core.unfreeze(
        variables['params'])['streetview_encoder']
    marked = jax.tree_util.tree_map(
        lambda p: np.full_like(np.asarray(p), 0.5), enc_params)
    checkpoints.save_checkpoint(
        tmp_path,
        {'params': {'bev_mapper': {'streetview_encoder': marked}}},
        step=1)

    with occ_cfg.streetview_encoder.unlocked():
      occ_cfg.streetview_encoder.pretrained_path = str(tmp_path)
    model2 = occupancy_net.OccupancyNetModel(
        occ_cfg, dataset.meta_data, jnp.float32)
    flax_model = model2.flax_model
    # The module-level merge must not lose the pointer.
    assert (flax_model.config.streetview_encoder.pretrained_path
            == str(tmp_path))

    updated = trainer.update_pretrained_variables(flax_model, variables)
    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(updated)['params'], sep='/')
    adopted = [k for k in flat if k.startswith('streetview_encoder/')]
    assert adopted
    for k in adopted:
      np.testing.assert_array_equal(
          np.asarray(flat[k]), np.full(flat[k].shape, 0.5), err_msg=k)
