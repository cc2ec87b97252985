"""Tests for viz utilities and evaluator helpers."""

import pathlib

import jax.numpy as jnp
import numpy as np
from ml_collections import config_dict

from snap_tpu import evaluator
from snap_tpu.utils import configs as config_utils
from snap_tpu.utils import grids
from snap_tpu.viz import bev as viz_bev
from snap_tpu.viz import image as viz_image


class TestRasterizePointcloud:

  def test_mean_reduce(self):
    grid = grids.Grid2D((4, 4), 1.0)
    xy = np.array([[0.5, 0.5], [0.6, 0.7], [3.5, 3.5]])
    values = np.array([[1.0], [3.0], [10.0]])
    raster, count = viz_bev.rasterize_pointcloud(xy, values, grid)
    assert raster.shape == (4, 4, 1)
    np.testing.assert_allclose(raster[0, 0, 0], 2.0)
    np.testing.assert_allclose(raster[3, 3, 0], 10.0)
    assert count[0, 0] == 2 and count[3, 3] == 1

  def test_out_of_grid_points_dropped(self):
    grid = grids.Grid2D((2, 2), 1.0)
    xy = np.array([[-1.0, 0.0], [5.0, 5.0], [0.5, 0.5]])
    values = np.ones((3, 1))
    _, count = viz_bev.rasterize_pointcloud(xy, values, grid)
    assert count.sum() == 1


class TestFeaturePCA:

  def test_rgb_range_and_shape(self):
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(16, 16, 8))
    rgb = viz_image.features_to_rgb(feats)[0]
    assert rgb.shape == (16, 16, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0

  def test_save_load_roundtrip(self, tmp_path):
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(100, 8))
    pca = viz_image.FeaturePCA().fit(feats)
    path = str(tmp_path / 'pca.pkl')
    pca.save(path)
    pca2 = viz_image.FeaturePCA.load(path)
    np.testing.assert_allclose(pca(feats), pca2(feats))

  def test_shared_color_space(self):
    rng = np.random.default_rng(2)
    a = rng.normal(size=(10, 10, 6))
    b = rng.normal(size=(4, 4, 6))
    rgb_a, rgb_b = viz_image.features_to_rgb(a, b)
    assert rgb_a.shape == (10, 10, 3) and rgb_b.shape == (4, 4, 3)


class TestEvaluatorHelpers:

  def test_compute_recall(self):
    errors = np.array([0.1, 0.5, 1.5, 10.0])
    thresholds, recall = evaluator.compute_recall(errors, max_error=2.0)
    assert len(thresholds) == 100 and len(recall) == 100
    assert recall[0] == 0.0
    # At the top threshold (2.0), 3 of 4 errors are below.
    assert recall[-1] == 75.0

  def test_eval_dump_roundtrip(self, tmp_path):
    results = {'err': np.array([1.0, 2.0]), 'id': np.array(['a', 'b'])}
    config = config_dict.ConfigDict({'x': 1})
    evaluator.write_eval_dump(pathlib.Path(tmp_path), results, config)
    loaded, loaded_config = evaluator.read_eval_dump(pathlib.Path(tmp_path))
    np.testing.assert_allclose(loaded['err'], results['err'])
    assert loaded_config.x == 1

  def test_cities_splits(self):
    assert 'osaka' in evaluator.CITIES_SPLITS['test']
    assert 'seattle' in evaluator.CITIES_SPLITS['test']  # upstream typo fixed


def test_loader_multiworker_order():
  """Batches arrive in deterministic index order with multiple workers."""
  import helpers
  ds = helpers.tiny_dataset(batch_size=1, num_workers=3)
  ids = []
  for _ in range(4):
    b = next(ds.train_iter)
    ids.append(str(b['_host']['map/scene_id'][0]))
  ds2 = helpers.tiny_dataset(batch_size=1, num_workers=1)
  ids2 = [str(next(ds2.train_iter)['_host']['map/scene_id'][0])
          for _ in range(4)]
  assert ids == ids2


def test_pair_scenes_mode():
  """PAIR_SCENES batches carry scene_i/scene_j + typed T_j2i."""
  import helpers
  from snap_tpu.utils import geometry
  ds = helpers.tiny_dataset(batch_size=2, mode='pair_scenes')
  b = next(ds.train_iter)
  assert 'scene_i' in b and 'scene_j' in b
  assert isinstance(b['T_j2i'], geometry.Transform3D)
  assert b['scene_i']['images'].shape[:2] == (2, 3)
  assert b['scene_j']['T_view2scene'].shape == (2, 3)


def test_pair_scenes_independent_rigs_and_overlap():
  """The two rigs differ; overlap reflects frustum-coverage intersection;
  both scenes render the same shared world."""
  import numpy as np
  from snap_tpu.data import synthetic
  from snap_tpu.data import types as data_types

  gen = synthetic.SyntheticSceneGenerator(
      scene_config=data_types.SceneConfig(num_views=6),
      rasters_config=data_types.RastersConfig(resolution=0.5),
      lidar_config=data_types.LidarConfig(num_rays=64),
      image_hw=(24, 32),
      voxel_size=0.5,
      seed=7,
  )
  overlaps = []
  for index in range(4):
    ex = gen.make_example(index, data_types.DataMode.PAIR_SCENES,
                          add_images=False, add_rasters=True)
    ti, tj = ex['scene_i']['T_view2scene'], ex['scene_j']['T_view2scene']
    # Independent rigs: poses differ even after mapping j into i's frame.
    tj_in_i = ex['T_j2i']['t'][:2] + tj['t'][:, :2] @ ex['T_j2i']['R'][:2, :2].T
    assert np.abs(tj_in_i - ti['t'][:, :2]).max() > 1.0
    overlaps.append(float(ex['overlap']))

    # Shared world: scene_j's raster, resampled at cell centers mapped into
    # scene_i's frame, matches scene_i's raster (both sample one texture).
    res = 0.5
    rgb_i, rgb_j = ex['scene_i']['rasters']['rgb'], ex['scene_j']['rasters']['rgb']
    nx, ny = rgb_j.shape[:2]
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing='ij')
    xy_j = (np.stack([ii, jj], -1) + 0.5) * res
    xy_i = xy_j @ ex['T_j2i']['R'][:2, :2].T + ex['T_j2i']['t'][:2]
    idx = np.round(xy_i / res - 0.5).astype(int)
    valid = ((idx >= 0) & (idx < [nx, ny])).all(-1)
    # Exclude box footprints (occupancy overrides texture with box colors,
    # whose nearest-cell aliasing is binary) and compare texture cells only.
    diff = np.abs(rgb_i[idx[..., 0].clip(0, nx - 1),
                        idx[..., 1].clip(0, ny - 1)] - rgb_j)
    med = np.median(diff[valid])
    assert med < 0.15, med

  # Overlap varies per example and is not the old hardcoded 0.5.
  assert len(set(np.round(overlaps, 4))) > 1
  assert all(0.0 < o < 1.0 for o in overlaps)
  # The retry loop targets the PairingConfig window for most pairs.
  in_window = [0.3 <= o <= 0.7 for o in overlaps]
  assert sum(in_window) >= len(overlaps) // 2, overlaps


def test_eval_on_dataset_sharded_matches_single_device():
  """Data-axis-sharded eval produces the same per-example metrics."""
  import jax
  import helpers
  from snap_tpu.data import loader as data_loader
  from snap_tpu.models import bev_localizer
  from snap_tpu.parallel import mesh as mesh_lib
  from snap_tpu.train_lib import trainer as trainer_lib

  batch = 8
  dataset = helpers.tiny_dataset(batch_size=batch, evaluation_size=11)
  model = bev_localizer.BEVLocalizerModel(
      helpers.tiny_localizer(), dataset.meta_data, jnp.float32)
  params, model_state, _ = trainer_lib.initialize_model(
      model_def=model.flax_model,
      dummy_input=dataset.meta_data['get_dummy_batch_fn'](),
      rng=jax.random.PRNGKey(0))

  results = {}
  for mesh in (None, mesh_lib.make_mesh({'data': -1, 'model': 1})):
    dataset = helpers.tiny_dataset(
        batch_size=batch, mesh=mesh, evaluation_size=11)
    results[mesh is None] = evaluator.eval_on_dataset(
        model, params, model_state, dataset, jax.random.PRNGKey(1), batch,
        mesh=mesh)
  single, sharded = results[True], results[False]
  assert set(single) == set(sharded)
  assert len(single['error_max_meter']) == 11
  np.testing.assert_allclose(
      single['error_max_meter'], sharded['error_max_meter'],
      rtol=1e-4, atol=1e-4)


class TestDumpCacheProtocolGuard:
  """run_for_location never clobbers a cached dump with a different-protocol
  rerun: mismatches divert to a protocol-qualified path (ADVICE r3)."""

  def _setup_workdir(self, tmp_path):
    workdir = pathlib.Path(tmp_path) / 'exp'
    workdir.mkdir()
    config_utils.config_save(workdir, config_dict.ConfigDict(
        {'model_name': 'bev_localizer'}))
    full_dir = workdir / 'evaluation' / 'loc'
    evaluator.write_eval_dump(
        full_dir,
        {'error_max_meter': np.arange(8.0)},
        config_dict.ConfigDict({'eval_checkpoint_step': 100}))
    return workdir, full_dir

  def _eval_config(self, workdir, size, step):
    loader = config_dict.ConfigDict({'evaluation_size': size})
    return config_dict.ConfigDict(dict(
        workdir=str(workdir), checkpoint_step=step, tag='',
        overwrite=False, batch_size=4, rng_seed=0,
        data=config_dict.ConfigDict(dict(rng_seed=0, loader=loader)),
    ))

  def _patch_compute(self, monkeypatch, n_examples, counter):
    def fake_get(eval_config, config, workdir, location):
      cfg = config_dict.ConfigDict({'eval_checkpoint_step':
                                    eval_config.checkpoint_step})
      return None, None, None, None, cfg, None

    def fake_eval(model, params, model_state, dataset, rng, batch, mesh=None):
      counter.append(1)
      return {'error_max_meter': np.full(n_examples, 7.0)}

    monkeypatch.setattr(evaluator, 'get_model_and_dataset', fake_get)
    monkeypatch.setattr(evaluator, 'eval_on_dataset', fake_eval)

  def test_matching_protocol_hits_cache(self, tmp_path, monkeypatch):
    workdir, _ = self._setup_workdir(tmp_path)
    calls = []
    self._patch_compute(monkeypatch, 8, calls)
    results, _ = evaluator.run_for_location(
        'loc', self._eval_config(workdir, 8, 100))
    assert not calls  # cache hit, no recompute
    assert len(results['error_max_meter']) == 8

  def test_mismatch_diverts_and_preserves_original(
      self, tmp_path, monkeypatch):
    workdir, full_dir = self._setup_workdir(tmp_path)
    calls = []
    self._patch_compute(monkeypatch, 4, calls)
    results, _ = evaluator.run_for_location(
        'loc', self._eval_config(workdir, 4, 100))
    assert calls  # recomputed under the quick protocol
    assert len(results['error_max_meter']) == 4
    # The expensive full-protocol dump is untouched.
    kept, _ = evaluator.read_eval_dump(full_dir)
    assert len(kept['error_max_meter']) == 8
    # ... and the quick dump landed at a protocol-qualified path.
    qualified = workdir / 'evaluation' / 'loc-n4-s100'
    assert (qualified / 'results.npz').exists()
    # A rerun of the same quick protocol reuses the qualified dump.
    calls.clear()
    results, _ = evaluator.run_for_location(
        'loc', self._eval_config(workdir, 4, 100))
    assert not calls
    assert len(results['error_max_meter']) == 4

  def test_unstamped_dump_fails_explicit_step_request(
      self, tmp_path, monkeypatch):
    workdir, full_dir = self._setup_workdir(tmp_path)
    # Strip the recorded step: an unstamped dump cannot satisfy an
    # explicit checkpoint_step request.
    evaluator.write_eval_dump(
        full_dir, {'error_max_meter': np.arange(8.0)},
        config_dict.ConfigDict({}))
    calls = []
    self._patch_compute(monkeypatch, 8, calls)
    evaluator.run_for_location('loc', self._eval_config(workdir, 8, 100))
    assert calls  # recomputed, not silently served stale
