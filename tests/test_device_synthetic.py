"""Tests for on-device (jitted) synthetic scene generation.

Pins the schema contract between the host (numpy) reference generator and
the accelerator-side generator (snap_tpu/data/device_synthetic.py) and the
geometric self-consistency of the rendered world.
"""

import jax
import jax.numpy as jnp
import numpy as np

from snap_tpu.data import device_synthetic
from snap_tpu.data import loader as data_loader
from snap_tpu.data import types


def _small_data_config():
  from snap_tpu.configs import defaults

  config = defaults.streetview_singlescene()
  with config.unlocked():
    config.update(dict(
        locations=dict(training='x-synthetic'),
        mode='pair_scene_view',
        voxel_size=0.8,
        add_images=True,
        add_rasters=True,
        evaluation_size=6,
        num_views=3,
        image_size=(24, 32),
        num_workers=1,
    ))
  return config


def _tree_signature(tree):
  sig = {}
  for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
    key = jax.tree_util.keystr(path)
    sig[key] = (tuple(np.shape(leaf)), str(np.asarray(leaf).dtype))
  return sig


def test_schema_matches_host_generator():
  config = _small_data_config()
  batches = {}
  for on_device in (True, False):
    config.on_device_generation = on_device
    ds = data_loader.get_dataset(
        batch_size=2, eval_batch_size=2, dataset_configs=config,
        mesh=None, shuffle_seed=3, start_step=0)
    batches[on_device] = next(ds.train_iter)
  sig_dev = _tree_signature(batches[True])
  sig_host = _tree_signature(batches[False])
  assert sig_dev == sig_host
  # Host side-channel carries the same keys (string ids formatted by index).
  assert set(batches[True]['_host']) == set(batches[False]['_host'])


def test_deterministic_and_index_dependent():
  spec = device_synthetic.Spec(
      num_views=3, image_hw=(24, 32), voxel_size=0.8, add_rasters=True)
  mode = types.DataMode.PAIR_SCENE_VIEW
  batcher = device_synthetic.DeviceBatcher(spec, mode, seed=11)
  a = batcher(np.asarray([0, 1]), np.ones(2, bool))
  b = batcher(np.asarray([0, 2]), np.ones(2, bool))
  img_a = np.asarray(a['map']['images'])
  img_b = np.asarray(b['map']['images'])
  np.testing.assert_array_equal(img_a[0], img_b[0])  # same index -> identical
  assert np.abs(img_a[1] - img_b[1]).max() > 0.05  # different index
  # Different location seed -> different world.
  other = device_synthetic.DeviceBatcher(spec, mode, seed=12)
  c = other(np.asarray([0]), np.ones(1, bool))
  assert np.abs(np.asarray(c['map']['images'])[0] - img_a[0]).max() > 0.05


def test_query_view_consistent_with_map_texture():
  """The query image's ground pixels must match the map-frame texture."""
  spec = device_synthetic.Spec(
      num_views=2, image_hw=(32, 40), add_rasters=False, num_boxes=0)
  example = jax.jit(
      lambda i: device_synthetic.make_example(
          spec, types.DataMode.PAIR_SCENE_VIEW, 5, i)
  )(jnp.asarray(0))
  key = jax.random.fold_in(jax.random.fold_in(
      jax.random.fold_in(jax.random.PRNGKey(0), 5), 1), 0)
  k_tex, _, _, _ = jax.random.split(key, 4)
  texture = device_synthetic.sample_texture(k_tex, spec)

  image = np.asarray(example['query']['images'][0])  # [H, W, 3]
  t_q2m = example['T_query2map']
  cam_q = example['query']['camera']
  cam_t_q = example['query']['T_view2scene']
  h, w = spec.image_hw

  # Unproject the bottom-center pixel ray to the ground plane (z=0) in the
  # query frame, transform to the map frame, and evaluate the texture there.
  pix = jnp.asarray([[w / 2, h - 0.5]])
  ray_cam = jnp.concatenate([cam_q.normalize(pix[None])[0], jnp.ones((1, 1))],
                            -1)[0]
  r = np.asarray(cam_t_q.R[0])
  t = np.asarray(cam_t_q.t[0])
  ray_q = r @ np.asarray(ray_cam)
  assert ray_q[2] < 0  # bottom pixel looks down
  lam = -t[2] / ray_q[2]
  ground_q = t + lam * ray_q
  ground_map = np.asarray(t_q2m.R) @ ground_q + np.asarray(t_q2m.t)

  dist = np.linalg.norm(ground_q[:2] - t[:2])
  fade = np.exp(-dist / 60.0)
  sky = np.array([0.55, 0.65, 0.8])
  expected = np.asarray(
      device_synthetic.texture_eval(texture, jnp.asarray(ground_map[:2])))
  expected = np.clip(expected * fade + sky * (1 - fade), 0, 1)
  rendered = image[h - 1, w // 2]
  np.testing.assert_allclose(rendered, expected, atol=0.02)


def test_eval_iterator_masks_padding():
  config = _small_data_config()
  config.on_device_generation = True
  config.evaluation_size = 3
  ds = data_loader.get_dataset(
      batch_size=2, eval_batch_size=2, dataset_configs=config,
      mesh=None, shuffle_seed=3, start_step=0)
  b0 = next(ds.valid_iter)
  b1 = next(ds.valid_iter)
  np.testing.assert_array_equal(np.asarray(b0['batch_mask']), [1.0, 1.0])
  np.testing.assert_array_equal(np.asarray(b1['batch_mask']), [1.0, 0.0])


def test_device_generation_with_mesh_shards_batch_mask():
  """On-device generation under a data mesh: every batch leaf including
  batch_mask carries the data sharding (ADVICE r2: an unsharded mask next
  to sharded outputs relied on silent jit auto-resharding)."""
  from snap_tpu.parallel import mesh as mesh_lib

  config = _small_data_config()
  config.on_device_generation = True
  mesh = mesh_lib.make_mesh(None)
  ds = data_loader.get_dataset(
      batch_size=8, eval_batch_size=8, dataset_configs=config,
      mesh=mesh, shuffle_seed=3, start_step=0)
  batch = next(ds.train_iter)
  batch.pop('_host', None)
  mask = batch['batch_mask']
  data_leaves = [batch['overlap'], batch['map']['images'], mask]
  for leaf in data_leaves:
    assert len(leaf.sharding.device_set) == mesh.devices.size, leaf.sharding
  assert mask.sharding.is_equivalent_to(
      batch['overlap'].sharding, mask.ndim)

  # Real overlap (not the old constant 0.5): per-example variation.
  overlap = np.asarray(batch['overlap'])
  assert (overlap >= 0.0).all() and (overlap <= 1.0).all()
  assert np.unique(overlap).size > 1, overlap


def test_pair_scene_view_overlap_matches_host():
  """Device and host PAIR_SCENE_VIEW overlaps follow the same definition
  (fraction of query-frustum cells covered by the map rig)."""
  config = _small_data_config()
  vals = {}
  for on_device in (True, False):
    config.on_device_generation = on_device
    ds = data_loader.get_dataset(
        batch_size=4, eval_batch_size=4, dataset_configs=config,
        mesh=None, shuffle_seed=3, start_step=0)
    vals[on_device] = np.asarray(next(ds.train_iter)['overlap'])
  for overlap in vals.values():
    assert (overlap >= 0.0).all() and (overlap <= 1.0).all()
    assert np.unique(overlap).size > 1, overlap


def test_single_scene_mode_schema_with_lidar():
  config = _small_data_config()
  config.mode = 'single_scene'
  config.add_lidar_rays = True
  config.num_rays = 64
  batches = {}
  for on_device in (True, False):
    config.on_device_generation = on_device
    ds = data_loader.get_dataset(
        batch_size=2, eval_batch_size=2, dataset_configs=config,
        mesh=None, shuffle_seed=3, start_step=0)
    batches[on_device] = next(ds.train_iter)
  assert _tree_signature(batches[True]) == _tree_signature(batches[False])
  rays = batches[True]['lidar_rays']
  points = np.asarray(rays['points'])
  origins = np.asarray(rays['origins'])
  mask = np.asarray(rays['mask'])
  assert mask.any()
  # Hit points lie on the ground plane or on a box (z in [0, max height]).
  assert points[mask][..., 2].min() > -1e-3
  assert (np.linalg.norm((points - origins)[mask], axis=-1) < 40.0).all()


def test_pair_scenes_mode_on_device():
  config = _small_data_config()
  config.mode = 'pair_scenes'
  batches = {}
  for on_device in (True, False):
    config.on_device_generation = on_device
    ds = data_loader.get_dataset(
        batch_size=2, eval_batch_size=2, dataset_configs=config,
        mesh=None, shuffle_seed=3, start_step=0)
    batches[on_device] = next(ds.train_iter)
  assert _tree_signature(batches[True]) == _tree_signature(batches[False])
  b = batches[True]
  overlap = np.asarray(b['overlap'])
  assert (overlap > 0.0).all() and (overlap <= 1.0).all()
  # The two rigs are genuinely different.
  ti = np.asarray(b['scene_i']['T_view2scene'].t)
  tj = np.asarray(b['scene_j']['T_view2scene'].t)
  assert np.abs(ti - tj).max() > 0.5
