"""Unit tests for snap_tpu.utils.grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snap_tpu.utils import grids


class TestGridND:

  def test_from_extent_meters(self):
    g = grids.Grid3D.from_extent_meters((24, 32, 12), 0.2)
    assert g.extent == (120, 160, 60)
    assert g.num_cells == 120 * 160 * 60
    np.testing.assert_allclose(g.extent_meters, [24.0, 32.0, 12.0])

  def test_from_extent_meters_indivisible(self):
    with pytest.raises(ValueError):
      grids.Grid2D.from_extent_meters((24, 32.1), 0.2)

  def test_xyz_index_roundtrip(self):
    g = grids.Grid2D((10, 12), 0.5)
    idx = jnp.array([[0, 0], [9, 11], [3, 4]])
    xyz = g.index_to_xyz(idx)
    np.testing.assert_array_equal(g.xyz_to_index(xyz), idx)

  def test_id_index_roundtrip(self):
    g = grids.Grid3D((4, 5, 6), 1.0)
    idx = g.grid_index().reshape(-1, 3)
    ids = g.index_to_id(idx)
    np.testing.assert_array_equal(ids, np.arange(g.num_cells))
    np.testing.assert_array_equal(g.id_to_index(ids), idx)

  def test_in_grid(self):
    g = grids.Grid2D((4, 4), 1.0)
    assert bool(g.xyz_in_grid(jnp.array([0.5, 3.9])))
    assert not bool(g.xyz_in_grid(jnp.array([4.0, 1.0])))
    assert bool(g.index_in_grid(jnp.array([3, 3])))
    assert not bool(g.index_in_grid(jnp.array([-1, 0])))

  def test_bev(self):
    g = grids.Grid3D((4, 5, 6), 0.5)
    assert g.bev().extent == (4, 5)

  def test_hashable_static(self):
    g1 = grids.Grid2D((4, 4), 1.0)
    g2 = grids.Grid2D((4, 4), 1.0)
    assert hash(g1) == hash(g2) and g1 == g2


def reference_interpolate(array, points, valid_array=None):
  """Reference formulation via map_coordinates (matches upstream SNAP)."""
  pts = np.moveaxis(np.asarray(points) - 0.5, -1, 0)
  values = np.stack([
      jax.scipy.ndimage.map_coordinates(array[..., d], list(pts), 1, 'nearest')
      for d in range(array.shape[-1])
  ], -1)
  size = np.asarray(array.shape[:-1])
  valid = np.all((points >= 0) & (points < size), -1)
  if valid_array is not None:
    nan_mask = np.where(valid_array, 0.0, np.nan)
    poisoned = jax.scipy.ndimage.map_coordinates(nan_mask, list(pts), 1,
                                                 'nearest')
    valid &= ~np.isnan(np.asarray(poisoned))
  return values, valid


class TestInterpolateND:

  def test_2d_matches_reference(self):
    rng = np.random.default_rng(0)
    array = rng.normal(size=(8, 9, 3)).astype(np.float32)
    points = rng.uniform(-1, 10, size=(50, 2)).astype(np.float32)
    got_v, got_valid = grids.interpolate_nd(jnp.asarray(array),
                                            jnp.asarray(points))
    exp_v, exp_valid = reference_interpolate(array, points)
    np.testing.assert_allclose(got_v, exp_v, atol=1e-5)
    np.testing.assert_array_equal(got_valid, exp_valid)

  def test_3d_matches_reference(self):
    rng = np.random.default_rng(1)
    array = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    points = rng.uniform(0, 7, size=(40, 3)).astype(np.float32)
    got_v, got_valid = grids.interpolate_nd(jnp.asarray(array),
                                            jnp.asarray(points))
    exp_v, exp_valid = reference_interpolate(array, points)
    np.testing.assert_allclose(got_v, exp_v, atol=1e-5)
    np.testing.assert_array_equal(got_valid, exp_valid)

  def test_validity_propagation(self):
    rng = np.random.default_rng(2)
    array = rng.normal(size=(6, 6, 1)).astype(np.float32)
    valid_array = rng.uniform(size=(6, 6)) > 0.4
    points = rng.uniform(0, 6, size=(64, 2)).astype(np.float32)
    got_v, got_valid = grids.interpolate_nd(
        jnp.asarray(array), jnp.asarray(points), jnp.asarray(valid_array))
    exp_v, exp_valid = reference_interpolate(array, points, valid_array)
    np.testing.assert_allclose(got_v, exp_v, atol=1e-5)
    np.testing.assert_array_equal(got_valid, exp_valid)

  def test_exact_cell_centers(self):
    array = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    # Cell centers are at half-integer coordinates.
    points = jnp.array([[0.5, 0.5], [2.5, 3.5], [1.5, 2.5]])
    values, valid = grids.interpolate_nd(array, points)
    np.testing.assert_allclose(values.squeeze(-1), [0.0, 11.0, 6.0])
    assert bool(valid.all())

  def test_nearest_order0(self):
    array = jnp.arange(4, dtype=jnp.float32).reshape(2, 2, 1)
    points = jnp.array([[0.4, 0.4], [1.6, 1.6]])
    values, valid = grids.interpolate_nd(array, points, order=0)
    np.testing.assert_allclose(values.squeeze(-1), [0.0, 3.0])
    assert bool(valid.all())

  def test_1d(self):
    array = jnp.arange(5, dtype=jnp.float32)[:, None]
    points = jnp.array([[1.0], [2.5]])
    values, _ = grids.interpolate_nd(array, points)
    np.testing.assert_allclose(values.squeeze(-1), [0.5, 2.0])


def test_argmax_nd():
  g = grids.Grid2D((3, 4), 1.0)
  scores = jnp.zeros((3, 4)).at[1, 2].set(5.0)
  np.testing.assert_array_equal(grids.argmax_nd(scores, g), [1, 2])


def test_argmax_nd_batched():
  g = grids.Grid2D((3, 4), 1.0)
  scores = jnp.zeros((2, 3, 4)).at[0, 1, 2].set(5.0).at[1, 2, 0].set(3.0)
  np.testing.assert_array_equal(
      grids.argmax_nd(scores, g), [[1, 2], [2, 0]])


def test_expectation_nd():
  g = grids.Grid2D((3, 3), 1.0)
  pdf = jnp.zeros((3, 3)).at[1, 2].set(1.0)
  np.testing.assert_allclose(grids.expectation_nd(pdf, g), [1.0, 2.0])
