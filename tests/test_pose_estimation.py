"""Parity and correctness tests for pose estimation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snap_tpu.models import pose_estimation
from snap_tpu.utils import geometry
from snap_tpu.utils import grids


def svd_kabsch_reference(i_p, j_p):
  """SVD-based 2D Kabsch (the upstream formulation) for parity checks."""
  mu_i, mu_j = i_p.mean(0), j_p.mean(0)
  i_c, j_c = i_p - mu_i, j_p - mu_j
  cov = np.einsum('ji,jk->ik', i_c, j_c)
  u, s, vh = np.linalg.svd(cov)
  sign = np.sign(np.linalg.det(u @ vh))
  u = u * np.array([1, sign])
  r = u @ vh
  t = mu_i - r @ mu_j
  return r, t


class TestKabsch2D:

  def test_matches_svd_reference(self):
    rng = np.random.default_rng(0)
    for _ in range(20):
      i_p = rng.normal(size=(2, 2)) * 5
      j_p = rng.normal(size=(2, 2)) * 5
      tfm, _ = pose_estimation.kabsch_2d(
          jnp.asarray(i_p), jnp.asarray(j_p))
      r_ref, t_ref = svd_kabsch_reference(i_p, j_p)
      np.testing.assert_allclose(tfm.R, r_ref, atol=1e-4)
      np.testing.assert_allclose(tfm.t, t_ref, atol=1e-4)

  def test_recovers_exact_transform(self):
    rng = np.random.default_rng(1)
    gt = geometry.Transform2D.from_radians(0.7, jnp.array([2.0, -1.0]))
    j_p = jnp.asarray(rng.normal(size=(2, 2)) * 3)
    i_p = gt @ j_p
    tfm, rssd = pose_estimation.kabsch_2d(i_p, j_p)
    np.testing.assert_allclose(tfm.angle, 0.7, atol=1e-5)
    np.testing.assert_allclose(tfm.t, [2.0, -1.0], atol=1e-4)
    assert float(rssd) < 1e-2  # f32 cancellation noise in the residual

  def test_batched(self):
    rng = np.random.default_rng(2)
    i_p = jnp.asarray(rng.normal(size=(4, 3, 2, 2)))
    j_p = jnp.asarray(rng.normal(size=(4, 3, 2, 2)))
    tfm, rssd = pose_estimation.kabsch_2d(i_p, j_p)
    assert tfm.shape == (4, 3)
    assert rssd.shape == (4, 3)


def naive_pose_scoring(j_t_i, scores_all, i_xy, valid_points, valid_j, grid,
                       mask_oob):
  """Upstream formulation: per-pose loop, per-point map_coordinates read."""
  out = []
  for p in range(j_t_i.shape[0]):
    tfm = geometry.Transform2D.from_radians(
        j_t_i.angle[p], j_t_i.t[p])
    j_uv = np.asarray(tfm @ jnp.asarray(i_xy)) / grid.cell_size
    total = 0.0
    for n in range(i_xy.shape[0]):
      val, valid_interp = grids.interpolate_nd(
          jnp.asarray(scores_all[n][..., None]),
          jnp.asarray(j_uv[n][None]),
          jnp.asarray(valid_j))
      v = bool(valid_points[n])
      if mask_oob:
        v = v and bool(valid_interp[0])
      total += float(val[0, 0]) * v
    out.append(total)
  return np.array(out)


class TestPoseScoring:

  @pytest.mark.parametrize('mask_oob', [False, True])
  def test_matches_naive(self, mask_oob):
    rng = np.random.default_rng(3)
    grid = grids.Grid2D((6, 8), 0.5)
    n, p = 5, 7
    scores_all = rng.normal(size=(n, 6, 8)).astype(np.float32)
    i_xy = rng.uniform(0, 3, size=(n, 2)).astype(np.float32)
    valid_points = rng.uniform(size=n) > 0.3
    valid_j = rng.uniform(size=(6, 8)) > 0.2
    poses = geometry.Transform2D.from_radians(
        jnp.asarray(rng.uniform(-3, 3, p).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 3, (p, 2)).astype(np.float32)))

    got = pose_estimation.pose_scoring_many(
        poses, jnp.asarray(scores_all), jnp.asarray(i_xy),
        jnp.asarray(valid_points), jnp.asarray(valid_j), grid, mask_oob)
    expected = naive_pose_scoring(
        poses, scores_all, i_xy, valid_points, valid_j, grid, mask_oob)
    np.testing.assert_allclose(got, expected, atol=1e-4)

  def test_batched_shape(self):
    rng = np.random.default_rng(4)
    grid = grids.Grid2D((6, 8), 0.5)
    b, n, p = 2, 4, 3
    poses = geometry.Transform2D.from_radians(
        jnp.zeros((b, p)), jnp.zeros((b, p, 2)))
    scores = jnp.asarray(rng.normal(size=(b, n, 6, 8)).astype(np.float32))
    i_xy = jnp.asarray(rng.uniform(0, 3, (b, n, 2)).astype(np.float32))
    out = pose_estimation.pose_scoring_many_batched(
        poses, scores, i_xy, jnp.ones((b, n), bool), jnp.ones((b, 6, 8), bool),
        grid, False)
    assert out.shape == (b, p)


class TestRansacSampling:

  def test_recovers_planted_pose(self):
    """A sharply peaked PDF at ground-truth correspondences must yield
    samples close to the true pose."""
    grid = grids.Grid2D((20, 20), 0.5)
    gt = geometry.Transform2D.from_radians(
        jnp.asarray(0.4), jnp.asarray([2.0, 1.5]))
    n = 6
    rng = np.random.default_rng(5)
    i_xy = jnp.asarray(rng.uniform(1, 6, size=(n, 2)).astype(np.float32))
    j_xy = gt @ i_xy
    # Build a PDF that puts all mass on the true corresponding cells.
    prob = np.zeros((n, 20, 20), np.float32)
    idx = np.floor(np.asarray(j_xy) / grid.cell_size).astype(int)
    for k in range(n):
      prob[k, idx[k, 0], idx[k, 1]] = 1.0
    prob /= prob.sum()

    poses = pose_estimation.sample_transforms_ransac(
        jax.random.split(jax.random.PRNGKey(0), 1),
        jnp.asarray(prob)[None],
        i_xy[None],
        num_poses=16,
        num_retries=4,
        grid=grid,
    )
    err_t = np.linalg.norm(np.asarray(poses.t) - np.asarray(gt.t), axis=-1)
    err_r = np.abs(np.asarray(poses.angle) - 0.4)
    # Cell quantization (0.5 m) bounds the attainable accuracy.
    assert np.median(err_t) < 1.0
    assert np.median(err_r) < 0.5


class TestGridRefinement:

  def test_improves_score(self):
    rng = np.random.default_rng(6)
    grid = grids.Grid2D((12, 12), 0.5)
    n = 4
    scores_all = jnp.asarray(rng.normal(size=(1, n, 12, 12)).astype(np.float32))
    i_xy = jnp.asarray(rng.uniform(0, 4, size=(1, n, 2)).astype(np.float32))
    valid_p = jnp.ones((1, n), bool)
    valid_j = jnp.ones((1, 12, 12), bool)
    init = geometry.Transform2D.from_radians(
        jnp.zeros(1), jnp.ones((1, 2)))

    refined, score_vol = pose_estimation.grid_refinement_batched(
        init, scores_all, i_xy, valid_p, valid_j, grid, False)
    init_score = pose_estimation.pose_scoring_many(
        init[:, None], scores_all, i_xy, valid_p, valid_j, grid, False)
    best_score = pose_estimation.pose_scoring_many(
        refined[:, None], scores_all, i_xy, valid_p, valid_j, grid, False)
    assert score_vol.shape[1:] == (41, 41, 41)
    assert float(best_score[0, 0]) >= float(init_score[0, 0]) - 1e-5
