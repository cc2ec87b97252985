"""Pose-hypothesis machinery: sampling, scoring, refinement.

Reference behavior: snap/models/pose_estimation.py. TPU-first changes:

- the 2-point 2D Kabsch fit is closed-form (``atan2`` of summed cross/dot
  products) instead of a batched 2x2 SVD — tens of thousands of tiny SVDs
  serialize terribly on TPU, while the closed form is pure VPU math;
- pose scoring is broadcast-native over (batch, poses, points) with explicit
  4-tap corner gathers, the layout a Pallas kernel can tile directly;
- everything is batched with leading axes instead of nested Python vmaps.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from snap_tpu.utils import geometry
from snap_tpu.utils import grids

Array = jax.Array


def sample_sparse_query_points(
    features: Array,
    valid: Array,
    rng: Array,
    grid: grids.Grid2D,
    num_points: int,
) -> Tuple[Array, Array, Array, Array]:
  """Sample ``num_points`` distinct cells from a 2D feature map."""
  uv_all = grid.grid_index().reshape(-1, 2)
  assert num_points <= uv_all.shape[0]
  indices = jax.random.choice(
      rng, uv_all.shape[0], (num_points,), replace=False)
  uv = uv_all[indices]
  xy = (uv + 0.5) * grid.cell_size
  features_q = features[uv[:, 0], uv[:, 1]]
  valid_q = valid[uv[:, 0], uv[:, 1]]
  return features_q, valid_q, xy, uv


def pose_scoring_many(
    j_t_i: geometry.Transform2D,
    scores_points_all: Array,
    i_xy_points: Array,
    valid_points: Array,
    valid_j: Array,
    grid: grids.Grid2D,
    mask_out_of_bounds: bool,
    pose_chunk: int = 4096,
) -> Array:
  """Score many poses, tiling the pose axis to bound the [P, N] working set.

  At eval budgets (20k+ poses x thousands of points) the per-(pose, point)
  gather intermediates would otherwise dominate HBM; chunking keeps the
  working set to ``pose_chunk x N`` while XLA pipelines the chunks.
  """
  p = j_t_i.shape[-1]
  if p <= pose_chunk:
    return _pose_scoring_block(
        j_t_i, scores_points_all, i_xy_points, valid_points, valid_j, grid,
        mask_out_of_bounds)
  pad = (-p) % pose_chunk
  pose_axis = j_t_i.angle.ndim - 1
  angle = j_t_i.angle
  t = j_t_i.t
  if pad:
    angle = jnp.concatenate(
        [angle, jnp.zeros((*angle.shape[:-1], pad), angle.dtype)], -1)
    t = jnp.concatenate(
        [t, jnp.zeros((*t.shape[:-2], pad, 2), t.dtype)], -2)
  num_chunks = (p + pad) // pose_chunk

  def chunk_fn(start):
    block = geometry.Transform2D(
        angle=jax.lax.dynamic_slice_in_dim(angle, start, pose_chunk,
                                           axis=pose_axis),
        t=jax.lax.dynamic_slice_in_dim(t, start, pose_chunk, axis=pose_axis),
    )
    return _pose_scoring_block(
        block, scores_points_all, i_xy_points, valid_points, valid_j, grid,
        mask_out_of_bounds)

  starts = jnp.arange(num_chunks) * pose_chunk
  scores = jax.lax.map(chunk_fn, starts)  # [C, ..., chunk]
  scores = jnp.moveaxis(scores, 0, -2).reshape(*scores.shape[1:-1], -1)
  return scores[..., :p]


def _pose_scoring_block(
    j_t_i: geometry.Transform2D,
    scores_points_all: Array,
    i_xy_points: Array,
    valid_points: Array,
    valid_j: Array,
    grid: grids.Grid2D,
    mask_out_of_bounds: bool,
) -> Array:
  """Score a block of poses by summing per-point score-map reads.

  Args:
    j_t_i: candidate poses, batch shape ``[..., P]``.
    scores_points_all: ``[..., N, H, W]`` per-query-point score maps.
    i_xy_points: ``[..., N, 2]`` query points in frame i (meters).
    valid_points: ``[..., N]`` query-point validity.
    valid_j: ``[..., H, W]`` map validity.
    grid: the map grid (static).
    mask_out_of_bounds: also require the transformed point to land on a valid
      map cell.

  Returns:
    ``[..., P]`` pose scores.

  For each pose p and point n, bilinearly reads ``scores[n]`` at
  ``(j_t_i[p] @ i_xy[n]) / cell_size`` with border clamping, zeroing reads
  outside the map, and sums over n (reference:
  snap/models/pose_estimation.py:49-82).
  """
  h, w = grid.extent
  batch = scores_points_all.shape[:-3]
  n = scores_points_all.shape[-3]
  p = j_t_i.shape[-1]

  # Transformed query points for every pose: [..., P, N, 2] in cell units.
  j_uv = j_t_i.transform(i_xy_points[..., None, :, :]) / grid.cell_size

  size = jnp.asarray([h, w], j_uv.dtype)
  in_bounds = jnp.all((j_uv >= 0) & (j_uv < size), -1)  # [..., P, N]
  pts = jnp.clip(j_uv - 0.5, 0, size - 1)
  lower = jnp.floor(pts).astype(jnp.int32)
  upper = jnp.minimum(lower + 1, jnp.asarray([h - 1, w - 1]))
  frac = pts - lower

  flat = scores_points_all.reshape(*batch, n * h * w)
  point_ids = jnp.arange(n) * (h * w)  # [N]

  def read(ci, cj):
    flat_idx = point_ids + ci * w + cj  # [..., P, N]
    idx = flat_idx.reshape(*batch, p * n)
    vals = jnp.take_along_axis(flat, idx, axis=-1)
    return vals.reshape(*batch, p, n)

  w_i = (1 - frac[..., 0], frac[..., 0])
  w_j = (1 - frac[..., 1], frac[..., 1])
  coords_i = (lower[..., 0], upper[..., 0])
  coords_j = (lower[..., 1], upper[..., 1])
  scores = None
  corners_valid = in_bounds
  if mask_out_of_bounds:
    flat_valid = valid_j.reshape(*batch, h * w)
  for a in range(2):
    for b in range(2):
      contrib = w_i[a] * w_j[b] * read(coords_i[a], coords_j[b])
      scores = contrib if scores is None else scores + contrib
      if mask_out_of_bounds:
        flat_idx = (coords_i[a] * w + coords_j[b]).reshape(*batch, p * n)
        cv = jnp.take_along_axis(flat_valid, flat_idx, axis=-1)
        corners_valid &= cv.reshape(*batch, p, n)

  valid = valid_points[..., None, :]
  if mask_out_of_bounds:
    valid = valid & corners_valid
  else:
    valid = jnp.broadcast_to(valid, scores.shape)
  # Out-of-bounds reads are clamped to the border; match the reference's
  # 'nearest' semantics by keeping them (only masked when requested).
  return jnp.sum(valid * scores, axis=-1)


def pose_scoring_many_batched(
    j_t_i: geometry.Transform2D,
    scores_points_all: Array,
    i_xy_points: Array,
    valid_points: Array,
    valid_j: Array,
    grid: grids.Grid2D,
    mask_out_of_bounds: bool,
) -> Array:
  """Alias: the broadcast-native implementation is already batched."""
  return pose_scoring_many(
      j_t_i, scores_points_all, i_xy_points, valid_points, valid_j, grid,
      mask_out_of_bounds)


def sample_transforms_random(
    rng: Array, num: int, grid: grids.Grid2D
) -> geometry.Transform2D:
  """Uniform random poses: any yaw, translation within 2/3 grid extents.

  The rotation acts about the grid *center*; re-expressed in the
  corner-origin map frame a center-rotation (theta, t) maps a point x to
  ``R(x - c) + c + t``, i.e. corner-frame translation ``c + t - R c``.
  """
  draws = jax.random.uniform(rng, (num, 3))
  yaw = draws[:, 0] * (2 * jnp.pi)
  half_extent = jnp.asarray(grid.extent_meters) / 2
  t_about_center = (draws[:, 1:] * 2 - 1) * (half_extent * 4 / 3)
  spin = geometry.Transform2D.from_radians(yaw, jnp.zeros_like(t_about_center))
  t_corner = half_extent + t_about_center - spin.transform(half_extent)
  return geometry.Transform2D.from_radians(yaw, t_corner)


def kabsch_2d(
    i_p: Array, j_p: Array
) -> Tuple[geometry.Transform2D, Array]:
  """Closed-form least-squares 2D rigid fit ``i_t_j`` between point sets.

  Solves ``argmin_R,t sum_n |i_p[n] - (R j_p[n] + t)|^2`` for a proper
  rotation. Batched over leading axes; the point axis is -2.

  The optimal angle maximizes ``a cos(theta) + b sin(theta)`` where
  ``a = sum <i', j'>`` and ``b = sum cross(j', i')`` of the centered sets,
  giving ``theta = atan2(b, a)`` — equivalent to the 2x2 SVD solution with a
  positive determinant (reference uses SVD: snap/models/pose_estimation.py:
  100-123) but pure elementwise math on TPU.
  """
  mu_i = i_p.mean(-2)
  mu_j = j_p.mean(-2)
  i_c = i_p - mu_i[..., None, :]
  j_c = j_p - mu_j[..., None, :]
  a = jnp.sum(i_c * j_c, axis=(-1, -2))
  b = jnp.sum(
      j_c[..., 0] * i_c[..., 1] - j_c[..., 1] * i_c[..., 0], axis=-1)
  angle = jnp.arctan2(b, a)
  cos, sin = jnp.cos(angle), jnp.sin(angle)
  r_mu_j = jnp.stack([
      cos * mu_j[..., 0] - sin * mu_j[..., 1],
      sin * mu_j[..., 0] + cos * mu_j[..., 1],
  ], -1)
  t = mu_i - r_mu_j
  # Residual (RSSD) for degeneracy checks: |i|^2 + |j|^2 - 2 sqrt(a^2 + b^2).
  norm2 = jnp.sum(i_c**2 + j_c**2, axis=(-1, -2))
  rssd = jnp.sqrt((norm2 - 2 * jnp.hypot(a, b)).clip(min=0))
  return geometry.Transform2D.from_radians(angle, t), rssd


def sample_transforms_ransac(
    rng: Array,
    prob_points: Array,
    i_xy_p: Array,
    num_poses: int,
    num_retries: int,
    grid: grids.Grid2D,
) -> geometry.Transform2D:
  """Sample poses from 2-point correspondences drawn from a match PDF.

  Args:
    rng: per-example key, batch shape ``[B]`` (stacked keys) or scalar key.
    prob_points: ``[B, N, H, W]`` correspondence PDF.
    i_xy_p: ``[B, N, 2]`` query-point coordinates (meters).
    num_poses: P poses to return.
    num_retries: minimal sets sampled per pose; the set whose point-distance
      ratio is closest to 1 (most rigid-consistent) wins.
    grid: map grid.

  Returns:
    ``j_t_i`` poses with batch shape ``[B, P]``.
  """
  batch, n, h, w = prob_points.shape
  shape = (n, h, w)
  num_matches = math.prod(shape)
  num_obs = 2

  def sample_one(key, probs):
    return jax.random.choice(
        key,
        num_matches,
        shape=(num_poses * num_retries * num_obs,),
        replace=True,
        p=probs,
    )

  flat = prob_points.reshape(batch, -1)
  if rng.ndim == 1:
    rng = jax.random.split(rng, batch)
  indices = jax.vmap(sample_one)(rng, flat)  # [B, P*R*2]
  indices = jnp.stack(jnp.unravel_index(indices, shape), -1)  # [B, PR2, 3]

  pool_shape = (batch, num_poses, num_retries, num_obs, 2)
  i_xy_pool = jnp.take_along_axis(
      i_xy_p, indices[..., :1], axis=1).reshape(pool_shape)
  j_xy_pool = grid.index_to_xyz(indices[..., 1:]).reshape(pool_shape)

  if num_retries > 1:
    # A rigid fit preserves distances, so keep, per pose, the retry whose
    # two points are most nearly the same distance apart in both frames:
    # minimize |log |i1-i0| - log |j1-j0||  (== log of the max length ratio).
    def segment_log_length(pts):  # [..., R, 2(obs), 2(xy)] -> [..., R]
      return jnp.log(
          jnp.linalg.norm(pts[..., 1, :] - pts[..., 0, :], axis=-1)
          .clip(min=1e-5))

    stretch = jnp.abs(
        segment_log_length(i_xy_pool) - segment_log_length(j_xy_pool))
    select = jnp.argmin(stretch, axis=-1)[..., None, None, None]  # [B,P,1,1,1]
    i_xy_pool = jnp.take_along_axis(i_xy_pool, select, axis=2).squeeze(2)
    j_xy_pool = jnp.take_along_axis(j_xy_pool, select, axis=2).squeeze(2)
  else:
    i_xy_pool = i_xy_pool.squeeze(2)
    j_xy_pool = j_xy_pool.squeeze(2)

  j_t_i, _ = kabsch_2d(j_xy_pool, i_xy_pool)
  return j_t_i


sample_transforms_ransac_batched = sample_transforms_ransac


def make_refinement_offsets(
    delta_p: float = 0.2,
    delta_r: float = 0.25,
    range_p: float = 4.0,
    range_r: float = 5.0,
) -> Tuple[geometry.Transform2D, Tuple[int, int, int]]:
  """Dense (rotation, x, y) offsets around a pose for grid refinement.

  Default budget matches snap/models/pose_estimation.py:178-184:
  +-5 deg at 0.25 deg x (+-4 m at 0.2 m)^2 = 41x41x41 offsets.
  """
  def axis(extent, step):
    count = round(2 * extent / step) + 1
    return jnp.linspace(-extent, extent, count)

  rot, dx, dy = jnp.meshgrid(
      axis(range_r, delta_r), axis(range_p, delta_p), axis(range_p, delta_p),
      indexing='ij')
  i_t_i_offset = geometry.Transform2D.from_radians(
      angle=jnp.deg2rad(rot.ravel()),
      t=jnp.stack([dx.ravel(), dy.ravel()], axis=-1),
  )
  return i_t_i_offset, rot.shape


def grid_refinement(
    j_t_i_init: geometry.Transform2D,
    scores_points_all: Array,
    i_xy_points: Array,
    valid_points: Array,
    valid_j: Array,
    grid: grids.Grid2D,
    mask_out_of_bounds: bool,
) -> Tuple[geometry.Transform2D, Array]:
  """Exhaustively rescore a dense offset grid around initial poses.

  ``j_t_i_init`` has batch shape ``[B]``; returns refined poses ``[B]`` and
  the ``[B, R, X, Y]`` score volume (reference offsets: ±5° @0.25°,
  ±4 m @0.2 m; snap/models/pose_estimation.py:168-205).
  """
  i_t_i_offset, exhaustive_shape = make_refinement_offsets()
  j_t_i_samples = j_t_i_init[..., None] @ i_t_i_offset

  scores = pose_scoring_many(
      j_t_i_samples,
      scores_points_all,
      i_xy_points,
      valid_points,
      valid_j,
      grid,
      mask_out_of_bounds,
  )
  idx_best = jnp.argmax(scores, axis=-1)
  j_t_i_refined = jax.tree_util.tree_map(
      lambda x: jnp.take_along_axis(
          x, idx_best.reshape(idx_best.shape + (1,) * (x.ndim - idx_best.ndim)),
          axis=idx_best.ndim,
      ).squeeze(idx_best.ndim),
      j_t_i_samples,
  )
  scores = scores.reshape(*scores.shape[:-1], *exhaustive_shape)
  return j_t_i_refined, scores


grid_refinement_batched = grid_refinement
