"""Dense 3-DoF pose voting: exhaustive translation x rotation matching.

The reference ships this as unreferenced dead code built on per-template
``jax.scipy.signal.convolve`` (snap/models/pose_exhaustive_voting.py); here
it is a live, selectable pose backend re-designed for the MXU:

- the query BEV is warped into R rotated templates (bilinear, one gather);
- all R templates are correlated against the map in a single
  ``lax.conv_general_dilated`` call with R output channels — one large
  matmul-shaped op on the MXU instead of R FFT convolutions;
- query and map grids may differ (the reference implicitly required square,
  equal grids for its rot90 trick).

Scores are normalized by the number of valid query cells (uniform weighting),
and translations with insufficient overlap are masked to -inf.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snap_tpu.models import types
from snap_tpu.utils import geometry
from snap_tpu.utils import grids

Array = jax.Array


def get_grid_center_transform(grid: grids.Grid2D) -> geometry.Transform2D:
  """corner_t_center for a grid."""
  center_offset = jnp.asarray(grid.extent_meters) / 2
  return geometry.Transform2D.from_radians(jnp.zeros(()), center_offset)


def sample_query_templates(
    features: Array,
    valid: Array,
    num_rotations: int,
    grid: grids.Grid2D,
) -> Tuple[Array, Array]:
  """Rotate a BEV into ``num_rotations`` templates about the grid center.

  Args:
    features: ``[H, W, D]``; valid: ``[H, W]``.

  Returns:
    templates ``[R, H, W, D]`` and validity ``[R, H, W]``. Template r at cell
    u holds the query value at ``c + R(angle_r) (u - c)``.
  """
  angles = jnp.linspace(0, 2 * jnp.pi, num_rotations, endpoint=False)
  rotated_t_grid = geometry.Transform2D.from_radians(
      angles, jnp.zeros((num_rotations, 2)))
  corner_t_center = get_grid_center_transform(grid)
  templates_t_grid = corner_t_center @ rotated_t_grid @ corner_t_center.inv

  grid_xy = grid.index_to_xyz(grid.grid_index()).reshape(-1, 2)
  templates_xy = templates_t_grid.transform(grid_xy)  # [R, HW, 2]
  templates_uv = templates_xy / grid.cell_size

  interp = jax.vmap(grids.interpolate_nd, in_axes=(None, 0, None))
  t_feats, t_valid = interp(features, templates_uv, valid)
  t_feats = jnp.where(t_valid[..., None], t_feats, 0)
  h, w = grid.extent
  return (
      t_feats.reshape(num_rotations, h, w, -1),
      t_valid.reshape(num_rotations, h, w),
  )


def template_matching(
    q: Array,
    q_valid: Array,
    m: Array,
    m_valid: Array,
    min_overlap: Optional[float] = 0.05,
) -> Array:
  """Correlate R rotated templates against a map over all translations.

  Args:
    q: ``[R, Hq, Wq, D]`` templates; q_valid: ``[R, Hq, Wq]``.
    m: ``[H, W, D]`` map; m_valid: ``[H, W]``.

  Returns:
    ``[R, H + Hq - 1, W + Wq - 1]`` scores. Output (r, a, b) aligns template
    cell (0, 0) with map cell (a - Hq + 1, b - Wq + 1).

  The map is edge-padded (out-of-map reads clamp to the border, matching the
  'nearest' interpolation convention of sampled pose scoring) and the
  template stack becomes the conv kernel: shape [Hq, Wq, D, R], one MXU pass.
  """
  hq, wq = q.shape[1:3]
  m_pad = jnp.pad(m, ((hq - 1,) * 2, (wq - 1,) * 2, (0, 0)), mode='edge')
  # Correlation: out[r, a, b] = sum_{u,v,d} q[r,u,v,d] * m_pad[a+u, b+v, d].
  kernel = jnp.moveaxis(q, 0, -1)  # [Hq, Wq, D, R]
  scores = jax.lax.conv_general_dilated(
      m_pad[None],
      kernel,
      window_strides=(1, 1),
      padding='VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
      preferred_element_type=jnp.float32,
  )[0]  # [H + Hq - 1, W + Wq - 1, R]
  scores = jnp.moveaxis(scores, -1, 0)

  if min_overlap is not None:
    m_valid_pad = jnp.pad(
        m_valid.astype(jnp.float32), ((hq - 1,) * 2, (wq - 1,) * 2))
    num_valid = jax.lax.conv_general_dilated(
        m_valid_pad[None, ..., None],
        jnp.moveaxis(q_valid.astype(jnp.float32), 0, -1)[..., None, :],
        window_strides=(1, 1),
        padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32,
    )[0]
    num_valid = jnp.moveaxis(num_valid, -1, 0)
    threshold = min_overlap * math.prod(q_valid.shape[-2:])
    scores = jnp.where(num_valid > threshold, scores, -jnp.inf)

  scores /= q_valid.sum((-1, -2), keepdims=True).clip(min=1)
  return scores


def exhaustive_pose_voting(
    plane_q: types.FeaturePlane,
    plane_map: types.FeaturePlane,
    num_rotations: int,
    grid_q: grids.Grid2D,
    conf_q: Optional[Array] = None,
) -> Array:
  """Vote over the dense (rotation, translation) pose volume.

  ``plane_q`` must be a dense BEV on ``grid_q`` (the exhaustive backend
  requires ``filter_points_in_fov=False``).
  """
  feats_q = plane_q.features
  if conf_q is not None:
    feats_q = feats_q * conf_q[..., None]
  templates, t_valid = sample_query_templates(
      feats_q, plane_q.valid, num_rotations, grid_q
  )
  return template_matching(
      templates, t_valid, plane_map.features, plane_map.valid
  )


def exhaustive_pose_voting_batched(
    plane_q: types.FeaturePlane,
    plane_map: types.FeaturePlane,
    num_rotations: int,
    grid_q: grids.Grid2D,
    grid_map: grids.Grid2D,
    conf_q: Optional[Array] = None,
) -> Array:
  """Batched dense voting; query planes may be [B, N, 1, D] frustum layouts
  only if they correspond to the full dense grid (asserted by size)."""
  del grid_map
  b = plane_map.features.shape[0]
  hq, wq = grid_q.extent
  feats_q = plane_q.features.reshape(b, hq, wq, -1)
  valid_q = plane_q.valid.reshape(b, hq, wq)
  return jax.vmap(
      lambda f, v, mf, mv: exhaustive_pose_voting(
          types.FeaturePlane(features=f, valid=v),
          types.FeaturePlane(features=mf, valid=mv),
          num_rotations, grid_q)
  )(feats_q, valid_q, plane_map.features, plane_map.valid)


def exhaustive_index_to_tfm(
    index: Array,
    grid_q: grids.Grid2D,
    grid_map: grids.Grid2D,
    num_rotations: int,
    qgrid_p_q: Array,
) -> geometry.Transform2D:
  """Convert a pose-volume index (r, a, b) to ``map_t_query``.

  Derivation: template r at map offset ``delta = (a - Hq + 1, b - Wq + 1)``
  cells places query-grid point x at map position
  ``delta_m + c + R(-angle_r) (x - c)`` with c the query-grid center, so
  ``map_t_qgrid = T2D(-angle_r, delta_m + c - R(-angle_r) c)``; composing
  with ``qgrid_t_q`` (translation by the camera position in the query grid)
  yields ``map_t_query``.
  """
  del grid_map
  hq, wq = grid_q.extent
  angle = -index[..., 0] * 2 * jnp.pi / num_rotations
  delta_m = (index[..., 1:] - jnp.asarray([hq - 1, wq - 1])) * grid_q.cell_size
  c = jnp.asarray(grid_q.extent_meters) / 2
  rot = geometry.Transform2D.from_radians(angle, jnp.zeros_like(delta_m))
  t = delta_m + c - rot.transform(
      jnp.broadcast_to(c, delta_m.shape)[..., None, :])[..., 0, :]
  map_t_qgrid = geometry.Transform2D.from_radians(angle, t)
  qgrid_t_q = geometry.Transform2D.from_radians(
      jnp.zeros_like(angle),
      jnp.broadcast_to(jnp.asarray(qgrid_p_q), delta_m.shape))
  return map_t_qgrid @ qgrid_t_q


def exhaustive_index_to_tfm_batched(
    index: Array,
    grid_q: grids.Grid2D,
    grid_map: grids.Grid2D,
    num_rotations: int,
    qgrid_p_q: Array,
) -> geometry.Transform2D:
  return exhaustive_index_to_tfm(
      index, grid_q, grid_map, num_rotations, qgrid_p_q)


def exhaustive_tfm_to_index(
    map_t_q: geometry.Transform2D,
    grid_q: grids.Grid2D,
    num_rotations: int,
    qgrid_p_q: Array,
) -> Array:
  """Inverse of ``exhaustive_index_to_tfm`` (continuous-valued index)."""
  hq, wq = grid_q.extent
  qgrid_p = jnp.asarray(qgrid_p_q)
  map_t_qgrid = map_t_q @ geometry.Transform2D.from_radians(
      jnp.zeros_like(map_t_q.angle),
      jnp.broadcast_to(-qgrid_p, map_t_q.t.shape))
  angle = map_t_qgrid.angle
  r = (-angle / (2 * jnp.pi) % 1) * num_rotations
  c = jnp.asarray(grid_q.extent_meters) / 2
  rot = geometry.Transform2D.from_radians(angle, jnp.zeros_like(map_t_qgrid.t))
  delta_m = map_t_qgrid.t - c + rot.transform(
      jnp.broadcast_to(c, map_t_qgrid.t.shape)[..., None, :])[..., 0, :]
  ab = delta_m / grid_q.cell_size + jnp.asarray([hq - 1, wq - 1])
  return jnp.concatenate([r[..., None], ab], -1)
