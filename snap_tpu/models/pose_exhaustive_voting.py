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
from snap_tpu.ops import view_scan
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
    num_rotations: int | Array,
    grid: grids.Grid2D,
) -> Tuple[Array, Array]:
  """Rotate a BEV into rotation templates about the grid center.

  Args:
    features: ``[H, W, D]``; valid: ``[H, W]``.
    num_rotations: an int R (uniform angles over [0, 2pi)) or an explicit
      ``[R]`` array of angles (e.g. a fine fan for refinement).

  Returns:
    templates ``[R, H, W, D]`` and validity ``[R, H, W]``. Template r at cell
    u holds the query value at ``c + R(angle_r) (u - c)``.
  """
  if isinstance(num_rotations, int):
    angles = jnp.linspace(0, 2 * jnp.pi, num_rotations, endpoint=False)
  else:
    angles = jnp.asarray(num_rotations)
  num_rotations = angles.shape[0]
  rotated_t_grid = geometry.Transform2D.from_radians(
      angles, jnp.zeros((num_rotations, 2)))
  corner_t_center = get_grid_center_transform(grid)
  templates_t_grid = corner_t_center @ rotated_t_grid @ corner_t_center.inv

  grid_xy = grid.index_to_xyz(grid.grid_index()).reshape(-1, 2)
  templates_xy = templates_t_grid.transform(grid_xy)  # [R, HW, 2]
  templates_uv = templates_xy / grid.cell_size

  # One 2x2-patch gather for all R x HW samples: the TPU gather is
  # descriptor-bound, so this is ~4x cheaper than the 4-corner
  # interpolate_nd formulation (exact parity incl. boundary semantics —
  # tests/test_view_scan.py::test_interpolate_patch_2d_matches_interpolate_nd).
  t_feats, t_valid = view_scan.interpolate_patch_2d(
      features, valid, templates_uv.reshape(-1, 2))
  t_feats = t_feats.reshape(*templates_uv.shape[:2], -1)
  t_valid = t_valid.reshape(templates_uv.shape[:2])
  t_feats = jnp.where(t_valid[..., None], t_feats, 0)
  h, w = grid.extent
  return (
      t_feats.reshape(num_rotations, h, w, -1),
      t_valid.reshape(num_rotations, h, w),
  )


@jax.custom_vjp
def correlate_conv(x: Array, kernel: Array) -> Array:
  """NHWC x HWIO VALID correlation with f32 MXU accumulation.

  ``lax.conv_general_dilated(preferred_element_type=f32)`` on bf16 operands
  has a broken transpose in jax 0.9 (the f32 cotangent is convolved against
  the bf16 operands, a dtype mismatch). This wrapper keeps the f32-accumulated
  forward and defines the backward as the VJP of the same-dtype conv with the
  cotangent rounded to the operand dtype — standard mixed-precision practice
  (gradients re-accumulate in f32 in the optimizer).
  """
  return jax.lax.conv_general_dilated(
      x, kernel, window_strides=(1, 1), padding='VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
      preferred_element_type=jnp.float32)


def _correlate_conv_fwd(x, kernel):
  return correlate_conv(x, kernel), (x, kernel)


def _correlate_conv_bwd(res, g):
  x, kernel = res

  def same_dtype_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

  _, vjp = jax.vjp(same_dtype_conv, x, kernel)
  return vjp(g.astype(x.dtype))


correlate_conv.defvjp(_correlate_conv_fwd, _correlate_conv_bwd)


def template_matching(
    q: Array,
    q_valid: Array,
    m: Array,
    m_valid: Array,
    min_overlap: Optional[float] = 0.05,
    return_raw: bool = False,
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
  scores = correlate_conv(m_pad[None], kernel)[0]  # [H+Hq-1, W+Wq-1, R]
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
    if return_raw:
      norm = q_valid.sum((-1, -2), keepdims=True).clip(min=1)
      raw = scores / norm
      return jnp.where(num_valid > threshold, raw, -jnp.inf), raw
    scores = jnp.where(num_valid > threshold, scores, -jnp.inf)

  scores /= q_valid.sum((-1, -2), keepdims=True).clip(min=1)
  if return_raw:
    return scores, scores
  return scores


def _next_fast_len(n: int) -> int:
  """Smallest 5-smooth (2^a 3^b 5^c) size >= n: FFT stays off the Bluestein
  slow path (e.g. 477 = 3^2 x 53 is ~10x slower than 480)."""
  best = 1 << (n - 1).bit_length()
  p3 = 1
  while p3 < best:
    p5 = p3
    while p5 < best:
      p2 = p5
      while p2 < n:
        p2 *= 2
      best = min(best, p2)
      p5 *= 5
    p3 *= 3
  return best


def template_matching_fft(
    q: Array,
    q_valid: Array,
    m: Array,
    m_valid: Array,
    min_overlap: Optional[float] = 0.05,
    return_raw: bool = False,
) -> Array:
  """FFT-based equivalent of ``template_matching``.

  Same contract and output as the direct-conv version, but O(R·D·HW log HW)
  instead of O(R·D·HW·HqWq): at eval scale (R=64, D=32, 120x160 map) this is
  ~20 GFLOP instead of ~2 PFLOP. The map is edge-padded first so
  out-of-bounds reads clamp like the sampled scorer, then both sides are
  zero-padded to the FFT size (linear, not circular, correlation).
  """
  r, hq, wq, d = q.shape
  h, w = m.shape[:2]
  out_h, out_w = h + hq - 1, w + wq - 1
  m_pad = jnp.pad(m, ((hq - 1,) * 2, (wq - 1,) * 2, (0, 0)), mode='edge')
  big_h, big_w = m_pad.shape[:2]
  # Circular correlation out[a] = sum_u q[u] m[(a+u) mod N] is wrap-free for
  # a <= N - hq; we read a in [0, out_h) = [0, big_h - hq], so N = big_h
  # already suffices — no extra linear-conv margin needed.
  fft_h = _next_fast_len(big_h)
  fft_w = _next_fast_len(big_w)

  mf = jnp.fft.rfft2(m_pad.astype(jnp.float32), s=(fft_h, fft_w), axes=(0, 1))

  # Chunk the rotation axis: the [R, fft_h, fft_w, D] template spectrum is
  # by far the largest tensor of the whole model (GBs at eval scale);
  # lax.map keeps the working set to one chunk while XLA pipelines chunks.
  chunk = max(1, min(r, 8))
  pad_r = (-r) % chunk
  q_chunks = jnp.concatenate(
      [q, jnp.zeros((pad_r, *q.shape[1:]), q.dtype)]) if pad_r else q
  q_chunks = q_chunks.reshape(-1, chunk, hq, wq, d)

  def correlate_chunk(q_c):
    qf = jnp.fft.rfft2(
        q_c.astype(jnp.float32), s=(fft_h, fft_w), axes=(1, 2))
    # Correlation <-> conjugate product; contract the feature channel.
    prod = jnp.einsum('rxyd,xyd->rxy', jnp.conj(qf), mf)
    corr = jnp.fft.irfft2(prod, s=(fft_h, fft_w), axes=(1, 2))
    return corr[:, :out_h, :out_w]

  # Remat the chunk body: under grad, the scan otherwise SAVES each chunk's
  # [chunk, fft_h, fft_w/2+1, D] template spectrum as a residual — i.e. the
  # full-R spectrum tensor the chunking exists to avoid (~2 GB at training
  # scale); recomputing the FFTs in the backward is cheap.
  scores = jax.lax.map(jax.checkpoint(correlate_chunk), q_chunks)
  scores = scores.reshape(-1, out_h, out_w)[:r]

  if min_overlap is not None:
    # The valid-count correlation uses the *unpadded* map mask, zero-padded
    # into the same frame as the edge-padded map.
    m_valid_pad = jnp.pad(
        m_valid.astype(jnp.float32), ((hq - 1,) * 2, (wq - 1,) * 2))
    mvf = jnp.fft.rfft2(m_valid_pad, s=(fft_h, fft_w), axes=(0, 1))
    qvf = jnp.fft.rfft2(
        q_valid.astype(jnp.float32), s=(fft_h, fft_w), axes=(1, 2))
    num_valid = jnp.fft.irfft2(
        jnp.conj(qvf) * mvf[None], s=(fft_h, fft_w), axes=(1, 2)
    )[:, :out_h, :out_w]  # wrap-free for the same reason as the scores
    num_valid = jnp.round(num_valid)  # counts are integers up to fp noise
    threshold = min_overlap * math.prod(q_valid.shape[-2:])
    if return_raw:
      norm = q_valid.sum((-1, -2), keepdims=True).clip(min=1)
      raw = scores / norm
      return jnp.where(num_valid > threshold, raw, -jnp.inf), raw
    scores = jnp.where(num_valid > threshold, scores, -jnp.inf)

  scores /= q_valid.sum((-1, -2), keepdims=True).clip(min=1)
  if return_raw:
    return scores, scores
  return scores


def exhaustive_pose_voting(
    plane_q: types.FeaturePlane,
    plane_map: types.FeaturePlane,
    num_rotations: int,
    grid_q: grids.Grid2D,
    conf_q: Optional[Array] = None,
    use_fft: bool = True,
    return_raw: bool = False,
) -> Array:
  """Vote over the dense (rotation, translation) pose volume.

  ``plane_q`` must be a dense BEV on ``grid_q`` (the exhaustive backend
  requires ``filter_points_in_fov=False``). With ``return_raw`` also returns
  the volume without the overlap mask (finite everywhere) — used for reading
  scores at arbitrary poses (e.g. the GT), where a masked -inf would poison
  the loss.
  """
  feats_q = plane_q.features
  if conf_q is not None:
    feats_q = feats_q * conf_q[..., None]
  templates, t_valid = sample_query_templates(
      feats_q, plane_q.valid, num_rotations, grid_q
  )
  matcher = template_matching_fft if use_fft else template_matching
  return matcher(
      templates, t_valid, plane_map.features, plane_map.valid,
      return_raw=return_raw)


def read_pose_volume(
    volume: Array, index_rab: Array, floor_value: float = -1e9
) -> Array:
  """Trilinearly read the [R, A, B] pose volume at continuous (r, a, b).

  The rotation axis wraps; -inf cells are floored so reads near masked
  regions keep finite values and gradients.
  """
  num_rot = volume.shape[0]
  volume = jnp.maximum(volume, floor_value)
  r, ab = index_rab[..., 0], index_rab[..., 1:]
  size = jnp.asarray(volume.shape[1:])
  ab = jnp.clip(ab, 0, size - 1)
  r0 = jnp.floor(r).astype(jnp.int32)
  fr = r - r0
  ab0 = jnp.floor(ab).astype(jnp.int32)
  fab = ab - ab0
  ab1 = jnp.minimum(ab0 + 1, size - 1)

  def read(ri, ai, bi):
    return volume[ri % num_rot, ai, bi]

  out = 0.0
  for dr, wr in ((r0, 1 - fr), (r0 + 1, fr)):
    for da, wa in ((ab0[..., 0], 1 - fab[..., 0]), (ab1[..., 0], fab[..., 0])):
      for db, wb in ((ab0[..., 1], 1 - fab[..., 1]),
                     (ab1[..., 1], fab[..., 1])):
        out = out + wr * wa * wb * read(dr, da, db)
  return out


def dense_refinement(
    plane_q: types.FeaturePlane,
    plane_map: types.FeaturePlane,
    coarse_index: Array,
    grid_q: grids.Grid2D,
    num_rotations: int,
    qgrid_p_q: Array,
    delta_r_deg: float = 0.25,
    range_r_deg: float = 5.0,
    range_p_cells: int = 20,
    stages: Optional[Tuple[Tuple[float, float], ...]] = None,
    subcell: bool = False,
) -> Tuple[geometry.Transform2D, Array]:
  """Dense local refinement around a coarse pose-volume index.

  Builds a fan of finely rotated query templates around the coarse angle and
  correlates them against a map window around the coarse translation — the
  MXU-native equivalent of the reference's sampled grid refinement
  (snap/models/pose_estimation.py:168-205: ±5° @0.25°, ±4 m @cell).

  ``stages`` runs multiple (range_deg, delta_deg) fans, each re-centered on
  the previous best angle *and* translation — e.g. ((11, 1), (1.25, 0.125))
  first reaches a wrong coarse rotation bin (±2 bins at 64 rotations), then
  resolves the angle to 1/8°. Measured on a trained checkpoint
  (results/run_small/rotation_ablation.json) the wider schedule is
  recall-neutral — rotation outliers are wrong-mode score failures, not
  adjacent-bin errors — so the default is a single ±5° fan (the
  reference's refinement budget). When ``stages`` is None, a single
  (range_r_deg, delta_r_deg) fan is used.

  Returns the refined ``map_t_query`` and the last stage's
  [R_f, 2P+1, 2P+1] score volume.
  """
  hq, wq = grid_q.extent
  h, w = plane_map.features.shape[:2]
  if stages is None:
    stages = ((range_r_deg, delta_r_deg),)
  # Template angle = -(map angle); the coarse map angle is -r * 2pi / R.
  center_angle = coarse_index[0] * (2 * jnp.pi / num_rotations)
  ab = jnp.stack([
      jnp.clip(coarse_index[1], 0, h + hq - 2),
      jnp.clip(coarse_index[2], 0, w + wq - 2),
  ])

  p = range_p_cells
  m_pad = jnp.pad(
      plane_map.features,
      ((hq - 1 + p,) * 2, (wq - 1 + p,) * 2, (0, 0)), mode='edge')
  window = (hq + 2 * p, wq + 2 * p)

  scores = None
  for range_deg, delta_deg in stages:
    num_fine = int(round(2 * range_deg / delta_deg)) + 1
    deltas = jnp.deg2rad(jnp.linspace(-range_deg, range_deg, num_fine))
    template_angles = center_angle - deltas
    templates, t_valid = sample_query_templates(
        plane_q.features, plane_q.valid, template_angles, grid_q)

    # Crop a map window around the current offset such that VALID
    # correlation yields offsets ab + [-P, P].
    start = jnp.clip(ab, 0, jnp.asarray([h + hq - 2, w + wq - 2]))
    crop = jax.lax.dynamic_slice(
        m_pad, (start[0], start[1], 0), (*window, m_pad.shape[-1]))

    kernel = jnp.moveaxis(templates, 0, -1)  # [Hq, Wq, D, Rf]
    scores = correlate_conv(
        crop[None], kernel.astype(crop.dtype))[0]  # [2P+1, 2P+1, Rf]
    scores = jnp.moveaxis(scores, -1, 0)
    scores = scores / jnp.sum(
        t_valid, axis=(-1, -2))[:, None, None].clip(min=1)

    flat_best = jnp.argmax(scores.reshape(-1))
    fr, fa, fb = jnp.unravel_index(flat_best, scores.shape)
    center_angle = template_angles[fr]
    ab = jnp.stack([start[0] + fa - p, start[1] + fb - p])

  ab = ab.astype(jnp.float32)
  if subcell:
    # Sub-bin peak: per-axis 3-point parabola fit at the argmax. The fan
    # and translation grids quantize the estimate at delta_r/2 and
    # cell_size/2; the local score surface of a matched template is smooth
    # (sums of shifted feature products), so the quadratic vertex recovers
    # the fractional peak. Offsets are index units in [-0.5, 0.5]; edge
    # peaks and flat/non-concave fits fall back to the argmax.
    off = parabolic_peak_offsets(scores, jnp.stack([fr, fa, fb]))
    step_rad = jnp.deg2rad(stages[-1][1])
    center_angle = center_angle - off[0] * step_rad
    ab = ab + off[1:]

  tfm = offset_to_tfm(-center_angle, ab, grid_q, qgrid_p_q)
  return tfm, scores


def parabolic_peak_offsets(scores: Array, idx: Array) -> Array:
  """Per-axis sub-bin offsets of a score-volume peak (3-pt parabola).

  For each axis, fits ``f(x) = a x^2 + b x + c`` through the argmax value
  and its two neighbors along that axis; the vertex ``x* = (s- - s+) /
  (2 (s- - 2 s0 + s+))`` is the fractional peak in index units, clipped to
  [-0.5, 0.5]. Returns 0 for an axis whose peak sits on the volume edge or
  whose fit is not strictly concave (degenerate / flat score line).

  ``scores``: [N0, N1, ..., Nk] volume; ``idx``: [k+1] integer argmax.
  """
  offs = []
  s0 = scores[tuple(idx)]
  for axis in range(scores.ndim):
    n = scores.shape[axis]
    i = idx[axis]
    take = lambda j: jnp.take(  # noqa: E731 (per-axis neighbor read)
        scores, jnp.clip(j, 0, n - 1), axis=axis
    )[tuple(jnp.delete(idx, axis, assume_unique_indices=True))]
    sm, sp = take(i - 1), take(i + 1)
    den = sm - 2.0 * s0 + sp
    interior = (i > 0) & (i < n - 1)
    concave = den < -1e-12
    raw = 0.5 * (sm - sp) / jnp.where(concave, den, -1.0)
    offs.append(jnp.where(interior & concave,
                          jnp.clip(raw, -0.5, 0.5), 0.0))
  return jnp.stack(offs)


def offset_to_tfm(
    angle: Array, ab_index: Array, grid_q: grids.Grid2D, qgrid_p_q: Array
) -> geometry.Transform2D:
  """(map angle, volume translation index) -> ``map_t_query`` transform."""
  hq, wq = grid_q.extent
  delta_m = (ab_index - jnp.asarray([hq - 1, wq - 1])) * grid_q.cell_size
  c = jnp.asarray(grid_q.extent_meters) / 2
  rot = geometry.Transform2D.from_radians(angle, jnp.zeros_like(delta_m))
  t = delta_m + c - rot.transform(
      jnp.broadcast_to(c, delta_m.shape)[..., None, :])[..., 0, :]
  map_t_qgrid = geometry.Transform2D.from_radians(angle, t)
  qgrid_t_q = geometry.Transform2D.from_radians(
      jnp.zeros_like(angle),
      jnp.broadcast_to(jnp.asarray(qgrid_p_q), delta_m.shape))
  return map_t_qgrid @ qgrid_t_q


def exhaustive_pose_voting_batched(
    plane_q: types.FeaturePlane,
    plane_map: types.FeaturePlane,
    num_rotations: int,
    grid_q: grids.Grid2D,
    grid_map: grids.Grid2D,
    conf_q: Optional[Array] = None,
    use_fft: bool = True,
    return_raw: bool = False,
) -> Array:
  """Batched dense voting over [B] examples."""
  del grid_map
  b = plane_map.features.shape[0]
  hq, wq = grid_q.extent
  feats_q = plane_q.features.reshape(b, hq, wq, -1)
  valid_q = plane_q.valid.reshape(b, hq, wq)
  if conf_q is None:
    return jax.vmap(
        lambda f, v, mf, mv: exhaustive_pose_voting(
            types.FeaturePlane(features=f, valid=v),
            types.FeaturePlane(features=mf, valid=mv),
            num_rotations, grid_q, use_fft=use_fft, return_raw=return_raw)
    )(feats_q, valid_q, plane_map.features, plane_map.valid)
  conf_q = conf_q.reshape(b, hq, wq)
  return jax.vmap(
      lambda f, v, mf, mv, c: exhaustive_pose_voting(
          types.FeaturePlane(features=f, valid=v),
          types.FeaturePlane(features=mf, valid=mv),
          num_rotations, grid_q, conf_q=c, use_fft=use_fft,
          return_raw=return_raw)
  )(feats_q, valid_q, plane_map.features, plane_map.valid, conf_q)


def dense_refinement_batched(
    plane_q: types.FeaturePlane,
    plane_map: types.FeaturePlane,
    coarse_index: Array,
    grid_q: grids.Grid2D,
    num_rotations: int,
    qgrid_p_q: Array,
    stages: Optional[Tuple[Tuple[float, float], ...]] = None,
    subcell: bool = False,
) -> Tuple[geometry.Transform2D, Array]:
  b = plane_map.features.shape[0]
  hq, wq = grid_q.extent
  feats_q = plane_q.features.reshape(b, hq, wq, -1)
  valid_q = plane_q.valid.reshape(b, hq, wq)
  return jax.vmap(
      lambda f, v, mf, mv, ci: dense_refinement(
          types.FeaturePlane(features=f, valid=v),
          types.FeaturePlane(features=mf, valid=mv),
          ci, grid_q, num_rotations, qgrid_p_q, stages=stages,
          subcell=subcell)
  )(feats_q, valid_q, plane_map.features, plane_map.valid, coarse_index)


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
  angle = -index[..., 0] * 2 * jnp.pi / num_rotations
  return offset_to_tfm(
      angle, index[..., 1:].astype(jnp.float32), grid_q, qgrid_p_q)


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
