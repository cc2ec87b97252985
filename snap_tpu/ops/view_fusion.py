"""Multi-view lifting ops: project, select, sample, and pool image features.

This is the geometric hot core of the mapper (reference:
snap/models/streetview_encoder.py:42-178). The implementation here is the
XLA path, written TPU-first:

- projection is broadcast-native over (batch, views, points) — no nested
  Python vmaps, one fused elementwise program;
- the per-point selective view sampling is a single flattened gather over the
  (view, y, x) axes (``take_along_axis`` on a [B, V*H*W, D] view) so XLA
  emits wide dynamic-gathers instead of per-channel scalar loads;
- pooling keeps the reference's masked-statistics numerics (double-where
  guards, f32 softmax islands) bit-carefully, since recall parity depends on
  them.

A Pallas kernel can replace ``interpolate_views_selective`` +
``pool_multiview_features`` per grid-point tile without touching callers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from snap_tpu.utils import geometry

Array = jax.Array


def project_points_to_views(
    scene_t_view: geometry.TransformND,
    camera: geometry.CameraND,
    points: Array,
) -> Tuple[Array, Array, Array, Array]:
  """Project scene points into every view.

  Args:
    scene_t_view: camera-to-scene transforms, batch shape ``[B, V]``.
    camera: camera models, batch shape ``[B, V]``.
    points: ``[B, N, 3]`` scene-frame points.

  Returns:
    p2d: ``[B, N, V, 2]`` pixel coords in (i, j) = (row, col) indexing.
    visible: ``[B, N, V]`` bool.
    depth: ``[B, N, V]`` z-depth in the camera frame.
    rays: ``[B, N, V, 3]`` unit-norm viewing rays in the camera frame.
  """
  view_t_scene = scene_t_view.inv  # [B, V]
  points_view = view_t_scene.transform(points[:, None])  # [B, V, N, 3]
  depth = points_view[..., -1]
  distance = jnp.linalg.norm(points_view, axis=-1, keepdims=True)
  rays = points_view / distance.clip(min=1e-5)
  p2d, vis = camera.world2image(points_view)  # [B, V, N, 2], [B, V, N]
  p2d = jnp.flip(p2d, axis=-1)  # (x, y) -> (i, j) indexing
  swap = lambda x: jnp.swapaxes(x, 1, 2)  # [B, V, N, ...] -> [B, N, V, ...]
  return swap(p2d), swap(vis), swap(depth), swap(rays)


def view_selection(
    points: Array,
    scene_t_view: geometry.TransformND,
    vis: Array,
    num: int,
) -> Tuple[Array, Array]:
  """Select the k nearest visible views per point.

  Args:
    points: ``[B, N, 3]``.
    scene_t_view: batch shape ``[B, V]``.
    vis: ``[B, N, V]`` visibility mask.
    num: k.

  Returns:
    indices ``[B, N, K]`` of selected views, min distance ``[B, N]``.
  """
  diff = points[..., None, :] - scene_t_view.t[..., None, :, :]  # B,N,V,3
  dist = jnp.linalg.norm(diff, axis=-1)
  min_dist = jnp.min(jnp.where(vis, dist, jnp.inf), axis=-1)
  # k is tiny (4): k iterative masked argmins beat a full per-row sort.
  # Two penalty tiers keep the k indices DISTINCT like lax.top_k: already
  # chosen views get a larger penalty than invisible ones, so once the
  # visible views are exhausted the fillers are distinct *invisible* views
  # (whose gathered vis=False masks them downstream) — never a repeat of an
  # already-counted visible view.
  invisible_penalty = 1e20
  chosen_penalty = 1e30
  remaining = jnp.where(vis, dist, invisible_penalty)
  indices = []
  for _ in range(num):
    idx = jnp.argmin(remaining, axis=-1)
    indices.append(idx)
    remaining = remaining + jax.nn.one_hot(
        idx, dist.shape[-1], dtype=remaining.dtype) * chosen_penalty
  return jnp.stack(indices, axis=-1), min_dist


def gather_observations(x: Array, indices: Array) -> Array:
  """Gather per-point view observations: ``x[b, n, indices[b, n, k]]``.

  ``x``: [B, N, V, ...]; ``indices``: [B, N, K] -> [B, N, K, ...].
  """
  idx = indices.reshape(*indices.shape, *(1,) * (x.ndim - 3))
  idx = jnp.broadcast_to(idx, indices.shape + x.shape[3:])
  return jnp.take_along_axis(x, idx, axis=2)


def interpolate_views_selective(
    images: Array,
    points: Array,
    view_indices: Array,
) -> Array:
  """Bilinear-sample per-point features from the selected views only.

  Args:
    images: ``[B, V, H, W, D]`` feature maps.
    points: ``[B, N, K, 2]`` sample locations in (i, j) pixel coords.
    view_indices: ``[B, N, K]`` which view each sample reads.

  Returns:
    ``[B, N, K, D]`` sampled features.

  Matches the reference 4-tap bilinear with boundary clamping
  (snap/models/streetview_encoder.py:84-105): coordinates are shifted by
  -0.5 (pixel centers) and clamped to [0, size-1]; all 4 taps contribute.
  """
  b, v, h, w, d = images.shape
  flat = images.reshape(b, v * h * w, d)

  size = jnp.asarray([h, w], points.dtype)
  pts = jnp.clip(points - 0.5, 0, size - 1)
  lower = jnp.floor(pts).astype(jnp.int32)
  upper = lower + 1  # may reach size; weight is 0 there, clamp for safety
  w_upper = pts - lower
  w_lower = 1.0 - w_upper
  upper = jnp.minimum(upper, jnp.asarray([h - 1, w - 1]))

  base = view_indices * (h * w)  # [B, N, K]
  out = None
  for ci, wi in ((lower[..., 0], w_lower[..., 0]),
                 (upper[..., 0], w_upper[..., 0])):
    for cj, wj in ((lower[..., 1], w_lower[..., 1]),
                   (upper[..., 1], w_upper[..., 1])):
      flat_idx = base + ci * w + cj  # [B, N, K]
      n, k = flat_idx.shape[1:]
      vals = jnp.take_along_axis(
          flat, flat_idx.reshape(b, n * k, 1), axis=1
      ).reshape(b, n, k, d)
      contrib = (wi * wj)[..., None].astype(vals.dtype) * vals
      out = contrib if out is None else out + contrib
  return out


def interpolate_views_all(images: Array, points: Array) -> Array:
  """Dense variant: sample every view at its own point set.

  Args:
    images: ``[B, V, H, W, D]``; points: ``[B, N, V, 2]`` (i, j).

  Returns:
    ``[B, N, V, D]``.
  """
  b, v, h, w, d = images.shape
  n = points.shape[1]
  view_idx = jnp.broadcast_to(jnp.arange(v)[None, None], (b, n, v))
  return interpolate_views_selective(images, points, view_idx)


def interpolate_depth_score(
    score_scales: Array,
    depth: Array,
    depth_min_max: Tuple[float, float],
) -> Array:
  """Linearly interpolate per-observation log-depth-bin scores at each depth.

  Args:
    score_scales: ``[..., S]`` scores over S log-spaced depth bins.
    depth: ``[...]`` metric depths.
    depth_min_max: (min, max) metric depth covered by the bins.

  Returns:
    ``[...]`` interpolated scores.
  """
  num_bins = score_scales.shape[-1]
  min_, max_ = depth_min_max
  depth = jnp.clip(depth, min_, max_)
  x = jnp.log(depth / min_) / jnp.log(max_ / min_) * (num_bins - 1)
  x = jnp.clip(x, 0, num_bins - 1)
  # Gather-free linear interpolation: hat-function weights over the bins
  # and a dense dot (elementwise+reduce beats per-element gathers on TPU).
  bins = jnp.arange(num_bins, dtype=score_scales.dtype)
  w = jnp.maximum(
      0, 1 - jnp.abs(x[..., None].astype(score_scales.dtype) - bins))
  return jnp.sum(score_scales * w, axis=-1)


@functools.partial(jax.checkpoint, static_argnums=(3, 4))
def pool_multiview_features(
    feats: Array,
    valid: Array,
    scores: Optional[Array] = None,
    add_minmax: bool = True,
    use_variance: bool = True,
) -> Tuple[Array, Array]:
  """Masked statistics over the view axis (axis=-2 of ``feats``).

  Matches reference numerics (snap/models/streetview_encoder.py:141-178):
  double-where mask guard, f32 softmax when score-weighted, concatenated
  [mean, var?, max?, min?, score_max?] statistics, zeroed where no view sees
  the point. Rematerialized: the [..., V, D] intermediates never persist.
  """
  valid_any = valid.any(-1)
  valid_ = jnp.where(valid_any[..., None], valid, True)[..., None]
  if scores is None:
    mean_ = jnp.mean(feats, axis=-2, where=valid_)
    var_ = jnp.var(feats, axis=-2, where=valid_)
  else:
    weights = jax.nn.softmax(
        scores.astype(jnp.float32)[..., None], axis=-2, where=valid_,
    )
    weights = jnp.where(valid_, weights, 0).astype(jnp.float32)
    feats32 = feats.astype(jnp.float32)
    mean_ = jnp.sum(weights * feats32, axis=-2)
    var_ = jnp.sum(weights * (feats32 - mean_[..., None, :]) ** 2, axis=-2)
    mean_ = mean_.astype(feats.dtype)
    var_ = var_.astype(feats.dtype)
  stats = [mean_]
  if use_variance:
    stats.append(var_)
  if add_minmax:
    stats.append(jnp.max(feats, axis=-2, where=valid_, initial=-jnp.inf))
    stats.append(jnp.min(feats, axis=-2, where=valid_, initial=jnp.inf))
  if scores is not None:
    stats.append(
        jnp.max(scores[..., None], axis=-2, where=valid_, initial=-jnp.inf)
    )
  stats = jnp.where(valid_any[..., None], jnp.concatenate(stats, -1), 0)
  return stats, valid_any
