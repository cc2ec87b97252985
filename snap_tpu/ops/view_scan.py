"""Fused multi-view lifting: scan over views with online-softmax pooling.

The gather formulation (ops/view_fusion.py) materializes a
``[B, N, K, D]`` per-point-per-view feature tensor — ~6 GB at eval scale —
and does ragged gathers across view images. This module restructures the
computation the way a TPU wants it (same trick as Fast-BEV and
flash-attention):

- loop over views (``lax.fori_loop``): each step projects all points into
  ONE view and bilinearly reads its ``[h, w, D]`` feature map — a dense,
  row-major gather with good locality;
- pooling statistics are accumulated *online*: running max-score ``m``,
  rescaled sum-exp ``l``, and exp-weighted feature sums ``S1``/``S2``
  (mean = S1/l, var = S2/l − mean²) — mathematically identical to the
  two-pass masked softmax of the reference
  (snap/models/streetview_encoder.py:141-178) up to fp rounding;
- top-k nearest-view selection becomes a *mask*: a cheap ``[N, V]``
  distance top-k picks the k-th smallest visible distance per point, and a
  view contributes iff it is visible and within that threshold — the same
  view set as the reference's gather;
- the whole view loop is wrapped in ``lax.map`` over point tiles, bounding
  the working set to ``tile × D`` regardless of scene size.

Peak memory drops from O(N·K·D) to O(tile·D); per-view reads are dense.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from snap_tpu.utils import geometry

Array = jax.Array

NEG_INF = -1e30

# Backward strategy for the patch gather/combine custom VJPs. The shipped
# 'direct' backward scatter-adds with duplicate indices, which serializes
# on TPU (~543 ms/step at full training scale, 20% of the step —
# docs/PERFORMANCE.md round 4); the alternatives trade extra sorted/
# materialized buffers for vectorizable accumulation. All are exact
# (up to summation order; 'bf16' accumulates in bfloat16). Select before
# tracing via set_gather_backward_mode() or SNAP_TPU_SCATTER_MODE.
GATHER_BACKWARD_MODES = ('direct', 'sorted', 'sorted_tap', 'segsum', 'bf16')
_gather_backward_mode = os.environ.get('SNAP_TPU_SCATTER_MODE', 'direct')


def set_gather_backward_mode(mode: str) -> None:
  global _gather_backward_mode
  if mode not in GATHER_BACKWARD_MODES:
    raise ValueError(f'{mode!r} not in {GATHER_BACKWARD_MODES}')
  _gather_backward_mode = mode


def gather_backward_mode() -> str:
  return _gather_backward_mode


def _scatter_rows(ids: Array, vals: Array, rw: int, mode: str) -> Array:
  """sum-scatter [B, M, D] float32 rows at [B, M] flat ids into [B, rw, D].

  'direct'/'bf16': one scatter-add (duplicate indices; bf16 accumulator
  halves traffic). 'sorted': sort contributions by target row first so the
  scatter can claim indices_are_sorted. 'segsum': no scatter at all — sort,
  cumsum the rows, and difference the running sum at segment boundaries.
  """
  b, _, d = vals.shape
  if mode in ('direct', 'bf16'):
    acc_dtype = jnp.bfloat16 if mode == 'bf16' else jnp.float32
    acc = jnp.zeros((b, rw, d), acc_dtype)
    out = jax.vmap(lambda a, i, v: a.at[i].add(v.astype(acc_dtype)))(
        acc, ids, vals)
    return out.astype(jnp.float32)
  order = jnp.argsort(ids, axis=1)
  ids_s = jnp.take_along_axis(ids, order, axis=1)
  vals_s = jnp.take_along_axis(vals, order[..., None], axis=1)
  if mode == 'sorted':
    acc = jnp.zeros((b, rw, d), jnp.float32)
    return jax.vmap(
        lambda a, i, v: a.at[i].add(v, indices_are_sorted=True))(
            acc, ids_s, vals_s)
  if mode == 'segsum':
    running = jnp.cumsum(vals_s, axis=1)

    def per_b(i_s, cs):
      ends = jnp.searchsorted(i_s, jnp.arange(rw), side='right')
      starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
      padded = jnp.concatenate(
          [jnp.zeros((1, cs.shape[-1]), cs.dtype), cs], axis=0)
      return padded[ends] - padded[starts]

    return jax.vmap(per_b)(ids_s, running)
  raise ValueError(f'Unknown gather backward mode {mode!r}')


class ViewScanOutput(NamedTuple):
  stats: Array  # [B, N, C] pooled statistics (matches gather path layout)
  valid: Array  # [B, N]
  min_distance: Array  # [B, N]


def _bilinear_read(image: Array, pts_ij: Array) -> Array:
  """Dense 4-tap bilinear read of one [h, w, D] image at [N, 2] points.

  Same convention as ops/view_fusion.interpolate_views_selective: shift by
  -0.5 (pixel centers), clamp to [0, size-1], all 4 taps contribute.
  """
  h, w, _ = image.shape
  size = jnp.asarray([h, w], pts_ij.dtype)
  pts = jnp.clip(pts_ij - 0.5, 0, size - 1)
  lower = jnp.floor(pts).astype(jnp.int32)
  upper = jnp.minimum(lower + 1, jnp.asarray([h - 1, w - 1]))
  frac = pts - lower
  flat = image.reshape(h * w, -1)

  def read(ci, cj):
    return flat[ci * w + cj]

  w_i = (1 - frac[:, 0], frac[:, 0])
  w_j = (1 - frac[:, 1], frac[:, 1])
  out = None
  for a, ci in enumerate((lower[:, 0], upper[:, 0])):
    for b, cj in enumerate((lower[:, 1], upper[:, 1])):
      contrib = (w_i[a] * w_j[b])[:, None].astype(image.dtype) * read(ci, cj)
      out = contrib if out is None else out + contrib
  return out


def _depth_hat_weights(depth: Array, num_bins: int,
                       depth_min_max: Tuple[float, float],
                       dtype: jnp.dtype) -> Array:
  """Hat-function interpolation weights over S log-depth bins: [..., S]."""
  min_, max_ = depth_min_max
  depth = jnp.clip(depth, min_, max_)
  x = jnp.log(depth / min_) / jnp.log(max_ / min_) * (num_bins - 1)
  x = jnp.clip(x, 0, num_bins - 1)
  bins = jnp.arange(num_bins, dtype=dtype)
  # Edge case x == num_bins - 1 exactly: weights sum to 1 by construction.
  return jnp.maximum(0, 1 - jnp.abs(x[..., None].astype(dtype) - bins))


def _interp_depth_score_1d(scores: Array, depth: Array,
                           depth_min_max: Tuple[float, float]) -> Array:
  """Linear interpolation of [..., S] log-depth-bin scores, gather-free.

  Uses a hat-function weight vector over the S bins and a dense dot — on TPU
  a [.., S] elementwise+reduce is ~100x faster than per-element gathers.
  """
  w = _depth_hat_weights(
      depth, scores.shape[-1], depth_min_max, scores.dtype)
  return jnp.sum(scores * w, axis=-1)


def _view_threshold(
    points: Array,
    cam_centers: Array,
    vis: Array,
    k: int,
) -> Tuple[Array, Array]:
  """Per-point distance to the k-th nearest visible camera (+ min dist).

  A view contributes to a point iff visible and dist <= threshold — the same
  selection as the reference's hard top-k gather.
  """
  diff = points[:, None, :] - cam_centers[None, :, :]  # [N, V, 3]
  dist = jnp.linalg.norm(diff, axis=-1)
  dist = jnp.where(vis, dist, jnp.inf)
  num_views = dist.shape[-1]
  if k and num_views > k:
    neg_topk, _ = jax.lax.top_k(-dist, k)  # [N, k]
    threshold = -neg_topk[:, -1]
  else:
    threshold = jnp.full(dist.shape[:-1], jnp.inf)
  return threshold, jnp.min(dist, axis=-1)


def pool_views_scan_single(
    f_images: Array,
    scores_images: Optional[Array],
    view_r: Array,
    view_t: Array,
    camera: geometry.CameraND,
    points: Array,
    *,
    top_k: int,
    depth_min_max: Tuple[float, float],
    add_minmax: bool,
    use_variance: bool,
    point_tile: int = 131072,
) -> ViewScanOutput:
  """Single-example fused lifting (vmapped over batch by the caller).

  Args:
    f_images: ``[V, h, w, D]`` per-view feature maps (already projected).
    scores_images: ``[V, h, w, S]`` log-depth-bin score maps, or None for
      unweighted mean/var pooling.
    view_r / view_t: ``[V, 3, 3]`` / ``[V, 3]`` camera-to-scene poses.
    camera: per-view cameras, batch shape ``[V]`` (already feature-scaled).
    points: ``[N, 3]`` scene-frame query points.
  """
  num_views, h, w, dim = f_images.shape
  n = points.shape[0]
  weighted = scores_images is not None

  pad = (-n) % point_tile if n > point_tile else 0
  if pad:
    points = jnp.concatenate(
        [points, jnp.zeros((pad, 3), points.dtype)], axis=0)
  num_tiles = points.shape[0] // min(point_tile, points.shape[0])
  tile = points.shape[0] // num_tiles

  view_t_all = view_t  # [V, 3]

  def process_tile(pts):
    # Visibility of every view for threshold computation: needs projection of
    # all views — but only the boolean, done per view inside the loop would
    # race with the threshold. Compute [tile, V] visibility in one shot
    # (cheap: no feature reads).
    view_tfm = geometry.Transform3D(R=view_r, t=view_t_all)
    pts_view = view_tfm.inv.transform(pts[None])  # [V, tile, 3]
    _, vis_all = camera.world2image(pts_view)  # [V, tile]
    vis_all = vis_all.T  # [tile, V]
    threshold, min_dist = _view_threshold(pts, view_t_all, vis_all, top_k)

    acc_dtype = jnp.float32
    m = jnp.full((tile,), NEG_INF, acc_dtype)  # running max score
    l = jnp.zeros((tile,), acc_dtype)  # running sum of exp
    s1 = jnp.zeros((tile, dim), acc_dtype)
    s2 = jnp.zeros((tile, dim), acc_dtype)
    f_min = jnp.full((tile, dim), jnp.inf, acc_dtype)
    f_max = jnp.full((tile, dim), -jnp.inf, acc_dtype)
    count = jnp.zeros((tile,), acc_dtype)

    def body(v, carry):
      m, l, s1, s2, f_min, f_max, count = carry
      tfm_v = geometry.Transform3D(R=view_r[v], t=view_t_all[v])
      cam_v = jax.tree_util.tree_map(lambda x: x[v], camera)
      pts_v = tfm_v.inv.transform(pts[None])[0]  # [tile, 3]
      depth = pts_v[:, -1]
      p2d, vis = cam_v.world2image(pts_v[None])
      p2d, vis = jnp.flip(p2d[0], -1), vis[0]
      dist = jnp.linalg.norm(pts - view_t_all[v], axis=-1)
      select = vis & (dist <= threshold)

      f_v = _bilinear_read(f_images[v], p2d).astype(acc_dtype)  # [tile, D]
      if weighted:
        s_maps = _bilinear_read(scores_images[v], p2d)  # [tile, S]
        score = _interp_depth_score_1d(
            s_maps.astype(acc_dtype), depth, depth_min_max)
      else:
        score = jnp.zeros((tile,), acc_dtype)
      score = jnp.where(select, score, NEG_INF)

      # Online softmax update (masked entries contribute exp(-inf) = 0).
      new_m = jnp.maximum(m, score)
      # Avoid NaN from (-inf) - (-inf) when nothing selected yet.
      safe_m = jnp.where(new_m <= NEG_INF, 0.0, new_m)
      rescale = jnp.exp(jnp.where(m <= NEG_INF, NEG_INF, m) - safe_m)
      wv = jnp.exp(score - safe_m) * select
      l = l * rescale + wv
      s1 = s1 * rescale[:, None] + wv[:, None] * f_v
      s2 = s2 * rescale[:, None] + wv[:, None] * f_v * f_v
      if add_minmax:
        f_min = jnp.where(select[:, None], jnp.minimum(f_min, f_v), f_min)
        f_max = jnp.where(select[:, None], jnp.maximum(f_max, f_v), f_max)
      count = count + select
      return new_m, l, s1, s2, f_min, f_max, count

    m, l, s1, s2, f_min, f_max, count = jax.lax.fori_loop(
        0, num_views, body, (m, l, s1, s2, f_min, f_max, count))

    valid = count > 0
    l_safe = jnp.maximum(l, 1e-20)
    mean = s1 / l_safe[:, None]
    var = jnp.maximum(s2 / l_safe[:, None] - mean * mean, 0.0)
    stats = [mean]
    if use_variance:
      stats.append(var)
    if add_minmax:
      stats.append(jnp.where(valid[:, None], f_max, 0.0))
      stats.append(jnp.where(valid[:, None], f_min, 0.0))
    if weighted:
      score_max = jnp.where(valid, m, 0.0)
      stats.append(score_max[:, None])
    stats = jnp.where(valid[:, None], jnp.concatenate(stats, -1), 0.0)
    return stats, valid, min_dist

  if num_tiles == 1:
    stats, valid, min_dist = process_tile(points)
  else:
    tiles = points.reshape(num_tiles, tile, 3)
    stats, valid, min_dist = jax.lax.map(process_tile, tiles)
    stats = stats.reshape(num_tiles * tile, -1)
    valid = valid.reshape(-1)
    min_dist = min_dist.reshape(-1)
  if pad:
    stats, valid, min_dist = stats[:n], valid[:n], min_dist[:n]
  return ViewScanOutput(stats=stats, valid=valid, min_distance=min_dist)


@functools.lru_cache(maxsize=None)
def _make_patch_gather(shape: Tuple[int, ...], dtype_name: str,
                       mode: str = 'direct'):
  """custom_vjp patch gather specialized to an image-stack shape/dtype."""
  b, r, w, d = shape
  dtype = jnp.dtype(dtype_name)

  def impl(images, row0, col0):
    starts = jnp.stack([row0, col0], axis=-1)  # [B, N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        images, starts, dnums, slice_sizes=(1, 2, 2, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )

  @jax.custom_vjp
  def fn(images, row0, col0):
    return impl(images, row0, col0)

  def fwd(images, row0, col0):
    return impl(images, row0, col0), (row0, col0)

  def bwd(res, g):
    row0, col0 = res
    # Flat pixel ids of the 4 taps, (point, tap) order matching g's layout
    # [B, N, 2, 2, D] -> [B, 4N, D].
    rows = jnp.stack([row0, row0, row0 + 1, row0 + 1], -1)
    cols = jnp.stack([col0, col0 + 1, col0, col0 + 1], -1)
    ids = (rows * w + cols).reshape(b, -1)
    g_taps = g.astype(jnp.float32).reshape(b, -1, d)
    # The cotangent is already materialized at [B, 4N, D] here, so the
    # per-tap variant has no memory edge — use the one-shot sorted path.
    grad = _scatter_rows(
        ids, g_taps, r * w, 'sorted' if mode == 'sorted_tap' else mode)
    return grad.reshape(b, r, w, d).astype(dtype), None, None

  fn.defvjp(fwd, bwd)
  return fn


@functools.lru_cache(maxsize=None)
def _make_patch_combine(shape: Tuple[int, ...], dtype_name: str,
                        mode: str = 'direct'):
  """custom_vjp fused patch-gather + bilinear combine for one stack shape."""
  b, r, w, d = shape
  dtype = jnp.dtype(dtype_name)

  def impl(stack, row0, col0, weights):
    starts = jnp.stack([row0, col0], axis=-1)  # [B, N, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        stack, starts, dnums, slice_sizes=(1, 2, 2, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 2, 2, D]
    return jnp.einsum('bnij,bnijd->bnd', weights, patches)

  @jax.custom_vjp
  def fn(stack, row0, col0, weights):
    return impl(stack, row0, col0, weights)

  def fwd(stack, row0, col0, weights):
    return impl(stack, row0, col0, weights), (row0, col0, weights)

  def bwd(res, g):
    row0, col0, weights = res
    # d stack = sum over taps of scatter_add(w_tap * g) at the tap's flat
    # pixel row. Never materializes the [B, N, 2, 2, D] patch cotangent the
    # naive einsum transpose would build (5.9 GB f32 at training scale).
    g32 = g.astype(jnp.float32)
    if mode in ('direct', 'bf16'):
      # Each tap's [B, N, D] value fuses into its own scatter — the lowest-
      # transient formulation (HBM-tight full-scale training).
      acc_dtype = jnp.bfloat16 if mode == 'bf16' else jnp.float32
      grad = jnp.zeros((b, r * w, d), acc_dtype)
      for a in (0, 1):
        for c in (0, 1):
          ids = (row0 + a) * w + (col0 + c)  # [B, N]
          vals = weights[..., a, c, None].astype(jnp.float32) * g32
          grad = jax.vmap(
              lambda acc, i, v: acc.at[i].add(v.astype(acc_dtype)))(
                  grad, ids, vals)
      grad = grad.astype(jnp.float32)
    elif mode == 'sorted_tap':
      # Sorted-indices scatter per tap: transient stays [B, N, D]-sized
      # (one tap at a time) instead of the 4N materialization below — for
      # when 'sorted' wins on speed but busts the full-scale HBM budget.
      grad = jnp.zeros((b, r * w, d), jnp.float32)
      for a in (0, 1):
        for c in (0, 1):
          ids = (row0 + a) * w + (col0 + c)  # [B, N]
          vals = weights[..., a, c, None].astype(jnp.float32) * g32
          order = jnp.argsort(ids, axis=1)
          ids_s = jnp.take_along_axis(ids, order, axis=1)
          vals_s = jnp.take_along_axis(vals, order[..., None], axis=1)
          grad = jax.vmap(
              lambda acc, i, v: acc.at[i].add(v, indices_are_sorted=True))(
                  grad, ids_s, vals_s)
    else:
      # Sort-based modes materialize the [B, 4N, D] weighted taps (the
      # per-tap fusion above cannot span the sort); tap order (0,0),(0,1),
      # (1,0),(1,1) matches the weights' row-major (a, c) layout.
      rows = jnp.stack([row0, row0, row0 + 1, row0 + 1], -1)
      cols = jnp.stack([col0, col0 + 1, col0, col0 + 1], -1)
      ids = (rows * w + cols).reshape(b, -1)
      vals = (weights.reshape(b, -1, 4)[..., None].astype(jnp.float32)
              * g32[:, :, None, :]).reshape(b, -1, d)
      grad = _scatter_rows(ids, vals, r * w, mode)
    # No cotangent for weights: sample coordinates derive from cameras /
    # poses / query points (data, not trainable parameters), matching the
    # gather reference path where those branches are pruned.
    return grad.reshape(b, r, w, d).astype(dtype), None, None, None

  fn.defvjp(fwd, bwd)
  return fn


def bilinear_patch_combine(
    stack: Array, row0: Array, col0: Array, weights: Array
) -> Array:
  """Fused ``einsum('bnij,bnijd->bnd', weights, gather_patches(...))``.

  Args:
    stack: ``[B, R, W, D]`` row-padded image stack (``row0 <= R - 2``,
      ``col0 <= W - 2`` guaranteed by the caller).
    row0, col0: ``[B, N]`` int32 patch origins.
    weights: ``[B, N, 2, 2]`` bilinear tap weights (stack dtype).

  Returns:
    ``[B, N, D]`` combined features; forward is bit-identical to the
    unfused gather + einsum.

  Custom VJP: the einsum transpose w.r.t. the gathered patches would
  materialize a ``[B, N, 2, 2, D]`` cotangent to feed the gather's scatter
  backward; at training scale (1.15M points x 160 ch) that is the model's
  largest tensor and forced point tiling (lax.map x remat x grad), which
  the XLA TPU compiler cannot handle at full scale (STATUS.md round-2 gap
  #3). The fused backward scatter-adds the four weighted taps directly,
  bounding the transient to one ``[B, N, D]`` per tap and letting the
  full-scale step compile untiled. Weights receive no cotangent (they
  derive from non-trainable geometry).
  """
  return _make_patch_combine(
      tuple(stack.shape), stack.dtype.name, _gather_backward_mode)(
          stack, row0, col0, weights)


def gather_bilinear_patches(
    images: Array, row0: Array, col0: Array
) -> Array:
  """Fetch [2, 2, D] bilinear tap patches with one gather.

  Args:
    images: ``[B, R, W, D]`` row-padded stack (caller guarantees
      ``row0 <= R - 2`` and ``col0 <= W - 2``).
    row0, col0: ``[B, N]`` int32 patch origins.

  Returns:
    ``[B, N, 2, 2, D]`` patches. One multi-dim slice gather replaces four
    row gathers: fewer descriptors and 2x contiguity on the col axis.

  Custom VJP: XLA's transpose of a windowed gather is a windowed scatter,
  which serializes on TPU; the backward scatter-adds the four taps as flat
  pixel *rows* instead.
  """
  return _make_patch_gather(
      tuple(images.shape), images.dtype.name, _gather_backward_mode)(
          images, row0, col0)


def interpolate_patch_2d(
    array: Array,
    valid: Optional[Array],
    points: Array,
) -> Tuple[Array, Array]:
  """Bilinear 2-D interpolation via one 2x2-patch gather per point.

  Exact drop-in for ``grids.interpolate_nd(array, points, valid, order=1)``
  on 2-D grids, but one gather descriptor per point instead of four — the
  TPU gather is descriptor-bound (docs/PERFORMANCE.md), so this is ~4x
  faster, and the patch gather's custom VJP gives the flat-row-scatter
  backward. Matches interpolate_nd's boundary semantics bit-for-bit up to
  summation order:

  - corner indices clamp to the grid ('nearest' boundary) while fractional
    weights are kept → high-edge taps read an edge-replicated pad row;
  - a low-edge point (coordinate in [0, 0.5)) collapses both taps onto
    row/col 0, so the out-of-cell tap carries zero weight and its validity
    is NOT consulted;
  - a point is valid iff in bounds and every *consulted* corner is valid.

  Args:
    array: ``[H, W, D]``; valid: ``[H, W]`` bool or None; points: ``[N, 2]``
      in the same corner-origin convention as interpolate_nd.

  Returns:
    ``(values [N, D], valid [N])``.
  """
  h, w, d = array.shape
  size = jnp.asarray([h, w], points.dtype)
  in_bounds = jnp.all((points >= 0) & (points < size), -1)

  pts = points.astype(array.dtype) - 0.5
  count_upper = pts >= 0  # [N, 2]: else both taps collapse onto index 0
  pts_adj = jnp.clip(pts, 0, size.astype(array.dtype) - 1)
  lower = jnp.floor(pts_adj).astype(jnp.int32)
  lower = jnp.minimum(lower, jnp.asarray([h - 1, w - 1]))
  frac = (pts_adj - lower).astype(array.dtype)

  if valid is not None:
    array = jnp.concatenate([array, valid[..., None].astype(array.dtype)], -1)
  # Edge-pad one row/col: a clamped upper corner reads the replicated edge.
  padded = jnp.pad(array, ((0, 1), (0, 1), (0, 0)), mode='edge')

  patches = gather_bilinear_patches(
      padded[None], lower[None, :, 0], lower[None, :, 1])[0]  # [N, 2, 2, C]
  if valid is not None:
    patches, tap_valid = patches[..., :d], patches[..., d] > 0.5

  w_i = jnp.stack([1 - frac[:, 0], frac[:, 0]], -1)  # [N, 2]
  w_j = jnp.stack([1 - frac[:, 1], frac[:, 1]], -1)
  weights = w_i[:, :, None] * w_j[:, None, :]  # [N, 2, 2]
  values = jnp.einsum('nij,nijd->nd', weights, patches)

  ok = in_bounds
  if valid is not None:
    tap_counted = (
        count_upper[:, 0, None, None] | (jnp.arange(2)[:, None] == 0)
    ) & (count_upper[:, 1, None, None] | (jnp.arange(2)[None, :] == 0))
    ok &= jnp.all(tap_valid | ~tap_counted, axis=(-1, -2))
  return values, ok


def pool_views_stream(
    f_images: Array,
    scores_images: Optional[Array],
    scene_t_view: geometry.Transform3D,
    camera: geometry.CameraND,
    points: Array,
    *,
    top_k: int,
    depth_min_max: Tuple[float, float],
    add_minmax: bool,
    use_variance: bool,
    point_tile: int = 0,
) -> ViewScanOutput:
  """Top-k streamed lifting: k row-gather passes with online pooling.

  Combines the gather path's work bound (only the k selected views are read)
  with the scan path's memory bound (no ``[N, K, D]`` tensor): after top-k
  view selection, the k ranks are processed sequentially; each rank does 4
  bilinear-tap *row* gathers of ``[N, D]`` from the flattened
  ``[V*h*w, D]`` image stack (row gathers are the fast gather shape on TPU)
  and updates online-softmax accumulators. Statistics layout matches
  ops/view_fusion.pool_multiview_features.

  ``point_tile > 0`` processes points in ``lax.map`` tiles of that size with
  a rematerialized body: the per-rank ``[B, tile, 2, 2, C]`` patch tensors
  are the largest transients of the whole model, and at training scale
  (batch 4+, 1.15M points) an untiled backward materializes an 18.9 GB
  f32 patch product that cannot fit HBM.

  Shapes: f_images [B, V, h, w, D]; scores_images [B, V, h, w, S] or None;
  points [B, N, 3]. Returns stats [B, N, C], valid [B, N], min_dist [B, N].
  """
  from snap_tpu.ops import view_fusion  # local import to avoid cycle

  b, v, h, w, dim = f_images.shape
  n = points.shape[1]
  weighted = scores_images is not None
  acc = jnp.float32

  p2d_all, vis_all, depth_all, _ = view_fusion.project_points_to_views(
      scene_t_view, camera, points)
  if top_k and v > top_k:
    view_indices, min_dist = view_fusion.view_selection(
        points, scene_t_view, vis_all, top_k)
  else:
    top_k = v
    view_indices = jnp.broadcast_to(jnp.arange(v)[None, None], (b, n, v))
    dist = jnp.linalg.norm(
        points[..., None, :] - scene_t_view.t[..., None, :, :], axis=-1)
    min_dist = jnp.min(jnp.where(vis_all, dist, jnp.inf), axis=-1)

  images = (f_images if not weighted
            else jnp.concatenate([f_images, scores_images], -1))
  # Pad one row/col so 2x2 tap patches never need clamping: the clamped
  # bilinear coordinates guarantee the out-of-range tap weight is exactly 0.
  padded = jnp.pad(images, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
  stack = padded.reshape(b, v * (h + 1), w + 1, padded.shape[-1])

  # Select per-rank (p2d, vis, depth) via a masked reduce over the small V
  # axis instead of take_along_axis: a [B, N] element gather costs ~as much
  # as the whole 2x2xD patch gather on TPU (descriptor-bound), while the
  # [B, N, K, V] select-and-sum fuses into cheap VPU work and its backward
  # is dense too. Exact: each (n, k) row has exactly one True.
  rank_is_view = (
      view_indices[..., :, None] == jnp.arange(v)[None, None, None])

  def pick(x):  # [B, N, V, ...] -> [B, N, K, ...]
    mask = rank_is_view.reshape(b, n, top_k, v, *(1,) * (x.ndim - 3))
    return jnp.sum(jnp.where(mask, x[:, :, None], 0), axis=3)

  p2d_sel = pick(p2d_all)  # [B, N, K, 2]
  vis_sel = jnp.any(rank_is_view & vis_all[:, :, None], axis=-1)  # [B, N, K]
  depth_sel = pick(depth_all)  # [B, N, K]
  idx_sel = view_indices  # [B, N, K]

  size = jnp.asarray([h, w], p2d_all.dtype)

  def rank_step(carry, idx_k, p2d, select, depth):
    """One rank's gather + online-softmax update (checkpointed per rank:
    the tile backward then holds O(ranks) carry states instead of every
    rank's gather/convert recomputes simultaneously — the ~12 concurrent
    [B, T, C] f32 transients that blew the full-scale HBM budget)."""
    m, l, s1, s2, f_min, f_max, count = carry

    pts = jnp.clip(p2d - 0.5, 0, size - 1)
    lower = jnp.floor(pts).astype(jnp.int32)
    frac = (pts - lower).astype(stack.dtype)

    t = p2d.shape[1]
    w_i = jnp.stack([1 - frac[..., 0], frac[..., 0]], -1)  # [B, T, 2]
    w_j = jnp.stack([1 - frac[..., 1], frac[..., 1]], -1)
    weights = w_i[..., :, None] * w_j[..., None, :]  # [B, T, 2, 2]
    f_k = bilinear_patch_combine(
        stack, idx_k * (h + 1) + lower[..., 0], lower[..., 1], weights
    ).astype(acc)
    if weighted:
      f_k, score_scales = f_k[..., :dim], f_k[..., dim:]
      score = _interp_depth_score_1d(
          score_scales.reshape(b * t, -1), depth.reshape(b * t),
          depth_min_max).reshape(b, t)
    else:
      score = jnp.zeros((b, t), acc)
    score = jnp.where(select, score, NEG_INF)

    new_m = jnp.maximum(m, score)
    safe_m = jnp.where(new_m <= NEG_INF, 0.0, new_m)
    rescale = jnp.exp(jnp.where(m <= NEG_INF, NEG_INF, m) - safe_m)
    wv = jnp.exp(score - safe_m) * select
    l = l * rescale + wv
    s1 = s1 * rescale[..., None] + wv[..., None] * f_k
    s2 = s2 * rescale[..., None] + wv[..., None] * f_k * f_k
    if add_minmax:
      f_min = jnp.where(select[..., None], jnp.minimum(f_min, f_k), f_min)
      f_max = jnp.where(select[..., None], jnp.maximum(f_max, f_k), f_max)
    count = count + select
    return new_m, l, s1, s2, f_min, f_max, count

  rank_step_remat = jax.checkpoint(rank_step)

  def pool_tile(tile_sel):
    """Gather + online-softmax pool one tile: [B, T, K, ...] -> [B, T, C]."""
    p2d_t, vis_t, depth_t, idx_t = tile_sel
    t = p2d_t.shape[1]
    m = jnp.full((b, t), NEG_INF, acc)
    l = jnp.zeros((b, t), acc)
    s1 = jnp.zeros((b, t, dim), acc)
    s2 = jnp.zeros((b, t, dim), acc)
    f_min = jnp.full((b, t, dim), jnp.inf, acc)
    f_max = jnp.full((b, t, dim), -jnp.inf, acc)
    count = jnp.zeros((b, t), acc)

    carry = (m, l, s1, s2, f_min, f_max, count)
    for k in range(top_k):
      carry = rank_step_remat(
          carry, idx_t[..., k], p2d_t[..., k, :], vis_t[..., k],
          depth_t[..., k])
    m, l, s1, s2, f_min, f_max, count = carry

    valid = count > 0
    l_safe = jnp.maximum(l, 1e-20)
    mean = s1 / l_safe[..., None]
    var = jnp.maximum(s2 / l_safe[..., None] - mean * mean, 0.0)
    stats = [mean]
    if use_variance:
      stats.append(var)
    if add_minmax:
      stats.append(jnp.where(valid[..., None], f_max, 0.0))
      stats.append(jnp.where(valid[..., None], f_min, 0.0))
    if weighted:
      stats.append(jnp.where(valid, m, 0.0)[..., None])
    stats = jnp.where(valid[..., None], jnp.concatenate(stats, -1), 0.0)
    # Stats leave the tile in the feature dtype: the [N, C] tensor is a
    # saved residual under remat and must not persist in f32.
    return stats.astype(f_images.dtype), valid

  sel = (p2d_sel, vis_sel, depth_sel, idx_sel)
  if point_tile and n > point_tile:
    # Balance the tiles: ceil(n / ceil(n/tile)) wastes at most one tile's
    # worth of padding in total (padding up to a multiple of point_tile can
    # nearly double the work, e.g. 144k points -> 2 x 131072).
    num_tiles = -(-n // point_tile)
    tile = -(-n // num_tiles)
    pad = num_tiles * tile - n

    def to_tiles(x):  # [B, N, ...] -> [T, B, tile, ...]
      x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
      x = x.reshape(b, num_tiles, tile, *x.shape[2:])
      return jnp.moveaxis(x, 1, 0)

    tiles = jax.tree_util.tree_map(to_tiles, sel)
    # Rematerialize each tile body: its patch transients are recomputed in
    # the backward instead of being saved across the whole map. The tiles
    # run as an UNROLLED Python loop, not lax.map: grad-of-scan-of-remat is
    # the composition the XLA TPU compiler cannot schedule at full scale
    # (round-2 gap #3 — 25+ min compiles / compiler OOM even with the
    # fused gather VJP), while the flat unrolled graph compiles in ~2 min
    # and lets the scheduler serialize tile backwards for minimal memory.
    body = jax.checkpoint(pool_tile)
    outs = [
        body(jax.tree_util.tree_map(lambda x, t=t: x[t], tiles))
        for t in range(num_tiles)
    ]
    stats = jnp.concatenate([o[0] for o in outs], axis=1)[:, :n]
    valid = jnp.concatenate([o[1] for o in outs], axis=1)[:, :n]
  else:
    stats, valid = pool_tile(sel)
  return ViewScanOutput(stats=stats, valid=valid, min_distance=min_dist)


def pool_views_scan(
    f_images: Array,
    scores_images: Optional[Array],
    scene_t_view: geometry.Transform3D,
    camera: geometry.CameraND,
    points: Array,
    *,
    top_k: int,
    depth_min_max: Tuple[float, float],
    add_minmax: bool,
    use_variance: bool,
    point_tile: int = 131072,
) -> ViewScanOutput:
  """Batched fused lifting: ``[B, V, h, w, D]`` images, ``[B, N, 3]`` points.

  Returns pooled stats ``[B, N, C]`` with the same statistic layout as
  ops/view_fusion.pool_multiview_features (mean, var?, max?, min?,
  score_max?), per-point validity, and min view distance.
  """
  fn = functools.partial(
      pool_views_scan_single,
      top_k=top_k,
      depth_min_max=depth_min_max,
      add_minmax=add_minmax,
      use_variance=use_variance,
      point_tile=point_tile,
  )
  if scores_images is None:
    return jax.vmap(
        lambda f, r, t, c, p: fn(f, None, r, t, c, p)
    )(f_images, scene_t_view.R, scene_t_view.t, camera, points)
  return jax.vmap(fn)(
      f_images, scores_images, scene_t_view.R, scene_t_view.t, camera, points)
