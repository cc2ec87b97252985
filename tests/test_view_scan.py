"""Parity: fused view-scan pooling vs the reference gather formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snap_tpu.ops import view_fusion
from snap_tpu.ops import view_scan
from snap_tpu.utils import geometry


def random_rig(rng, batch, num_views):
  """Random cameras looking around a small scene."""
  yaw = rng.uniform(0, 2 * np.pi, size=(batch, num_views))
  cos, sin = np.cos(yaw), np.sin(yaw)
  zero, one = np.zeros_like(yaw), np.ones_like(yaw)
  # yaw about z composed with cam-to-world (x right, y down->-z, z fwd->+y).
  cam2world = np.array([[1., 0, 0], [0, 0, 1], [0, -1, 0]])
  r_yaw = np.stack([cos, -sin, zero,
                    sin, cos, zero,
                    zero, zero, one], -1).reshape(batch, num_views, 3, 3)
  R = r_yaw @ cam2world
  t = rng.uniform([2, 2, 2], [10, 14, 3], size=(batch, num_views, 3))
  tfm = geometry.Transform3D(
      R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32))
  f = 20.0
  cams = geometry.FisheyeCamera(
      wh=jnp.broadcast_to(jnp.asarray([16.0, 12.0]), (batch, num_views, 2)),
      f=jnp.full((batch, num_views, 2), f),
      c=jnp.broadcast_to(jnp.asarray([8.0, 6.0]), (batch, num_views, 2)),
      k_radial=jnp.zeros((batch, num_views, 3)),
      max_fov=jnp.full((batch, num_views), np.deg2rad(115.0)),
  )
  return tfm, cams


def gather_reference(f_maps, score_maps, tfm, cams, points, top_k,
                     depth_min_max, add_minmax, use_variance):
  """The gather formulation, composed exactly as the flax module does."""
  images = (f_maps if score_maps is None
            else jnp.concatenate([f_maps, score_maps], -1))
  p2d, vis, depth, _ = view_fusion.project_points_to_views(tfm, cams, points)
  v = images.shape[1]
  if top_k and v > top_k:
    idx, min_dist = view_fusion.view_selection(points, tfm, vis, top_k)
    p2d = view_fusion.gather_observations(p2d, idx)
    vis = view_fusion.gather_observations(vis, idx)
    depth = view_fusion.gather_observations(depth, idx)
    f_proj = view_fusion.interpolate_views_selective(images, p2d, idx)
  else:
    f_proj = view_fusion.interpolate_views_all(images, p2d)
    min_dist = None
  if score_maps is not None:
    f_proj, score_scales = jnp.split(f_proj, [f_maps.shape[-1]], axis=-1)
    scores = view_fusion.interpolate_depth_score(
        score_scales, depth, depth_min_max)
  else:
    scores = None
  stats, valid = view_fusion.pool_multiview_features(
      f_proj, vis, scores, add_minmax, use_variance)
  return stats, valid, min_dist


@pytest.mark.parametrize('weighted', [True, False])
@pytest.mark.parametrize('add_minmax', [False, True])
def test_scan_matches_gather(weighted, add_minmax):
  rng = np.random.default_rng(0)
  batch, num_views, h, w, dim, bins = 2, 5, 12, 16, 8, 4
  tfm, cams = random_rig(rng, batch, num_views)
  f_maps = jnp.asarray(
      rng.normal(size=(batch, num_views, h, w, dim)), jnp.float32)
  score_maps = (
      jnp.asarray(rng.normal(size=(batch, num_views, h, w, bins)), jnp.float32)
      if weighted else None)
  points = jnp.asarray(
      rng.uniform([0, 0, 0], [12, 16, 4], size=(batch, 60, 3)), jnp.float32)
  depth_min_max = (1.0, 32.0)

  stats_ref, valid_ref, min_dist_ref = gather_reference(
      f_maps, score_maps, tfm, cams, points, 3, depth_min_max,
      add_minmax, True)
  out = view_scan.pool_views_scan(
      f_maps, score_maps, tfm, cams, points,
      top_k=3, depth_min_max=depth_min_max,
      add_minmax=add_minmax, use_variance=True)

  np.testing.assert_array_equal(out.valid, valid_ref)
  np.testing.assert_allclose(
      np.asarray(out.min_distance)[np.asarray(valid_ref)],
      np.asarray(min_dist_ref)[np.asarray(valid_ref)], atol=1e-4)
  np.testing.assert_allclose(out.stats, stats_ref, atol=2e-3)


def test_scan_point_tiling_invariant():
  """Tiled and untiled scans agree (padding handled correctly)."""
  rng = np.random.default_rng(1)
  batch, num_views, h, w, dim = 1, 4, 10, 10, 6
  tfm, cams = random_rig(rng, batch, num_views)
  f_maps = jnp.asarray(
      rng.normal(size=(batch, num_views, h, w, dim)), jnp.float32)
  points = jnp.asarray(
      rng.uniform(0, 10, size=(batch, 37, 3)), jnp.float32)
  kwargs = dict(top_k=2, depth_min_max=(1.0, 32.0), add_minmax=False,
                use_variance=True)
  out_full = view_scan.pool_views_scan(
      f_maps, None, tfm, cams, points, point_tile=1 << 20, **kwargs)
  out_tiled = view_scan.pool_views_scan(
      f_maps, None, tfm, cams, points, point_tile=8, **kwargs)
  np.testing.assert_array_equal(out_full.valid, out_tiled.valid)
  np.testing.assert_allclose(out_full.stats, out_tiled.stats, atol=1e-5)


@pytest.mark.parametrize('weighted', [True, False])
def test_stream_matches_gather(weighted):
  rng = np.random.default_rng(7)
  batch, num_views, h, w, dim, bins = 2, 5, 12, 16, 8, 4
  tfm, cams = random_rig(rng, batch, num_views)
  f_maps = jnp.asarray(
      rng.normal(size=(batch, num_views, h, w, dim)), jnp.float32)
  score_maps = (
      jnp.asarray(rng.normal(size=(batch, num_views, h, w, bins)), jnp.float32)
      if weighted else None)
  points = jnp.asarray(
      rng.uniform([0, 0, 0], [12, 16, 4], size=(batch, 60, 3)), jnp.float32)
  depth_min_max = (1.0, 32.0)

  stats_ref, valid_ref, min_dist_ref = gather_reference(
      f_maps, score_maps, tfm, cams, points, 3, depth_min_max, False, True)
  out = view_scan.pool_views_stream(
      f_maps, score_maps, tfm, cams, points,
      top_k=3, depth_min_max=depth_min_max, add_minmax=False,
      use_variance=True)
  np.testing.assert_array_equal(out.valid, valid_ref)
  np.testing.assert_allclose(
      np.asarray(out.min_distance)[np.asarray(valid_ref)],
      np.asarray(min_dist_ref)[np.asarray(valid_ref)], atol=1e-4)
  np.testing.assert_allclose(out.stats, stats_ref, atol=2e-3)


def test_patch_gather_custom_vjp():
  """The flat-row-scatter backward matches the autodiff of a reference."""
  rng = np.random.default_rng(9)
  b, r, w, d, n = 2, 10, 7, 5, 13
  images = jnp.asarray(rng.normal(size=(b, r, w, d)), jnp.float32)
  row0 = jnp.asarray(rng.integers(0, r - 1, size=(b, n)), jnp.int32)
  col0 = jnp.asarray(rng.integers(0, w - 1, size=(b, n)), jnp.int32)

  def reference(images):
    out = []
    for di in range(2):
      for dj in range(2):
        idx = (row0 + di) * w + (col0 + dj)
        flat = images.reshape(b, r * w, d)
        out.append(jnp.take_along_axis(flat, idx[..., None], axis=1))
    out = jnp.stack(out, 2).reshape(b, n, 2, 2, d)
    return out

  fwd = view_scan.gather_bilinear_patches(images, row0, col0)
  np.testing.assert_allclose(fwd, reference(images), atol=1e-6)

  cotangent = jnp.asarray(rng.normal(size=fwd.shape), jnp.float32)
  grad_custom = jax.grad(
      lambda im: (view_scan.gather_bilinear_patches(im, row0, col0)
                  * cotangent).sum())(images)
  grad_ref = jax.grad(lambda im: (reference(im) * cotangent).sum())(images)
  np.testing.assert_allclose(grad_custom, grad_ref, atol=1e-5)


def test_bilinear_patch_combine_fused_vjp():
  """Fused gather+combine matches the unfused einsum fwd and bwd."""
  rng = np.random.default_rng(17)
  b, r, w, d, n = 2, 10, 7, 5, 13
  stack = jnp.asarray(rng.normal(size=(b, r, w, d)), jnp.float32)
  row0 = jnp.asarray(rng.integers(0, r - 1, size=(b, n)), jnp.int32)
  col0 = jnp.asarray(rng.integers(0, w - 1, size=(b, n)), jnp.int32)
  weights = jnp.asarray(rng.uniform(size=(b, n, 2, 2)), jnp.float32)

  def unfused(stack):
    patches = view_scan.gather_bilinear_patches(stack, row0, col0)
    return jnp.einsum('bnij,bnijd->bnd', weights, patches)

  fused = view_scan.bilinear_patch_combine(stack, row0, col0, weights)
  np.testing.assert_array_equal(fused, unfused(stack))

  cot = jnp.asarray(rng.normal(size=fused.shape), jnp.float32)
  g_fused = jax.grad(lambda s: (view_scan.bilinear_patch_combine(
      s, row0, col0, weights) * cot).sum())(stack)
  g_ref = jax.grad(lambda s: (unfused(s) * cot).sum())(stack)
  np.testing.assert_allclose(g_fused, g_ref, atol=1e-5)


def test_view_selection_no_duplicate_visible_views():
  """Points with fewer than k visible views must not double-count view 0."""
  tfm = geometry.Transform3D(
      R=jnp.broadcast_to(jnp.eye(3), (1, 4, 3, 3)),
      t=jnp.asarray([[[0., 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]]))
  points = jnp.zeros((1, 2, 3))
  # Only views 0 and 2 visible.
  vis = jnp.asarray([[[True, False, True, False]] * 2])
  idx, _ = view_fusion.view_selection(points, tfm, vis, 3)
  chosen = np.asarray(idx[0, 0])
  assert len(set(chosen.tolist())) == 3, chosen  # distinct indices
  assert chosen[0] == 0 and chosen[1] == 2  # nearest visible first
  # The filler must be an invisible view, never a repeated visible one.
  assert chosen[2] in (1, 3)


def test_stream_partial_visibility_pooling():
  """Pooling over fewer-than-k visible views matches a hand computation."""
  tfm = geometry.Transform3D(
      R=jnp.broadcast_to(
          jnp.asarray([[1., 0, 0], [0, 0, 1], [0, -1, 0]]), (1, 3, 3, 3)),
      t=jnp.asarray([[[5., 2, 2], [5., 2.5, 2], [5., 100, 2]]]))
  cams = geometry.FisheyeCamera(
      wh=jnp.broadcast_to(jnp.asarray([16.0, 12.0]), (1, 3, 2)),
      f=jnp.full((1, 3, 2), 4.0),
      c=jnp.broadcast_to(jnp.asarray([8.0, 6.0]), (1, 3, 2)),
      k_radial=jnp.zeros((1, 3, 3)),
      max_fov=jnp.full((1, 3), np.deg2rad(115.0)),
  )
  # Constant per-view feature maps: view v has value 10*(v+1).
  f_maps = jnp.stack(
      [jnp.full((12, 16, 4), 10.0 * (v + 1)) for v in range(3)])[None]
  # A point ahead of views 0/1 but far behind view 2's position.
  points = jnp.asarray([[[5.0, 6.0, 0.5]]])
  out = view_scan.pool_views_stream(
      f_maps, None, tfm, cams, points,
      top_k=2, depth_min_max=(1.0, 32.0), add_minmax=False,
      use_variance=True)
  # Unweighted mean over the (visible) selected views only.
  assert bool(out.valid[0, 0])
  mean = float(out.stats[0, 0, 0])
  assert 10.0 <= mean <= 20.0, mean


@pytest.mark.heavy
def test_stream_tiled_matches_untiled_incl_grad():
  """point_tile processing (lax.map + remat) is bit-identical to untiled,
  and its backward runs with bounded transients (training-scale guard)."""
  rng = np.random.default_rng(11)
  batch, num_views, h, w, dim, bins = 2, 5, 12, 16, 8, 4
  tfm, cams = random_rig(rng, batch, num_views)
  f_maps = jnp.asarray(
      rng.normal(size=(batch, num_views, h, w, dim)), jnp.float32)
  score_maps = jnp.asarray(
      rng.normal(size=(batch, num_views, h, w, bins)), jnp.float32)
  points = jnp.asarray(
      rng.uniform([0, 0, 0], [12, 16, 4], size=(batch, 53, 3)), jnp.float32)
  kwargs = dict(top_k=3, depth_min_max=(1.0, 32.0), add_minmax=False,
                use_variance=True)

  def run(fm, sm, tile):
    out = view_scan.pool_views_stream(
        fm, sm, tfm, cams, points, point_tile=tile, **kwargs)
    return out

  out_full = run(f_maps, score_maps, 0)
  out_tiled = run(f_maps, score_maps, 16)  # 53 -> 4 tiles with padding
  np.testing.assert_array_equal(out_full.valid, out_tiled.valid)
  np.testing.assert_allclose(out_full.stats, out_tiled.stats, atol=1e-6)

  def loss(fm, sm, tile):
    return (run(fm, sm, tile).stats ** 2).sum()

  g_full = jax.grad(loss)(f_maps, score_maps, 0)
  g_tiled = jax.grad(loss)(f_maps, score_maps, 16)
  np.testing.assert_allclose(g_full, g_tiled, atol=1e-4)


def test_interpolate_patch_2d_matches_interpolate_nd():
  """One-descriptor patch interpolation == grids.interpolate_nd (order 1),
  including the boundary bands (coords in [-1, size+1)) and validity
  propagation with clamped corners."""
  from snap_tpu.utils import grids as grids_lib

  rng = np.random.default_rng(13)
  h, w, d = 9, 7, 5
  array = jnp.asarray(rng.normal(size=(h, w, d)), jnp.float32)
  valid = jnp.asarray(rng.random((h, w)) > 0.3)
  # Dense sweep incl. sub-cell offsets around every boundary.
  points = jnp.asarray(
      rng.uniform([-1, -1], [h + 1, w + 1], size=(4000, 2)), jnp.float32)
  # Exact lattice points and the low-edge band, where tap collapsing occurs.
  special = np.stack(np.meshgrid(
      np.asarray([0.0, 0.25, 0.49, 0.5, 0.75, 1.0, h - 1.0, h - 0.51]),
      np.asarray([0.0, 0.25, 0.49, 0.5, 0.75, 1.0, w - 1.0, w - 0.51]),
      indexing='ij'), -1).reshape(-1, 2)
  points = jnp.concatenate([points, jnp.asarray(special, jnp.float32)])

  ref_vals, ref_valid = grids_lib.interpolate_nd(array, points, valid)
  got_vals, got_valid = view_scan.interpolate_patch_2d(array, valid, points)
  np.testing.assert_array_equal(got_valid, ref_valid)
  mask = np.asarray(ref_valid)
  np.testing.assert_allclose(
      np.asarray(got_vals)[mask], np.asarray(ref_vals)[mask],
      rtol=1e-6, atol=1e-6)

  # No-validity variant.
  ref_vals2, ref_in = grids_lib.interpolate_nd(array, points, None)
  got_vals2, got_in = view_scan.interpolate_patch_2d(array, None, points)
  np.testing.assert_array_equal(got_in, ref_in)
  np.testing.assert_allclose(
      np.asarray(got_vals2)[np.asarray(ref_in)],
      np.asarray(ref_vals2)[np.asarray(ref_in)], rtol=1e-6, atol=1e-6)

  # Gradients flow through the custom-VJP gather.
  g = jax.grad(lambda a: view_scan.interpolate_patch_2d(
      a, valid, points)[0].sum())(array)
  assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize('mode', ['sorted', 'sorted_tap', 'segsum', 'bf16'])
def test_gather_backward_modes_match_direct(mode):
  """Every backward scatter strategy computes the same stack gradient."""
  key = jax.random.PRNGKey(3)
  b, r, w, d, n = 2, 7, 9, 8, 50
  ks = jax.random.split(key, 4)
  stack = jax.random.normal(ks[0], (b, r, w, d), jnp.float32)
  row0 = jax.random.randint(ks[1], (b, n), 0, r - 1, jnp.int32)
  col0 = jax.random.randint(ks[2], (b, n), 0, w - 1, jnp.int32)
  weights = jax.nn.softmax(
      jax.random.normal(ks[3], (b, n, 2, 2), jnp.float32))

  def loss_combine(s, mode_):
    view_scan.set_gather_backward_mode(mode_)
    try:
      out = view_scan.bilinear_patch_combine(s, row0, col0, weights)
    finally:
      view_scan.set_gather_backward_mode('direct')
    return (out * jnp.arange(d)).sum()

  def loss_gather(s, mode_):
    view_scan.set_gather_backward_mode(mode_)
    try:
      out = view_scan.gather_bilinear_patches(s, row0, col0)
    finally:
      view_scan.set_gather_backward_mode('direct')
    return (out * jnp.arange(d)).sum()

  for loss in (loss_combine, loss_gather):
    g_ref = jax.grad(lambda s: loss(s, 'direct'))(stack)
    g_alt = jax.grad(lambda s: loss(s, mode))(stack)
    # bf16 accumulates in bfloat16; segsum differences a running cumsum
    # (rounding grows with segment position — measured rel. 8e-6 here).
    tol = {'bf16': 5e-2, 'segsum': 1e-3}.get(mode, 1e-5)
    np.testing.assert_allclose(np.asarray(g_alt), np.asarray(g_ref),
                               rtol=tol, atol=tol)


def test_gather_backward_mode_registry():
  assert view_scan.gather_backward_mode() == 'direct'
  with pytest.raises(ValueError):
    view_scan.set_gather_backward_mode('nope')
