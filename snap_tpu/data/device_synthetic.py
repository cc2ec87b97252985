"""On-device synthetic scene generation: the data pipeline as an XLA program.

The numpy generator (``synthetic.py``) is the reference formulation and the
fixture source for CPU tests, but a synthetic *training* stream rendered on
the host cannot feed an accelerator: one example costs ~0.4 host-CPU-seconds
(procedural texture + raycasts over every pixel) and the training host may
have a single core. The procedural world is pure math — oriented-sinusoid
textures, axis-aligned box raycasts, frustum coverage — so this module
evaluates the *same distributions* as one jitted, vmapped XLA program per
batch, directly on the device that consumes it. Batch generation takes
milliseconds of accelerator time instead of seconds of host time, and the
host's only job is dispatching and formatting the string side-channel.

Semantics match ``synthetic.SyntheticSceneGenerator`` (same schema, same
world model, same pairing contract); the random streams differ (JAX
threefry vs numpy PCG), so per-index examples are *distributionally* but not
bitwise identical. Schema parity is pinned by tests/test_device_synthetic.py.

Reference schema: snap/data/loader.py:82-168.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snap_tpu.data import types as data_types
from snap_tpu.utils import geometry

Array = jax.Array
DataDict = Dict[str, Any]

# world_from_cam rotation for a yaw-0 camera looking along +y (z up).
CAM_TO_WORLD = np.array([
    [1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0],
    [0.0, -1.0, 0.0],
])


def yaw_matrix(yaw: Array) -> Array:
  cos, sin = jnp.cos(yaw), jnp.sin(yaw)
  zero, one = jnp.zeros_like(yaw), jnp.ones_like(yaw)
  return jnp.stack([
      cos, -sin, zero,
      sin, cos, zero,
      zero, zero, one,
  ], -1).reshape(*yaw.shape, 3, 3)


@dataclasses.dataclass(frozen=True)
class Spec:
  """Static generation parameters (hashable: closed over by jit)."""

  num_views: int = 10
  image_hw: Tuple[int, int] = (90, 120)
  grid_size: Tuple[float, float, float] = (24.0, 32.0, 12.0)
  voxel_size: float = 0.2
  hfov_deg: float = 72.0
  frustum_depth: float = 16.0
  min_step: float = 1.5
  max_step: float = 4.0
  num_boxes: int = 5
  num_tex_components: int = 24
  camera_height_range: Tuple[float, float] = (2.0, 3.0)
  num_sem_classes: int = 8
  num_gt_classes: int = 6
  building_sem_indices: Tuple[int, ...] = ()
  building_gt_index: Optional[int] = None
  add_images: bool = True
  add_rasters: bool = False
  add_lidar_rays: bool = False
  num_rays: int = 10_000
  # PAIR_SCENES pairing window (types.PairingConfig.{min,max}_overlap) —
  # plumbed from the same ProcessingConfig as the host generator's.
  pair_overlap: Tuple[float, float] = (0.3, 0.7)

  @classmethod
  def from_configs(cls, scene_config, rasters_config, image_hw, voxel_size,
                   **flags) -> 'Spec':
    sem = list(rasters_config.semantic_classes)
    gt = list(rasters_config.gt_semantic_classes)
    return cls(
        num_views=scene_config.num_views,
        image_hw=tuple(image_hw),
        grid_size=tuple(float(g) for g in scene_config.grid_size),
        voxel_size=float(voxel_size),
        hfov_deg=float(scene_config.streetview_hfov_deg),
        frustum_depth=float(scene_config.camera_frustum_depth),
        min_step=float(scene_config.min_distance_between_views),
        max_step=float(scene_config.max_distance_between_views),
        num_sem_classes=len(sem),
        num_gt_classes=len(gt),
        building_sem_indices=tuple(
            sem.index(n) for n in ('buildings_raw', 'buildings_contoured')
            if n in sem),
        building_gt_index=gt.index('building') if 'building' in gt else None,
        **flags,
    )


# --- world sampling -------------------------------------------------------


def sample_texture(key: Array, spec: Spec) -> DataDict:
  """Random mixture of oriented 2D sinusoids per RGB channel."""
  k_coarse, k_fine, k_phase, k_amp = jax.random.split(key, 4)
  half = spec.num_tex_components // 2
  coarse = jax.random.uniform(k_coarse, (3, half, 2), minval=-1.5, maxval=1.5)
  fine = jax.random.uniform(k_fine, (3, half, 2), minval=-6.0, maxval=6.0)
  freqs = jnp.concatenate([coarse, fine], axis=1)
  phases = jax.random.uniform(
      k_phase, (3, spec.num_tex_components), maxval=2 * jnp.pi)
  amps = jax.random.normal(k_amp, (3, spec.num_tex_components))
  amps /= jnp.abs(amps).sum(-1, keepdims=True)
  return {'freqs': freqs, 'phases': phases, 'amps': amps}


def texture_eval(texture: DataDict, xy: Array) -> Array:
  """Evaluate the texture at ``[..., 2]`` points -> ``[..., 3]`` in [0, 1]."""
  phase = jnp.einsum('...d,ckd->...ck', xy, texture['freqs'])
  vals = (jnp.cos(phase + texture['phases']) * texture['amps']).sum(-1)
  return (vals + 1) / 2


def sample_boxes(key: Array, spec: Spec) -> DataDict:
  gx, gy, _ = spec.grid_size
  k_c, k_s, k_h, k_col = jax.random.split(key, 4)
  n = spec.num_boxes
  centers = jax.random.uniform(
      k_c, (n, 2), minval=jnp.asarray([3.0, 3.0]),
      maxval=jnp.asarray([gx - 3.0, gy - 3.0]))
  sizes = jax.random.uniform(k_s, (n, 2), minval=1.5, maxval=4.0)
  heights = jax.random.uniform(k_h, (n, 1), minval=3.0, maxval=8.0)
  mins = jnp.concatenate([centers - sizes / 2, jnp.zeros((n, 1))], -1)
  maxs = jnp.concatenate([centers + sizes / 2, heights], -1)
  colors = jax.random.uniform(k_col, (n, 3), minval=0.2, maxval=0.9)
  return {'mins': mins, 'maxs': maxs, 'colors': colors}


_FAR = 1e9  # Finite stand-in for "no hit" (inf breaks where-free math).


def raycast_boxes(boxes: DataDict, origins: Array,
                  dirs: Array) -> Tuple[Array, Array]:
  """Slab-method first hit for ``[..., 3]`` rays -> (t [...], box idx)."""
  o = origins[..., None, :]  # [..., K, 3]
  d = dirs[..., None, :]
  safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
  t1 = (boxes['mins'] - o) / safe_d
  t2 = (boxes['maxs'] - o) / safe_d
  t_near = jnp.minimum(t1, t2).max(-1)
  t_far = jnp.maximum(t1, t2).min(-1)
  hit = (t_far >= jnp.maximum(t_near, 1e-4)) & (t_near > 1e-4)
  t_near = jnp.where(hit, t_near, _FAR)
  idx = jnp.argmin(t_near, axis=-1)
  t = jnp.take_along_axis(t_near, idx[..., None], axis=-1)[..., 0]
  return t, idx


def box_footprint(boxes: DataDict, xy: Array) -> Array:
  inside = (
      (xy[..., None, 0] >= boxes['mins'][:, 0])
      & (xy[..., None, 0] < boxes['maxs'][:, 0])
      & (xy[..., None, 1] >= boxes['mins'][:, 1])
      & (xy[..., None, 1] < boxes['maxs'][:, 1])
  )
  return inside


# --- rendering ------------------------------------------------------------


def _pixel_rays_cam(spec: Spec) -> np.ndarray:
  """Camera-frame ray directions per pixel (constant, baked into the jit)."""
  h, w = spec.image_hw
  f = (w / 2) / np.tan(np.deg2rad(spec.hfov_deg) / 2)
  u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
  return np.stack([
      (u - w / 2) / f,
      (v - h / 2) / f,
      np.ones_like(u),
  ], -1)


def render_views(
    spec: Spec,
    texture: DataDict,
    boxes: DataDict,
    world_from_cam_r: Array,  # [V, 3, 3]
    cam_pos: Array,  # [V, 3]
) -> Array:
  """Ground texture + boxes seen by V pinhole cameras -> [V, H, W, 3]."""
  rays_cam = jnp.asarray(_pixel_rays_cam(spec), jnp.float32)
  rays_world = jnp.einsum('hwc,vrc->vhwr', rays_cam, world_from_cam_r)
  rz = rays_world[..., 2]
  hits_ground = rz < -1e-4
  t_ground = jnp.where(
      hits_ground, -cam_pos[:, None, None, 2] / jnp.where(
          hits_ground, rz, -1.0), _FAR)
  ground_xy = (
      cam_pos[:, None, None, :2] + t_ground[..., None] * rays_world[..., :2])
  ground_xy = jnp.clip(ground_xy, -1e4, 1e4)
  colors = texture_eval(texture, ground_xy)
  dist = jnp.linalg.norm(ground_xy - cam_pos[:, None, None, :2], axis=-1)
  fade = jnp.exp(-dist / 60.0)[..., None]
  sky = jnp.asarray([0.55, 0.65, 0.8], jnp.float32)
  img = jnp.where(
      hits_ground[..., None], colors * fade + sky * (1 - fade), sky)

  if boxes['mins'].shape[0] == 0:
    return jnp.clip(img, 0.0, 1.0).astype(jnp.float32)
  norm = jnp.linalg.norm(rays_world, axis=-1, keepdims=True)
  dirs = rays_world / norm
  t_box, idx = raycast_boxes(
      boxes, jnp.broadcast_to(cam_pos[:, None, None, :], dirs.shape), dirs)
  box_in_front = t_box * norm[..., 0] < t_ground
  box_color = boxes['colors'][idx]
  hit_z = cam_pos[:, None, None, 2] + t_box * dirs[..., 2]
  shade = jnp.clip(0.6 + 0.08 * jnp.clip(hit_z, -100, 100), 0.3, 1.0)
  img = jnp.where(box_in_front[..., None], box_color * shade[..., None], img)
  return jnp.clip(img, 0.0, 1.0).astype(jnp.float32)


def make_rasters(spec: Spec, texture: DataDict, boxes: DataDict,
                 scene2world: Optional[Tuple[Array, Array]] = None
                 ) -> DataDict:
  gx, gy, _ = spec.grid_size
  nx = int(round(gx / spec.voxel_size))
  ny = int(round(gy / spec.voxel_size))
  ii, jj = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing='ij')
  xy = (jnp.stack([ii, jj], -1) + 0.5) * spec.voxel_size
  if scene2world is not None:
    r_s2w, t_s2w = scene2world
    xy = xy @ r_s2w[:2, :2].T + t_s2w[:2]
  rgb = texture_eval(texture, xy).astype(jnp.float32)

  thresholds = np.linspace(0.35, 0.65, spec.num_sem_classes)
  sem = jnp.stack(
      [rgb[..., i % 3] > t for i, t in enumerate(thresholds)], -1)
  # Band-partitioned GT masks — must mirror synthetic.py's host generator
  # exactly (same edges/grouping), so head recipes train (device) and
  # evaluate (host) on the same label distribution. See synthetic.py for
  # why bands replaced nested superlevel sets (degenerate argmax labels).
  n_gt = spec.num_gt_classes
  gt_layers = [None] * n_gt
  for ch in range(3):
    group = [i for i in range(n_gt) if (i + 1) % 3 == ch]
    if not group:
      continue
    edges = np.linspace(0.36, 0.64, len(group) + 1)
    edges[0], edges[-1] = -np.inf, np.inf
    v = rgb[..., ch]
    for rank, i in enumerate(group):
      gt_layers[i] = (v > edges[rank]) & (v <= edges[rank + 1])
  gt = jnp.stack(gt_layers, -1)

  if boxes['mins'].shape[0]:
    inside = box_footprint(boxes, xy)  # [X, Y, K]
    footprint = inside.any(-1)
    first_box = jnp.argmax(inside, -1)
    rgb = jnp.where(
        footprint[..., None], boxes['colors'][first_box], rgb
    ).astype(jnp.float32)
    for i in spec.building_sem_indices:
      sem = sem.at[..., i].set(footprint)
    if spec.building_gt_index is not None:
      gt = gt.at[..., spec.building_gt_index].set(footprint)
  return {'rgb': rgb, 'semantics': sem, 'gt_semantics': gt}


def make_lidar_rays(spec: Spec, key: Array, positions: Array,
                    boxes: DataDict,
                    scene2world: Optional[Tuple[Array, Array]] = None
                    ) -> DataDict:
  """First-hit raycasts from camera origins (ground plane + box walls)."""
  k_view, k_azim, k_elev = jax.random.split(key, 3)
  n = spec.num_rays
  view_idx = jax.random.randint(k_view, (n,), 0, spec.num_views)
  origins = positions[view_idx]
  azim = jax.random.uniform(k_azim, (n,), maxval=2 * jnp.pi)
  elev = jax.random.uniform(
      k_elev, (n,), minval=np.deg2rad(-35.0), maxval=np.deg2rad(10.0))
  dirs = jnp.stack([
      jnp.cos(elev) * jnp.cos(azim),
      jnp.cos(elev) * jnp.sin(azim),
      jnp.sin(elev),
  ], -1)
  down = dirs[:, 2] < -1e-4
  t_ground = jnp.where(
      down, -origins[:, 2] / jnp.where(down, dirs[:, 2], -1.0), _FAR)
  t = t_ground
  if boxes['mins'].shape[0]:
    if scene2world is not None:
      r_s2w, t_s2w = scene2world
      origins_w = origins @ r_s2w.T + t_s2w
      dirs_w = dirs @ r_s2w.T
    else:
      origins_w, dirs_w = origins, dirs
    t_box, _ = raycast_boxes(boxes, origins_w, dirs_w)
    t = jnp.minimum(t_ground, t_box)
  mask = t < 40.0
  t_safe = jnp.where(mask, t, 1.0)
  points = origins + t_safe[:, None] * dirs
  return {
      'points': points.astype(jnp.float32),
      'origins': origins.astype(jnp.float32),
      'mask': mask,
  }


# --- scenes ---------------------------------------------------------------


def sample_rig(key: Array, spec: Spec) -> Tuple[Array, Array]:
  """Camera positions along a rough driving path + yaws -> ([V,3], [V])."""
  gx, gy, _ = spec.grid_size
  num = spec.num_views
  k_start, k_dir, k_steps, k_wander, k_z, k_yaw = jax.random.split(key, 6)
  start = jax.random.uniform(
      k_start, (2,), minval=jnp.asarray([2.0, 2.0]),
      maxval=jnp.asarray([gx - 2.0, gy - 2.0]))
  dir0 = jax.random.uniform(k_dir, (), maxval=2 * jnp.pi)
  steps = jax.random.uniform(
      k_steps, (num,), minval=spec.min_step, maxval=min(spec.max_step, 4.0))
  wander = jax.random.normal(k_wander, (num,)) * 0.3

  def walk(carry, inputs):
    pos, direction = carry
    step, dw = inputs
    new_dir = direction + dw
    new_pos = pos + step * jnp.stack([jnp.cos(new_dir), jnp.sin(new_dir)])
    new_pos = jnp.clip(new_pos, 1.0, jnp.asarray([gx - 1.0, gy - 1.0]))
    return (new_pos, new_dir), pos

  (_, _), positions = jax.lax.scan(walk, (start, dir0), (steps, wander))
  z = jax.random.uniform(
      k_z, (num,), minval=spec.camera_height_range[0],
      maxval=spec.camera_height_range[1])
  yaws = jax.random.uniform(k_yaw, (num,), maxval=2 * jnp.pi)
  return jnp.concatenate([positions, z[:, None]], -1), yaws


def camera_struct(spec: Spec, num: int) -> geometry.FisheyeCamera:
  """The rig's (shared, undistorted-fisheye) intrinsics as a typed pytree."""
  h, w = spec.image_hw
  f = (w / 2) / np.tan(np.deg2rad(spec.hfov_deg) / 2)
  ones = jnp.ones((num,), jnp.float32)
  return geometry.FisheyeCamera(
      wh=ones[:, None] * jnp.asarray([w, h], jnp.float32),
      f=ones[:, None] * jnp.asarray([f, f], jnp.float32),
      c=ones[:, None] * jnp.asarray([w / 2, h / 2], jnp.float32),
      k_radial=jnp.zeros((num, 3), jnp.float32),
      max_fov=ones * jnp.float32(np.deg2rad(115.0)),
  )


def make_map_scene(
    spec: Spec,
    key: Array,
    world: Optional[DataDict] = None,
    rig: Optional[Tuple[Array, Array]] = None,
    scene2world: Optional[Tuple[Array, Array]] = None,
) -> Tuple[DataDict, DataDict]:
  """One posed multi-view scene; returns (scene dict, world)."""
  k_tex, k_boxes, k_rig, k_lidar = jax.random.split(key, 4)
  if world is None:
    world = {
        'texture': sample_texture(k_tex, spec),
        'boxes': sample_boxes(k_boxes, spec),
    }
  positions, yaws = rig if rig is not None else sample_rig(k_rig, spec)
  num = positions.shape[0]
  r_view = yaw_matrix(yaws) @ jnp.asarray(CAM_TO_WORLD, positions.dtype)
  scene: DataDict = {
      'T_view2scene': geometry.Transform3D(
          R=r_view.astype(jnp.float32), t=positions.astype(jnp.float32)),
      'camera': camera_struct(spec, num),
      'latlng': jnp.zeros(2, jnp.float32),
  }
  if spec.add_images:
    if scene2world is None:
      render_r, render_pos = r_view, positions
    else:
      r_s2w, t_s2w = scene2world
      render_r = r_s2w[None] @ r_view
      render_pos = positions @ r_s2w.T + t_s2w
    scene['images'] = render_views(
        spec, world['texture'], world['boxes'], render_r, render_pos)
  if spec.add_rasters:
    scene['rasters'] = make_rasters(
        spec, world['texture'], world['boxes'], scene2world)
  if spec.add_lidar_rays:
    scene['lidar_rays'] = make_lidar_rays(
        spec, k_lidar, positions, world['boxes'], scene2world)
  return scene, world


def make_query_scene(
    spec: Spec, key: Array, world: DataDict
) -> Tuple[DataDict, geometry.Transform3D]:
  """A single-view trekker query + its T_query2map ground truth."""
  gx, gy, _ = spec.grid_size
  margin = min(4.0, spec.frustum_depth / 4)
  k_xy, k_z, k_yaw = jax.random.split(key, 3)
  cam_xy_map = jax.random.uniform(
      k_xy, (2,), minval=margin,
      maxval=jnp.asarray([gx - margin, gy - margin]))
  cam_z = jax.random.uniform(
      k_z, (), minval=spec.camera_height_range[0],
      maxval=spec.camera_height_range[1])
  yaw_map = jax.random.uniform(k_yaw, (), maxval=2 * jnp.pi)

  # Query frame: camera at the x/y origin looking along +y, ground at z=0.
  positions = jnp.stack([0.0 * cam_z, 0.0 * cam_z, cam_z])[None]
  r_local = jnp.asarray(CAM_TO_WORLD, jnp.float32)[None]
  r_world = yaw_matrix(yaw_map) @ jnp.asarray(CAM_TO_WORLD, jnp.float32)
  cam_pos_map = jnp.concatenate([cam_xy_map, cam_z[None]])
  image = render_views(
      spec, world['texture'], world['boxes'], r_world[None],
      cam_pos_map[None])

  scene: DataDict = {
      'T_view2scene': geometry.Transform3D(
          R=r_local.astype(jnp.float32), t=positions.astype(jnp.float32)),
      'camera': camera_struct(spec, 1),
      'latlng': jnp.zeros(2, jnp.float32),
      'images': image,
  }
  t_query2map = geometry.Transform3D(
      R=yaw_matrix(yaw_map).astype(jnp.float32),
      t=jnp.concatenate([cam_xy_map, jnp.zeros(1)]).astype(jnp.float32),
  )
  return scene, t_query2map


def _rig_coverage(
    spec: Spec,
    positions: Array,
    yaws: Array,
    scene2common: Optional[Tuple[Array, Array]] = None,
    cell: float = 1.0,
) -> Array:
  """Boolean grid of common-frame cells inside the rig's view frusta.

  Matches synthetic.SyntheticSceneGenerator._rig_coverage (used for the
  PAIR_SCENES ``overlap`` field, reference contract snap/data/types.py:71-81).
  """
  gx, gy, _ = spec.grid_size
  ii, jj = jnp.meshgrid(
      jnp.arange(int(gx / cell)), jnp.arange(int(gy / cell)), indexing='ij')
  centers = (jnp.stack([ii, jj], -1) + 0.5) * cell
  fwd = jnp.stack([-jnp.sin(yaws), jnp.cos(yaws)], -1)
  cam_xy = positions[:, :2]
  in_cells = True
  if scene2common is not None:
    r_s2c, t_s2c = scene2common
    cam_xy = cam_xy @ r_s2c[:2, :2].T + t_s2c[:2]
    fwd = fwd @ r_s2c[:2, :2].T
    cells_scene = (centers - t_s2c[:2]) @ r_s2c[:2, :2]
    in_cells = (
        (cells_scene >= 0) & (cells_scene < jnp.asarray([gx, gy]))).all(-1)
  rel = centers[..., None, :] - cam_xy  # [X, Y, V, 2]
  dist = jnp.linalg.norm(rel, axis=-1)
  cos_angle = (rel * fwd).sum(-1) / jnp.maximum(dist, 1e-6)
  half_fov = np.deg2rad(spec.hfov_deg) / 2
  seen = (dist <= spec.frustum_depth) & (cos_angle >= np.cos(half_fov))
  return seen.any(-1) & in_cells


def _make_pair_scenes(spec: Spec, scene_key, num_candidates: int = 8,
                      min_overlap: float = 0.3, max_overlap: float = 0.7
                      ) -> DataDict:
  """Two independent rigs over one world, paired by frustum overlap.

  The host generator rejection-samples the second rig until the coverage
  overlap lands in the pairing window; on device all candidates are scored
  vectorized and the first in-window one wins (else the closest to the
  window center) — same distribution family, fixed shapes.
  """
  scene_i, world = make_map_scene(spec, scene_key(1))
  pos_i = scene_i['T_view2scene'].t.astype(jnp.float32)
  r_i = scene_i['T_view2scene'].R.astype(jnp.float32)
  yaw_mats = r_i @ jnp.asarray(CAM_TO_WORLD, jnp.float32).T
  yaws_i = jnp.arctan2(yaw_mats[:, 1, 0], yaw_mats[:, 0, 0])
  cov_i = _rig_coverage(spec, pos_i, yaws_i)

  def candidate(c):
    key = jax.random.fold_in(scene_key(100), c)
    k_shift, k_yaw, k_rig = jax.random.split(key, 3)
    shift = jax.random.uniform(k_shift, (2,), minval=-8.0, maxval=8.0)
    yaw = jax.random.uniform(
        k_yaw, (), minval=-jnp.pi / 4, maxval=jnp.pi / 4)
    positions, yaws = sample_rig(k_rig, spec)
    r_j2i = yaw_matrix(yaw)
    t_j2i = jnp.concatenate([shift, jnp.zeros(1)])
    cov_j = _rig_coverage(spec, positions, yaws, (r_j2i, t_j2i))
    union = (cov_i | cov_j).sum()
    overlap = (cov_i & cov_j).sum() / jnp.maximum(union, 1)
    return overlap, positions, yaws, r_j2i, t_j2i

  overlaps, cand_pos, cand_yaws, cand_r, cand_t = jax.vmap(candidate)(
      jnp.arange(num_candidates))
  in_window = (overlaps >= min_overlap) & (overlaps <= max_overlap)
  mid = (min_overlap + max_overlap) / 2
  fallback = jnp.argmin(jnp.abs(overlaps - mid))
  best = jnp.where(in_window.any(), jnp.argmax(in_window), fallback)

  rig_j = (cand_pos[best], cand_yaws[best])
  scene2world = (cand_r[best], cand_t[best])
  scene_j, _ = make_map_scene(
      spec, scene_key(4), world=world, rig=rig_j, scene2world=scene2world)
  return {
      'scene_i': scene_i,
      'scene_j': scene_j,
      'T_j2i': geometry.Transform3D(
          R=scene2world[0].astype(jnp.float32),
          t=scene2world[1].astype(jnp.float32)),
      'overlap': overlaps[best].astype(jnp.float32),
      'time_delta_days': jnp.float32(0.0),
  }


def make_example(spec: Spec, mode: data_types.DataMode, seed: Array,
                 index: Array) -> DataDict:
  """One example (no strings — those live in the host side-channel)."""
  base = jax.random.fold_in(jax.random.PRNGKey(0), seed)

  def scene_key(salt):
    return jax.random.fold_in(jax.random.fold_in(base, salt), index)

  if mode == data_types.DataMode.SINGLE_SCENE:
    scene, _ = make_map_scene(spec, scene_key(1))
    return scene
  if mode == data_types.DataMode.PAIR_SCENE_VIEW:
    map_scene, world = make_map_scene(spec, scene_key(1))
    query_scene, t_query2map = make_query_scene(spec, scene_key(2), world)
    # Real frustum-coverage overlap (reference contract,
    # snap/data/types.py:71-81): the fraction of query-frustum cells the map
    # rig also covers. Mirrors the host generator.
    pos_map = map_scene['T_view2scene'].t
    yaw_mats = (map_scene['T_view2scene'].R
                @ jnp.asarray(CAM_TO_WORLD, jnp.float32).T)
    yaws_map = jnp.arctan2(yaw_mats[:, 1, 0], yaw_mats[:, 0, 0])
    cov_map = _rig_coverage(spec, pos_map, yaws_map)
    yaw_q = jnp.arctan2(t_query2map.R[1, 0], t_query2map.R[0, 0])
    cov_q = _rig_coverage(spec, t_query2map.t[None], yaw_q[None])
    overlap = (cov_q & cov_map).sum() / jnp.maximum(cov_q.sum(), 1)
    return {
        'map': map_scene,
        'query': query_scene,
        'T_query2map': t_query2map,
        'overlap': overlap.astype(jnp.float32),
        'time_delta_days': jnp.float32(0.0),
    }
  if mode == data_types.DataMode.PAIR_SCENES:
    return _make_pair_scenes(
        spec, scene_key, min_overlap=spec.pair_overlap[0],
        max_overlap=spec.pair_overlap[1])
  raise NotImplementedError(mode)


class DeviceBatcher:
  """Jitted, vmapped batch generation bound to a location seed."""

  def __init__(self, spec: Spec, mode: data_types.DataMode, seed: int,
               sharding: Optional[jax.sharding.Sharding] = None):
    self._seed = seed
    self._sharding = sharding
    fn = functools.partial(make_example, spec, mode)
    batched = jax.vmap(fn, in_axes=(None, 0))
    self._generate = jax.jit(batched, out_shardings=sharding)

  def __call__(self, indices: np.ndarray, mask: np.ndarray) -> DataDict:
    batch = dict(self._generate(self._seed, jnp.asarray(indices)))
    # batch_mask must carry the same data sharding as the generated arrays:
    # an unsharded mask next to sharded outputs would rely on silent jit
    # auto-resharding inside the consumer step (ADVICE r2).
    mask = jnp.asarray(mask, jnp.float32)
    if self._sharding is not None:
      mask = jax.device_put(mask, self._sharding)
    batch['batch_mask'] = mask
    return batch
