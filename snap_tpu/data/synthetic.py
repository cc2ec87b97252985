"""Procedural synthetic-scene generator with the SNAP batch schema.

The upstream TFDS builder is unreleased (reference README.md:30-32), so this
generator is the framework's first-class data source for tests, smoke
training, and benchmarks. It builds a geometrically consistent world:

- each scene has a random smooth 2D ground texture (a mixture of oriented
  sinusoids) defining RGB appearance;
- street-level fisheye views render that texture by intersecting per-pixel
  camera rays with the ground plane (sky above the horizon), so multi-view
  observations of the same ground point agree — the self-supervised
  localization objective is learnable;
- the aerial raster samples the same texture on the BEV grid; semantic
  rasters threshold texture channels into boolean layers; lidar rays connect
  camera origins to ground points.

Coordinate conventions (matching the reference data, snap/data/loader.py):
- map scene frame: grid corner at the origin, z up; cameras inside the grid;
- query scene frame: camera at the x/y origin looking along +y,
  gravity-aligned;
- camera frame: x right, y down, z optical axis (forward).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

from snap_tpu.data import types as data_types

DataDict = Dict[str, Any]

# world_from_cam rotation for a yaw-0 camera looking along +y.
CAM_TO_WORLD = np.array([
    [1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0],
    [0.0, -1.0, 0.0],
])


def yaw_matrix(yaw: np.ndarray) -> np.ndarray:
  cos, sin = np.cos(yaw), np.sin(yaw)
  zero, one = np.zeros_like(yaw), np.ones_like(yaw)
  return np.stack([
      cos, -sin, zero,
      sin, cos, zero,
      zero, zero, one,
  ], -1).reshape(*yaw.shape, 3, 3)


@dataclasses.dataclass
class TextureParams:
  """A random mixture of oriented 2D sinusoids per RGB channel."""

  freqs: np.ndarray  # [C, K, 2]
  phases: np.ndarray  # [C, K]
  amps: np.ndarray  # [C, K]

  @classmethod
  def sample(cls, rng: np.random.Generator, num_components: int = 24,
             num_channels: int = 3) -> 'TextureParams':
    # Mix coarse layout frequencies with fine detail (wavelengths down to
    # ~1 m) so locations are visually distinctive at the 0.2 m map scale —
    # the self-supervised matching task needs local texture identity.
    coarse = rng.uniform(-1.5, 1.5, size=(num_channels, num_components // 2, 2))
    fine = rng.uniform(-6.0, 6.0, size=(num_channels, num_components // 2, 2))
    freqs = np.concatenate([coarse, fine], axis=1)
    phases = rng.uniform(0, 2 * np.pi, size=(num_channels, num_components))
    amps = rng.normal(size=(num_channels, num_components))
    amps /= np.abs(amps).sum(-1, keepdims=True)
    return cls(freqs=freqs, phases=phases, amps=amps)

  def __call__(self, xy: np.ndarray) -> np.ndarray:
    """Evaluate the texture at ``[..., 2]`` points -> ``[..., C]`` in [0, 1]."""
    phase = np.einsum('...d,ckd->...ck', xy, self.freqs) + self.phases
    vals = (np.cos(phase) * self.amps).sum(-1)  # [..., C]
    return (vals + 1) / 2


@dataclasses.dataclass
class Boxes:
  """Axis-aligned boxes standing on the ground (buildings/obstacles)."""

  mins: np.ndarray  # [K, 3] (z always 0)
  maxs: np.ndarray  # [K, 3]
  colors: np.ndarray  # [K, 3]

  @classmethod
  def sample(cls, rng: np.random.Generator, grid_size, num: int = 5) -> 'Boxes':
    gx, gy, _ = grid_size
    centers = rng.uniform([3, 3], [gx - 3, gy - 3], size=(num, 2))
    sizes = rng.uniform(1.5, 4.0, size=(num, 2))
    heights = rng.uniform(3.0, 8.0, size=(num, 1))
    mins = np.concatenate([centers - sizes / 2, np.zeros((num, 1))], -1)
    maxs = np.concatenate([centers + sizes / 2, heights], -1)
    colors = rng.uniform(0.2, 0.9, size=(num, 3))
    return cls(mins=mins, maxs=maxs, colors=colors)

  def raycast(self, origins: np.ndarray, dirs: np.ndarray):
    """First-hit distance and box index for ``[..., 3]`` rays (slab method).

    Returns (t [...], hit_index [...]) with t=inf where nothing is hit.
    """
    o = origins[..., None, :]  # [..., K, 3]
    d = dirs[..., None, :]
    safe_d = np.where(np.abs(d) < 1e-9, 1e-9, d)
    t1 = (self.mins - o) / safe_d
    t2 = (self.maxs - o) / safe_d
    t_near = np.minimum(t1, t2).max(-1)
    t_far = np.maximum(t1, t2).min(-1)
    hit = (t_far >= np.maximum(t_near, 1e-4))
    t_near = np.where(hit & (t_near > 1e-4), t_near, np.inf)
    idx = np.argmin(t_near, axis=-1)
    t = np.take_along_axis(t_near, idx[..., None], axis=-1)[..., 0]
    return t, idx

  def footprint_mask(self, xy: np.ndarray) -> np.ndarray:
    """Boolean [...,] mask of points inside any box footprint."""
    inside = (
        (xy[..., None, 0] >= self.mins[:, 0])
        & (xy[..., None, 0] < self.maxs[:, 0])
        & (xy[..., None, 1] >= self.mins[:, 1])
        & (xy[..., None, 1] < self.maxs[:, 1])
    )
    return inside.any(-1)


def make_fisheye_intrinsics(
    image_hw: Tuple[int, int], hfov_deg: float = 72.0
) -> DataDict:
  h, w = image_hw
  f = (w / 2) / np.tan(np.deg2rad(hfov_deg) / 2)
  K = np.array([
      [f, 0.0, w / 2],
      [0.0, f, h / 2],
      [0.0, 0.0, 1.0],
  ], dtype=np.float32)
  return {
      'K': K,
      'image_width': np.float32(w),
      'image_height': np.float32(h),
      'distortion': {'radial': np.zeros(3, np.float32)},
      'maxfov': np.float32(np.deg2rad(115.0)),
  }


def render_view(
    texture: TextureParams,
    world_from_cam_r: np.ndarray,
    cam_pos: np.ndarray,
    intrinsics: DataDict,
    image_hw: Tuple[int, int],
    boxes: Optional[Boxes] = None,
) -> np.ndarray:
  """Render the ground texture + boxes seen by a pinhole-ish camera."""
  h, w = image_hw
  K = intrinsics['K']
  # Pixel centers (half-integer convention).
  u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
  rays_cam = np.stack([
      (u - K[0, 2]) / K[0, 0],
      (v - K[1, 2]) / K[1, 1],
      np.ones_like(u),
  ], -1)
  rays_world = rays_cam @ world_from_cam_r.T
  # Intersect z = 0: t = -cam_z / ray_z for downward rays.
  rz = rays_world[..., 2]
  hits_ground = rz < -1e-4
  t_ground = np.where(
      hits_ground, -cam_pos[2] / np.where(hits_ground, rz, -1.0), np.inf)
  ground_xy = cam_pos[:2] + t_ground[..., None] * rays_world[..., :2]
  ground_xy = np.nan_to_num(ground_xy, posinf=0.0, neginf=0.0)
  colors = texture(ground_xy).astype(np.float32)
  dist = np.linalg.norm(ground_xy - cam_pos[:2], axis=-1)
  fade = np.exp(-dist / 60.0)[..., None]
  sky = np.array([0.55, 0.65, 0.8], np.float32)
  img = np.where(hits_ground[..., None], colors * fade + sky * (1 - fade), sky)

  if boxes is not None and len(boxes.mins):
    norm = np.linalg.norm(rays_world, axis=-1, keepdims=True)
    dirs = rays_world / norm
    t_box, idx = boxes.raycast(np.broadcast_to(cam_pos, dirs.shape), dirs)
    box_in_front = t_box * norm[..., 0] < t_ground
    box_color = boxes.colors[idx].astype(np.float32)
    # Simple height shading so faces are not flat.
    hit_z = cam_pos[2] + t_box * dirs[..., 2]
    shade = np.clip(0.6 + 0.08 * np.nan_to_num(hit_z), 0.3, 1.0)[..., None]
    img = np.where(box_in_front[..., None], box_color * shade, img)
  return np.clip(img, 0.0, 1.0).astype(np.float32)


@dataclasses.dataclass
class SyntheticSceneGenerator:
  """Generates scene dicts with the reference batch schema."""

  scene_config: data_types.SceneConfig
  rasters_config: data_types.RastersConfig
  lidar_config: data_types.LidarConfig
  image_hw: Tuple[int, int] = (90, 120)
  num_boxes: int = 5
  voxel_size: float = 0.2
  camera_height_range: Tuple[float, float] = (2.0, 3.0)
  seed: int = 0

  def scene_rng(self, index: int, salt: int = 0) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([self.seed, salt, index]))

  def _sample_map_views(
      self, rng: np.random.Generator
  ) -> Tuple[np.ndarray, np.ndarray]:
    """Camera positions along a rough driving path + yaws."""
    cfg = self.scene_config
    gx, gy, _ = cfg.grid_size
    num = cfg.num_views
    start = rng.uniform([2, 2], [gx - 2, gy - 2])
    direction = rng.uniform(0, 2 * np.pi)
    positions = []
    pos = start
    for _ in range(num):
      positions.append(pos.copy())
      step = rng.uniform(cfg.min_distance_between_views,
                         min(cfg.max_distance_between_views, 4.0))
      direction += rng.normal() * 0.3
      pos = pos + step * np.array([np.cos(direction), np.sin(direction)])
      pos = np.clip(pos, 1.0, [gx - 1, gy - 1])
    positions = np.stack(positions)
    z = rng.uniform(*self.camera_height_range, size=num)
    yaws = rng.uniform(0, 2 * np.pi, size=num)
    return np.concatenate([positions, z[:, None]], -1), yaws

  def _views_dict(
      self,
      texture: TextureParams,
      positions: np.ndarray,
      yaws: np.ndarray,
      add_images: bool,
      boxes: Optional[Boxes] = None,
  ) -> DataDict:
    num = len(positions)
    intr = make_fisheye_intrinsics(
        self.image_hw, self.scene_config.streetview_hfov_deg)
    R = yaw_matrix(yaws) @ CAM_TO_WORLD  # [V, 3, 3] world_from_cam
    ret = {
        'T_view2scene': {
            'R': R.astype(np.float32),
            't': positions.astype(np.float32),
        },
        'camera': {
            'K': np.tile(intr['K'], (num, 1, 1)),
            'image_width': np.full(num, intr['image_width']),
            'image_height': np.full(num, intr['image_height']),
            'distortion': {
                'radial': np.tile(intr['distortion']['radial'], (num, 1))
            },
            'maxfov': np.full(num, intr['maxfov']),
        },
    }
    if add_images:
      images = np.stack([
          render_view(texture, R[i], positions[i], intr, self.image_hw, boxes)
          for i in range(num)
      ])
      ret['images'] = images
    return ret

  def _rasters(self, texture: TextureParams,
               boxes: Optional[Boxes] = None) -> DataDict:
    gx, gy, _ = self.scene_config.grid_size
    nx = int(round(gx / self.voxel_size))
    ny = int(round(gy / self.voxel_size))
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing='ij')
    xy = (np.stack([ii, jj], -1) + 0.5) * self.voxel_size
    rgb = texture(xy).astype(np.float32)
    rasters: DataDict = {'rgb': rgb}
    # Boolean layers from texture-channel thresholds: crude but consistent
    # across the aerial raster, the views, and the lidar geometry.
    classes = list(self.rasters_config.semantic_classes)
    thresholds = np.linspace(0.35, 0.65, len(classes))
    sem = np.stack([
        rgb[..., i % 3] > t for i, t in enumerate(thresholds)], -1)
    rasters['semantics'] = sem
    gt_classes = list(self.rasters_config.gt_semantic_classes)
    thresholds = np.linspace(0.3, 0.7, len(gt_classes))
    gt = np.stack([
        rgb[..., (i + 1) % 3] > t for i, t in enumerate(thresholds)], -1)
    if boxes is not None:
      footprint = boxes.footprint_mask(xy)
      rgb = np.where(
          footprint[..., None],
          boxes.colors[np.argmax(
              footprint[..., None] & np.ones(len(boxes.mins), bool), -1)],
          rgb).astype(np.float32)
      rasters['rgb'] = rgb
      for name in ('buildings_raw', 'buildings_contoured'):
        if name in classes:
          sem[..., classes.index(name)] = footprint
      if 'building' in gt_classes:
        gt[..., gt_classes.index('building')] = footprint
    rasters['gt_semantics'] = gt
    return rasters

  def _lidar_rays(
      self,
      rng: np.random.Generator,
      positions: np.ndarray,
      num_rays: int,
      boxes: Optional[Boxes] = None,
  ) -> DataDict:
    """First-hit raycasts from camera origins (ground plane + box walls)."""
    num_views = len(positions)
    view_idx = rng.integers(0, num_views, size=num_rays)
    origins = positions[view_idx]
    azim = rng.uniform(0, 2 * np.pi, size=num_rays)
    elev = rng.uniform(np.deg2rad(-35.0), np.deg2rad(10.0), size=num_rays)
    dirs = np.stack([
        np.cos(elev) * np.cos(azim),
        np.cos(elev) * np.sin(azim),
        np.sin(elev),
    ], -1)
    down = dirs[:, 2] < -1e-4
    t_ground = np.where(down, -origins[:, 2] / np.where(down, dirs[:, 2], -1),
                        np.inf)
    t = t_ground
    if boxes is not None and len(boxes.mins):
      t_box, _ = boxes.raycast(origins, dirs)
      t = np.minimum(t, t_box)
    mask = np.isfinite(t) & (t < 40.0)
    t_safe = np.where(mask, t, 1.0)
    points = origins + t_safe[:, None] * dirs
    return {
        'points': points.astype(np.float32),
        'origins': origins.astype(np.float32),
        'mask': mask,
    }

  def make_map_scene(
      self,
      index: int,
      add_images: bool = True,
      add_rasters: bool = False,
      add_lidar_rays: bool = False,
      num_rays: Optional[int] = None,
  ) -> Tuple[DataDict, tuple]:
    rng = self.scene_rng(index, salt=1)
    texture = TextureParams.sample(rng)
    boxes = Boxes.sample(rng, self.scene_config.grid_size, self.num_boxes)
    positions, yaws = self._sample_map_views(rng)
    scene = self._views_dict(texture, positions, yaws, add_images, boxes)
    scene['scene_id'] = f'synthetic/{self.seed}/{index}'
    scene['vehicle_type'] = 'CAR'
    scene['latlng'] = np.zeros(2, np.float32)
    if add_rasters:
      scene['rasters'] = self._rasters(texture, boxes)
    if add_lidar_rays:
      scene['lidar_rays'] = self._lidar_rays(
          rng, positions, num_rays or self.lidar_config.num_rays, boxes)
    return scene, (texture, boxes)

  def make_query_scene(
      self, index: int, world
  ) -> Tuple[DataDict, DataDict]:
    """A single-view trekker query + its T_query2map ground truth."""
    rng = self.scene_rng(index, salt=2)
    cfg = self.scene_config
    gx, gy, _ = cfg.grid_size
    # Keep the camera inside the map with room for the frustum.
    margin = min(4.0, cfg.camera_frustum_depth / 4)
    cam_xy_map = rng.uniform([margin, margin], [gx - margin, gy - margin])
    cam_z = rng.uniform(*self.camera_height_range)
    yaw_map = rng.uniform(0, 2 * np.pi)

    # Query scene frame: camera at the x/y origin, looking along +y, z up,
    # ground at z = 0 (same elevation as the map scene).
    positions = np.array([[0.0, 0.0, cam_z]])
    yaws = np.zeros(1)
    # Render in the map frame, then express the pose in the query frame.
    r_world = yaw_matrix(np.array(yaw_map)) @ CAM_TO_WORLD
    intr = make_fisheye_intrinsics(self.image_hw, cfg.streetview_hfov_deg)
    cam_pos_map = np.array([*cam_xy_map, cam_z])
    texture, boxes = world
    image = render_view(
        texture, r_world, cam_pos_map, intr, self.image_hw, boxes)

    scene = self._views_dict(texture, positions, yaws, add_images=False)
    scene['images'] = image[None]
    scene['scene_id'] = f'synthetic_query/{self.seed}/{index}'
    scene['vehicle_type'] = 'TREKKER'
    scene['latlng'] = np.zeros(2, np.float32)

    t_query2map = {
        'R': yaw_matrix(np.array(yaw_map)).astype(np.float32),
        't': np.array([*cam_xy_map, 0.0], np.float32),
    }
    return scene, t_query2map

  def make_example(
      self,
      index: int,
      mode: data_types.DataMode,
      add_images: bool = True,
      add_rasters: bool = False,
      add_lidar_rays: bool = False,
      num_rays: Optional[int] = None,
  ) -> DataDict:
    """One example in the requested mode (reference schema,
    snap/data/loader.py:113-136)."""
    kwargs = dict(add_images=add_images, add_rasters=add_rasters,
                  add_lidar_rays=add_lidar_rays, num_rays=num_rays)
    if mode == data_types.DataMode.SINGLE_SCENE:
      scene, _ = self.make_map_scene(index, **kwargs)
      return scene
    if mode == data_types.DataMode.PAIR_SCENE_VIEW:
      map_scene, world = self.make_map_scene(index, **kwargs)
      query_scene, t_query2map = self.make_query_scene(index, world)
      return {
          'map': map_scene,
          'query': query_scene,
          'T_query2map': t_query2map,
          'overlap': np.float32(0.5),
          'time_delta_days': np.float32(0.0),
          'pair_id': f'{map_scene["scene_id"]}|{query_scene["scene_id"]}',
      }
    if mode == data_types.DataMode.PAIR_SCENES:
      # Two full rigs over the same world; scene_j's frame is a shifted,
      # yawed copy of scene_i's (reference schema: snap/data/loader.py:
      # 121-124 — keys scene_i/scene_j + T_j2i).
      scene_i, _ = self.make_map_scene(index, **kwargs)
      rng = self.scene_rng(index, salt=3)
      shift = rng.uniform([-8, -8], [8, 8])
      yaw = rng.uniform(-np.pi / 4, np.pi / 4)
      t_j2i = {
          'R': yaw_matrix(np.array(yaw)).astype(np.float32),
          't': np.array([*shift, 0.0], np.float32),
      }
      scene_j, _ = self.make_map_scene(index, **kwargs)
      # Re-express scene_j's views in its own (shifted) frame: the world
      # content is shared via the texture; poses move by inv(T_j2i).
      r_i2j = t_j2i['R'].T
      t_i2j = -r_i2j @ t_j2i['t']
      tv = scene_j['T_view2scene']
      tv['R'] = (r_i2j[None] @ tv['R']).astype(np.float32)
      tv['t'] = (tv['t'] @ r_i2j.T + t_i2j).astype(np.float32)
      scene_j['scene_id'] = scene_j['scene_id'] + '/j'
      return {
          'scene_i': scene_i,
          'scene_j': scene_j,
          'T_j2i': t_j2i,
          'overlap': np.float32(0.5),
          'time_delta_days': np.float32(0.0),
      }
    raise NotImplementedError(mode)
