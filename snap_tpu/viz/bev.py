"""Overhead (BEV) visualization: grids, camera frusta, rasters, point clouds.

Capability parity with the reference viz layer (snap/viz/bev.py): a
matplotlib Plotter2D for overhead plots with SE(2)-transformed rasters, and
numpy point-cloud rasterization.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from snap_tpu.utils import geometry
from snap_tpu.utils import grids


def rasterize_pointcloud(
    xy: np.ndarray,
    values: np.ndarray,
    grid: grids.Grid2D,
    reduce: str = 'mean',
) -> Tuple[np.ndarray, np.ndarray]:
  """Accumulate per-point values into grid cells.

  Args:
    xy: ``[N, 2]`` point positions (meters, grid-corner origin).
    values: ``[N, D]`` per-point values.
    grid: target 2D grid.
    reduce: 'mean', 'sum', or 'max'.

  Returns:
    raster ``[X, Y, D]`` and count ``[X, Y]``.
  """
  values = np.atleast_2d(np.asarray(values))
  if values.shape[0] != xy.shape[0]:
    values = values.T
  idx = np.floor(np.asarray(xy) / grid.cell_size).astype(int)
  in_grid = ((idx >= 0) & (idx < np.asarray(grid.extent))).all(-1)
  idx = idx[in_grid]
  values = values[in_grid]
  flat = idx[:, 0] * grid.extent[1] + idx[:, 1]
  d = values.shape[-1]
  count = np.bincount(flat, minlength=grid.num_cells).reshape(grid.extent)
  raster = np.zeros((grid.num_cells, d), values.dtype)
  if reduce == 'max':
    np.maximum.at(raster, flat, values)
  else:
    np.add.at(raster, flat, values)
    if reduce == 'mean':
      raster /= np.maximum(count.reshape(-1, 1), 1)
  return raster.reshape(*grid.extent, d), count


class Plotter2D:
  """Overhead scene plots: grid box, camera frusta, rasters, poses."""

  def __init__(self, grid: Optional[grids.Grid2D] = None, ax=None,
               figsize: float = 6.0):
    import matplotlib.pyplot as plt
    if ax is None:
      _, ax = plt.subplots(1, 1, figsize=(figsize, figsize))
    self.ax = ax
    self.grid = grid
    ax.set_aspect('equal')
    if grid is not None:
      self.plot_grid_box(grid)

  def plot_grid_box(self, grid: grids.Grid2D, color: str = 'k', **kwargs):
    ex, ey = grid.extent_meters
    xs = [0, ex, ex, 0, 0]
    ys = [0, 0, ey, ey, 0]
    self.ax.plot(xs, ys, color=color, **kwargs)

  def plot_cameras(
      self,
      scene_t_view: geometry.Transform3D,
      hfov_deg: float = 72.0,
      depth: float = 4.0,
      color: str = 'r',
      **kwargs,
  ):
    """Draw camera positions and viewing frusta projected to the plane."""
    t = np.asarray(scene_t_view.t).reshape(-1, 3)
    R = np.asarray(scene_t_view.R).reshape(-1, 3, 3)
    self.ax.scatter(t[:, 0], t[:, 1], color=color, s=10, **kwargs)
    half = np.deg2rad(hfov_deg / 2)
    for k in range(len(t)):
      # Optical axis (camera +z) projected to the plane.
      fwd = R[k] @ np.array([0.0, 0.0, 1.0])
      yaw = np.arctan2(fwd[1], fwd[0])
      for a in (yaw - half, yaw + half):
        end = t[k, :2] + depth * np.array([np.cos(a), np.sin(a)])
        self.ax.plot([t[k, 0], end[0]], [t[k, 1], end[1]],
                     color=color, linewidth=0.8, **kwargs)

  def plot_raster(
      self,
      raster: np.ndarray,
      grid: grids.Grid2D,
      map_t_raster: Optional[geometry.Transform2D] = None,
      alpha: float = 1.0,
      **kwargs,
  ):
    """Draw a raster, optionally SE(2)-transformed into the map frame."""
    import matplotlib.transforms as mtransforms
    ex, ey = grid.extent_meters
    # raster[i, j] indexes x (rows) / y (cols): show transposed so x is
    # horizontal.
    im = self.ax.imshow(
        np.asarray(raster).swapaxes(0, 1),
        origin='lower',
        extent=(0, ex, 0, ey),
        alpha=alpha,
        **kwargs,
    )
    if map_t_raster is not None:
      angle = float(np.asarray(map_t_raster.angle))
      tx, ty = np.asarray(map_t_raster.t)
      tfm = (
          mtransforms.Affine2D().rotate(angle).translate(tx, ty)
          + self.ax.transData
      )
      im.set_transform(tfm)
    return im

  def plot_pose(
      self,
      map_t_query: geometry.Transform2D,
      color: str = 'g',
      length: float = 3.0,
      **kwargs,
  ):
    t = np.asarray(map_t_query.t).reshape(-1, 2)
    angle = np.asarray(map_t_query.angle).reshape(-1)
    # Query forward axis is +y in the query frame.
    dx = -length * np.sin(angle)
    dy = length * np.cos(angle)
    self.ax.quiver(t[:, 0], t[:, 1], dx, dy, color=color,
                   angles='xy', scale_units='xy', scale=1, **kwargs)
