"""Regular N-D grids and TPU-friendly linear interpolation.

Re-design of the grid layer of SNAP (reference: snap/utils/grids.py).

The key departure from the reference: ``interpolate_nd`` is implemented as a
single corner-gather-and-blend over all channels at once (2^N gathers of
``[K, D]`` slices), instead of ``jax.scipy.ndimage.map_coordinates`` vmapped
per channel (reference: snap/utils/grids.py:109-137). On TPU this turns K*D
scalarish loads into wide vectorized gathers that XLA lowers to efficient
dynamic-gather ops, and it makes validity propagation explicit instead of the
NaN-poisoning trick.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from typing import Optional, Tuple, Type, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
AnyGrid = TypeVar('AnyGrid', bound='GridND')


@dataclasses.dataclass(frozen=True)
class GridND:
  """N-dimensional regular grid (static metadata; hashable for jit args).

  Reference behavior: snap/utils/grids.py:33-89.
  """

  extent: Tuple[int, ...]
  cell_size: float

  @classmethod
  def from_extent_meters(
      cls: Type[AnyGrid], extent_meters: Tuple[float, ...], cell_size: float
  ) -> AnyGrid:
    extent = tuple(i / cell_size for i in extent_meters)
    if not all(abs(e - round(e)) < 1e-9 for e in extent):
      raise ValueError(
          f'The metric grid extent {extent_meters} is not divisible '
          f'by the cell size {cell_size}.'
      )
    return cls(tuple(int(round(e)) for e in extent), cell_size)

  def xyz_to_index(self, xyz: Array) -> Array:
    return jnp.floor(xyz / self.cell_size).astype(jnp.int32)

  def index_to_xyz(self, idx: Array) -> Array:
    return (idx + 0.5) * self.cell_size

  def index_to_id(self, idx: Array) -> Array:
    idx = jnp.moveaxis(idx, -1, 0)
    return jnp.ravel_multi_index(idx, self.extent, mode='clip')

  def id_to_index(self, ids: Array) -> Array:
    return jnp.stack(jnp.unravel_index(ids, self.extent), -1)

  @property
  def num_cells(self) -> int:
    return int(np.prod(self.extent))

  @property
  def extent_meters(self) -> np.ndarray:
    return np.asarray(self.extent) * self.cell_size

  def index_in_grid(self, idx: Array) -> Array:
    return ((idx >= 0) & (idx < np.asarray(self.extent))).all(-1)

  def xyz_in_grid(self, xyz: Array) -> Array:
    return ((xyz >= 0) & (xyz < self.extent_meters)).all(-1)

  def grid_index(self) -> Array:
    grid = jnp.mgrid[tuple(slice(None, e) for e in self.extent)]
    return jnp.moveaxis(grid, 0, -1)


@dataclasses.dataclass(frozen=True)
class Grid2D(GridND):
  extent: Tuple[int, int]


@dataclasses.dataclass(frozen=True)
class Grid3D(GridND):
  extent: Tuple[int, int, int]

  def bev(self) -> Grid2D:
    return Grid2D(self.extent[:2], self.cell_size)


@functools.partial(jax.jit, static_argnames=['order'])
def interpolate_nd(
    array: Array,
    points: Array,
    valid_array: Optional[Array] = None,
    order: int = 1,
) -> Tuple[Array, Array]:
  """Linear interpolation of an N-D array of channel vectors at given points.

  Args:
    array: ``[*spatial, D]`` values.
    points: ``[K, N]`` query coordinates where ``N == len(spatial)``. The
      origin of the coordinates is the corner of cell ``(0,)*N``, i.e. cell
      centers live at half-integer coordinates.
    valid_array: optional ``[*spatial]`` boolean mask; a query point becomes
      invalid when any of its surrounding corners is invalid (this matches
      the reference's NaN-poisoning semantics, snap/utils/grids.py:131-136).
    order: 0 (nearest) or 1 (multilinear).

  Returns:
    ``(values [K, D], valid [K])``.
  """
  spatial = array.shape[:-1]
  n = len(spatial)
  assert points.shape[-1] == n, (points.shape, spatial)
  size = jnp.asarray(spatial)
  in_bounds = jnp.all((points >= 0) & (points < size), -1)

  # Shift to cell-center indexing; boundary mode 'nearest' clamps the corner
  # *indices* while keeping the fractional weights (this matches
  # map_coordinates semantics for both values and validity propagation).
  pts = points.astype(array.dtype) - 0.5

  flat = array.reshape(-1, array.shape[-1])
  flat_valid = None if valid_array is None else valid_array.reshape(-1)
  strides = np.concatenate(
      [np.cumprod(np.asarray(spatial[1:])[::-1])[::-1], [1]]
  ).astype(np.int32)

  if order == 0:
    idx = jnp.clip(jnp.rint(pts).astype(jnp.int32), 0, size - 1)
    flat_idx = (idx * strides).sum(-1)
    values = flat[flat_idx]
    valid = in_bounds
    if flat_valid is not None:
      valid &= flat_valid[flat_idx]
    return values, valid

  lower_raw = jnp.floor(pts)
  frac = pts - lower_raw
  lower = jnp.clip(lower_raw.astype(jnp.int32), 0, size - 1)
  upper = jnp.clip(lower_raw.astype(jnp.int32) + 1, 0, size - 1)

  values = jnp.zeros((points.shape[0], array.shape[-1]), array.dtype)
  corners_valid = in_bounds
  for corner in itertools.product((0, 1), repeat=n):
    coords = [
        (upper if c else lower)[:, d] for d, c in enumerate(corner)
    ]
    w = functools.reduce(
        jnp.multiply,
        [(frac if c else (1 - frac))[:, d] for d, c in enumerate(corner)],
    )
    flat_idx = sum(cd * s for cd, s in zip(coords, strides))
    values = values + w[:, None] * flat[flat_idx]
    if flat_valid is not None:
      corners_valid &= flat_valid[flat_idx]
  return values, corners_valid


def argmax_nd(scores: Array, grid: GridND) -> Array:
  """Index of the maximum value in an N-dimensional score tensor."""
  n = len(grid.extent)
  scores = scores.reshape(*scores.shape[:-n], -1)
  i = jnp.argmax(scores, axis=-1)
  return grid.id_to_index(i)


def expectation_nd(pdf: Array, grid: GridND) -> Array:
  """Expected index of an N-dim probability tensor."""
  n = len(grid.extent)
  reduce_axes = tuple(-i - 2 for i in range(n))
  return jnp.sum(grid.grid_index() * pdf[..., None], axis=reduce_axes)
