"""Batched SE(2)/SE(3) transforms and camera models as JAX pytrees.

TPU-native re-design of the geometry layer of SNAP
(reference: snap/utils/geometry.py). Instead of depending on
``dataclass_array`` we register lightweight ``flax.struct`` dataclasses as
pytrees so they flow through ``jit`` / ``vmap`` / ``shard_map`` and can be
placed in sharded device buffers directly. All operations are written
broadcast-native: fields carry arbitrary leading batch dimensions and methods
never assume a fixed rank, so no implicit vmapping is required.

Conventions
- Points are stored as ``[..., N, D]`` (a trailing set axis ``N``).
- A transform ``a_t_b`` maps points from frame ``b`` to frame ``a``.
- Pixel coordinates use half-integer pixel centers: the origin is the top-left
  corner of the top-left pixel (reference: snap/utils/geometry.py:160-177).
"""

from __future__ import annotations

import dataclasses
from typing import Any, ClassVar, Dict, Mapping, Tuple, Union

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _batched_index(x: Array, idx: Any, event_ndim: int) -> Array:
  """Index into the *batch* dims of ``x``, leaving event dims untouched."""
  if event_ndim == 0:
    return x[idx]
  if not isinstance(idx, tuple):
    idx = (idx,)
  # Make Ellipsis explicit over batch dims only.
  if any(i is Ellipsis for i in idx):
    return x[idx + (slice(None),) * event_ndim]
  return x[idx + (Ellipsis,)]


class _Batched:
  """Mixin adding batch-aware shape/indexing to geometry structs.

  Subclasses declare ``_event_ndims`` mapping field name -> number of trailing
  event (non-batch) dimensions.
  """

  _event_ndims: ClassVar[Dict[str, int]] = {}

  @property
  def shape(self) -> Tuple[int, ...]:
    name, ndim = next(iter(self._event_ndims.items()))
    arr = getattr(self, name)
    return arr.shape[: arr.ndim - ndim]

  def __len__(self) -> int:
    return self.shape[0]

  def __getitem__(self, idx: Any):
    kwargs = {
        k: _batched_index(getattr(self, k), idx, nd)
        for k, nd in self._event_ndims.items()
    }
    return self.replace(**kwargs)  # type: ignore[attr-defined]

  def reshape(self, *batch_shape: int):
    if len(batch_shape) == 1 and isinstance(batch_shape[0], (tuple, list)):
      batch_shape = tuple(batch_shape[0])
    kwargs = {}
    for k, nd in self._event_ndims.items():
      arr = getattr(self, k)
      event = arr.shape[arr.ndim - nd:] if nd else ()
      kwargs[k] = arr.reshape(*batch_shape, *event)
    return self.replace(**kwargs)  # type: ignore[attr-defined]

  def broadcast_to(self, *batch_shape: int):
    if len(batch_shape) == 1 and isinstance(batch_shape[0], (tuple, list)):
      batch_shape = tuple(batch_shape[0])
    kwargs = {}
    for k, nd in self._event_ndims.items():
      arr = getattr(self, k)
      event = arr.shape[arr.ndim - nd:] if nd else ()
      kwargs[k] = jnp.broadcast_to(arr, tuple(batch_shape) + event)
    return self.replace(**kwargs)  # type: ignore[attr-defined]


def _rotmat2d(angle: Array) -> Array:
  cos, sin = jnp.cos(angle), jnp.sin(angle)
  return jnp.stack([cos, -sin, sin, cos], axis=-1).reshape(*angle.shape, 2, 2)


@struct.dataclass
class Transform2D(_Batched):
  """SE(2) transform stored as (angle, translation).

  Reference behavior: snap/utils/geometry.py:87-154.
  """

  angle: Array  # [...]
  t: Array  # [..., 2]

  _event_ndims: ClassVar[Dict[str, int]] = {'angle': 0, 't': 1}

  @classmethod
  def from_radians(cls, angle: Array, t: Array) -> 'Transform2D':
    return cls(angle=jnp.asarray(angle), t=jnp.asarray(t))

  @classmethod
  def from_R(cls, R: Array, t: Array) -> 'Transform2D':
    angle = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return cls(angle=angle, t=t)

  @classmethod
  def from_Transform3D(cls, tfm: 'Transform3D') -> 'Transform2D':
    return cls.from_R(tfm.R, tfm.t[..., :2])

  @classmethod
  def identity(cls, batch_shape: Tuple[int, ...] = ()) -> 'Transform2D':
    return cls(
        angle=jnp.zeros(batch_shape), t=jnp.zeros((*batch_shape, 2))
    )

  @property
  def R(self) -> Array:
    return _rotmat2d(self.angle)

  def to_3x3matrix(self) -> Array:
    mat = jnp.broadcast_to(jnp.eye(3), (*self.shape, 3, 3))
    mat = mat.at[..., :2, :2].set(self.R)
    return mat.at[..., :2, 2].set(self.t)

  @property
  def inv(self) -> 'Transform2D':
    t_inv = -jnp.einsum('...ji,...j->...i', self.R, self.t)
    return Transform2D(angle=-self.angle, t=t_inv)

  def magnitude(self) -> Tuple[Array, Array]:
    dr = jnp.rad2deg(jnp.abs(self.angle)) % 360
    dr = jnp.minimum(dr, 360 - dr)
    dt = jnp.linalg.norm(self.t, axis=-1)
    return dr, dt

  def transform(self, points: Array) -> Array:
    points = jnp.einsum('...ij,...nj->...ni', self.R, points)
    return self.t[..., None, :] + points

  def compose(self, other: 'Transform2D') -> 'Transform2D':
    t = self.t + jnp.einsum('...ij,...j->...i', self.R, other.t)
    return Transform2D(angle=self.angle + other.angle, t=t)

  def __matmul__(
      self, other: Union[Array, 'Transform2D']
  ) -> Union[Array, 'Transform2D']:
    if isinstance(other, Transform2D):
      return self.compose(other)
    if isinstance(other, (jnp.ndarray, np.ndarray)):
      return self.transform(other)
    raise TypeError(f'Unexpected type: {type(other)}')


@struct.dataclass
class Transform3D(_Batched):
  """SE(3) transform stored as (rotation matrix, translation).

  Reference behavior: snap/utils/geometry.py:36-84.
  """

  R: Array  # [..., 3, 3]
  t: Array  # [..., 3]

  _event_ndims: ClassVar[Dict[str, int]] = {'R': 2, 't': 1}

  @classmethod
  def from_Rt(cls, R: Array, t: Array) -> 'Transform3D':
    return cls(R=jnp.asarray(R), t=jnp.asarray(t))

  @classmethod
  def identity(cls, batch_shape: Tuple[int, ...] = ()) -> 'Transform3D':
    return cls(
        R=jnp.broadcast_to(jnp.eye(3), (*batch_shape, 3, 3)),
        t=jnp.zeros((*batch_shape, 3)),
    )

  @classmethod
  def from_Transform2D(
      cls, tfm: Transform2D, z: Array | float = 0.0
  ) -> 'Transform3D':
    batch = tfm.shape
    R = jnp.broadcast_to(jnp.eye(3), (*batch, 3, 3))
    R = R.at[..., :2, :2].set(tfm.R)
    t = jnp.concatenate(
        [tfm.t, jnp.broadcast_to(jnp.asarray(z), batch)[..., None]], -1
    )
    return cls(R=R, t=t)

  def to_4x4matrix(self) -> Array:
    mat = jnp.broadcast_to(jnp.eye(4), (*self.shape, 4, 4))
    mat = mat.at[..., :3, :3].set(self.R)
    return mat.at[..., :3, 3].set(self.t)

  @property
  def inv(self) -> 'Transform3D':
    R_inv = jnp.swapaxes(self.R, -1, -2)
    t_inv = -jnp.einsum('...ij,...j->...i', R_inv, self.t)
    return Transform3D(R=R_inv, t=t_inv)

  def magnitude(self) -> Tuple[Array, Array]:
    trace = jnp.trace(self.R, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1) / 2, -1, 1)
    dr = jnp.rad2deg(jnp.abs(jnp.arccos(cos)))
    dt = jnp.linalg.norm(self.t, axis=-1)
    return dr, dt

  def transform(self, p3d: Array) -> Array:
    p3d = jnp.einsum('...ij,...nj->...ni', self.R, p3d)
    return self.t[..., None, :] + p3d

  def compose(self, other: 'Transform3D') -> 'Transform3D':
    R = self.R @ other.R
    t = self.t + jnp.einsum('...ij,...j->...i', self.R, other.t)
    return Transform3D(R=R, t=t)

  def __matmul__(
      self, other: Union[Array, 'Transform3D']
  ) -> Union[Array, 'Transform3D']:
    if isinstance(other, Transform3D):
      return self.compose(other)
    if isinstance(other, (jnp.ndarray, np.ndarray)):
      return self.transform(other)
    raise TypeError(f'Unexpected type: {type(other)}')


TransformND = Union[Transform2D, Transform3D]


@struct.dataclass
class Camera(_Batched):
  """Pinhole camera with half-integer pixel-center convention.

  Reference behavior: snap/utils/geometry.py:160-221.
  """

  wh: Array  # [..., 2]
  f: Array  # [..., 2]
  c: Array  # [..., 2]

  eps: ClassVar[float] = 1e-3
  _event_ndims: ClassVar[Dict[str, int]] = {'wh': 1, 'f': 1, 'c': 1}

  def scale(self, scale: Array) -> 'Camera':
    return self.replace(wh=self.wh * scale, f=self.f * scale, c=self.c * scale)

  def K(self) -> Array:
    K = jnp.broadcast_to(
        jnp.eye(3, dtype=self.f.dtype), (*self.shape, 3, 3)
    )
    K = K.at[..., 0, 0].set(self.f[..., 0])
    K = K.at[..., 1, 1].set(self.f[..., 1])
    K = K.at[..., 0, 2].set(self.c[..., 0])
    return K.at[..., 1, 2].set(self.c[..., 1])

  def in_image(self, p2d: Array) -> Array:
    return jnp.all((p2d >= 0) & (p2d < self.wh[..., None, :]), -1)

  def project(self, p3d: Array) -> Tuple[Array, Array]:
    z = p3d[..., -1]
    valid = z >= self.eps
    z = z.clip(min=self.eps)[..., None]
    return p3d[..., :-1] / z, valid

  def denormalize(self, p2d: Array) -> Array:
    return p2d * self.f[..., None, :] + self.c[..., None, :]

  def normalize(self, p2d: Array) -> Array:
    return (p2d - self.c[..., None, :]) / self.f[..., None, :]

  def world2image(self, p3d: Array) -> Tuple[Array, Array]:
    p2d, visible = self.project(p3d)
    p2d = self.denormalize(p2d)
    valid = visible & self.in_image(p2d)
    return p2d, valid


@struct.dataclass
class FisheyeCamera(_Batched):
  """Pinhole camera with 3-coefficient radial (theta-polynomial) distortion.

  Reference behavior: snap/utils/geometry.py:224-280.
  """

  wh: Array
  f: Array
  c: Array
  k_radial: Array  # [..., 3]
  max_fov: Array  # [...] radians

  eps: ClassVar[float] = 1e-3
  _event_ndims: ClassVar[Dict[str, int]] = {
      'wh': 1, 'f': 1, 'c': 1, 'k_radial': 1, 'max_fov': 0,
  }

  @classmethod
  def from_dict(cls, intrinsics: Mapping[str, Any]) -> 'FisheyeCamera':
    K = jnp.asarray(intrinsics['K'])
    wh = jnp.stack(
        [jnp.asarray(intrinsics['image_width']),
         jnp.asarray(intrinsics['image_height'])], -1
    ).astype(K.dtype)
    f = K[..., (0, 1), (0, 1)]
    c = K[..., (0, 1), (2, 2)]
    k_radial = jnp.asarray(intrinsics['distortion']['radial'])
    max_fov = intrinsics.get('maxfov')
    if max_fov is None:
      max_fov = jnp.full(wh.shape[:-1], np.deg2rad(115.0), K.dtype)
    return cls(wh=wh, f=f, c=c, k_radial=k_radial, max_fov=jnp.asarray(max_fov))

  # Shared pinhole pieces (broadcast-compatible with Camera).
  scale_wh = Camera.scale
  in_image = Camera.in_image
  project = Camera.project
  denormalize = Camera.denormalize
  normalize = Camera.normalize
  K = Camera.K

  def scale(self, scale: Array) -> 'FisheyeCamera':
    return self.replace(wh=self.wh * scale, f=self.f * scale, c=self.c * scale)

  def distort_points(self, p2d: Array) -> Tuple[Array, Array]:
    # Numerics-parity with snap/utils/geometry.py:261-280 (the camera model
    # the dataset's intrinsics are calibrated against): theta-polynomial
    # distortion, eps-guarded center, max-FoV validity. Pinned by
    # tests/test_geometry.py round-trip tests.
    radius2 = jnp.sum(p2d**2, axis=-1)
    in_center = radius2 < self.eps**2
    radius = jnp.sqrt(jnp.where(in_center, self.eps**2, radius2))
    theta = jnp.arctan(radius)
    theta2 = theta**2
    k = self.k_radial
    # Horner evaluation of k0*t^2 + k1*t^4 + k2*t^6.
    offset = theta2 * (
        k[..., None, 0] + theta2 * (k[..., None, 1] + theta2 * k[..., None, 2])
    )
    dist = (offset + 1) * theta / radius
    dist = jnp.where(in_center, 1.0, dist)
    p2d_dist = p2d * dist[..., None]
    max_radius = jnp.tan(0.5 * self.max_fov)[..., None]
    valid = in_center | ((radius < max_radius) & (dist > 0))
    return p2d_dist, valid

  def world2image(self, p3d: Array) -> Tuple[Array, Array]:
    p2d, visible = self.project(p3d)
    p2d, valid = self.distort_points(p2d)
    p2d = self.denormalize(p2d)
    valid = visible & valid & self.in_image(p2d)
    return p2d, valid


CameraND = Union[Camera, FisheyeCamera]
