"""Unit tests for snap_tpu.utils.geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snap_tpu.utils import geometry


def random_rotmat3d(rng: np.random.Generator, shape=()) -> np.ndarray:
  q = rng.normal(size=(*shape, 4))
  q /= np.linalg.norm(q, axis=-1, keepdims=True)
  w, x, y, z = np.moveaxis(q, -1, 0)
  R = np.stack([
      1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y),
      2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x),
      2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2),
  ], axis=-1).reshape(*shape, 3, 3)
  return R


class TestTransform2D:

  def test_compose_inverse_roundtrip(self):
    rng = np.random.default_rng(0)
    t = geometry.Transform2D.from_radians(
        jnp.asarray(rng.uniform(-np.pi, np.pi, (5,))),
        jnp.asarray(rng.normal(size=(5, 2))),
    )
    eye = t @ t.inv
    np.testing.assert_allclose(eye.angle, 0, atol=1e-6)
    np.testing.assert_allclose(eye.t, 0, atol=1e-6)

  def test_transform_points(self):
    t = geometry.Transform2D.from_radians(jnp.pi / 2, jnp.array([1.0, 2.0]))
    p = jnp.array([[1.0, 0.0]])
    out = t @ p
    np.testing.assert_allclose(out, [[1.0, 3.0]], atol=1e-6)

  def test_matrix_matches_compose(self):
    rng = np.random.default_rng(1)
    a = geometry.Transform2D.from_radians(
        rng.uniform(-3, 3), jnp.asarray(rng.normal(size=2)))
    b = geometry.Transform2D.from_radians(
        rng.uniform(-3, 3), jnp.asarray(rng.normal(size=2)))
    mat = a.to_3x3matrix() @ b.to_3x3matrix()
    np.testing.assert_allclose(
        (a @ b).to_3x3matrix(), mat, atol=1e-6)

  def test_magnitude(self):
    t = geometry.Transform2D.from_radians(
        jnp.deg2rad(jnp.array([10.0, 350.0])), jnp.array([[3.0, 4.0]] * 2))
    dr, dt = t.magnitude()
    np.testing.assert_allclose(dr, [10.0, 10.0], atol=1e-4)
    np.testing.assert_allclose(dt, [5.0, 5.0], atol=1e-6)

  def test_from_R_roundtrip(self):
    angle = jnp.array(0.7)
    t = geometry.Transform2D.from_radians(angle, jnp.zeros(2))
    t2 = geometry.Transform2D.from_R(t.R, t.t)
    np.testing.assert_allclose(t2.angle, angle, atol=1e-6)

  def test_indexing_and_shape(self):
    t = geometry.Transform2D.from_radians(
        jnp.zeros((4, 3)), jnp.zeros((4, 3, 2)))
    assert t.shape == (4, 3)
    assert t[0].shape == (3,)
    assert t[..., None].shape == (4, 3, 1)
    assert t[:, 1].shape == (4,)
    assert len(t) == 4

  def test_pytree_flatten(self):
    t = geometry.Transform2D.from_radians(jnp.zeros(3), jnp.zeros((3, 2)))
    leaves = jax.tree_util.tree_leaves(t)
    assert len(leaves) == 2
    t2 = jax.tree_util.tree_map(lambda x: x + 1, t)
    assert isinstance(t2, geometry.Transform2D)


class TestTransform3D:

  def test_compose_inverse_roundtrip(self):
    rng = np.random.default_rng(2)
    t = geometry.Transform3D.from_Rt(
        jnp.asarray(random_rotmat3d(rng, (4,))),
        jnp.asarray(rng.normal(size=(4, 3))),
    )
    eye = t @ t.inv
    np.testing.assert_allclose(eye.R, np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(eye.t, 0, atol=1e-6)

  def test_transform_matches_matrix(self):
    rng = np.random.default_rng(3)
    t = geometry.Transform3D.from_Rt(
        jnp.asarray(random_rotmat3d(rng)), jnp.asarray(rng.normal(size=3)))
    p = jnp.asarray(rng.normal(size=(7, 3)))
    hom = jnp.concatenate([p, jnp.ones((7, 1))], -1)
    expected = (t.to_4x4matrix() @ hom.T).T[:, :3]
    np.testing.assert_allclose(t @ p, expected, atol=1e-5)

  def test_magnitude(self):
    angle = np.deg2rad(30.0)
    R = np.array([
        [np.cos(angle), -np.sin(angle), 0],
        [np.sin(angle), np.cos(angle), 0],
        [0, 0, 1.0],
    ])
    t = geometry.Transform3D.from_Rt(jnp.asarray(R), jnp.array([0.0, 3.0, 4.0]))
    dr, dt = t.magnitude()
    np.testing.assert_allclose(dr, 30.0, atol=1e-4)
    np.testing.assert_allclose(dt, 5.0, atol=1e-6)

  def test_2d_3d_conversion(self):
    t2 = geometry.Transform2D.from_radians(jnp.array(0.3), jnp.array([1., 2.]))
    t3 = geometry.Transform3D.from_Transform2D(t2, z=5.0)
    back = geometry.Transform2D.from_Transform3D(t3)
    np.testing.assert_allclose(back.angle, 0.3, atol=1e-6)
    np.testing.assert_allclose(back.t, [1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(t3.t[-1], 5.0)


class TestCamera:

  def make_camera(self, batch=()):
    return geometry.Camera(
        wh=jnp.broadcast_to(jnp.array([640.0, 480.0]), (*batch, 2)),
        f=jnp.broadcast_to(jnp.array([500.0, 500.0]), (*batch, 2)),
        c=jnp.broadcast_to(jnp.array([320.0, 240.0]), (*batch, 2)),
    )

  def test_project_center(self):
    cam = self.make_camera()
    p2d, valid = cam.world2image(jnp.array([[0.0, 0.0, 10.0]]))
    np.testing.assert_allclose(p2d, [[320.0, 240.0]])
    assert bool(valid[0])

  def test_behind_camera_invalid(self):
    cam = self.make_camera()
    _, valid = cam.world2image(jnp.array([[0.0, 0.0, -1.0]]))
    assert not bool(valid[0])

  def test_normalize_denormalize_roundtrip(self):
    cam = self.make_camera()
    p = jnp.array([[100.0, 50.0], [12.0, 300.0]])
    np.testing.assert_allclose(
        cam.denormalize(cam.normalize(p)), p, atol=1e-3)

  def test_scale(self):
    cam = self.make_camera().scale(jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(cam.wh, [320.0, 240.0])
    np.testing.assert_allclose(cam.f, [250.0, 250.0])

  def test_batched(self):
    cam = self.make_camera(batch=(3,))
    p3d = jnp.broadcast_to(jnp.array([0.0, 0.0, 5.0]), (3, 4, 3))
    p2d, valid = cam.world2image(p3d)
    assert p2d.shape == (3, 4, 2)
    assert valid.shape == (3, 4)
    assert bool(valid.all())

  def test_K_matrix(self):
    K = self.make_camera().K()
    np.testing.assert_allclose(
        K, [[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])


class TestFisheyeCamera:

  def make_camera(self):
    return geometry.FisheyeCamera(
        wh=jnp.array([640.0, 480.0]),
        f=jnp.array([300.0, 300.0]),
        c=jnp.array([320.0, 240.0]),
        k_radial=jnp.array([0.05, 0.01, 0.001]),
        max_fov=jnp.asarray(np.deg2rad(115.0)),
    )

  def test_center_is_undistorted(self):
    cam = self.make_camera()
    p2d, valid = cam.world2image(jnp.array([[0.0, 0.0, 2.0]]))
    np.testing.assert_allclose(p2d, [[320.0, 240.0]], atol=1e-3)
    assert bool(valid[0])

  def test_zero_coeffs_matches_pinhole(self):
    fisheye = geometry.FisheyeCamera(
        wh=jnp.array([640.0, 480.0]),
        f=jnp.array([300.0, 300.0]),
        c=jnp.array([320.0, 240.0]),
        k_radial=jnp.zeros(3),
        max_fov=jnp.asarray(np.deg2rad(170.0)),
    )
    # With zero radial coefficients, distortion = arctan(r)/r (pure equidistant
    # fisheye): points near the optical axis match the pinhole projection.
    p3d = jnp.array([[0.01, -0.02, 4.0]])
    p2d, _ = fisheye.world2image(p3d)
    pin = geometry.Camera(wh=fisheye.wh, f=fisheye.f, c=fisheye.c)
    p2d_pin, _ = pin.world2image(p3d)
    np.testing.assert_allclose(p2d, p2d_pin, atol=1e-2)

  def test_from_dict(self):
    K = np.array([[300.0, 0, 320.0], [0, 300.0, 240.0], [0, 0, 1]])
    cam = geometry.FisheyeCamera.from_dict({
        'K': K,
        'image_width': np.asarray(640.0),
        'image_height': np.asarray(480.0),
        'distortion': {'radial': np.zeros(3)},
    })
    np.testing.assert_allclose(cam.f, [300.0, 300.0])
    np.testing.assert_allclose(cam.c, [320.0, 240.0])
    np.testing.assert_allclose(cam.max_fov, np.deg2rad(115.0))

  def test_batched_indexing(self):
    cam = self.make_camera()
    cams = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), cam)
    assert cams.shape == (4,)
    assert cams[0].shape == ()


def test_jit_through_transforms():
  @jax.jit
  def fn(t: geometry.Transform2D, p):
    return (t @ t) @ p

  t = geometry.Transform2D.from_radians(jnp.array(0.1), jnp.array([1.0, 0.0]))
  out = fn(t, jnp.zeros((1, 2)))
  assert out.shape == (1, 2)


def test_vmap_through_transforms():
  ts = geometry.Transform2D.from_radians(jnp.zeros(5), jnp.ones((5, 2)))
  out = jax.vmap(lambda t: t @ jnp.zeros((1, 2)))(ts)
  np.testing.assert_allclose(out, np.ones((5, 1, 2)))
