import numpy as np
import jax.numpy as jnp

from dvmvs_tpu.ops import geometry
from tests.conftest import random_pose


def test_pose_distance_identity():
    eye = np.eye(4)
    c, r, t = geometry.pose_distance_np(eye, eye)
    assert c == 0.0 and r == 0.0 and t == 0.0


def test_pose_distance_pure_translation():
    a = np.eye(4)
    b = np.eye(4)
    b[:3, 3] = [3.0, 0.0, 4.0]
    c, r, t = geometry.pose_distance_np(a, b)
    assert abs(t - 5.0) < 1e-12
    assert r < 1e-7
    assert abs(c - 5.0) < 1e-9


def test_pose_distance_rotation_180():
    # 180-degree rotation about z: trace(R) = -1 -> R_measure = sqrt(2*(1+1/3))
    a = np.eye(4)
    b = np.eye(4)
    b[0, 0] = b[1, 1] = -1.0
    _, r, t = geometry.pose_distance_np(a, b)
    assert abs(r - np.sqrt(2 * (1 + 1.0 / 3.0))) < 1e-12
    assert t == 0.0


def test_pose_distance_jnp_matches_np(rng):
    a, b = random_pose(rng), random_pose(rng)
    expect = geometry.pose_distance_np(a, b)
    got = geometry.pose_distance(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose([float(g) for g in got], expect, rtol=1e-5)


def test_warp_grid_layout():
    g = geometry.make_warp_grid(4, 3)
    assert g.shape == (3, 12)
    # first row of pixels: x = 0..3, y = 0
    np.testing.assert_array_equal(g[0, :4], [0, 1, 2, 3])
    np.testing.assert_array_equal(g[1, :4], [0, 0, 0, 0])
    np.testing.assert_array_equal(g[2], np.ones(12))


def test_depth_to_3d_project_roundtrip(rng):
    B, H, W = 2, 8, 10
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(B, H, W)).astype(np.float32))
    K = np.array([[50.0, 0, 4.5], [0, 55.0, 3.5], [0, 0, 1]], dtype=np.float32)
    K = jnp.asarray(np.stack([K] * B))
    pts = geometry.depth_to_3d(depth, K)
    assert pts.shape == (B, H, W, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(depth), rtol=1e-6)
    uv = geometry.project_points(pts, K)
    xg, yg = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_allclose(np.asarray(uv[..., 0]), np.broadcast_to(xg, (B, H, W)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), np.broadcast_to(yg, (B, H, W)), atol=1e-3)


def test_transform_points_roundtrip(rng):
    pose = random_pose(rng)
    pts = jnp.asarray(rng.randn(1, 17, 3).astype(np.float32))
    fwd = geometry.transform_points(jnp.asarray(pose[None].astype(np.float32)), pts)
    back = geometry.transform_points(jnp.asarray(np.linalg.inv(pose)[None].astype(np.float32)), fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_project_points_zero_z_guard():
    # |z| <= 1e-8 must not divide (kornia convert_points_from_homogeneous)
    pts = jnp.asarray(np.array([[[2.0, 3.0, 0.0]]], dtype=np.float32))
    K = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    uv = geometry.project_points(pts, K)
    np.testing.assert_allclose(np.asarray(uv), [[[2.0, 3.0]]], rtol=1e-6)


def test_is_pose_available():
    good = np.eye(4)
    assert geometry.is_pose_available_np(good)
    bad = good.copy()
    bad[1, 2] = np.nan
    assert not geometry.is_pose_available_np(bad)
    bad[1, 2] = np.inf
    assert not geometry.is_pose_available_np(bad)
