"""Pallas plane-sweep kernel conformance (interpret mode, CPU)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from dvmvs_tpu.ops.cost_volume import (
    inverse_depth_planes,
    plane_sweep_cost_volume,
)
from dvmvs_tpu.ops.pallas.cost_volume_kernel import (
    BAND_H,
    build_plane_matrices,
    max_row_span,
    pallas_plane_sweep,
)

H, W, C, P = 32, 64, 8, 16


def _pose(euler_deg, t):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("xyz", euler_deg, degrees=True).as_matrix()
    pose[:3, 3] = t
    return pose


def _K():
    return np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)


@pytest.mark.parametrize(
    "euler,t",
    [
        ([0, 0, 0], [0.12, 0.0, 0.0]),       # pure lateral baseline
        ([2, 3, 1], [0.12, 0.03, 0.02]),     # typical keyframe motion
        ([0, 0, 4], [0.05, 0.0, 0.1]),       # roll + forward
    ],
)
def test_kernel_matches_gather_reference(rng, euler, t):
    ref = rng.randn(H, W, C).astype(np.float32)
    meas = rng.randn(H, W, C).astype(np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose(euler, t)
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(_K()), invd)
    assert float(max_row_span(M, H, W)) <= BAND_H

    got = pallas_plane_sweep(jnp.asarray(ref), jnp.asarray(meas), M, interpret=True)
    want = plane_sweep_cost_volume(
        jnp.asarray(ref)[None], jnp.asarray(meas)[None],
        jnp.asarray(pose1)[None], jnp.asarray(pose2)[None],
        jnp.asarray(_K())[None], 0.25, 20.0, P, plane_chunk=4,
    )[0].transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


@pytest.mark.parametrize("euler,t,band", [
    ([0, 0, 14], [0.1, 0.0, 0.05], 32),   # strong roll -> span in (16, 32]
    ([8, 0, 25], [0.15, 0.05, 0.1], 64),  # extreme roll -> span in (32, 64]
])
def test_large_band_tiers_match_gather_reference(rng, euler, t, band):
    """The 32/64 band tiers (runtime ladder for rotation-heavy real
    trajectories, e.g. hololens keyframes with median row-span 27) must stay
    exact."""
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import max_row_spans

    H2, W2 = 64, 64  # band-64 needs H >= 64
    K2 = np.array([[40.0, 0, W2 / 2], [0, 40.0, H2 / 2], [0, 0, 1]], np.float32)
    ref = rng.randn(H2, W2, C).astype(np.float32)
    meas = rng.randn(H2, W2, C).astype(np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose(euler, t)
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(K2), invd)
    span_smaller, span_this = (
        float(s) for s in max_row_spans(M, H2, W2, (band // 2, band)))
    assert span_smaller > band // 2, "geometry too easy for this tier"
    assert span_this <= band

    got = pallas_plane_sweep(
        jnp.asarray(ref), jnp.asarray(meas), M, interpret=True, band_h=band)
    want = plane_sweep_cost_volume(
        jnp.asarray(ref)[None], jnp.asarray(meas)[None],
        jnp.asarray(pose1)[None], jnp.asarray(pose2)[None],
        jnp.asarray(K2)[None], 0.25, 20.0, P, plane_chunk=4,
    )[0].transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


@pytest.mark.parametrize("euler,t", [
    ([0, 0, 0], [0.12, 0.0, 0.0]),       # easy: tiny span
    ([0, 0, 35], [0.1, 0.0, 0.0]),       # extreme roll: span > 64
    ([0, 120, 0], [0.1, 0.0, 2.0]),      # degenerate: most samples behind
])
def test_dynamic_trip_kernel_exact_any_geometry(rng, euler, t):
    """The dynamic-trip kernel (absolute 8-row-aligned predicated chunks)
    must match the gather reference for ANY geometry — it replaces the
    gather fallback entirely."""
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import (
        pallas_plane_sweep_multiview_dyn,
    )

    H2, W2 = 64, 64
    K2 = np.array([[40.0, 0, W2 / 2], [0, 40.0, H2 / 2], [0, 0, 1]], np.float32)
    ref = rng.randn(H2, W2, C).astype(np.float32)
    meas = np.stack([rng.randn(H2, W2, C).astype(np.float32) for _ in range(2)])
    pose1 = np.eye(4, dtype=np.float32)
    poses = [_pose(euler, t), _pose([1, 2, 0.5], [0.1, 0.02, 0.0])]
    invd = inverse_depth_planes(0.25, 20.0, P)
    Ms = jnp.stack([
        build_plane_matrices(jnp.asarray(pose1), jnp.asarray(p), jnp.asarray(K2), invd)
        for p in poses])
    weights = jnp.asarray([0.6, 0.4])
    got = pallas_plane_sweep_multiview_dyn(
        jnp.asarray(ref), jnp.asarray(meas), Ms, weights, interpret=True)
    want = 0.0
    for w, m, p in zip([0.6, 0.4], meas, poses):
        cv = plane_sweep_cost_volume(
            jnp.asarray(ref)[None], jnp.asarray(m)[None],
            jnp.asarray(pose1)[None], jnp.asarray(p)[None],
            jnp.asarray(K2)[None], 0.25, 20.0, P, plane_chunk=4,
        )[0].transpose(2, 0, 1)
        want = want + w * np.asarray(cv)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


@pytest.mark.parametrize("euler,t", [
    ([0, 0, 0], [0.12, 0.0, 0.0]),       # easy: tiny span
    ([0, 0, 35], [0.1, 0.0, 0.0]),       # extreme roll: span > 64
])
def test_single_view_dyn_kernel_exact_any_geometry(rng, euler, t):
    """Single-view dynamic-trip kernel (the training ladder's last rung)
    must match the gather reference for ANY geometry."""
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import pallas_plane_sweep_dyn

    H2, W2 = 64, 64
    K2 = np.array([[40.0, 0, W2 / 2], [0, 40.0, H2 / 2], [0, 0, 1]], np.float32)
    ref = rng.randn(H2, W2, C).astype(np.float32)
    meas = rng.randn(H2, W2, C).astype(np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose(euler, t)
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(K2), invd)
    got = pallas_plane_sweep_dyn(
        jnp.asarray(ref), jnp.asarray(meas), M, interpret=True)
    want = plane_sweep_cost_volume(
        jnp.asarray(ref)[None], jnp.asarray(meas)[None],
        jnp.asarray(pose1)[None], jnp.asarray(pose2)[None],
        jnp.asarray(K2)[None], 0.25, 20.0, P, plane_chunk=4,
    )[0].transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_span_check_flags_extreme_roll():
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose([0, 0, 35], [0.1, 0, 0])  # 35-degree roll
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(_K()), invd)
    assert float(max_row_span(M, H, W)) > BAND_H


def test_plane_matrices_reproduce_reference_warp():
    """M_p @ [x,y,1] must equal K_R_Kinv uv + Kt/depth (dvmvs/utils.py:68)."""
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose([1, 2, 0.5], [0.1, 0.02, 0.01])
    K = _K()
    invd = np.asarray(inverse_depth_planes(0.25, 20.0, P))
    M = np.asarray(build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(K), jnp.asarray(invd)))

    ext = np.linalg.inv(pose2) @ pose1
    A = K @ ext[:3, :3] @ np.linalg.inv(K)
    Kt = K @ ext[:3, 3:4]
    uv = np.array([[13.0], [7.0], [1.0]], np.float32)
    for p in range(0, P, 5):
        want = A @ uv + Kt * invd[p]
        got = M[p] @ uv
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_multiview_kernel_matches_per_view_mean(rng):
    """Fused multi-view kernel (interpret mode) == weighted mean of
    single-view sweeps."""
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import pallas_plane_sweep_multiview

    ref = rng.randn(H, W, C).astype(np.float32)
    meas = [rng.randn(H, W, C).astype(np.float32) for _ in range(2)]
    pose1 = np.eye(4, dtype=np.float32)
    poses = [_pose([1, 2, 0.5], [0.1, 0.02, 0.0]), _pose([0, 1, 1], [-0.08, 0.0, 0.03])]
    invd = inverse_depth_planes(0.25, 20.0, P)
    Ms = jnp.stack([
        build_plane_matrices(jnp.asarray(pose1), jnp.asarray(p), jnp.asarray(_K()), invd)
        for p in poses])
    weights = jnp.asarray([0.7, 0.3])

    got = pallas_plane_sweep_multiview(
        jnp.asarray(ref), jnp.asarray(np.stack(meas)), Ms, weights, interpret=True)
    want = 0.0
    for w, m, M in zip([0.7, 0.3], meas, Ms):
        want = want + w * np.asarray(
            pallas_plane_sweep(jnp.asarray(ref), jnp.asarray(m), M, interpret=True))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
