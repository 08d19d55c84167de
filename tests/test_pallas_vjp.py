"""Gradient conformance for the Pallas plane-sweep custom VJP
(interpret mode, CPU; compiled numerics are pinned on hardware by
tests_tpu/test_compiled_conformance.py).

The training path (ops/cost_volume.py::plane_sweep_cost_volume_train)
routes banded tiers through the hand-written backward kernel
(ops/pallas/cost_volume_vjp.py); its gradients must match the
differentiable gather path — the oracle whose VJP is derived by JAX from
torch-conformant grid_sample — for every tier and for the full ladder.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from dvmvs_tpu.ops.cost_volume import (
    inverse_depth_planes,
    plane_sweep_cost_volume,
    plane_sweep_cost_volume_train,
)
from dvmvs_tpu.ops.pallas.cost_volume_kernel import (
    build_plane_matrices,
    max_row_span,
)
from dvmvs_tpu.ops.pallas.cost_volume_vjp import make_diff_plane_sweep

P = 16


def _pose(euler_deg, t):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("xyz", euler_deg, degrees=True).as_matrix()
    pose[:3, 3] = t
    return pose


def _K(w, h):
    return np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)


@pytest.mark.parametrize(
    "euler,t,band,C",
    [
        ([0, 0, 0], [0.12, 0.0, 0.0], 8, 8),      # lateral baseline
        ([2, 3, 1], [0.12, 0.03, 0.02], 16, 8),   # typical keyframe motion
        ([2, 3, 1], [0.12, 0.03, 0.02], 16, 5),   # channel padding path
        ([0, 0, 14], [0.1, 0.0, 0.05], 32, 8),    # strong roll tier
    ],
)
def test_vjp_matches_gather_grads(rng, euler, t, band, C):
    H, W = 64, 64
    ref = rng.randn(H, W, C).astype(np.float32)
    meas = rng.randn(H, W, C).astype(np.float32)
    cot = rng.randn(P, H, W).astype(np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose(euler, t)
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(_K(W, H)), invd)
    assert float(max_row_span(M, H, W, band)) <= band

    f = make_diff_plane_sweep(band, interpret=True)

    def loss_pallas(r, m):
        return jnp.sum(f(r, m, M) * cot)

    def loss_gather(r, m):
        cost = plane_sweep_cost_volume(
            r[None], m[None], jnp.asarray(pose1)[None], jnp.asarray(pose2)[None],
            jnp.asarray(_K(W, H))[None], 0.25, 20.0, P, plane_chunk=4,
        )[0].transpose(2, 0, 1)
        return jnp.sum(cost * cot)

    val_p, (dref_p, dmeas_p) = jax.value_and_grad(loss_pallas, (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))
    val_g, (dref_g, dmeas_g) = jax.value_and_grad(loss_gather, (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))

    np.testing.assert_allclose(float(val_p), float(val_g), rtol=1e-4)
    scale = np.abs(np.asarray(dref_g)).max()
    np.testing.assert_allclose(
        np.asarray(dref_p), np.asarray(dref_g), atol=2e-4 * max(scale, 1.0))
    scale = np.abs(np.asarray(dmeas_g)).max()
    np.testing.assert_allclose(
        np.asarray(dmeas_p), np.asarray(dmeas_g), atol=2e-4 * max(scale, 1.0))


@pytest.mark.parametrize(
    "euler,t",
    [
        ([0, 0, 0], [0.12, 0.0, 0.0]),     # easy: tiny span
        ([0, 0, 35], [0.1, 0.0, 0.0]),     # extreme roll: span > 64
        ([8, 0, 25], [0.15, 0.05, 0.1]),   # strong roll tier
    ],
)
def test_dyn_vjp_matches_gather_grads(rng, euler, t):
    """The dynamic-trip VJP pair (forward pallas_plane_sweep_dyn + the
    chunked backward kernel) must match the gather path's values and
    gradients for ANY geometry — it replaces the training ladder's gather
    rung entirely."""
    from dvmvs_tpu.ops.pallas.cost_volume_vjp import make_diff_plane_sweep_dyn

    H, W, C = 64, 64, 5  # odd C: channel-padding path
    ref = rng.randn(H, W, C).astype(np.float32)
    meas = rng.randn(H, W, C).astype(np.float32)
    cot = rng.randn(P, H, W).astype(np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = _pose(euler, t)
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(_K(W, H)), invd)

    f = make_diff_plane_sweep_dyn(interpret=True)

    def loss_pallas(r, m):
        return jnp.sum(f(r, m, M) * cot)

    def loss_gather(r, m):
        cost = plane_sweep_cost_volume(
            r[None], m[None], jnp.asarray(pose1)[None], jnp.asarray(pose2)[None],
            jnp.asarray(_K(W, H))[None], 0.25, 20.0, P, plane_chunk=4,
        )[0].transpose(2, 0, 1)
        return jnp.sum(cost * cot)

    val_p, (dref_p, dmeas_p) = jax.value_and_grad(loss_pallas, (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))
    val_g, (dref_g, dmeas_g) = jax.value_and_grad(loss_gather, (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))

    np.testing.assert_allclose(float(val_p), float(val_g), rtol=1e-4)
    for got, want in ((dref_p, dref_g), (dmeas_p, dmeas_g)):
        scale = np.abs(np.asarray(want)).max()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4 * max(scale, 1.0))


def test_train_ladder_per_element_mixed_geometry(rng):
    """A batch mixing an easy pair with an EXTREME-rotation pair (span >
    the largest band tier): the per-element switch must route one element
    to a band tier and the other to the dynamic-trip rung, with values and
    gradients matching the gather path for both."""
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import BAND_TIERS, max_row_spans

    H = W = 128  # the largest tier (64) must NOT cover the full height
    C = 8
    B = 2
    ref = rng.randn(B, H, W, C).astype(np.float32)
    meas = rng.randn(B, H, W, C).astype(np.float32)
    cot = rng.randn(B, H, W, P).astype(np.float32)
    poses_ref = np.stack([np.eye(4, dtype=np.float32)] * B)
    poses_meas = np.stack([
        _pose([1, 2, 0.5], [0.1, 0.02, 0.0]),   # easy
        _pose([0, 0, 35], [0.1, 0.0, 0.0]),     # span > 64 -> dyn rung
    ])
    Ks = np.stack([_K(W, H)] * B)

    # precondition: element 1 really exceeds every tier
    invd = inverse_depth_planes(0.25, 20.0, P)
    M1 = build_plane_matrices(
        jnp.asarray(poses_ref[1]), jnp.asarray(poses_meas[1]),
        jnp.asarray(Ks[1]), invd)
    tiers = tuple(b for b in BAND_TIERS if b <= H)
    assert float(max_row_spans(M1, H, W, tiers)[-1]) > tiers[-1]

    def loss(r, m, method):
        cost = plane_sweep_cost_volume_train(
            r, m, jnp.asarray(poses_ref), jnp.asarray(poses_meas),
            jnp.asarray(Ks), 0.25, 20.0, P, plane_chunk=4, method=method)
        return jnp.sum(cost * cot)

    val_p, (dr_p, dm_p) = jax.value_and_grad(
        lambda r, m: loss(r, m, "pallas_interpret"), (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))
    val_g, (dr_g, dm_g) = jax.value_and_grad(
        lambda r, m: loss(r, m, "gather"), (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))

    np.testing.assert_allclose(float(val_p), float(val_g), rtol=1e-3)
    for got, want in ((dr_p, dr_g), (dm_p, dm_g)):
        scale = np.abs(np.asarray(want)).max()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4 * max(scale, 1.0))


def test_plane_matrix_cotangent_is_zero(rng):
    H = W = 32
    C = 8
    ref = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    meas = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    invd = inverse_depth_planes(0.25, 20.0, P)
    M = build_plane_matrices(
        jnp.asarray(np.eye(4, dtype=np.float32)),
        jnp.asarray(_pose([1, 1, 0], [0.1, 0, 0])), jnp.asarray(_K(W, H)), invd)
    f = make_diff_plane_sweep(8, interpret=True)
    dM = jax.grad(lambda m: jnp.sum(f(ref, meas, m)))(M)
    assert not np.isnan(np.asarray(dM)).any()
    np.testing.assert_array_equal(np.asarray(dM), 0.0)


def test_train_ladder_pallas_interpret_matches_gather(rng):
    """Full training entry point, batch of 2 with different geometries:
    values and gradients of the Pallas-VJP ladder == gather path."""
    H = W = 32
    C = 8
    B = 2
    ref = rng.randn(B, H, W, C).astype(np.float32)
    meas = rng.randn(B, H, W, C).astype(np.float32)
    cot = rng.randn(B, H, W, P).astype(np.float32)
    poses_ref = np.stack([np.eye(4, dtype=np.float32)] * B)
    poses_meas = np.stack([
        _pose([1, 2, 0.5], [0.1, 0.02, 0.0]),
        _pose([0, 1, 3], [0.05, 0.0, 0.08]),
    ])
    Ks = np.stack([_K(W, H)] * B)

    def loss(r, m, method):
        cost = plane_sweep_cost_volume_train(
            r, m, jnp.asarray(poses_ref), jnp.asarray(poses_meas),
            jnp.asarray(Ks), 0.25, 20.0, P, plane_chunk=4, method=method)
        return jnp.sum(cost * cot)

    val_p, (dr_p, dm_p) = jax.value_and_grad(
        lambda r, m: loss(r, m, "pallas_interpret"), (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))
    val_g, (dr_g, dm_g) = jax.value_and_grad(
        lambda r, m: loss(r, m, "gather"), (0, 1))(
        jnp.asarray(ref), jnp.asarray(meas))

    # the scalar is a ~500k-term sum with cancellation; per-element grads
    # below carry the tight check
    np.testing.assert_allclose(float(val_p), float(val_g), rtol=1e-3)
    for got, want in ((dr_p, dr_g), (dm_p, dm_g)):
        scale = np.abs(np.asarray(want)).max()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4 * max(scale, 1.0))
