"""Mosaic-COMPILED kernel numerics vs the gather oracle, on real TPU.

Interpret-mode tests (tests/test_pallas_cost_volume.py,
tests/test_pallas_vjp.py) validate the kernel logic; this tier validates
the LOWERING — a Mosaic bug on an untested band tier / x_tiles setting /
the dynamic-trip rung would otherwise ship silently (round-2 verdict,
"What's weak" #3).

Shapes are the production cost-volume resolution (128x160, C=32, 64
planes). Geometry per band tier is a roll+translation chosen at runtime so
the measured row-span lands strictly inside that tier (above the previous
rung), i.e. each parametrization genuinely exercises its tier.

Tolerance note: with --xla_allow_excess_precision (this fleet's default)
f32 contractions run bf16 passes on the MXU in BOTH implementations, but
through different operation orders; the observed max |diff| is ~2e-3
relative over 1.3M elements (bf16 mantissa is 8 bits). The asserts bound
the max at 4e-3*scale and the MEAN at 3e-4*scale — a lowering bug corrupts
whole tiles at O(1) and trips the mean bound regardless.
"""

import functools

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
    BAND_TIERS,
    build_plane_matrices,
    max_row_spans,
    pallas_plane_sweep,
    pallas_plane_sweep_multiview,
    pallas_plane_sweep_multiview_dyn,
)
from dvmvs_tpu.ops.pallas.cost_volume_vjp import make_diff_plane_sweep

H, W, C, P = 128, 160, 32, 64
MIN_D, MAX_D = 0.25, 20.0


def _pose(euler_deg, t):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler(
        "xyz", euler_deg, degrees=True).as_matrix()
    pose[:3, 3] = t
    return pose


def _K():
    return np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
                    np.float32)


@functools.lru_cache(maxsize=None)
def _spans_fn(x_tiles):
    tiers = tuple(BAND_TIERS)
    return jax.jit(lambda M: jnp.stack(
        max_row_spans(M, H, W, tiers, x_tiles=x_tiles)))


def _geometry_for_tier(band_h, x_tiles):
    """Roll+lateral motion whose measured span lands in (prev_tier, band_h]
    for this x_tiles setting. Searches a roll grid at runtime so the test
    self-verifies it exercises the tier it claims to."""
    tiers = list(BAND_TIERS)
    prev = 0 if band_h == tiers[0] else tiers[tiers.index(band_h) - 1]
    invd = inverse_depth_planes(MIN_D, MAX_D, P)
    for roll in np.arange(0.0, 30.0, 0.25):
        pose2 = _pose([0.5, 1.0, roll], [0.10, 0.02, 0.01])
        M = build_plane_matrices(
            jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(pose2),
            jnp.asarray(_K()), invd)
        spans = np.asarray(_spans_fn(x_tiles)(M))
        span = float(spans[tiers.index(band_h)])
        if prev < span <= band_h:
            return pose2, M
    raise AssertionError(
        f"no geometry found for tier {band_h} (x_tiles={x_tiles})")


def _gather_oracle(ref, meas, pose2):
    return plane_sweep_cost_volume(
        jnp.asarray(ref)[None], jnp.asarray(meas)[None],
        jnp.asarray(np.eye(4, dtype=np.float32))[None], jnp.asarray(pose2)[None],
        jnp.asarray(_K())[None], MIN_D, MAX_D, P,
    )[0].transpose(2, 0, 1)  # (P, H, W)


def _assert_close(got, want, tol=4e-3):
    """Max error bounded at bf16-pass scale; MEAN error bounded much
    tighter — a Mosaic lowering bug corrupts whole tiles at O(1), which
    the mean bound catches even when the max bound would not."""
    got, want = np.asarray(got), np.asarray(want)
    scale = max(np.abs(want).max(), 1e-3)
    diff = np.abs(got - want)
    assert diff.max() <= tol * scale, \
        f"max|diff|={diff.max():.2e} scale={scale:.2e}"
    assert diff.mean() <= 3e-4 * scale, \
        f"mean|diff|={diff.mean():.2e} scale={scale:.2e}"


@pytest.mark.parametrize("x_tiles", [1, 2])
@pytest.mark.parametrize("band_h", list(BAND_TIERS))
def test_compiled_multiview_every_tier(rng, band_h, x_tiles):
    """Fused multi-view kernel, every tier x both column tilings."""
    pose2, _ = _geometry_for_tier(band_h, x_tiles)
    pose3 = _pose([0.3, -0.8, 0.2], [-0.08, 0.01, 0.02])  # easy second view
    ref = rng.randn(H, W, C).astype(np.float32)
    meas = np.stack([rng.randn(H, W, C).astype(np.float32) for _ in range(2)])
    invd = inverse_depth_planes(MIN_D, MAX_D, P)
    Ms = jnp.stack([
        build_plane_matrices(jnp.asarray(np.eye(4, dtype=np.float32)),
                             jnp.asarray(p), jnp.asarray(_K()), invd)
        for p in (pose2, pose3)])
    weights = jnp.asarray([0.5, 0.5])

    got = pallas_plane_sweep_multiview(
        jnp.asarray(ref), jnp.asarray(meas), Ms, weights,
        band_h=band_h, x_tiles=x_tiles)
    want = 0.5 * np.asarray(_gather_oracle(ref, meas[0], pose2)) \
        + 0.5 * np.asarray(_gather_oracle(ref, meas[1], pose3))
    _assert_close(got, want)


@pytest.mark.parametrize("roll", [0.0, 14.0, 35.0])
def test_compiled_dynamic_trip_rung(rng, roll):
    """Dynamic-trip kernel (the ladder's last rung) across easy, strong-roll
    and beyond-64-span geometry."""
    pose2 = _pose([0.5, 1.0, roll], [0.10, 0.02, 0.01])
    ref = rng.randn(H, W, C).astype(np.float32)
    meas = rng.randn(1, H, W, C).astype(np.float32)
    invd = inverse_depth_planes(MIN_D, MAX_D, P)
    Ms = build_plane_matrices(
        jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(pose2),
        jnp.asarray(_K()), invd)[None]
    got = pallas_plane_sweep_multiview_dyn(
        jnp.asarray(ref), jnp.asarray(meas), Ms, jnp.asarray([1.0]))
    want = _gather_oracle(ref, meas[0], pose2)
    _assert_close(got, want)


@pytest.mark.parametrize("band_h", [8, 32])
def test_compiled_single_view_kernel(rng, band_h):
    pose2, M = _geometry_for_tier(band_h, x_tiles=1)
    ref = rng.randn(H, W, C).astype(np.float32)
    meas = rng.randn(H, W, C).astype(np.float32)
    got = pallas_plane_sweep(
        jnp.asarray(ref), jnp.asarray(meas), M, band_h=band_h)
    want = _gather_oracle(ref, meas, pose2)
    _assert_close(got, want)


@pytest.mark.parametrize("band_h", [16, 48])
def test_compiled_vjp_backward_kernel(rng, band_h):
    """Compiled custom-VJP backward vs the gather path's JAX-derived grads —
    the training hot path's numerics on hardware."""
    pose2, M = _geometry_for_tier(band_h, x_tiles=1)
    ref = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    meas = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    cot = jnp.asarray(rng.randn(P, H, W).astype(np.float32))

    f = make_diff_plane_sweep(band_h, interpret=False)
    dref_p, dmeas_p = jax.grad(
        lambda r, m: jnp.sum(f(r, m, M) * cot), (0, 1))(ref, meas)

    pose1 = jnp.asarray(np.eye(4, dtype=np.float32))

    def loss_gather(r, m):
        cost = plane_sweep_cost_volume(
            r[None], m[None], pose1[None], jnp.asarray(pose2)[None],
            jnp.asarray(_K())[None], MIN_D, MAX_D, P,
        )[0].transpose(2, 0, 1)
        return jnp.sum(cost * cot)

    dref_g, dmeas_g = jax.grad(loss_gather, (0, 1))(ref, meas)
    _assert_close(dref_p, dref_g)
    _assert_close(dmeas_p, dmeas_g)


@pytest.mark.parametrize("roll", [1.0, 35.0])
def test_compiled_dyn_vjp_backward_kernel(rng, roll):
    """Compiled DYNAMIC-TRIP custom-VJP pair (forward + chunked backward,
    the training ladder's last rung) vs the gather path's JAX-derived
    grads, incl. beyond-64-span geometry where every static tier fails."""
    from dvmvs_tpu.ops.pallas.cost_volume_vjp import make_diff_plane_sweep_dyn

    pose2 = _pose([0.5, 1.0, roll], [0.10, 0.02, 0.01])
    invd = inverse_depth_planes(MIN_D, MAX_D, P)
    M = build_plane_matrices(
        jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(pose2),
        jnp.asarray(_K()), invd)
    ref = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    meas = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    cot = jnp.asarray(rng.randn(P, H, W).astype(np.float32))

    f = make_diff_plane_sweep_dyn(interpret=False)
    val_p, (dref_p, dmeas_p) = jax.value_and_grad(
        lambda r, m: jnp.sum(f(r, m, M) * cot), (0, 1))(ref, meas)

    pose1 = jnp.asarray(np.eye(4, dtype=np.float32))

    def loss_gather(r, m):
        cost = plane_sweep_cost_volume(
            r[None], m[None], pose1[None], jnp.asarray(pose2)[None],
            jnp.asarray(_K())[None], MIN_D, MAX_D, P,
        )[0].transpose(2, 0, 1)
        return jnp.sum(cost * cot)

    val_g, (dref_g, dmeas_g) = jax.value_and_grad(
        loss_gather, (0, 1))(ref, meas)
    np.testing.assert_allclose(float(val_p), float(val_g), rtol=5e-3)
    _assert_close(dref_p, dref_g)
    _assert_close(dmeas_p, dmeas_g)


def test_compiled_train_ladder_mixed_batch(rng):
    """Per-element tier switch on hardware: a batch mixing easy geometry
    (small band tier) with beyond-64-span geometry (dyn rung). Values and
    grads of both elements vs the gather method."""
    poses_meas = np.stack([
        _pose([0.5, 1.0, 1.0], [0.10, 0.02, 0.01]),
        _pose([0.5, 1.0, 35.0], [0.10, 0.02, 0.01]),  # span > 64
    ])
    invd = inverse_depth_planes(MIN_D, MAX_D, P)
    spans = np.asarray(_spans_fn(1)(build_plane_matrices(
        jnp.asarray(np.eye(4, dtype=np.float32)),
        jnp.asarray(poses_meas[1]), jnp.asarray(_K()), invd)))
    assert spans[-1] > BAND_TIERS[-1], "geometry must exceed every tier"

    B = 2
    ref = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    meas = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, H, W, P).astype(np.float32))
    pose1 = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))
    K = jnp.asarray(np.stack([_K()] * B))

    def loss(r, m, method):
        cost = plane_sweep_cost_volume_train(
            r, m, pose1, jnp.asarray(poses_meas), K,
            MIN_D, MAX_D, P, method=method)
        return jnp.sum(cost * cot)

    val_p, (dr_p, dm_p) = jax.value_and_grad(
        lambda r, m: loss(r, m, "auto"), (0, 1))(ref, meas)
    val_g, (dr_g, dm_g) = jax.value_and_grad(
        lambda r, m: loss(r, m, "gather"), (0, 1))(ref, meas)
    np.testing.assert_allclose(float(val_p), float(val_g), rtol=5e-3)
    _assert_close(dr_p, dr_g)
    _assert_close(dm_p, dm_g)


def test_compiled_fused_per_element_mixed(rng):
    """cost_volume_fused's per-element switch on hardware (the scene-batch
    lockstep serving path): easy + extreme scenes in one batch vs the
    gather oracle."""
    from dvmvs_tpu.ops.cost_volume import cost_volume_fused

    B, V = 2, 2
    poses_meas = np.stack([
        np.stack([_pose([0.5, 1.0, 1.0], [0.10, 0.02, 0.01]),
                  _pose([0.3, -0.8, 0.2], [-0.08, 0.01, 0.02])]),
        np.stack([_pose([0.5, 1.0, 35.0], [0.10, 0.02, 0.01]),  # dyn rung
                  _pose([0.3, -0.8, 0.2], [-0.08, 0.01, 0.02])]),
    ])  # (B, V, 4, 4)
    ref = rng.randn(B, H, W, C).astype(np.float32)
    meas = rng.randn(B, V, H, W, C).astype(np.float32)
    pose1 = np.stack([np.eye(4, dtype=np.float32)] * B)
    K = np.stack([_K()] * B)

    got = cost_volume_fused(
        jnp.asarray(ref), jnp.asarray(meas), jnp.asarray(pose1),
        jnp.asarray(poses_meas), jnp.asarray(K), MIN_D, MAX_D, P,
        method="pallas")
    for b in range(B):
        want = 0.5 * np.asarray(
            _gather_oracle(ref[b], meas[b, 0], poses_meas[b, 0])) \
            + 0.5 * np.asarray(
                _gather_oracle(ref[b], meas[b, 1], poses_meas[b, 1]))
        _assert_close(np.asarray(got[b]).transpose(2, 0, 1), want)


def test_compiled_train_ladder_end_to_end(rng):
    """plane_sweep_cost_volume_train (auto = Pallas VJP ladder) on TPU:
    value + grads vs the gather method at a mid-tier geometry."""
    pose2, _ = _geometry_for_tier(24, x_tiles=1)
    ref = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    meas = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, H, W, P).astype(np.float32))
    pose1 = jnp.asarray(np.eye(4, dtype=np.float32))[None]
    K = jnp.asarray(_K())[None]

    def loss(r, m, method):
        cost = plane_sweep_cost_volume_train(
            r, m, pose1, jnp.asarray(pose2)[None], K,
            MIN_D, MAX_D, P, method=method)
        return jnp.sum(cost * cot)

    val_p, (dr_p, dm_p) = jax.value_and_grad(
        lambda r, m: loss(r, m, "auto"), (0, 1))(ref, meas)
    val_g, (dr_g, dm_g) = jax.value_and_grad(
        lambda r, m: loss(r, m, "gather"), (0, 1))(ref, meas)
    np.testing.assert_allclose(float(val_p), float(val_g), rtol=5e-3)
    _assert_close(dr_p, dr_g)
    _assert_close(dm_p, dm_g)
