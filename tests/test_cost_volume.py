"""Cost-volume conformance tests.

The torch oracle below implements the published plane-sweep math
independently (homography per inverse-depth plane + F.grid_sample + channel
reduction) to pin our XLA implementation against torch's sampling semantics.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dvmvs_tpu.ops.cost_volume import cost_volume_fused, plane_sweep_cost_volume
from tests.conftest import random_pose

MIN_D, MAX_D, LEVELS = 0.25, 20.0, 8


def torch_plane_sweep(ref, meas, pose1, pose2, K, dot_product=True):
    """Oracle: (B,C,H,W) torch tensors -> (B,P,H,W) cost volume."""
    B, C, H, W = ref.shape
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv1 = torch.from_numpy(
        np.stack([xs, ys, np.ones_like(xs)], 0).reshape(3, -1).astype(np.float32)
    ).expand(B, 3, H * W)

    ext = torch.inverse(pose2).bmm(pose1)
    R, t = ext[:, :3, :3], ext[:, :3, 3:4]
    Kt = K.bmm(t)
    A = K.bmm(R).bmm(torch.inverse(K)).bmm(uv1)

    inv_base = 1.0 / MAX_D
    inv_step = (1.0 / MIN_D - 1.0 / MAX_D) / (LEVELS - 1)
    out = torch.empty(B, LEVELS, H, W)
    for p in range(LEVELS):
        d = 1.0 / (inv_base + p * inv_step)
        w = A + Kt / d
        w = w.transpose(1, 2)
        w = w[:, :, :2] / (w[:, :, 2:3] + 1e-8)
        w = w.view(B, H, W, 2)
        w = torch.stack(
            [w[..., 0] / (W / 2.0) - 1.0, w[..., 1] / (H / 2.0) - 1.0], dim=-1
        )
        warped = F.grid_sample(meas, w, mode="bilinear", padding_mode="zeros", align_corners=True)
        if dot_product:
            out[:, p] = (ref * warped).sum(1) / C
        else:
            out[:, p] = (ref - warped).abs().sum(1)
    return out


def _setup(rng, B=1, C=4, H=8, W=10):
    ref = rng.randn(B, C, H, W).astype(np.float32)
    meas = rng.randn(B, C, H, W).astype(np.float32)
    pose1 = np.stack([random_pose(rng, 0.1) for _ in range(B)]).astype(np.float32)
    pose2 = np.stack([random_pose(rng, 0.1) for _ in range(B)]).astype(np.float32)
    K = np.array([[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]], dtype=np.float32)
    K = np.stack([K] * B)
    return ref, meas, pose1, pose2, K


def test_identity_pose_planes_agree(rng):
    """Same pose for both views -> zero relative translation, so the warp is
    depth-independent: all planes must be identical (and match the torch
    oracle, which shares the reference's W/2-normalizer convention)."""
    ref, _, pose, _, K = _setup(rng)
    out = plane_sweep_cost_volume(
        jnp.asarray(ref.transpose(0, 2, 3, 1)),
        jnp.asarray(ref.transpose(0, 2, 3, 1)),
        jnp.asarray(pose), jnp.asarray(pose), jnp.asarray(K),
        MIN_D, MAX_D, LEVELS, plane_chunk=4,
    )
    out = np.asarray(out)
    for p in range(1, LEVELS):
        np.testing.assert_allclose(out[..., p], out[..., 0], atol=1e-4)
    want = torch_plane_sweep(
        *(torch.from_numpy(a) for a in (ref, ref, pose, pose, K))
    ).numpy()
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), want, atol=5e-4)


def test_plane_sweep_matches_torch_oracle(rng):
    for dot in (True, False):
        ref, meas, pose1, pose2, K = _setup(rng)
        want = torch_plane_sweep(
            *(torch.from_numpy(a) for a in (ref, meas, pose1, pose2, K)),
            dot_product=dot,
        ).numpy()
        got = plane_sweep_cost_volume(
            jnp.asarray(ref.transpose(0, 2, 3, 1)),
            jnp.asarray(meas.transpose(0, 2, 3, 1)),
            jnp.asarray(pose1), jnp.asarray(pose2), jnp.asarray(K),
            MIN_D, MAX_D, LEVELS, dot_product=dot, plane_chunk=4,
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=5e-4)


def test_fusion_masked_mean(rng):
    ref, meas, pose1, pose2, K = _setup(rng)
    meas2 = rng.randn(*meas.shape).astype(np.float32)
    pose3 = np.stack([random_pose(rng, 0.1)]).astype(np.float32)

    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    meas_stack = jnp.stack([nhwc(meas), nhwc(meas2), nhwc(meas)], axis=1)
    pose_stack = jnp.stack([jnp.asarray(pose2), jnp.asarray(pose3), jnp.asarray(pose2)], axis=1)

    # mask out the third (duplicate) view -> mean of views 1 and 2
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    got = cost_volume_fused(
        nhwc(ref), meas_stack, jnp.asarray(pose1), pose_stack, jnp.asarray(K),
        MIN_D, MAX_D, LEVELS, view_mask=mask, plane_chunk=4,
    )

    cv1 = plane_sweep_cost_volume(
        nhwc(ref), nhwc(meas), jnp.asarray(pose1), jnp.asarray(pose2),
        jnp.asarray(K), MIN_D, MAX_D, LEVELS, plane_chunk=4)
    cv2 = plane_sweep_cost_volume(
        nhwc(ref), nhwc(meas2), jnp.asarray(pose1), jnp.asarray(pose3),
        jnp.asarray(K), MIN_D, MAX_D, LEVELS, plane_chunk=4)
    want = (np.asarray(cv1) + np.asarray(cv2)) / 2.0
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("x_tiles", [1, 2])
def test_banded_matches_gather_and_grads(rng, x_tiles):
    """The differentiable banded hat-matmul path (tiled and untiled) must
    match the gather path in both forward values and gradients."""
    import jax
    from dvmvs_tpu.ops.cost_volume import plane_sweep_cost_volume_banded
    from scipy.spatial.transform import Rotation

    B, C, H, W = 1, 8, 16, 32
    ref = rng.randn(B, H, W, C).astype(np.float32)
    meas = rng.randn(B, H, W, C).astype(np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[:3, :3] = Rotation.from_euler("xyz", [1, 2, 0.5], degrees=True).as_matrix()
    pose2[:3, 3] = [0.1, 0.02, 0.01]
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)

    args = (jnp.asarray(pose1)[None], jnp.asarray(pose2)[None], jnp.asarray(K)[None])

    def f_banded(r, m):
        return plane_sweep_cost_volume_banded(
            r, m, *args, MIN_D, MAX_D, LEVELS, band_h=8, plane_chunk=4,
            x_tiles=x_tiles)

    def f_gather(r, m):
        return plane_sweep_cost_volume(
            r, m, *args, MIN_D, MAX_D, LEVELS, plane_chunk=4)

    rj, mj = jnp.asarray(ref), jnp.asarray(meas)
    np.testing.assert_allclose(
        np.asarray(f_banded(rj, mj)), np.asarray(f_gather(rj, mj)), atol=2e-4)

    def loss_b(r, m):
        return jnp.sum(f_banded(r, m) ** 2)

    def loss_g(r, m):
        return jnp.sum(f_gather(r, m) ** 2)

    gb = jax.grad(loss_b, argnums=(0, 1))(rj, mj)
    gg = jax.grad(loss_g, argnums=(0, 1))(rj, mj)
    for a, b in zip(gb, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
