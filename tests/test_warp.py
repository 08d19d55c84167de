"""warp_frame_depth and forward-splat conformance tests."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dvmvs_tpu.ops.warp import splat_depth_max, warp_frame_depth
from tests.conftest import random_pose


def torch_warp_oracle(image_src, depth_dst, trans, K):
    """Independent torch implementation of the depth-based backward warp:
    unproject dst depth, transform, relu z, project, grid_sample."""
    B, C, H, W = image_src.shape
    ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    xs, ys = xs.float(), ys.float()
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    d = depth_dst[:, 0]
    X = (xs[None] - cx.view(-1, 1, 1)) / fx.view(-1, 1, 1) * d
    Y = (ys[None] - cy.view(-1, 1, 1)) / fy.view(-1, 1, 1) * d
    pts = torch.stack([X, Y, d], dim=-1).view(B, -1, 3)
    R, t = trans[:, :3, :3], trans[:, :3, 3]
    pts = pts @ R.transpose(1, 2) + t[:, None]
    z = torch.relu(pts[..., 2])
    eps = 1e-8
    scale = torch.where(z.abs() > eps, 1.0 / torch.where(z.abs() > eps, z, torch.ones_like(z)), torch.ones_like(z))
    u = pts[..., 0] * scale * fx.view(-1, 1) + cx.view(-1, 1)
    v = pts[..., 1] * scale * fy.view(-1, 1) + cy.view(-1, 1)
    gx = u * 2.0 / (W - 1) - 1.0
    gy = v * 2.0 / (H - 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1).view(B, H, W, 2)
    return F.grid_sample(image_src, grid, mode="bilinear", padding_mode="zeros", align_corners=True)


def test_warp_frame_depth_matches_oracle(rng):
    B, C, H, W = 1, 6, 8, 10
    img = rng.randn(B, C, H, W).astype(np.float32)
    depth = rng.uniform(1.0, 5.0, size=(B, 1, H, W)).astype(np.float32)
    pa, pb = random_pose(rng, 0.2), random_pose(rng, 0.2)
    trans = (np.linalg.inv(pa) @ pb).astype(np.float32)[None]
    K = np.array([[9.0, 0, W / 2 - 0.5], [0, 9.0, H / 2 - 0.5], [0, 0, 1]], dtype=np.float32)[None]

    want = torch_warp_oracle(
        torch.from_numpy(img), torch.from_numpy(depth),
        torch.from_numpy(trans), torch.from_numpy(K),
    ).numpy()

    got = warp_frame_depth(
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(depth[:, 0]),
        jnp.asarray(trans),
        jnp.asarray(K),
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_warp_identity_transform(rng):
    B, C, H, W = 1, 3, 8, 8
    img = rng.randn(B, C, H, W).astype(np.float32)
    depth = rng.uniform(1.0, 5.0, size=(B, H, W)).astype(np.float32)
    K = np.array([[8.0, 0, 3.5], [0, 8.0, 3.5], [0, 0, 1]], dtype=np.float32)[None]
    got = warp_frame_depth(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(depth),
        jnp.asarray(np.eye(4, dtype=np.float32)[None]), jnp.asarray(K),
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), img, atol=1e-4)


def numpy_splat_oracle(prev_depth, prev_pose, cur_pose, full_K, half_K, hh, hw):
    """Reference-semantics forward splat: keep the largest z per landing
    pixel (z-descending sort + first-occurrence dedupe)."""
    H, W = prev_depth.shape
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    fx, fy, cx, cy = full_K[0, 0], full_K[1, 1], full_K[0, 2], full_K[1, 2]
    X = (xs - cx) / fx * prev_depth
    Y = (ys - cy) / fy * prev_depth
    pts = np.stack([X, Y, prev_depth], -1).reshape(-1, 3)
    trans = np.linalg.inv(cur_pose) @ prev_pose
    pts = pts @ trans[:3, :3].T + trans[:3, 3]
    z = np.maximum(pts[:, 2], 0.0)
    eps = 1e-8
    scale = np.where(np.abs(z) > eps, 1.0 / np.where(np.abs(z) > eps, z, 1.0), 1.0)
    u = np.round(pts[:, 0] * scale * half_K[0, 0] + half_K[0, 2]).astype(int)
    v = np.round(pts[:, 1] * scale * half_K[1, 1] + half_K[1, 2]).astype(int)
    valid = (u >= 0) & (v >= 0) & (u < hw) & (v < hh)
    out = np.zeros((hh, hw), dtype=np.float32)
    for ui, vi, zi in zip(u[valid], v[valid], z[valid]):
        out[vi, ui] = max(out[vi, ui], zi)
    return out


def test_splat_depth_max_matches_oracle(rng):
    H, W = 12, 16
    hh, hw = 6, 8
    depth = rng.uniform(0.5, 4.0, size=(H, W)).astype(np.float32)
    pa, pb = random_pose(rng, 0.1), random_pose(rng, 0.1)
    full_K = np.array([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]], dtype=np.float32)
    half_K = full_K.copy()
    half_K[:2] /= 2.0

    want = numpy_splat_oracle(depth, pa.astype(np.float32), pb.astype(np.float32), full_K, half_K, hh, hw)
    got = splat_depth_max(
        jnp.asarray(depth[None]),
        jnp.asarray(pa.astype(np.float32)[None]),
        jnp.asarray(pb.astype(np.float32)[None]),
        jnp.asarray(full_K[None]),
        jnp.asarray(half_K[None]),
        hh, hw,
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=1e-4)


def test_splat_strided_matches_splat_plus_nearest_resize(rng):
    """The fused strided splat must be bit-exact against splat at full
    half-res + nearest downsample (the reference's interpolate x1/16 chain,
    fusionnet/run-testing-online.py:194-198)."""
    from dvmvs_tpu.ops.sampling import resize_nearest
    from dvmvs_tpu.ops.warp import splat_depth_max_strided

    H, W = 64, 96           # "full res"
    hh, hw = H // 2, W // 2  # splat grid
    oh, ow, stride = H // 32, W // 32, 16
    for trial in range(5):
        depth = rng.uniform(0.5, 6.0, size=(1, H, W)).astype(np.float32)
        pa = random_pose(rng, 0.15).astype(np.float32)[None]
        pb = random_pose(rng, 0.15).astype(np.float32)[None]
        full_K = np.array(
            [[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)[None]
        half_K = full_K.copy()
        half_K[:, :2] /= 2.0

        big = splat_depth_max(
            jnp.asarray(depth), jnp.asarray(pa), jnp.asarray(pb),
            jnp.asarray(full_K), jnp.asarray(half_K), hh, hw)
        want = np.asarray(resize_nearest(big, oh, ow))
        got = np.asarray(splat_depth_max_strided(
            jnp.asarray(depth), jnp.asarray(pa), jnp.asarray(pb),
            jnp.asarray(full_K), jnp.asarray(half_K), oh, ow, stride))
        np.testing.assert_array_equal(got, want)


def test_splat_zero_depth_gives_zero():
    depth = jnp.zeros((1, 8, 8), dtype=jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    K = jnp.asarray(np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], dtype=np.float32)[None])
    out = splat_depth_max(depth, eye, eye, K, K, 4, 4)
    assert float(jnp.max(out)) == 0.0


def test_splat_soft_matches_hard_on_isolated_points(rng):
    """With integer landing pixels and no collisions, the differentiable
    splat must agree with the scatter-max splat; and it must be
    differentiable w.r.t. the previous depth."""
    import jax
    import jax.numpy as jnp
    from dvmvs_tpu.ops.warp import splat_depth_max, splat_depth_soft

    H, W = 8, 8
    depth = np.zeros((1, H, W), np.float32)
    depth[0, 2, 3] = 2.0
    depth[0, 5, 6] = 1.5
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    K = jnp.asarray(np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)[None])

    hard = np.asarray(splat_depth_max(jnp.asarray(depth), eye, eye, K, K, H, W))
    soft = np.asarray(splat_depth_soft(jnp.asarray(depth), eye, eye, K, K, H, W))
    np.testing.assert_allclose(soft, hard, atol=1e-4)

    def loss(d):
        return jnp.sum(splat_depth_soft(d, eye, eye, K, K, H, W))

    g = np.asarray(jax.grad(loss)(jnp.asarray(depth)))
    assert np.isfinite(g).all()
    assert abs(g[0, 2, 3]) > 0  # gradient reaches the source depth
