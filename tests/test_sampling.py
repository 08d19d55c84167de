"""Conformance tests: our sampling ops vs PyTorch CPU reference semantics.

These pin the exact corner conventions (align_corners=True, zeros padding,
nearest rounding) that the depth-map parity target depends on.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dvmvs_tpu.ops.sampling import (
    grid_sample,
    resize_bilinear_align_corners,
    resize_nearest,
)


def _rand_image(rs, B, C, H, W):
    return rs.randn(B, C, H, W).astype(np.float32)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, mode):
    B, C, H, W = 2, 5, 9, 12
    Ho, Wo = 7, 11
    img = _rand_image(rng, B, C, H, W)
    # grid includes out-of-bounds coords to exercise zeros padding
    grid = (rng.rand(B, Ho, Wo, 2).astype(np.float32) * 2.8) - 1.4

    want = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode=mode, padding_mode="zeros", align_corners=True,
    ).numpy()

    got = grid_sample(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid),
        mode=mode, align_corners=True,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_grid_sample_identity(rng):
    B, C, H, W = 1, 3, 6, 8
    img = _rand_image(rng, B, C, H, W)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = xs * 2.0 / (W - 1) - 1.0
    gy = ys * 2.0 / (H - 1) - 1.0
    grid = np.stack([gx, gy], axis=-1)[None].astype(np.float32)
    got = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), img, atol=1e-5
    )


@pytest.mark.parametrize("out_hw", [(12, 16), (17, 5), (8, 8)])
def test_resize_bilinear_matches_torch(rng, out_hw):
    B, C, H, W = 2, 4, 8, 8
    img = _rand_image(rng, B, C, H, W)
    want = F.interpolate(
        torch.from_numpy(img), size=out_hw, mode="bilinear", align_corners=True
    ).numpy()
    got = resize_bilinear_align_corners(jnp.asarray(img.transpose(0, 2, 3, 1)), *out_hw)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )


@pytest.mark.parametrize("out_hw", [(12, 16), (17, 5), (8, 8), (4, 4)])
def test_resize_bilinear_half_pixel_matches_torch(rng, out_hw):
    """align_corners=False (half-pixel) convention, used by the DELTAS
    baseline's reference interpolations."""
    B, C, H, W = 2, 4, 8, 8
    img = _rand_image(rng, B, C, H, W)
    want = F.interpolate(
        torch.from_numpy(img), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    got = resize_bilinear_align_corners(
        jnp.asarray(img.transpose(0, 2, 3, 1)), *out_hw, align_corners=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )


@pytest.mark.parametrize("out_hw", [(4, 4), (3, 5), (16, 20), (8, 10)])
def test_resize_nearest_matches_torch(rng, out_hw):
    B, C, H, W = 2, 3, 8, 10
    img = _rand_image(rng, B, C, H, W)
    want = F.interpolate(torch.from_numpy(img), size=out_hw, mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(img.transpose(0, 2, 3, 1)), *out_hw)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=0
    )


def test_resize_nearest_3d(rng):
    # depth maps (B, H, W) pass through without a channel axis
    d = rng.rand(2, 8, 8).astype(np.float32)
    got = resize_nearest(jnp.asarray(d), 4, 4)
    want = F.interpolate(torch.from_numpy(d)[:, None], size=(4, 4), mode="nearest")[:, 0].numpy()
    np.testing.assert_array_equal(np.asarray(got), want)
