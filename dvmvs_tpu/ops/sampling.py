"""Image sampling / resizing primitives, conformant with PyTorch semantics.

The reference system leans on two torch primitives whose exact corner
conventions determine depth-map parity:

  - ``torch.nn.functional.grid_sample`` with mode='bilinear'/'nearest',
    padding_mode='zeros', align_corners=True
    (reference: dvmvs/utils.py:75-79, 258)
  - ``torch.nn.functional.interpolate`` with mode='bilinear'
    (align_corners=True) and mode='nearest'
    (reference: dvmvs/fusionnet/model.py:59,114,293-294; dvmvs/losses.py:60)

This module re-implements those semantics in pure jnp with TPU-friendly
shapes: gathers are done on a flattened spatial axis (one gather per bilinear
corner), and static resizes are expressed as small dense interpolation
matrices so XLA maps them onto the MXU.

Layout: NHWC. Grids are (..., 2) in (x, y) order, like torch.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample with padding_mode='zeros', NHWC.

    image: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized coords in (x, y).
    Returns (B, Ho, Wo, C).

    Out-of-bounds bilinear corners contribute zero (torch 'zeros' padding);
    nearest mode uses round-half-to-even like torch.
    """
    B, H, W, C = image.shape
    Ho, Wo = grid.shape[1], grid.shape[2]

    ix = _unnormalize(grid[..., 0], W, align_corners)
    iy = _unnormalize(grid[..., 1], H, align_corners)

    flat = image.reshape(B, H * W, C)

    def gather(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        # yi, xi: (B, Ho, Wo) int32 — already clipped to valid range.
        lin = (yi * W + xi).reshape(B, Ho * Wo)
        out = jnp.take_along_axis(flat, lin[:, :, None], axis=1)
        return out.reshape(B, Ho, Wo, C)

    if mode == "nearest":
        xr = jnp.round(ix).astype(jnp.int32)
        yr = jnp.round(iy).astype(jnp.int32)
        valid = (xr >= 0) & (xr < W) & (yr >= 0) & (yr < H)
        out = gather(jnp.clip(yr, 0, H - 1), jnp.clip(xr, 0, W - 1))
        return out * valid[..., None].astype(image.dtype)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx1 = ix - x0f
    wy1 = iy - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    out = jnp.zeros((B, Ho, Wo, C), dtype=image.dtype)
    for yi, xi, wy, wx in (
        (y0, x0, wy0, wx0),
        (y0, x1, wy0, wx1),
        (y1, x0, wy1, wx0),
        (y1, x1, wy1, wx1),
    ):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        w = (wy * wx) * valid.astype(image.dtype)
        val = gather(jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
        out = out + val * w[..., None]
    return out


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix(in_size: int, out_size: int,
                          align_corners: bool = True) -> np.ndarray:
    """(out_size, in_size) dense interpolation matrix matching torch
    F.interpolate(mode='bilinear'). align_corners=False uses the half-pixel
    convention src = (i + 0.5) * in/out - 0.5 with edge clamping."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 and align_corners:
        A[0, 0] = 1.0
        return A
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = np.clip((i + 0.5) * in_size / out_size - 0.5, 0, in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        A[i, lo] += 1.0 - w
        A[i, hi] += w
    return A


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int,
                                  align_corners: bool = True) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear') for NHWC (align_corners=True
    default; False uses the half-pixel convention).

    Expressed as two small dense matmuls (separable linear interpolation),
    which XLA tiles onto the MXU — no gathers involved.
    """
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    Ah = jnp.asarray(_linear_resize_matrix(H, out_h, align_corners), dtype=x.dtype)
    Aw = jnp.asarray(_linear_resize_matrix(W, out_w, align_corners), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", Ah, x)
    return jnp.einsum("ow,bhwc->bhoc", Aw, x)


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch nearest: src = floor(i * in / out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') for NHWC (B, H, W, C) or (B, H, W)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    B, H, W, C = x.shape
    if (H, W) != (out_h, out_w):
        x = jnp.take(x, jnp.asarray(_nearest_indices(H, out_h)), axis=1)
        x = jnp.take(x, jnp.asarray(_nearest_indices(W, out_w)), axis=2)
    return x[..., 0] if squeeze else x
