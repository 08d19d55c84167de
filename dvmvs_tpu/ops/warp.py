"""Depth-based warping: ConvLSTM hidden-state warp and forward depth splat.

  - ``warp_frame_depth``: backward warp of a source image/state into the
    destination view using the destination depth (reference:
    dvmvs/utils.py:205-258, vendored from kornia with a relu on z).
  - ``splat_depth_max``: forward-splat a previous depth map into the current
    view, keeping the LARGEST z per landing pixel. The reference implements
    this with a z-descending sort, a CPU ``np.unique`` round-trip and
    ``index_put_`` (dvmvs/utils.py:110-154); here it is a single on-device
    scatter-max over linearized pixel ids — same tie-breaking (max z wins),
    no host transfer.
  - ``splat_depth_soft``: DIFFERENTIABLE forward splat — the TPU-native
    replacement for the reference's pytorch3d point-rasterizer alternative
    (``get_differentiable_square_depth_estimation``, dvmvs/utils.py:157-202,
    C++/CUDA rasterizer, radius 0.02, min-z over 3 points/pixel). Points are
    splatted bilinearly to their 4 neighbor pixels with soft-min z weighting
    (temperature tau), all via differentiable scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dvmvs_tpu.ops.geometry import (
    depth_to_3d,
    normalize_pixel_coordinates,
    project_points,
    transform_points,
)
from dvmvs_tpu.ops.sampling import grid_sample


def warp_frame_depth(
    image_src: jnp.ndarray,
    depth_dst: jnp.ndarray,
    src_trans_dst: jnp.ndarray,
    K: jnp.ndarray,
    sampling_mode: str = "bilinear",
) -> jnp.ndarray:
    """Warp ``image_src`` (B, H, W, C) into the dst view.

    depth_dst: (B, H, W) metric depth in the destination view;
    src_trans_dst: (B, 4, 4) transform taking dst-camera points to
    src-camera coordinates; K: (B, 3, 3) at this resolution.
    """
    B, H, W = depth_dst.shape
    points_dst = depth_to_3d(depth_dst, K)  # (B, H, W, 3)
    points_src = transform_points(src_trans_dst, points_dst)
    z = jax.nn.relu(points_src[..., 2])
    points_src = jnp.concatenate([points_src[..., :2], z[..., None]], axis=-1)
    uv = project_points(points_src, K)  # (B, H, W, 2)
    grid = normalize_pixel_coordinates(uv, H, W)
    return grid_sample(image_src, grid, mode=sampling_mode, align_corners=True)


def splat_depth_max(
    previous_depth: jnp.ndarray,
    previous_pose: jnp.ndarray,
    current_pose: jnp.ndarray,
    full_K: jnp.ndarray,
    half_K: jnp.ndarray,
    out_height: int,
    out_width: int,
) -> jnp.ndarray:
    """Forward-splat ``previous_depth`` (B, H, W) into the current view.

    Unprojects the previous prediction with full-res intrinsics, transforms
    into the current camera, round-projects with half-res intrinsics, and
    scatter-maxes z over landing pixels. Returns a sparse (B, out_height,
    out_width) depth hypothesis; unhit pixels are 0.

    Matches the reference's keep-largest-z collision rule
    (dvmvs/utils.py:110-154) without the CPU np.unique round-trip.
    """
    B = previous_depth.shape[0]
    trans = jnp.linalg.inv(current_pose) @ previous_pose  # prev-cam -> cur-cam

    points_prev = depth_to_3d(previous_depth, full_K)  # (B, H, W, 3)
    points_cur = transform_points(trans, points_prev).reshape(B, -1, 3)
    z = jax.nn.relu(points_cur[..., 2])
    points_cur = jnp.concatenate([points_cur[..., :2], z[..., None]], axis=-1)

    uv = jnp.round(project_points(points_cur, half_K)).astype(jnp.int32)
    x, y = uv[..., 0], uv[..., 1]
    valid = (x >= 0) & (y >= 0) & (x < out_width) & (y < out_height)
    n_pix = out_height * out_width
    # Invalid points land on a sentinel slot that is sliced away.
    lin = jnp.where(valid, y * out_width + x, n_pix)

    def splat_one(lin_b, z_b):
        buf = jnp.zeros((n_pix + 1,), dtype=z_b.dtype)
        buf = buf.at[lin_b].max(z_b)
        return buf[:n_pix]

    out = jax.vmap(splat_one)(lin, z)
    return out.reshape(B, out_height, out_width)


def splat_depth_max_strided(
    previous_depth: jnp.ndarray,
    previous_pose: jnp.ndarray,
    current_pose: jnp.ndarray,
    full_K: jnp.ndarray,
    half_K: jnp.ndarray,
    out_height: int,
    out_width: int,
    stride: int,
) -> jnp.ndarray:
    """Forward splat directly onto a strided sub-grid — bit-exact fusion of
    ``resize_nearest(splat_depth_max(..., out_height*stride, out_width*stride),
    out_height, out_width)``.

    The inference drivers only consume the splat after a nearest
    x1/16 downsample to the 1/32 LSTM grid (reference:
    fusionnet/run-testing-online.py:194-198 interpolates the half-res
    rectangle estimate by scale 1/16). Nearest downsampling by ``stride``
    reads source pixel (stride*i, stride*j) exactly, so only points whose
    ROUNDED projection lands on a stride-multiple site can influence the
    result. This skips the large scatter-max buffer and the resize: a dense
    masked max over the out_height*out_width slots (VPU-friendly compare +
    reduce, no scatter).
    """
    B = previous_depth.shape[0]
    trans = jnp.linalg.inv(current_pose) @ previous_pose  # prev-cam -> cur-cam

    points_prev = depth_to_3d(previous_depth, full_K)
    points_cur = transform_points(trans, points_prev).reshape(B, -1, 3)
    z = jax.nn.relu(points_cur[..., 2])
    points_cur = jnp.concatenate([points_cur[..., :2], z[..., None]], axis=-1)

    uv = jnp.round(project_points(points_cur, half_K)).astype(jnp.int32)
    x, y = uv[..., 0], uv[..., 1]
    n_pix = out_height * out_width
    valid = (
        (x >= 0) & (y >= 0)
        & (x < out_width * stride) & (y < out_height * stride)
        & (x % stride == 0) & (y % stride == 0)
    )
    lin = jnp.where(valid, (y // stride) * out_width + (x // stride), n_pix)

    iota = jnp.arange(n_pix, dtype=jnp.int32)
    contrib = jnp.where(lin[:, :, None] == iota[None, None, :], z[:, :, None], 0.0)
    out = jnp.max(contrib, axis=1)  # (B, n_pix); unhit pixels are 0
    return out.reshape(B, out_height, out_width)


def splat_depth_soft(
    previous_depth: jnp.ndarray,
    previous_pose: jnp.ndarray,
    current_pose: jnp.ndarray,
    full_K: jnp.ndarray,
    half_K: jnp.ndarray,
    out_height: int,
    out_width: int,
    tau: float = 0.05,
) -> jnp.ndarray:
    """Differentiable forward splat (soft z-buffer).

    Same geometry as splat_depth_max, but each projected point contributes
    to its 4 neighboring pixels with bilinear weights, and per-pixel depth is
    the soft-min over contributions: exp(-z/tau)-weighted average. Gradients
    flow to previous_depth and both poses. Returns (B, out_height, out_width);
    unhit pixels are 0.
    """
    B = previous_depth.shape[0]
    trans = jnp.linalg.inv(current_pose) @ previous_pose

    points_prev = depth_to_3d(previous_depth, full_K)
    points_cur = transform_points(trans, points_prev).reshape(B, -1, 3)
    z = jax.nn.relu(points_cur[..., 2])
    points_cur = jnp.concatenate([points_cur[..., :2], z[..., None]], axis=-1)
    uv = project_points(points_cur, half_K)  # (B, N, 2) float

    n_pix = out_height * out_width
    x0 = jnp.floor(uv[..., 0])
    y0 = jnp.floor(uv[..., 1])
    fx = uv[..., 0] - x0
    fy = uv[..., 1] - y0

    corners = []
    for dy, wy in ((0.0, 1.0 - fy), (1.0, fy)):
        for dx, wx in ((0.0, 1.0 - fx), (1.0, fx)):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (yi >= 0) & (xi < out_width) & (yi < out_height) & (z > 0)
            lin = jnp.where(valid, (yi * out_width + xi), n_pix).astype(jnp.int32)
            corners.append((lin, wx * wy * valid))

    # Pass 1 (stop-gradient): per-pixel nearest z, to stabilize the soft-min
    # exponent (exp(-(z - zmin)/tau) instead of exp(-z/tau) which underflows).
    zmin = jnp.full((B, n_pix + 1), jnp.inf, jnp.float32)
    for lin, w in corners:
        zsafe = jnp.where(w > 0, z, jnp.inf)
        zmin = jax.vmap(lambda m, l, v: m.at[l].min(v))(zmin, lin, zsafe)
    zmin = jax.lax.stop_gradient(zmin)

    num = jnp.zeros((B, n_pix + 1), jnp.float32)
    den = jnp.zeros((B, n_pix + 1), jnp.float32)
    for lin, w in corners:
        ref_z = jnp.take_along_axis(zmin, lin, axis=1)
        ref_z = jnp.where(jnp.isfinite(ref_z), ref_z, 0.0)
        # exponent <= 0 by construction (z >= per-pixel zmin); the clip kills
        # inf/nan leaking through invalid (w=0) corners in the backward pass
        expo = jnp.clip(-(z - ref_z) / tau, -60.0, 0.0)
        sw = w * jnp.exp(expo)
        num = jax.vmap(lambda n, l, v: n.at[l].add(v))(num, lin, sw * z)
        den = jax.vmap(lambda d, l, v: d.at[l].add(v))(den, lin, sw)
    out = num[:, :n_pix] / jnp.maximum(den[:, :n_pix], 1e-8)
    out = out * (den[:, :n_pix] > 1e-8)
    return out.reshape(B, out_height, out_width)
