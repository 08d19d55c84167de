"""Camera geometry primitives (pure jnp).

These replace the reference's mix of NumPy, kornia and torch geometry:
  - pose_distance            (reference: dvmvs/utils.py:17-31)
  - warp grid                (reference: dvmvs/utils.py:34-42)
  - depth_to_3d / transform_points / project_points /
    normalize_pixel_coordinates (kornia functions used at
    reference: dvmvs/utils.py:122-136, 241-256)

All functions are shape-polymorphic over leading batch dims and safe to use
inside jit; host-side NumPy variants are provided for the keyframe buffer.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# kornia's convert_points_from_homogeneous guard: coordinates with
# |z| <= eps are left undivided (scale 1) rather than producing inf.
_HOMOGENEOUS_EPS = 1e-8


def pose_distance_np(reference_pose: np.ndarray, measurement_pose: np.ndarray):
    """Combined SE(3) distance between two camera-to-world poses.

    Returns (combined, R_measure, t_measure). Host-side float64 NumPy — used
    by the keyframe buffer and crawlers, matching the reference's numeric
    behaviour exactly (reference: dvmvs/utils.py:17-31).
    """
    rel = np.linalg.inv(reference_pose) @ measurement_pose
    R = rel[:3, :3]
    t = rel[:3, 3]
    R_measure = np.sqrt(2 * (1 - min(3.0, float(np.trace(R))) / 3))
    t_measure = float(np.linalg.norm(t))
    combined = np.sqrt(t_measure ** 2 + R_measure ** 2)
    return float(combined), float(R_measure), t_measure


def pose_distance(reference_pose: jnp.ndarray, measurement_pose: jnp.ndarray):
    """Batched jnp pose distance; poses (..., 4, 4) → three (...,) arrays."""
    rel = jnp.linalg.inv(reference_pose) @ measurement_pose
    R = rel[..., :3, :3]
    t = rel[..., :3, 3]
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    R_measure = jnp.sqrt(2 * (1 - jnp.minimum(3.0, trace) / 3))
    t_measure = jnp.linalg.norm(t, axis=-1)
    combined = jnp.sqrt(t_measure ** 2 + R_measure ** 2)
    return combined, R_measure, t_measure


def inverse_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) pose matrices.

    Uses the generic inverse (like the reference's torch.inverse) so that
    results match bit-for-bit even for slightly non-orthonormal poses.
    """
    return jnp.linalg.inv(pose)


def make_warp_grid(width: int, height: int) -> np.ndarray:
    """Homogeneous pixel grid (3, H*W) float32: rows are (x, y, 1).

    Static (NumPy) — becomes an XLA constant when closed over in jit.
    Reference: dvmvs/utils.py:34-42.
    """
    x = np.linspace(0, width - 1, num=int(width))
    y = np.linspace(0, height - 1, num=int(height))
    xg, yg = np.meshgrid(x, y)
    grid = np.stack([xg, yg, np.ones_like(xg)], axis=-1)  # (H, W, 3)
    return np.ascontiguousarray(grid.reshape(-1, 3).T).astype(np.float32)


def depth_to_3d(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Unproject a depth map to camera-frame 3D points.

    depth: (B, H, W) metric depth; K: (B, 3, 3).
    Returns (B, H, W, 3) with x=(u-cx)/fx*d, y=(v-cy)/fy*d, z=d
    (kornia depth_to_3d with normalize_points=False).
    """
    B, H, W = depth.shape
    u = jnp.arange(W, dtype=depth.dtype)[None, None, :]  # (1,1,W)
    v = jnp.arange(H, dtype=depth.dtype)[None, :, None]  # (1,H,1)
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def transform_points(trans: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a (B, 4, 4) rigid transform to (B, ..., 3) points."""
    B = trans.shape[0]
    R = trans[:, :3, :3]
    t = trans[:, :3, 3]
    flat = points.reshape(B, -1, 3)
    # full f32: the TPU bf16-matmul default would shift warped sample
    # positions by ~0.1 px (see cost_volume._plane_grids)
    out = jnp.einsum("bij,bnj->bni", R, flat,
                     precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    return out.reshape(points.shape)


def project_points(points: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project (B, ..., 3) camera-frame points through (B, 3, 3) intrinsics.

    Matches kornia.project_points: the homogeneous division leaves points
    with |z| <= 1e-8 undivided instead of producing inf.
    Returns (B, ..., 2) pixel coordinates.
    """
    B = K.shape[0]
    flat = points.reshape(B, -1, 3)
    z = flat[..., 2:3]
    z_ok = jnp.abs(z) > _HOMOGENEOUS_EPS
    scale = jnp.where(z_ok, 1.0 / jnp.where(z_ok, z, 1.0), 1.0)
    xy = flat[..., :2] * scale
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    cx = K[:, 0, 2][:, None]
    cy = K[:, 1, 2][:, None]
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1).reshape(points.shape[:-1] + (2,))


def normalize_pixel_coordinates(coords: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Pixel coordinates → [-1, 1] with align_corners=True convention.

    Matches kornia.normalize_pixel_coordinates: factor 2/(size-1).
    coords: (..., 2) in xy order.
    """
    x = coords[..., 0] * (2.0 / (width - 1)) - 1.0
    y = coords[..., 1] * (2.0 / (height - 1)) - 1.0
    return jnp.stack([x, y], axis=-1)


def is_pose_available_np(pose: np.ndarray) -> bool:
    """True when the pose contains no NaN/Inf (reference: dvmvs/utils.py:261-268)."""
    return bool(np.isfinite(pose).all())
