"""On-device TSDF fusion.

Replaces the reference's inline CUDA kernel / numba fallback
(sample-data/run-tsdf-reconstruction.py:79-152, 180-217) with a jitted XLA
program: the per-voxel projective update is embarrassingly parallel, so the
whole volume updates as one vectorized step per frame — voxel-to-pixel
lookup is the only gather. State (tsdf, weight, packed color) stays on
device across frames; mesh extraction (native C++ marching cubes) pulls the
volume back once at the end.

Semantics match the reference kernel exactly: truncation 5*voxel_size,
cumulative weighted average, skip depth==0 / depth_diff < -margin /
behind-camera / out-of-image voxels, packed b*65536+g*256+r running color
average with per-frame rounding, and the world->camera transform using the
rigid inverse (R^T (p - t)).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

COLOR_CONST = 256.0 * 256.0


def _round_half_away(x):
    """C roundf: round half away from zero (jnp.round is half-to-even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


@functools.partial(
    jax.jit, donate_argnums=(0, 1, 2),
    static_argnames=("im_h", "im_w", "vol_dim"))
def integrate_step(
    tsdf_vol: jnp.ndarray,
    weight_vol: jnp.ndarray,
    color_vol: jnp.ndarray,
    vol_origin: jnp.ndarray,
    voxel_size: float,
    color_im: jnp.ndarray,
    depth_im: jnp.ndarray,
    K: jnp.ndarray,
    cam_pose: jnp.ndarray,
    obs_weight: float,
    trunc_margin: float,
    im_h: int,
    im_w: int,
    vol_dim: Tuple[int, int, int] = None,
):
    """One frame of TSDF integration.

    Volumes are FLAT (DX*DY*DZ,) f32 with logical dims ``vol_dim`` —
    a TPU-layout decision: a (DX, DY, DZ) array tiles its last two dims to
    (8, 128), and real volumes (e.g. 92x92x58) waste ~2.3x of every
    elementwise op on lane padding; flat 1-D arrays pad only the tail
    (see docs/PERF.md "TSDF fusion" for measurements).
    color_im is the packed single-channel float image.
    """
    DX, DY, DZ = vol_dim

    idx = jax.lax.iota(jnp.int32, tsdf_vol.shape[0])
    vx = (idx // (DY * DZ)).astype(jnp.float32)
    rem = idx % (DY * DZ)
    vy = (rem // DZ).astype(jnp.float32)
    vz = (rem % DZ).astype(jnp.float32)
    px_w = vol_origin[0] + vx * voxel_size
    py_w = vol_origin[1] + vy * voxel_size
    pz_w = vol_origin[2] + vz * voxel_size

    # world -> camera with the rigid inverse (kernel: R^T (p - t))
    t = cam_pose[:3, 3]
    R = cam_pose[:3, :3]
    dx = px_w - t[0]
    dy = py_w - t[1]
    dz = pz_w - t[2]
    cam_x = R[0, 0] * dx + R[1, 0] * dy + R[2, 0] * dz
    cam_y = R[0, 1] * dx + R[1, 1] * dy + R[2, 1] * dz
    cam_z = R[0, 2] * dx + R[1, 2] * dy + R[2, 2] * dz

    pix_x = _round_half_away(K[0, 0] * (cam_x / cam_z) + K[0, 2]).astype(jnp.int32)
    pix_y = _round_half_away(K[1, 1] * (cam_y / cam_z) + K[1, 2]).astype(jnp.int32)

    in_view = (
        (pix_x >= 0) & (pix_x < im_w) & (pix_y >= 0) & (pix_y < im_h)
        & (cam_z >= 0)
    )
    pix_x_c = jnp.clip(pix_x, 0, im_w - 1)
    pix_y_c = jnp.clip(pix_y, 0, im_h - 1)
    lin = pix_y_c * im_w + pix_x_c

    # ONE row-gather for (depth, color) instead of two flat gathers: TPU
    # gather cost is per-offset, so fetching 2-wide rows halves the offset
    # count — and the row form itself lowers better (measured 6.3 ms vs
    # 17.3 ms for two flat gathers on 1.26M voxels; docs/PERF.md).
    src = jnp.stack([depth_im.reshape(-1), color_im.reshape(-1)], axis=-1)
    picked = jnp.take(src, lin, axis=0)
    depth_val = picked[:, 0]
    color_val = picked[:, 1]

    depth_diff = depth_val - cam_z
    valid = in_view & (depth_val != 0) & (depth_diff >= -trunc_margin)
    dist = jnp.minimum(1.0, depth_diff / trunc_margin)

    w_old = weight_vol
    w_new = w_old + obs_weight
    tsdf_new = (tsdf_vol * w_old + obs_weight * dist) / w_new

    old_b = jnp.floor(color_vol / COLOR_CONST)
    old_g = jnp.floor((color_vol - old_b * COLOR_CONST) / 256.0)
    old_r = color_vol - old_b * COLOR_CONST - old_g * 256.0
    new_b = jnp.floor(color_val / COLOR_CONST)
    new_g = jnp.floor((color_val - new_b * COLOR_CONST) / 256.0)
    new_r = color_val - new_b * COLOR_CONST - new_g * 256.0
    mix = lambda o, n: jnp.minimum(
        _round_half_away((o * w_old + obs_weight * n) / w_new), 255.0)
    color_new = mix(old_b, new_b) * COLOR_CONST + mix(old_g, new_g) * 256.0 + mix(old_r, new_r)

    tsdf_vol = jnp.where(valid, tsdf_new, tsdf_vol)
    color_vol = jnp.where(valid, color_new, color_vol)
    weight_vol = jnp.where(valid, w_new, weight_vol)
    return tsdf_vol, weight_vol, color_vol


def pack_color(color_im: np.ndarray) -> np.ndarray:
    """(H, W, 3) image -> packed ch2*65536 + ch1*256 + ch0 float
    (reference: run-tsdf-reconstruction.py:234)."""
    c = color_im.astype(np.float32)
    return np.floor(c[..., 2] * COLOR_CONST + c[..., 1] * 256.0 + c[..., 0])


def unpack_color(packed: np.ndarray) -> np.ndarray:
    b = np.floor(packed / COLOR_CONST)
    g = np.floor((packed - b * COLOR_CONST) / 256.0)
    r = packed - b * COLOR_CONST - g * 256.0
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


class TSDFVolume:
    """Voxel-grid TSDF with color, device-resident
    (reference: run-tsdf-reconstruction.py:30-351)."""

    def __init__(self, vol_bnds: np.ndarray, voxel_size: float):
        vol_bnds = np.asarray(vol_bnds, dtype=np.float64).copy()
        assert vol_bnds.shape == (3, 2)
        self.voxel_size = float(voxel_size)
        self.trunc_margin = 5 * self.voxel_size
        self.vol_dim = np.ceil(
            (vol_bnds[:, 1] - vol_bnds[:, 0]) / voxel_size).astype(int)
        vol_bnds[:, 1] = vol_bnds[:, 0] + self.vol_dim * voxel_size
        self.vol_bnds = vol_bnds
        self.vol_origin = vol_bnds[:, 0].astype(np.float32)

        n_vox = int(np.prod(self.vol_dim))
        self.tsdf = jnp.ones((n_vox,), jnp.float32)
        self.weight = jnp.zeros((n_vox,), jnp.float32)
        self.color = jnp.zeros((n_vox,), jnp.float32)

    def integrate(self, color_im: np.ndarray, depth_im: np.ndarray,
                  K: np.ndarray, cam_pose: np.ndarray, obs_weight: float = 1.0):
        im_h, im_w = depth_im.shape
        packed = color_im if color_im.ndim == 2 else pack_color(color_im)
        self.tsdf, self.weight, self.color = integrate_step(
            self.tsdf, self.weight, self.color,
            jnp.asarray(self.vol_origin), self.voxel_size,
            jnp.asarray(packed.astype(np.float32)),
            jnp.asarray(depth_im.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            jnp.asarray(cam_pose.astype(np.float32)),
            float(obs_weight), self.trunc_margin, im_h, im_w,
            tuple(int(d) for d in self.vol_dim),
        )

    def integrate_frames(self, color_ims, depth_ims, K, cam_poses,
                         obs_weight: float = 1.0, chunk: int = 32):
        """Integrate many frames as fused device scans (one dispatch per
        ``chunk`` frames instead of one per frame — removes per-frame
        dispatch/transfer overhead; the reference loops frame-by-frame,
        run-tsdf-reconstruction.py:442-457)."""
        n = len(depth_ims)
        packed = np.stack([
            c if c.ndim == 2 else pack_color(c) for c in color_ims
        ]).astype(np.float32)
        depths = np.stack(depth_ims).astype(np.float32)
        poses = np.stack(cam_poses).astype(np.float32)
        im_h, im_w = depths.shape[1:]
        K = jnp.asarray(K.astype(np.float32))
        origin = jnp.asarray(self.vol_origin)

        vol_dim = tuple(int(d) for d in self.vol_dim)

        @jax.jit
        def scan_chunk(tsdf, weight, color, packed_c, depths_c, poses_c):
            def body(carry, x):
                t, w, c = carry
                pc, dc, po = x
                t, w, c = integrate_step(
                    t, w, c, origin, self.voxel_size, pc, dc, K, po,
                    obs_weight, self.trunc_margin, im_h, im_w, vol_dim)
                return (t, w, c), None
            (tsdf, weight, color), _ = jax.lax.scan(
                body, (tsdf, weight, color), (packed_c, depths_c, poses_c))
            return tsdf, weight, color

        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            if end - start < chunk:  # pad to keep one compiled shape
                pad = chunk - (end - start)
                pc = np.concatenate([packed[start:end], np.zeros((pad, im_h, im_w), np.float32)])
                dc = np.concatenate([depths[start:end], np.zeros((pad, im_h, im_w), np.float32)])
                po = np.concatenate([poses[start:end], np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
            else:
                pc, dc, po = packed[start:end], depths[start:end], poses[start:end]
            self.tsdf, self.weight, self.color = scan_chunk(
                self.tsdf, self.weight, self.color,
                jnp.asarray(pc), jnp.asarray(dc), jnp.asarray(po))

    def get_volume(self) -> Tuple[np.ndarray, np.ndarray]:
        shape = tuple(self.vol_dim)
        return (np.asarray(self.tsdf).reshape(shape),
                np.asarray(self.color).reshape(shape))

    def get_mesh(self):
        """Marching cubes (native C++) + vertex colors; world coords."""
        from dvmvs_tpu.utils.native import marching_cubes

        tsdf, color = self.get_volume()
        verts, faces, norms = marching_cubes(tsdf, level=0.0)
        vind = np.clip(np.round(verts).astype(int), 0,
                       np.array(tsdf.shape) - 1)
        rgb = unpack_color(color[vind[:, 0], vind[:, 1], vind[:, 2]])
        verts_world = verts * self.voxel_size + self.vol_origin
        return verts_world.astype(np.float32), faces, norms, rgb

    def get_point_cloud(self) -> np.ndarray:
        verts, faces, norms, rgb = self.get_mesh()
        return np.hstack([verts, rgb.astype(np.float32)])


def get_view_frustum(depth_im: np.ndarray, K: np.ndarray, cam_pose: np.ndarray):
    """Corners of the camera view frustum in world coordinates
    (reference: run-tsdf-reconstruction.py:361-372)."""
    im_h, im_w = depth_im.shape
    max_depth = np.max(depth_im)
    pts = np.array([
        (np.array([0, 0, 0, im_w, im_w]) - K[0, 2])
        * np.array([0, max_depth, max_depth, max_depth, max_depth]) / K[0, 0],
        (np.array([0, 0, im_h, 0, im_h]) - K[1, 2])
        * np.array([0, max_depth, max_depth, max_depth, max_depth]) / K[1, 1],
        np.array([0, max_depth, max_depth, max_depth, max_depth]),
    ])
    pts_h = np.vstack([pts, np.ones((1, pts.shape[1]))])
    return (cam_pose @ pts_h)[:3]


def calculate_volume_bounds(depth_maps, poses, K) -> np.ndarray:
    bounds = np.zeros((3, 2))
    for depth, pose in zip(depth_maps, poses):
        pts = get_view_frustum(depth, K, pose)
        bounds[:, 0] = np.minimum(bounds[:, 0], np.amin(pts, axis=1))
        bounds[:, 1] = np.maximum(bounds[:, 1], np.amax(pts, axis=1))
    return bounds
