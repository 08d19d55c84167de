"""TSDF integration + native marching cubes tests."""

import os

import numpy as np
import pytest

from dvmvs_tpu.ops.tsdf import (
    COLOR_CONST,
    TSDFVolume,
    calculate_volume_bounds,
    pack_color,
    unpack_color,
)


def numpy_integrate_oracle(tsdf, weight, color, origin, vsize, packed_color,
                           depth, K, pose, obs_w, trunc):
    """Reference-kernel semantics in NumPy (run-tsdf-reconstruction.py:79-152)."""
    DX, DY, DZ = tsdf.shape
    H, W = depth.shape
    out_t, out_w, out_c = tsdf.copy(), weight.copy(), color.copy()
    inv = np.linalg.inv(pose)
    for vx in range(DX):
        for vy in range(DY):
            for vz in range(DZ):
                pt = origin + vsize * np.array([vx, vy, vz])
                d = pt - pose[:3, 3]
                cam = pose[:3, :3].T @ d
                if cam[2] < 0:
                    continue
                with np.errstate(all="ignore"):
                    px = int(np.floor(abs(K[0, 0] * cam[0] / cam[2] + K[0, 2]) + 0.5)
                             * np.sign(K[0, 0] * cam[0] / cam[2] + K[0, 2])) \
                        if cam[2] != 0 else 10 ** 9
                    py = int(np.floor(abs(K[1, 1] * cam[1] / cam[2] + K[1, 2]) + 0.5)
                             * np.sign(K[1, 1] * cam[1] / cam[2] + K[1, 2])) \
                        if cam[2] != 0 else 10 ** 9
                if px < 0 or px >= W or py < 0 or py >= H:
                    continue
                dv = depth[py, px]
                if dv == 0:
                    continue
                diff = dv - cam[2]
                if diff < -trunc:
                    continue
                dist = min(1.0, diff / trunc)
                w_old = out_w[vx, vy, vz]
                w_new = w_old + obs_w
                out_w[vx, vy, vz] = w_new
                out_t[vx, vy, vz] = (out_t[vx, vy, vz] * w_old + obs_w * dist) / w_new
                oc = out_c[vx, vy, vz]
                ob = np.floor(oc / COLOR_CONST)
                og = np.floor((oc - ob * COLOR_CONST) / 256)
                orr = oc - ob * COLOR_CONST - og * 256
                nc = packed_color[py, px]
                nb = np.floor(nc / COLOR_CONST)
                ng = np.floor((nc - nb * COLOR_CONST) / 256)
                nr = nc - nb * COLOR_CONST - ng * 256
                rb = min(255.0, np.floor(abs((ob * w_old + obs_w * nb) / w_new) + 0.5))
                rg = min(255.0, np.floor(abs((og * w_old + obs_w * ng) / w_new) + 0.5))
                rr = min(255.0, np.floor(abs((orr * w_old + obs_w * nr) / w_new) + 0.5))
                out_c[vx, vy, vz] = rb * COLOR_CONST + rg * 256 + rr
    return out_t, out_w, out_c


def test_integrate_matches_oracle(rng):
    H, W = 12, 16
    K = np.array([[14.0, 0, W / 2], [0, 14.0, H / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -1.0  # camera 1 m behind origin looking at +z
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    depth[0, :] = 0.0  # invalid row
    image = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)

    bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.5, 1.5]])
    vol = TSDFVolume(bounds, voxel_size=0.2)
    vol.integrate(image, depth, K, pose)
    vol.integrate(image, depth * 0.9, K, pose)  # second frame, new depths

    want_t = np.ones(tuple(vol.vol_dim), np.float32)
    want_w = np.zeros_like(want_t)
    want_c = np.zeros_like(want_t)
    for d in (depth, depth * 0.9):
        want_t, want_w, want_c = numpy_integrate_oracle(
            want_t, want_w, want_c, vol.vol_origin, vol.voxel_size,
            pack_color(image), d, K, pose, 1.0, vol.trunc_margin)

    got_t, got_c = vol.get_volume()
    np.testing.assert_allclose(got_t, want_t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vol.weight).reshape(want_w.shape), want_w, atol=1e-6)
    np.testing.assert_array_equal(got_c, want_c)
    assert (np.asarray(vol.weight) > 0).any()


def test_pack_unpack_roundtrip(rng):
    img = rng.randint(0, 255, (4, 5, 3)).astype(np.uint8)
    packed = pack_color(img)
    np.testing.assert_array_equal(unpack_color(packed), img)


def test_marching_cubes_sphere():
    from dvmvs_tpu.utils.native import marching_cubes

    n = 24
    g = np.arange(n) - (n - 1) / 2.0
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    radius = 8.0
    sdf = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius).astype(np.float32)
    verts, faces, norms = marching_cubes(sdf, level=0.0)

    assert len(verts) > 100 and len(faces) > 100
    center = (n - 1) / 2.0
    r = np.linalg.norm(verts - center, axis=1)
    np.testing.assert_allclose(r, radius, atol=0.2)
    # normals point outward for an SDF (gradient ascent)
    outward = (verts - center) / r[:, None]
    cos = np.sum(norms * outward, axis=1)
    assert np.mean(cos) > 0.95
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_ply_writers(tmp_path, rng):
    from dvmvs_tpu.utils.native import write_mesh_ply, write_points_ply

    verts = rng.rand(5, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    norms = np.tile([0, 0, 1.0], (5, 1)).astype(np.float32)
    colors = rng.randint(0, 255, (5, 3)).astype(np.uint8)
    mesh_file = str(tmp_path / "mesh.ply")
    write_mesh_ply(mesh_file, verts, faces, norms, colors)
    content = open(mesh_file).read().splitlines()
    assert content[0] == "ply"
    assert "element vertex 5" in content
    assert "element face 2" in content
    assert content[-1] == "3 2 3 4"

    pc_file = str(tmp_path / "pc.ply")
    write_points_ply(pc_file, verts, colors)
    assert "element vertex 5" in open(pc_file).read()


def test_volume_bounds(rng):
    depth = np.full((8, 10), 2.0, np.float32)
    K = np.array([[10.0, 0, 5], [0, 10.0, 4], [0, 0, 1]])
    pose = np.eye(4)
    b = calculate_volume_bounds([depth], [pose], K)
    assert b[2, 1] >= 2.0  # frustum reaches max depth
    assert b[0, 0] < 0 < b[0, 1]


def test_integrate_frames_matches_sequential(rng):
    H, W = 12, 16
    K = np.array([[14.0, 0, W / 2], [0, 14.0, H / 2], [0, 0, 1]], np.float32)
    poses = []
    depths, images = [], []
    for i in range(5):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05 * i
        pose[2, 3] = -1.0
        poses.append(pose)
        depths.append(rng.uniform(1.0, 3.0, (H, W)).astype(np.float32))
        images.append(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))

    bounds = np.array([[-0.5, 0.5], [-0.5, 0.5], [0.5, 1.5]])
    seq = TSDFVolume(bounds, voxel_size=0.2)
    for img, d, p in zip(images, depths, poses):
        seq.integrate(img, d, K, p)
    batched = TSDFVolume(bounds, voxel_size=0.2)
    batched.integrate_frames(images, depths, K, poses, chunk=3)  # pads chunk 2

    ts, cs = seq.get_volume()
    tb, cb = batched.get_volume()
    np.testing.assert_allclose(tb, ts, atol=1e-6)
    np.testing.assert_array_equal(cb, cs)
    np.testing.assert_allclose(np.asarray(batched.weight), np.asarray(seq.weight))
