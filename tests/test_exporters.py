"""Exporter tests on synthetic raw datasets."""

import os
import struct
import zlib

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dvmvs_tpu.data.exporters.scannet import (
    SensorData,
    export_scene,
    register_color_to_depth,
    sanity_check,
)
from dvmvs_tpu.data.exporters.tum_rgbd import export_sequence as export_tum
from dvmvs_tpu.data.exporters.point_cloud import depth_image_to_point_cloud


def _write_sens(path, n_frames=4, color_hw=(12, 16), depth_hw=(6, 8), rng=None):
    rng = rng or np.random.RandomState(0)
    Kc = np.eye(4, dtype=np.float32)
    Kc[0, 0], Kc[1, 1], Kc[0, 2], Kc[1, 2] = 16.0, 16.0, 8.0, 6.0
    Kd = np.eye(4, dtype=np.float32)
    Kd[0, 0], Kd[1, 1], Kd[0, 2], Kd[1, 2] = 8.0, 8.0, 4.0, 3.0
    ext = np.eye(4, dtype=np.float32)

    frames = []
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"synthetic"
        f.write(struct.pack("Q", len(name)) + name)
        for M in (Kc, ext, Kd, ext):
            f.write(M.astype(np.float32).tobytes())
        f.write(struct.pack("i", 2))  # jpeg color
        f.write(struct.pack("i", 1))  # zlib_ushort depth
        f.write(struct.pack("I", color_hw[1]) + struct.pack("I", color_hw[0]))
        f.write(struct.pack("I", depth_hw[1]) + struct.pack("I", depth_hw[0]))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", n_frames))
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = 0.1 * i
            if i == 2:
                pose[1, 1] = np.nan  # invalid pose frame
            color = rng.randint(0, 255, color_hw + (3,)).astype(np.uint8)
            ok, jpg = cv2.imencode(".jpg", color)
            assert ok
            depth = rng.randint(500, 3000, depth_hw).astype(np.uint16)
            dz = zlib.compress(depth.tobytes())
            f.write(pose.tobytes())
            f.write(struct.pack("Q", 11) + struct.pack("Q", 22))  # timestamps
            f.write(struct.pack("Q", len(jpg.tobytes())))
            f.write(struct.pack("Q", len(dz)))
            f.write(jpg.tobytes())
            f.write(dz)
            frames.append((pose, depth))
    return frames


def test_sens_parser_roundtrip(tmp_path, rng):
    sens = tmp_path / "scene0000_00"
    sens.mkdir()
    frames = _write_sens(str(sens / "scene0000_00.sens"), rng=rng)
    sd = SensorData(str(sens / "scene0000_00.sens"))
    assert sd.num_frames == 4
    assert sd.depth_width == 8 and sd.depth_height == 6
    assert sd.color_compression == "jpeg" and sd.depth_compression == "zlib_ushort"
    color, depth = sd.decode_frame(sd.frames[0])
    np.testing.assert_array_equal(depth, frames[0][1])
    assert color.shape == (6, 8, 3)

    out_root = tmp_path / "out_test"
    out_root.mkdir()
    export_scene(str(sens), str(out_root), train=False, frame_skip=1)
    scene_out = out_root / "scene0000_00"
    assert len(os.listdir(scene_out / "images")) == 4
    assert len(os.listdir(scene_out / "depth")) == 4
    poses = np.loadtxt(scene_out / "poses.txt").reshape(-1, 4, 4)
    assert len(poses) == 4
    assert sanity_check(str(out_root), train=False) == []

    out_train = tmp_path / "out_train"
    out_train.mkdir()
    export_scene(str(sens), str(out_train), train=True, frame_skip=1)
    npzs = [f for f in os.listdir(out_train / "scene0000_00") if f.endswith(".npz")]
    # the NaN-pose frame is dropped in train mode
    assert len(npzs) == 3
    poses = np.loadtxt(out_train / "scene0000_00" / "poses.txt")
    assert len(poses) == 3 and np.isfinite(poses).all()
    assert sanity_check(str(out_train), train=True) == []


def test_register_color_matches_torch_nearest(rng):
    color = rng.randint(0, 255, (12, 16, 3)).astype(np.uint8)
    Kc = np.array([[16.0, 0, 8.0], [0, 16.0, 6.0], [0, 0, 1]])
    Kd = np.array([[8.0, 0, 4.0], [0, 8.0, 3.0], [0, 0, 1]])
    got = register_color_to_depth(color, (6, 8), Kc, Kd)

    # torch oracle with the reference's W/2-normalizer + nearest grid_sample
    H = Kc @ np.linalg.inv(Kd)
    xs, ys = np.meshgrid(np.arange(8, dtype=np.float64), np.arange(6, dtype=np.float64))
    coords = H @ np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
    gx = coords[0] / (coords[2] + 1e-8) / (16 / 2.0) - 1.0
    gy = coords[1] / (coords[2] + 1e-8) / (12 / 2.0) - 1.0
    grid = torch.from_numpy(
        np.stack([gx, gy], -1).reshape(1, 6, 8, 2).astype(np.float32))
    img = torch.from_numpy(color.transpose(2, 0, 1)[None].astype(np.float32))
    want = F.grid_sample(img, grid, mode="nearest", padding_mode="zeros",
                         align_corners=True)[0].numpy().transpose(1, 2, 0).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_tum_exporter(tmp_path, rng):
    seq = "rgbd_dataset_test"
    in_dir = tmp_path / "raw" / seq
    (in_dir / "rgb").mkdir(parents=True)
    (in_dir / "depth").mkdir()
    n = 5
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = 100.0 + i * 0.1
        cv2.imwrite(str(in_dir / "rgb" / f"{t:.4f}.png"),
                    rng.randint(0, 255, (8, 10, 3)).astype(np.uint8))
        cv2.imwrite(str(in_dir / "depth" / f"{t:.4f}.png"),
                    rng.randint(1000, 20000, (8, 10)).astype(np.uint16))
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t:.4f} depth/{t:.4f}.png")
        gt_lines.append(f"{t + 0.01:.4f} {0.1 * i:.3f} 0 0 0 0 0 1")
    (in_dir / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (in_dir / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (in_dir / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

    out = tmp_path / "out"
    out.mkdir()
    export_tum(seq, str(tmp_path / "raw"), str(out))
    scene = out / seq
    assert len(os.listdir(scene / "images")) == n
    poses = np.loadtxt(scene / "poses.txt").reshape(-1, 4, 4)
    np.testing.assert_allclose(poses[3, 0, 3], 0.3, atol=1e-6)
    d = cv2.imread(str(scene / "depth" / "000000.png"), -1)
    assert d.dtype == np.uint16 and d.max() <= 4000  # /5 scaling applied


def test_depth_image_to_point_cloud(rng):
    depth = np.full((4, 6), 2.0, np.float32)
    depth[0, 0] = 0.0
    rgb = rng.randint(0, 255, (4, 6, 3)).astype(np.uint8)
    K = np.array([[6.0, 0, 3.0], [0, 6.0, 2.0], [0, 0, 1]])
    pose = np.eye(4)
    pose[0, 3] = 1.0
    pts = depth_image_to_point_cloud(rgb, depth, K, pose)
    assert pts.shape == (23, 6)  # one invalid pixel dropped
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-6)  # z in world = depth
    # pixel (u=3, v=2) backprojects to x=0 camera + 1.0 translation
    assert np.any(np.isclose(pts[:, 0], 1.0, atol=1e-6))


def test_read_pfm_roundtrip(tmp_path, rng):
    from dvmvs_tpu.data.io import read_pfm

    h, w = 6, 9
    data = rng.rand(h, w).astype(np.float32)
    path = str(tmp_path / "img.pfm")
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        np.flipud(data).astype("<f").tofile(f)
    got, scale = read_pfm(path)
    np.testing.assert_allclose(got, data)
    assert scale == 1.0
