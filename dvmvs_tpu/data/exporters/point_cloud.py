"""Debug point-cloud builder: backproject GT depth to colored PLY chunks
(reference: dataset/build_point_cloud.py, dataset/utils.py:6-59).
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from dvmvs_tpu.utils.native import write_points_ply


def depth_image_to_point_cloud(rgb: np.ndarray, depth: np.ndarray, K: np.ndarray,
                               pose: np.ndarray, scale: float = 1.0):
    """Backproject a depth map to world-frame colored points (N, 6)."""
    h, w = depth.shape
    u, v = np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))
    Z = depth.astype(float) / scale
    X = (u - K[0, 2]) * Z / K[0, 0]
    Y = (v - K[1, 2]) * Z / K[1, 1]
    valid = Z.ravel() > 0
    pts = np.stack([X.ravel()[valid], Y.ravel()[valid], Z.ravel()[valid],
                    np.ones(valid.sum())])
    world = (pose @ pts)[:3].T
    colors = rgb.reshape(-1, 3)[valid]
    return np.hstack([world, colors]).astype(np.float32)


def build_point_cloud(dataset_folder: str, scene_name: str, output_folder: str = ".",
                      frame_stride: int = 10, frames_per_chunk: int = 30):
    scene = os.path.join(dataset_folder, scene_name)
    poses = np.fromfile(os.path.join(scene, "poses.txt"), dtype=float, sep="\n ").reshape(-1, 4, 4)
    K = np.loadtxt(os.path.join(scene, "K.txt"))
    images = sorted(os.listdir(os.path.join(scene, "images")))
    depths = sorted(os.listdir(os.path.join(scene, "depth")))

    os.makedirs(output_folder, exist_ok=True)
    chunk, part = [], 1
    for n, i in enumerate(range(0, len(images), frame_stride)):
        rgb = cv2.cvtColor(cv2.imread(os.path.join(scene, "images", images[i])), cv2.COLOR_BGR2RGB)
        depth = cv2.imread(os.path.join(scene, "depth", depths[i]), -1).astype(np.float32) / 1000.0
        chunk.append(depth_image_to_point_cloud(rgb, depth, K, poses[i]))
        if (n + 1) % frames_per_chunk == 0:
            pts = np.vstack(chunk)
            write_points_ply(
                os.path.join(output_folder, f"{scene_name}_point_cloud_part{part}.ply"),
                pts[:, :3], pts[:, 3:].astype(np.uint8))
            chunk, part = [], part + 1
    if chunk:
        pts = np.vstack(chunk)
        write_points_ply(
            os.path.join(output_folder, f"{scene_name}_point_cloud_part_last.ply"),
            pts[:, :3], pts[:, 3:].astype(np.uint8))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--scene", required=True)
    ap.add_argument("--output", default="point_clouds")
    ap.add_argument("--stride", type=int, default=10)
    args = ap.parse_args()
    build_point_cloud(args.dataset, args.scene, args.output, args.stride)


if __name__ == "__main__":
    main()
