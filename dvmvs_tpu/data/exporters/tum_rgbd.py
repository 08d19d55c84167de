"""TUM RGB-D exporter (reference: dataset/tum-rgbd-export/tum-rgbd-export.py).

Nearest-timestamp matching of rgb/depth/groundtruth streams per depth frame;
quaternion poses -> 4x4 camera-to-world; depth scaled /5 into millimeters
(TUM stores 5000 units per meter); K = [525, 525, 320, 240]; 13 sequences.
"""

from __future__ import annotations

import argparse
import os
from functools import partial
from multiprocessing.pool import Pool

import cv2
import numpy as np
from scipy.spatial.transform import Rotation

K_TUM = np.array([[525.0, 0.0, 320.0], [0.0, 525.0, 240.0], [0.0, 0.0, 1.0]])

SEQUENCES = [
    "rgbd_dataset_freiburg1_desk",
    "rgbd_dataset_freiburg1_plant",
    "rgbd_dataset_freiburg1_room",
    "rgbd_dataset_freiburg1_teddy",
    "rgbd_dataset_freiburg2_desk",
    "rgbd_dataset_freiburg2_dishes",
    "rgbd_dataset_freiburg2_large_no_loop",
    "rgbd_dataset_freiburg3_cabinet",
    "rgbd_dataset_freiburg3_long_office_household",
    "rgbd_dataset_freiburg3_nostructure_notexture_far",
    "rgbd_dataset_freiburg3_nostructure_texture_far",
    "rgbd_dataset_freiburg3_structure_notexture_far",
    "rgbd_dataset_freiburg3_structure_texture_far",
]


def export_sequence(sequence: str, input_root: str, output_root: str):
    in_dir = os.path.join(input_root, sequence)
    out_dir = os.path.join(output_root, sequence)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)

    image_files = sorted(os.listdir(os.path.join(in_dir, "rgb")))
    image_ts = np.loadtxt(os.path.join(in_dir, "rgb.txt"), usecols=0)
    depth_files = sorted(os.listdir(os.path.join(in_dir, "depth")))
    depth_ts = np.loadtxt(os.path.join(in_dir, "depth.txt"), usecols=0)
    gt = np.loadtxt(os.path.join(in_dir, "groundtruth.txt"))
    pose_ts, locations, quats = gt[:, 0], gt[:, 1:4], gt[:, 4:]

    poses = []
    for i, dfile in enumerate(depth_files):
        t = depth_ts[i]
        pi = int(np.argmin(np.abs(pose_ts - t)))
        ii = int(np.argmin(np.abs(image_ts - t)))
        pose = np.eye(4)
        pose[:3, :3] = Rotation.from_quat(quats[pi]).as_matrix()
        pose[:3, 3] = locations[pi]
        poses.append(pose.ravel())

        image = cv2.imread(os.path.join(in_dir, "rgb", image_files[ii]), -1)
        depth = (cv2.imread(os.path.join(in_dir, "depth", dfile), -1).astype(float) / 5).astype(np.uint16)
        name = str(i).zfill(6) + ".png"
        cv2.imwrite(os.path.join(out_dir, "images", name), image, [cv2.IMWRITE_PNG_COMPRESSION, 3])
        cv2.imwrite(os.path.join(out_dir, "depth", name), depth, [cv2.IMWRITE_PNG_COMPRESSION, 3])

    np.savetxt(os.path.join(out_dir, "poses.txt"), np.array(poses))
    np.savetxt(os.path.join(out_dir, "K.txt"), K_TUM)
    return sequence


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--sequences", nargs="*", default=SEQUENCES)
    ap.add_argument("--workers", type=int, default=6)
    args = ap.parse_args()
    with Pool(args.workers) as pool:
        for name in pool.imap_unordered(
                partial(export_sequence, input_root=args.input,
                        output_root=args.output), args.sequences):
            print("finished", name)


if __name__ == "__main__":
    main()
