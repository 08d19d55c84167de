"""Build the in-sandbox accuracy-proxy dataset from the hololens sample
scene (the reference's 373-frame end-to-end fixture,
sample-data/hololens-dataset/000): temporally disjoint train / validation /
held-out-eval splits.

Layout produced under --output:
  train/               canonical TRAINING layout (MVSSequenceDataset)
    train.txt validation.txt
    scene_000..N/  {i:05d}.npz(image,depth-mm) poses.txt K.txt
    val_000/       same
  eval/hololens-eval/000/   canonical test layout (images/ depth/ poses.txt K.txt)
  eval/indices/keyframe+hololens-eval+000+nmeas+{1,2}

The eval split is the LAST frames of the sequence, never seen in training.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_scene(scene):
    K = np.loadtxt(os.path.join(scene, "K.txt")).astype(np.float32)
    poses = np.fromfile(os.path.join(scene, "poses.txt"), dtype=float,
                        sep="\n ").reshape(-1, 4, 4)
    images = sorted(os.listdir(os.path.join(scene, "images")))
    depths = sorted(os.listdir(os.path.join(scene, "depth")))
    return K, poses, images, depths


def write_train_scene(out_dir, scene, K, poses, images, depths, indices):
    os.makedirs(out_dir, exist_ok=True)
    sel_poses = []
    for j, i in enumerate(indices):
        img = cv2.cvtColor(
            cv2.imread(os.path.join(scene, "images", images[i])), cv2.COLOR_BGR2RGB)
        dep = cv2.imread(os.path.join(scene, "depth", depths[i]), -1)  # uint16 mm
        np.savez(os.path.join(out_dir, f"{j:05d}.npz"),
                 image=img.astype(np.uint8), depth=dep.astype(np.uint16))
        sel_poses.append(poses[i].reshape(-1))
    np.savetxt(os.path.join(out_dir, "poses.txt"), np.array(sel_poses))
    np.savetxt(os.path.join(out_dir, "K.txt"), K)


def write_eval_scene(out_dir, scene, K, poses, images, depths, indices):
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    sel_poses = []
    for j, i in enumerate(indices):
        shutil.copy(os.path.join(scene, "images", images[i]),
                    os.path.join(out_dir, "images", f"{j:05d}.png"))
        shutil.copy(os.path.join(scene, "depth", depths[i]),
                    os.path.join(out_dir, "depth", f"{j:05d}.png"))
        sel_poses.append(poses[i].reshape(-1))
    np.savetxt(os.path.join(out_dir, "poses.txt"), np.array(sel_poses))
    np.savetxt(os.path.join(out_dir, "K.txt"), K)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene",
                    default="/root/reference/sample-data/hololens-dataset/000")
    ap.add_argument("--output", default="/root/repo/data_proxy")
    ap.add_argument("--train-frames", type=int, default=250)
    ap.add_argument("--val-frames", type=int, default=60)
    ap.add_argument("--scene-length", type=int, default=50)
    args = ap.parse_args()

    K, poses, images, depths = load_scene(args.scene)
    n = min(len(poses), len(images), len(depths))
    assert args.train_frames + args.val_frames < n

    train_root = os.path.join(args.output, "train")
    os.makedirs(train_root, exist_ok=True)
    train_names = []
    for s, start in enumerate(range(0, args.train_frames, args.scene_length)):
        idx = list(range(start, min(start + args.scene_length, args.train_frames)))
        name = f"scene_{s:03d}"
        write_train_scene(os.path.join(train_root, name), args.scene,
                          K, poses, images, depths, idx)
        train_names.append(name)
    val_idx = list(range(args.train_frames, args.train_frames + args.val_frames))
    write_train_scene(os.path.join(train_root, "val_000"), args.scene,
                      K, poses, images, depths, val_idx)
    with open(os.path.join(train_root, "train.txt"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    with open(os.path.join(train_root, "validation.txt"), "w") as f:
        f.write("val_000\n")

    eval_idx = list(range(args.train_frames + args.val_frames, n))
    eval_scene = os.path.join(args.output, "eval", "hololens-eval", "000")
    write_eval_scene(eval_scene, args.scene, K, poses, images, depths, eval_idx)

    from dvmvs_tpu.apps.simulate_keyframe_buffer import simulate_dataset

    indices_dir = os.path.join(args.output, "eval", "indices")
    for nmeas in (1, 2):
        simulate_dataset(os.path.join(args.output, "eval", "hololens-eval"),
                         indices_dir, nmeas)

    print(f"train scenes: {train_names} ({args.train_frames} frames), "
          f"val: {args.val_frames}, eval: {len(eval_idx)} frames -> {args.output}")


if __name__ == "__main__":
    main()
