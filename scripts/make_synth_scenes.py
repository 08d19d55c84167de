"""Generate the procedural multi-scene proxy corpus
(dvmvs_tpu/data/synthetic.py) in the canonical layouts:

  <out>/train/scene_<seed>/{i:05d}.npz(image,depth-mm) poses.txt K.txt
  <out>/train/{train,validation}.txt
  <out>/eval/synth-eval/<nnn>/{images,depth,poses.txt,K.txt}

Eval scenes use UNSEEN seeds. Keyframe index files for the eval scenes are
produced separately by apps/simulate_keyframe_buffer (same as the
reference's simulate_keyframe_buffer.py workflow).

Usage: python scripts/make_synth_scenes.py --output data_synth \
           --train-scenes 12 --val-scenes 2 --eval-scenes 3 --frames 160
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvmvs_tpu.data.synthetic import SynthScene, default_K  # noqa: E402


def render_scene(seed, n_frames, width, height):
    scene = SynthScene(seed)
    poses = scene.trajectory(n_frames)
    K = default_K(width, height)
    frames = []
    for i in range(n_frames):
        rgb, depth = scene.render(poses[i], K, width, height)
        frames.append((rgb, depth))
    return K, poses, frames


def write_train_scene(out_dir, K, poses, frames):
    os.makedirs(out_dir, exist_ok=True)
    for i, (rgb, depth) in enumerate(frames):
        np.savez(os.path.join(out_dir, f"{i:05d}.npz"),
                 image=rgb,
                 depth=np.round(depth * 1000.0).astype(np.uint16))
    np.savetxt(os.path.join(out_dir, "poses.txt"),
               poses.reshape(len(poses), 16))
    np.savetxt(os.path.join(out_dir, "K.txt"), K)


def write_eval_scene(out_dir, K, poses, frames):
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    for i, (rgb, depth) in enumerate(frames):
        cv2.imwrite(os.path.join(out_dir, "images", f"{i:05d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i:05d}.png"),
                    np.round(depth * 1000.0).astype(np.uint16))
    np.savetxt(os.path.join(out_dir, "poses.txt"),
               poses.reshape(len(poses), 16))
    np.savetxt(os.path.join(out_dir, "K.txt"), K)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", required=True)
    ap.add_argument("--train-scenes", type=int, default=12)
    ap.add_argument("--val-scenes", type=int, default=2)
    ap.add_argument("--eval-scenes", type=int, default=3)
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--seed-base", type=int, default=100)
    args = ap.parse_args()

    train_root = os.path.join(args.output, "train")
    os.makedirs(train_root, exist_ok=True)
    train_names, val_names = [], []
    n_total = args.train_scenes + args.val_scenes
    for i in range(n_total):
        seed = args.seed_base + i
        name = f"scene_{seed:03d}" if i < args.train_scenes else f"val_{seed:03d}"
        print(f"render {name} (seed {seed})", flush=True)
        K, poses, frames = render_scene(
            seed, args.frames, args.width, args.height)
        write_train_scene(os.path.join(train_root, name), K, poses, frames)
        (train_names if i < args.train_scenes else val_names).append(name)
    with open(os.path.join(train_root, "train.txt"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    with open(os.path.join(train_root, "validation.txt"), "w") as f:
        f.write("\n".join(val_names) + "\n")

    eval_root = os.path.join(args.output, "eval", "synth-eval")
    for i in range(args.eval_scenes):
        seed = args.seed_base + n_total + i
        print(f"render eval {i:03d} (seed {seed})", flush=True)
        K, poses, frames = render_scene(
            seed, args.frames, args.width, args.height)
        write_eval_scene(os.path.join(eval_root, f"{i:03d}"), K, poses, frames)
    print("done:", args.output)


if __name__ == "__main__":
    main()
