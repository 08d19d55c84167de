"""Training dataset + input pipeline
(reference: dvmvs/dataset_loader.py:349-496).

Loads per-frame ``.npz`` archives ({image, depth}) + poses.txt + K.txt from
the canonical training layout, applies the reference's augmentations:
  - 50% random sequence reversal (train)
  - geometric scale: depth AND pose translation scaled by a random factor
    bounded so depths stay inside [min_depth, max_depth]
  - color: random brightness/contrast/gamma in random order, only when the
    mean RGB is in (55, 200)
  - ImageNet normalization

Output layout is TPU-native: NHWC float32 batches
(images (B,S,H,W,3), depths (B,S,H,W), poses (B,S,4,4), K (B,3,3)).

The pipeline is a host-side process pool feeding a double-buffered device
prefetcher — decode/augment of batch t+1 overlaps device compute of batch t.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from dvmvs_tpu.config import TrainConfig
from dvmvs_tpu.data.crawler import crawl
from dvmvs_tpu.data.preprocess import PreprocessImage


# ----------------------------------------------------------- color augmenters
def adjust_brightness(img: np.ndarray, value: float) -> np.ndarray:
    return np.clip(img + value, 0.0, 1.0)


def adjust_contrast(img: np.ndarray, value: float) -> np.ndarray:
    return np.clip(img * value, 0.0, 1.0)


def adjust_gamma(img: np.ndarray, value: float) -> np.ndarray:
    return np.clip(img ** value, 0.0, 1.0)


class MVSSequenceDataset:
    def __init__(
        self,
        root: str,
        split: str,
        subsequence_length: int,
        cfg: TrainConfig = TrainConfig(),
        scale_rgb: float = 255.0,
        mean_rgb: Sequence[float] = (0.485, 0.456, 0.406),
        std_rgb: Sequence[float] = (0.229, 0.224, 0.225),
        geometric_scale_augmentation: bool = False,
        seed: int = 0,
        scenes: Optional[List[str]] = None,
    ):
        self.root = root
        self.split = split
        self.cfg = cfg
        self.subsequence_length = subsequence_length
        self.scale_rgb = scale_rgb
        self.mean_rgb = list(mean_rgb)
        self.std_rgb = list(std_rgb)
        self.geometric_scale_augmentation = geometric_scale_augmentation
        self.rng = np.random.RandomState(seed)
        self.pyrng = random.Random(seed)

        if scenes is None:
            split_file = os.path.join(root, "train.txt" if split == "TRAINING" else "validation.txt")
            scenes = [l.strip() for l in open(split_file) if l.strip()]
        self.scenes = scenes
        self.samples = crawl(
            root, scenes, subsequence_length,
            min_pose_distance=cfg.minimum_pose_distance,
            max_pose_distance=cfg.maximum_pose_distance,
            crawl_step=cfg.crawl_step,
            num_workers=cfg.data_pipeline_workers,
            seed=seed,
        )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        sample = self.samples[index]
        scene_path = os.path.join(self.root, sample["scene"])
        indices = list(sample["indices"])

        K = np.loadtxt(os.path.join(scene_path, "K.txt"), dtype=np.float32)
        scene_poses = np.reshape(
            np.loadtxt(os.path.join(scene_path, "poses.txt"), dtype=np.float32), (-1, 4, 4))
        npzs = sorted(
            os.path.join(scene_path, f) for f in os.listdir(scene_path) if f.endswith(".npz"))

        if self.split == "TRAINING" and self.rng.random_sample() > 0.5:
            indices.reverse()

        raw = [np.load(npzs[i]) for i in indices]
        raw_images = [r["image"] for r in raw]
        raw_depths = [r["depth"] for r in raw]
        raw_poses = [scene_poses[i] for i in indices]

        pre = PreprocessImage(
            K=K,
            old_width=raw_images[0].shape[1],
            old_height=raw_depths[0].shape[0],
            new_width=self.cfg.image_width,
            new_height=self.cfg.image_height,
            distortion_crop=0,
        )

        depth_cfg = self.cfg.depth
        min_d, max_d = depth_cfg.max_depth, depth_cfg.min_depth
        images, depths = [], []
        rgb_sum = 0.0
        for img, dep in zip(raw_images, raw_depths):
            d = dep.astype(np.float32) / 1000.0
            d[~np.isfinite(d)] = 0.0
            d = pre.apply_depth(d)
            depths.append(d)
            valid = d[d > 0]
            if valid.size:
                min_d = min(min_d, float(valid.min()))
                max_d = max(max_d, float(valid.max()))
            im = pre.apply_rgb(img, 1.0, [0.0] * 3, [1.0] * 3, normalize_colors=False)
            rgb_sum += im.sum()
            images.append(im)
        rgb_average = rgb_sum / (len(images) * self.cfg.image_height * self.cfg.image_width * 3)

        geometric_scale_factor = 1.0
        if self.geometric_scale_augmentation:
            lo_bound = depth_cfg.min_depth / min_d
            hi_bound = depth_cfg.max_depth / max_d
            if self.rng.random_sample() > 0.5:
                lo, hi = max(lo_bound, 0.666), min(hi_bound, 1.5)
            else:
                lo, hi = max(lo_bound, 0.8), min(hi_bound, 1.25)
            geometric_scale_factor = self.rng.uniform(low=lo, high=hi)

        color_transforms = [
            (adjust_gamma, self.pyrng.uniform(0.8, 1.2)),
            (adjust_contrast, self.pyrng.uniform(0.8, 1.2)),
            (adjust_brightness, self.pyrng.uniform(-0.03, 0.03)),
        ]
        self.pyrng.shuffle(color_transforms)

        out_images, out_depths, out_poses = [], [], []
        for im, d, pose in zip(images, depths, raw_poses):
            im = im.astype(np.float32) / 255.0
            if self.split == "TRAINING" and 55.0 < rgb_average < 200.0:
                for fn, v in color_transforms:
                    im = fn(im, v)
            im = (im * 255.0) / self.scale_rgb
            for c in range(3):
                im[:, :, c] = (im[:, :, c] - self.mean_rgb[c]) / self.std_rgb[c]
            pose = pose.astype(np.float32).copy()
            pose[0:3, 3] *= geometric_scale_factor
            out_images.append(im)
            out_depths.append(d * geometric_scale_factor)
            out_poses.append(pose)

        return {
            "images": np.stack(out_images).astype(np.float32),
            "depths": np.stack(out_depths).astype(np.float32),
            "poses": np.stack(out_poses).astype(np.float32),
            "K": pre.get_updated_intrinsics().astype(np.float32),
        }


def batch_iterator(
    dataset: MVSSequenceDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    for start in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
        idx = order[start : start + batch_size]
        if drop_last and len(idx) < batch_size:
            break
        items = [dataset[i] for i in idx]
        yield {k: np.stack([it[k] for it in items]) for k in items[0]}


def device_prefetch(iterator, sharding=None, buffer_size: int = 2):
    """Double-buffered host->device feed: device_put of batch t+1 is issued
    while batch t computes (XLA dispatch is async)."""
    import jax

    buf = []
    for batch in iterator:
        put = jax.device_put(batch, sharding) if sharding is not None else jax.device_put(batch)
        buf.append(put)
        if len(buf) == buffer_size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
