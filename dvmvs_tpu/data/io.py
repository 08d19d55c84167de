"""Scene file I/O for the canonical dataset layout.

Canonical scene (reference: README.md:88-100): ``images/*.png`` RGB,
``depth/*.png`` uint16 millimeters, ``poses.txt`` flattened 4x4
camera-to-world per line, ``K.txt`` 3x3 intrinsics.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import cv2
import numpy as np


def load_image(path: str) -> np.ndarray:
    """RGB float32 (H, W, 3), values 0..255."""
    image = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32)
    return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)


def load_depth_png(path: str, scaling: float = 1000.0) -> np.ndarray:
    """uint16 millimeter PNG -> float32 meters."""
    return cv2.imread(path, -1).astype(np.float32) / scaling


@dataclass
class Scene:
    name: str
    path: str
    K: np.ndarray  # (3, 3)
    poses: np.ndarray  # (N, 4, 4)
    image_filenames: List[str]
    depth_filenames: Optional[List[str]]


def load_scene(scene_path: str) -> Scene:
    K = np.loadtxt(os.path.join(scene_path, "K.txt")).astype(np.float32)
    poses = np.fromfile(os.path.join(scene_path, "poses.txt"), dtype=float, sep="\n ").reshape(-1, 4, 4)
    images_dir = os.path.join(scene_path, "images")
    image_filenames = sorted(
        os.path.join(images_dir, f) for f in os.listdir(images_dir) if f.endswith(".png")
    )
    depth_dir = os.path.join(scene_path, "depth")
    depth_filenames = None
    if os.path.isdir(depth_dir):
        depth_filenames = sorted(
            os.path.join(depth_dir, f) for f in os.listdir(depth_dir) if f.endswith(".png")
        )
    return Scene(
        name=os.path.basename(os.path.normpath(scene_path)),
        path=scene_path,
        K=K,
        poses=poses,
        image_filenames=image_filenames,
        depth_filenames=depth_filenames,
    )


def read_pfm(path: str):
    """Read a PFM image (reference: dataset/utils.py:68-108).

    Returns (data (H, W) or (H, W, 3) float32, scale). PFM stores rows
    bottom-up; the returned array is top-down.
    """
    import re

    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")

        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dims.groups())

        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)

        data = np.fromfile(f, endian + "f")
        shape = (height, width, 3) if color else (height, width)
        data = np.reshape(data, shape)
        return np.flipud(data).astype(np.float32), scale
