"""Baseline plugin protocol + registry."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


class DepthEstimator:
    """Protocol for pluggable depth estimators driven by the shared
    evaluation loop (apps/run_testing_baseline.py).

    Attributes:
      image_width/image_height: working resolution
      scale_rgb/mean_rgb/std_rgb: preprocessing normalization
    """

    image_width: int = 320
    image_height: int = 256
    scale_rgb: float = 1.0
    mean_rgb: Sequence[float] = (81.0, 81.0, 81.0)
    std_rgb: Sequence[float] = (35.0, 35.0, 35.0)

    def reset(self):
        """Called on new scene / TRACKING LOST."""

    def predict(
        self,
        ref_image: np.ndarray,
        meas_images: List[np.ndarray],
        ref_pose: np.ndarray,
        meas_poses: List[np.ndarray],
        K: np.ndarray,
    ) -> np.ndarray:
        raise NotImplementedError


BASELINE_REGISTRY: Dict[str, Callable[..., DepthEstimator]] = {}


def register_baseline(name: str):
    def deco(cls):
        BASELINE_REGISTRY[name] = cls
        return cls
    return deco
