"""Prediction visualization (reference: dvmvs/utils.py:355-366).

``visualize_predictions`` replicates the reference's live cv2 windows
(reference / measurement image + x5000 uint16 depth) when a display is
available; on headless TPU hosts the same panels are written as PNG files
via ``save_visualization``.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def display_available() -> bool:
    """cv2 windows need a display; Linux headless hosts have no $DISPLAY."""
    import sys

    return bool(os.environ.get("DISPLAY")) or sys.platform == "darwin"


def visualize_predictions(
    reference_image: np.ndarray,
    measurement_image: np.ndarray,
    predicted_depth: np.ndarray,
    mean_rgb,
    std_rgb,
    scale_rgb: float,
    depth_multiplier: float = 5000.0,
    wait: bool = True,
):
    """Live windows matching the reference (dvmvs/utils.py:355-366):
    denormalized reference + measurement images and the predicted depth
    scaled by ``depth_multiplier`` as uint16. ``wait=True`` blocks for a
    keypress per frame, as the reference's cv2.waitKey() does."""
    ref = denormalize_image(reference_image, mean_rgb, std_rgb, scale_rgb)
    meas = denormalize_image(measurement_image, mean_rgb, std_rgb, scale_rgb)
    cv2.imshow("Reference Image", cv2.cvtColor(ref, cv2.COLOR_RGB2BGR))
    cv2.imshow("A Measurement Image", cv2.cvtColor(meas, cv2.COLOR_RGB2BGR))
    cv2.imshow("Predicted Depth",
               (depth_multiplier * predicted_depth).astype(np.uint16))
    cv2.waitKey(0 if wait else 1)


def denormalize_image(image: np.ndarray, mean_rgb, std_rgb, scale_rgb: float) -> np.ndarray:
    img = image * np.array(std_rgb) + np.array(mean_rgb)
    return np.clip(img * scale_rgb, 0, 255).astype(np.uint8)


def colorize_depth(depth: np.ndarray, max_depth: float = 5.0) -> np.ndarray:
    d = np.clip(depth / max_depth, 0, 1)
    return cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_TURBO)


def save_visualization(
    out_dir: str,
    index: int,
    reference_image: np.ndarray,
    measurement_image: np.ndarray,
    predicted_depth: np.ndarray,
    mean_rgb,
    std_rgb,
    scale_rgb: float,
    depth_multiplier: float = 5000.0,
):
    os.makedirs(out_dir, exist_ok=True)
    ref = denormalize_image(reference_image, mean_rgb, std_rgb, scale_rgb)
    meas = denormalize_image(measurement_image, mean_rgb, std_rgb, scale_rgb)
    cv2.imwrite(os.path.join(out_dir, f"{index:05d}_reference.png"),
                cv2.cvtColor(ref, cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(out_dir, f"{index:05d}_measurement.png"),
                cv2.cvtColor(meas, cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(out_dir, f"{index:05d}_depth.png"),
                (depth_multiplier * predicted_depth).astype(np.uint16))
    cv2.imwrite(os.path.join(out_dir, f"{index:05d}_depth_color.png"),
                colorize_depth(predicted_depth))
