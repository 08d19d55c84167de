"""Multi-scale masked depth losses (reference: dvmvs/losses.py:7-82).

Pure-jnp and jit/grad-safe: valid-pixel selection uses masked sums (the
reference's boolean indexing would be a dynamic shape). The loss actually
used by both training drivers is L1-inv: |1/gt - 1/pred| over valid pixels.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from dvmvs_tpu.ops.sampling import resize_nearest

LOSS_TYPES = ("L1", "L1-inv", "L1-rel", "Huber")


def calculate_loss(groundtruth: jnp.ndarray, prediction: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Loss sums for one prediction scale.

    groundtruth: (B, H, W) full-res depth (0 = invalid);
    prediction: (B, h, w) at any scale. GT is nearest-downsampled to the
    prediction scale. Returns dict of scalar sums + ``valid_count``.
    """
    B, h, w = prediction.shape
    gt = resize_nearest(groundtruth, h, w)
    mask = (gt != 0).astype(prediction.dtype)
    count = jnp.sum(mask)

    safe_gt = jnp.where(gt != 0, gt, 1.0)
    diff = jnp.abs(gt - prediction) * mask

    # torch smooth_l1_loss (beta=1): 0.5*x^2 if |x|<1 else |x|-0.5
    absdiff = jnp.abs(gt - prediction)
    huber = jnp.where(absdiff < 1.0, 0.5 * absdiff ** 2, absdiff - 0.5) * mask

    l1_inv = jnp.abs(1.0 / safe_gt - 1.0 / prediction) * mask
    l1_rel = diff / safe_gt

    return {
        "l1": jnp.sum(diff),
        "huber": jnp.sum(huber),
        "l1_inv": jnp.sum(l1_inv),
        "l1_rel": jnp.sum(l1_rel),
        "valid_count": count,
    }


def multi_scale_loss(
    predictions: Sequence[jnp.ndarray],
    weights: Sequence[float],
    groundtruth: jnp.ndarray,
    loss_type: str = "L1-inv",
):
    """Weighted per-scale loss: sum_j w_j * (loss_j / valid_count_j).

    Returns (optimizer_loss, metrics-dict-of-the-last-scale) — mirroring the
    reference's update_losses which reports meters for each scale but
    optimizes the weighted normalized sum (dvmvs/losses.py:26-50).
    """
    key = {"L1": "l1", "L1-inv": "l1_inv", "L1-rel": "l1_rel", "Huber": "huber"}[loss_type]
    total = 0.0
    last = None
    for w, pred in zip(weights, predictions):
        terms = calculate_loss(groundtruth, pred)
        denom = jnp.maximum(terms["valid_count"], 1.0)
        total = total + w * (terms[key] / denom)
        last = terms
    return total, last


class LossMeter:
    """Host-side running average (reference: dvmvs/losses.py:7-23)."""

    def __init__(self):
        self.count = 0.0
        self.sum = 0.0
        self.avg = 0.0
        self.item_average = 0.0

    def update(self, loss: float, count: float):
        self.sum += loss
        self.count += count
        self.avg = self.sum / self.count
        self.item_average = loss / count

    def __repr__(self):
        return f"{self.item_average:.4f} ({self.avg:.4f})"
