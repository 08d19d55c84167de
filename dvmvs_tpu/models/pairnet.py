"""PairNet: the stateless backbone (reference: dvmvs/pairnet/model.py).

features -> plane-sweep cost volume -> hourglass encoder -> decoder.

The reference runs 5 separate torch modules per frame from Python; here the
whole network is one Flax module with two entry methods:

  - ``extract_features``: MnasNet + FPN on a batch of images. The online
    driver calls this once per accepted keyframe and caches the result —
    the reference recomputes measurement-frame features every step
    (fusionnet/run-testing-online.py:160-163); caching is numerically
    identical and removes V redundant backbone passes per frame.
  - ``predict_depth``: cost volume -> encoder -> decoder from cached
    features (static measurement count V with a validity mask).

``__call__`` composes both for a self-contained forward pass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dvmvs_tpu.models.decoder import CostVolumeDecoder
from dvmvs_tpu.models.encoder import CostVolumeEncoder
from dvmvs_tpu.models.fpn import FeatureShrinker
from dvmvs_tpu.models.mnasnet import MnasFeatureExtractor
from dvmvs_tpu.ops.cost_volume import cost_volume_fused


def scale_intrinsics(K: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Scale fx, fy, cx, cy (the first two rows) by ``factor``."""
    scale = jnp.asarray([factor, factor, 1.0], dtype=K.dtype)[None, :, None]
    return K * scale


class PairNet(nn.Module):
    min_depth: float = 0.25
    max_depth: float = 20.0
    n_depth_levels: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = MnasFeatureExtractor(self.dtype, name="feature_extractor")
        self.feature_shrinker = FeatureShrinker(32, self.dtype, name="feature_shrinker")
        self.cost_volume_encoder = CostVolumeEncoder(32, self.dtype, name="cost_volume_encoder")
        self.cost_volume_decoder = CostVolumeDecoder(
            self.min_depth, self.max_depth, 32, self.dtype, name="cost_volume_decoder")

    def extract_features(self, images: jnp.ndarray, train: bool = False):
        """images (N, H, W, 3) -> (half, quarter, one_eight, one_sixteen)."""
        l1, l2, l3, l4, l5 = self.feature_extractor(images, train)
        return self.feature_shrinker(l1, l2, l3, l4, l5)

    def predict_depth(
        self,
        ref_image: jnp.ndarray,
        ref_features: Tuple[jnp.ndarray, ...],
        meas_feature_half: jnp.ndarray,
        ref_pose: jnp.ndarray,
        meas_poses: jnp.ndarray,
        K: jnp.ndarray,
        view_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """Cost volume -> encoder -> decoder.

        ref_features: tuple from ``extract_features`` for the reference
        frame; meas_feature_half: (B, V, H/2, W/2, C) cached measurement
        half-res features; K: full-resolution intrinsics (B, 3, 3).
        Returns 5 depth maps (full..one_sixteen), each (B, h, w).
        """
        f_half, f_quarter, f_one_eight, f_one_sixteen = ref_features
        half_K = scale_intrinsics(K, 0.5)

        # The plane-sweep kernel runs in f32 regardless of the model's
        # compute dtype (sampling weights need f32); cast at the boundary.
        cost_volume = cost_volume_fused(
            f_half.astype(jnp.float32), meas_feature_half.astype(jnp.float32),
            ref_pose, meas_poses, half_K,
            self.min_depth, self.max_depth, self.n_depth_levels,
            dot_product=True, view_mask=view_mask,
        ).astype(self.dtype)
        skip0, skip1, skip2, skip3, bottom = self.cost_volume_encoder(
            f_half, f_quarter, f_one_eight, f_one_sixteen, cost_volume, train)
        return self.cost_volume_decoder(
            ref_image, skip0, skip1, skip2, skip3, bottom, train)

    def __call__(
        self,
        ref_image: jnp.ndarray,
        meas_images: jnp.ndarray,
        ref_pose: jnp.ndarray,
        meas_poses: jnp.ndarray,
        K: jnp.ndarray,
        view_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """Full forward: ref_image (B,H,W,3), meas_images (B,V,H,W,3)."""
        B, V = meas_images.shape[:2]
        H, W = ref_image.shape[1:3]
        all_images = jnp.concatenate([ref_image[:, None], meas_images], axis=1)
        feats = self.extract_features(all_images.reshape(B * (V + 1), H, W, 3), train)

        def unstack(f):
            return f.reshape((B, V + 1) + f.shape[1:])

        f_half, f_quarter, f_one_eight, f_one_sixteen = (unstack(f) for f in feats)
        ref_features = (f_half[:, 0], f_quarter[:, 0], f_one_eight[:, 0], f_one_sixteen[:, 0])
        return self.predict_depth(
            ref_image, ref_features, f_half[:, 1:], ref_pose, meas_poses, K,
            view_mask, train)
