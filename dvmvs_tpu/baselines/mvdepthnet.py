"""MVDepthNet baseline (reference: dvmvs/baselines/mvdepthnet/run-testing.py).

Full-resolution L1 plane-sweep cost volume (64 planes, 0.5-50 m) + U-Net;
inverse depth clamped to [0.02, 2] and inverted. Normalization mean/std
81/35, scale 1.
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from dvmvs_tpu.baselines.mvdepth_backbone import MVDepthDecoder, MVDepthEncoder
from dvmvs_tpu.baselines.registry import DepthEstimator, register_baseline
from dvmvs_tpu.ops.cost_volume import cost_volume_fused

MIN_DEPTH, MAX_DEPTH, N_LEVELS = 0.5, 50.0, 64


class _MVDepthModel:
    """Shared jitted encoder/decoder stack."""

    def __init__(self, height: int, width: int, n_views: int, seed: int = 0):
        self.encoder = MVDepthEncoder()
        self.decoder = MVDepthDecoder()
        self.H, self.W, self.V = height, width, n_views

        dummy_img = jnp.zeros((1, height, width, 3), jnp.float32)
        dummy_cv = jnp.zeros((1, height, width, N_LEVELS), jnp.float32)
        self.enc_vars = self.encoder.init(jax.random.PRNGKey(seed), dummy_img, dummy_cv)
        feats = self.encoder.apply(self.enc_vars, dummy_img, dummy_cv)
        self.dec_vars = self.decoder.init(jax.random.PRNGKey(seed + 1), *feats)

        def fwd(enc_vars, dec_vars, image, meas_images, pose, mposes, K, mask):
            cv = cost_volume_fused(
                image, meas_images, pose, mposes, K,
                MIN_DEPTH, MAX_DEPTH, N_LEVELS, dot_product=False,
                view_mask=mask)
            feats = self.encoder.apply(enc_vars, image, cv)
            disp1, *_ = self.decoder.apply(dec_vars, *feats)
            disp = jnp.clip(disp1, 0.02, 2.0)
            return 1.0 / disp[..., 0]

        self._fwd = jax.jit(fwd)

    def predict(self, image, meas_images, pose, mposes, K, mask):
        return self._fwd(self.enc_vars, self.dec_vars, image, meas_images,
                         pose, mposes, K, mask)


@register_baseline("mvdepthnet")
class MVDepthNet(DepthEstimator):
    image_width = 320
    image_height = 256
    scale_rgb = 1.0
    mean_rgb = (81.0, 81.0, 81.0)
    std_rgb = (35.0, 35.0, 35.0)

    def __init__(self, n_measurement_frames: int = 2, variables=None, seed: int = 0):
        self.V = n_measurement_frames
        self.model = _MVDepthModel(self.image_height, self.image_width,
                                   n_measurement_frames, seed)
        if variables is not None:
            self.model.enc_vars = variables["encoder"]
            self.model.dec_vars = variables["decoder"]

    def predict(self, ref_image, meas_images: List[np.ndarray], ref_pose,
                meas_poses, K) -> np.ndarray:
        n = len(meas_images)
        mask = np.zeros((1, self.V), np.float32)
        mask[0, :n] = 1.0
        padded_imgs = list(meas_images) + [meas_images[0]] * (self.V - n)
        padded_poses = list(meas_poses) + [meas_poses[0]] * (self.V - n)
        out = self.model.predict(
            jnp.asarray(ref_image.astype(np.float32))[None],
            jnp.asarray(np.stack(padded_imgs).astype(np.float32))[None],
            jnp.asarray(ref_pose.astype(np.float32))[None],
            jnp.asarray(np.stack(padded_poses).astype(np.float32))[None],
            jnp.asarray(K.astype(np.float32))[None],
            jnp.asarray(mask),
        )
        return np.asarray(out[0])
