"""GP-MVS baseline (reference: dvmvs/baselines/gpmvs/).

MVDepthNet backbone + Gaussian-process latent fusion at the bottleneck.
Online mode uses the equivalent Kalman / state-space form of the Matern-3/2
GP (reference: gpmvs/run-testing.py:97-103, 177-193): per keyframe,
propagate the 2-state SDE by expm(F*dt) over the pose distance, then a
scalar Kalman update of the flattened conv5 latent; the smoothed latent
(relu'd) replaces conv5 in the decoder.

The batch (offline) GP form Z = K(C + sigma2 I)^-1 Y with the Matern-3/2
kernel over the pose-distance matrix is also provided (gp_batch_smooth).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from scipy.linalg import expm

import jax
import jax.numpy as jnp

from dvmvs_tpu.baselines.mvdepth_backbone import MVDepthDecoder, MVDepthEncoder
from dvmvs_tpu.baselines.registry import DepthEstimator, register_baseline
from dvmvs_tpu.ops.cost_volume import cost_volume_fused
from dvmvs_tpu.ops.geometry import pose_distance_np

MIN_DEPTH, MAX_DEPTH, N_LEVELS = 0.5, 50.0, 64


def matern32_kernel(D: np.ndarray, gamma2: float, ell: float) -> np.ndarray:
    """Matern-3/2 covariance over a pose-distance matrix
    (reference: gplayer.py:26-30)."""
    s = np.sqrt(3.0) * D / ell
    return gamma2 * (1.0 + s) * np.exp(-s)


def gp_batch_smooth(D: np.ndarray, Y: np.ndarray, gamma2: float, ell: float,
                    sigma2: float) -> np.ndarray:
    """Batch GP posterior mean: Z = K (K + sigma2 I)^-1 Y, relu'd
    (reference: gplayer.py:21-35). D: (N, N); Y: (N, d)."""
    K = matern32_kernel(D, gamma2, ell)
    C = K + sigma2 * np.eye(len(D))
    Z = K @ np.linalg.solve(C, Y)
    return np.maximum(Z, 0.0)


class KalmanLatentState:
    """Matern-3/2 state-space filter over the bottleneck latent."""

    def __init__(self, latent_dim: int, gamma2: float, ell: float, sigma2: float):
        lam = np.sqrt(3.0) / ell
        self.F = np.array([[0.0, 1.0], [-lam ** 2, -2 * lam]])
        self.Pinf = np.array([[gamma2, 0.0], [0.0, gamma2 * lam ** 2]])
        self.h = np.array([[1.0], [0.0]])
        self.sigma2 = sigma2
        self.latent_dim = latent_dim
        self.reset()

    def reset(self):
        self.M = np.zeros((2, self.latent_dim))
        self.P = self.Pinf.copy()

    def step(self, y: np.ndarray, dt: float) -> np.ndarray:
        """Propagate by dt (pose distance) and update with observation y."""
        A = expm(self.F * dt)
        Q = self.Pinf - A @ self.Pinf @ A.T
        self.M = A @ self.M
        self.P = A @ self.P @ A.T + Q

        v = y[None, :] - self.h.T @ self.M
        s = float((self.h.T @ self.P @ self.h)[0, 0]) + self.sigma2
        k = self.P @ self.h / s
        self.M += k @ v
        self.P -= k @ self.h.T @ self.P
        return self.M[0]


@register_baseline("gpmvs")
class GPMVS(DepthEstimator):
    image_width = 320
    image_height = 256
    scale_rgb = 1.0
    mean_rgb = (81.0, 81.0, 81.0)
    std_rgb = (35.0, 35.0, 35.0)

    def __init__(self, n_measurement_frames: int = 2, variables=None,
                 gamma2: float = 1.0, ell: float = 1.0, sigma2: float = 0.1,
                 seed: int = 0):
        self.V = n_measurement_frames
        H, W = self.image_height, self.image_width
        self.encoder = MVDepthEncoder()
        self.decoder = MVDepthDecoder()

        dummy_img = jnp.zeros((1, H, W, 3), jnp.float32)
        dummy_cv = jnp.zeros((1, H, W, N_LEVELS), jnp.float32)
        self.enc_vars = self.encoder.init(jax.random.PRNGKey(seed), dummy_img, dummy_cv)
        feats = self.encoder.apply(self.enc_vars, dummy_img, dummy_cv)
        self.dec_vars = self.decoder.init(jax.random.PRNGKey(seed + 1), *feats)
        if variables is not None:
            self.enc_vars = variables["encoder"]
            self.dec_vars = variables["decoder"]
            gamma2 = variables.get("gamma2", gamma2)
            ell = variables.get("ell", ell)
            sigma2 = variables.get("sigma2", sigma2)

        self._latent_hw = (H // 32, W // 32)
        latent_dim = 512 * self._latent_hw[0] * self._latent_hw[1]
        self.kalman = KalmanLatentState(latent_dim, gamma2, ell, sigma2)
        self.prev_pose: Optional[np.ndarray] = None

        def encode(enc_vars, image, meas_images, pose, mposes, K, mask):
            cv = cost_volume_fused(
                image, meas_images, pose, mposes, K,
                MIN_DEPTH, MAX_DEPTH, N_LEVELS, dot_product=False,
                view_mask=mask)
            return self.encoder.apply(enc_vars, image, cv)

        def decode(dec_vars, conv5, conv4, conv3, conv2, conv1):
            disp1, *_ = self.decoder.apply(dec_vars, conv5, conv4, conv3, conv2, conv1)
            return 1.0 / jnp.clip(disp1, 0.02, 2.0)[..., 0]

        self._encode = jax.jit(encode)
        self._decode = jax.jit(decode)

    def reset(self):
        self.kalman.reset()
        self.prev_pose = None

    def predict(self, ref_image, meas_images: List[np.ndarray], ref_pose,
                meas_poses, K) -> np.ndarray:
        n = len(meas_images)
        mask = np.zeros((1, self.V), np.float32)
        mask[0, :n] = 1.0
        padded_imgs = list(meas_images) + [meas_images[0]] * (self.V - n)
        padded_poses = list(meas_poses) + [meas_poses[0]] * (self.V - n)

        conv5, conv4, conv3, conv2, conv1 = self._encode(
            self.enc_vars,
            jnp.asarray(ref_image.astype(np.float32))[None],
            jnp.asarray(np.stack(padded_imgs).astype(np.float32))[None],
            jnp.asarray(ref_pose.astype(np.float32))[None],
            jnp.asarray(np.stack(padded_poses).astype(np.float32))[None],
            jnp.asarray(K.astype(np.float32))[None],
            jnp.asarray(mask),
        )

        # Kalman smoothing of the flattened latent, host-side like the
        # reference (scipy expm per frame)
        if self.prev_pose is None:
            self.prev_pose = meas_poses[-1]
        dt, _, _ = pose_distance_np(ref_pose, self.prev_pose)
        y = np.asarray(conv5).ravel()
        z = self.kalman.step(y, dt)
        self.prev_pose = ref_pose

        z = np.maximum(z, 0.0).reshape(conv5.shape).astype(np.float32)
        out = self._decode(self.dec_vars, jnp.asarray(z), conv4, conv3, conv2, conv1)
        return np.asarray(out[0])
