"""FusionNet: PairNet + ConvLSTM temporal fusion at the 1/32 bottleneck
(reference: dvmvs/fusionnet/model.py).

The LSTM carry (h, c) plus (prev_pose, prev_depth) is an explicit functional
carry. Zero-initialising h/c with an identity prev_pose and zero prev_depth
reproduces the reference's ``None``-state branches exactly: warping a zero
hidden state yields zero, and a zero depth hypothesis invalidates every
pixel — so the first step after a reset needs no control flow inside jit.

Depth hypothesis for the hidden-state warp:
  - training: GT depth nearest-downsampled x1/32
    (reference: fusionnet/run-training.py:249-253)
  - inference: previous prediction forward-splat at half res, then
    nearest x1/16 (reference: fusionnet/run-testing-online.py:186-198)
The caller computes it and passes ``depth_hypothesis_1_32``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from dvmvs_tpu.models.convlstm import LSTMFusion, warp_hidden_state
from dvmvs_tpu.models.pairnet import PairNet, scale_intrinsics
from dvmvs_tpu.ops.cost_volume import cost_volume_fused


class LSTMCarry(NamedTuple):
    h: jnp.ndarray  # (B, H/32, W/32, 512)
    c: jnp.ndarray  # (B, H/32, W/32, 512)


def init_lstm_carry(batch: int, height: int, width: int, hidden: int = 512,
                    dtype=jnp.float32) -> LSTMCarry:
    shape = (batch, height // 32, width // 32, hidden)
    return LSTMCarry(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class FusionNet(PairNet):
    """Adds lstm_fusion to the PairNet submodules."""

    hidden_channels: int = 512

    def setup(self):
        super().setup()
        self.lstm_fusion = LSTMFusion(self.hidden_channels, self.dtype, name="lstm_fusion")

    def predict_depth(
        self,
        ref_image: jnp.ndarray,
        ref_features: Tuple[jnp.ndarray, ...],
        meas_feature_half: jnp.ndarray,
        ref_pose: jnp.ndarray,
        meas_poses: jnp.ndarray,
        K: jnp.ndarray,
        carry: LSTMCarry,
        prev_pose: jnp.ndarray,
        depth_hypothesis_1_32: jnp.ndarray,
        view_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """Recurrent prediction step.

        carry: LSTM state; prev_pose: (B, 4, 4) pose of the previous
        keyframe (identity after a reset); depth_hypothesis_1_32:
        (B, H/32, W/32) depth used to warp the hidden state.
        Returns (5 depth maps, next carry).
        """
        f_half, f_quarter, f_one_eight, f_one_sixteen = ref_features
        half_K = scale_intrinsics(K, 0.5)
        lstm_K = scale_intrinsics(K, 1.0 / 32.0)

        cost_volume = cost_volume_fused(
            f_half.astype(jnp.float32), meas_feature_half.astype(jnp.float32),
            ref_pose, meas_poses, half_K,
            self.min_depth, self.max_depth, self.n_depth_levels,
            dot_product=True, view_mask=view_mask,
        ).astype(self.dtype)
        skip0, skip1, skip2, skip3, bottom = self.cost_volume_encoder(
            f_half, f_quarter, f_one_eight, f_one_sixteen, cost_volume, train)

        h_warped = warp_hidden_state(
            carry.h, prev_pose, ref_pose, depth_hypothesis_1_32, lstm_K)
        h_next, c_next = self.lstm_fusion(bottom, h_warped, carry.c)

        depths = self.cost_volume_decoder(
            ref_image, skip0, skip1, skip2, skip3, h_next, train)
        return depths, LSTMCarry(h_next, c_next)

    def __call__(
        self,
        ref_image: jnp.ndarray,
        meas_images: jnp.ndarray,
        ref_pose: jnp.ndarray,
        meas_poses: jnp.ndarray,
        K: jnp.ndarray,
        carry: LSTMCarry,
        prev_pose: jnp.ndarray,
        depth_hypothesis_1_32: jnp.ndarray,
        view_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
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
            carry, prev_pose, depth_hypothesis_1_32, view_mask, train)
