"""Layer-norm ConvLSTM cell with depth-based hidden-state warping.

Reference: dvmvs/convlstm.py:7-64 and dvmvs/fusionnet/model.py:308-337.
The cell is bias-free, layer-norms the candidate and the next cell state
over the spatial axes only, and uses celu activations. The hidden state is
warped from the previous keyframe's viewpoint into the current one before
the gates, using the current depth estimate at 1/32 resolution; pixels whose
estimate is <= 0.01 m are invalidated (zeroed).

TPU design: the warp is a pure function applied to the carry before the
cell; training runs the cell under `lax.scan` over the subsequence with the
(h, c) carry — no Python-step recurrence.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvmvs_tpu.ops.geometry import inverse_pose
from dvmvs_tpu.ops.warp import warp_frame_depth


def spatial_layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch.layer_norm(x, [H, W]): normalize over the spatial axes only,
    per (batch, channel), no affine parameters. x is NHWC."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def warp_hidden_state(
    h_cur: jnp.ndarray,
    previous_pose: jnp.ndarray,
    current_pose: jnp.ndarray,
    estimated_current_depth: jnp.ndarray,
    camera_matrix: jnp.ndarray,
) -> jnp.ndarray:
    """Warp h_cur (B, H, W, C) into the current viewpoint.

    estimated_current_depth: (B, H, W) at the hidden-state resolution;
    camera_matrix: (B, 3, 3) scaled to that resolution. Pixels with depth
    <= 0.01 are zeroed (reference: dvmvs/convlstm.py:29-41).
    """
    transformation = inverse_pose(previous_pose) @ current_pose
    warped = warp_frame_depth(h_cur, estimated_current_depth, transformation, camera_matrix)
    valid = (estimated_current_depth > 0.01)[..., None]
    return warped * valid.astype(warped.dtype)


class MVSLayernormConvLSTMCell(nn.Module):
    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_tensor: jnp.ndarray, h_cur: jnp.ndarray, c_cur: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p = self.kernel_size // 2
        combined = jnp.concatenate([input_tensor, h_cur], axis=-1)
        gates = nn.Conv(
            4 * self.hidden_dim,
            (self.kernel_size, self.kernel_size),
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(combined)
        cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)

        i = nn.sigmoid(cc_i)
        f = nn.sigmoid(cc_f)
        o = nn.sigmoid(cc_o)
        g = jax.nn.celu(spatial_layer_norm(cc_g))

        c_next = spatial_layer_norm(f * c_cur + i * g)
        h_next = o * jax.nn.celu(c_next)
        return h_next, c_next


class LSTMFusion(nn.Module):
    """Wrapper holding the cell; the hidden-state warp is applied by the
    caller (it needs geometry inputs) — see fusionnet.step."""

    hidden_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, current_encoding, h_cur, c_cur):
        return MVSLayernormConvLSTMCell(
            self.hidden_dim, 3, self.dtype, name="lstm_cell"
        )(current_encoding, h_cur, c_cur)
