"""Cost-volume decoder with per-scale depth heads
(reference: dvmvs/fusionnet/model.py:227-305).

4 DecoderBlocks (512->256->128->64->32) each followed by a sigmoid depth
head; the sigmoid map feeds the next block ("plus_one" channel). A full-res
refine head consumes the upsampled decoder output, the upsampled sigmoid
depth and the RGB image. Sigmoid s maps to depth via
1/d = s*(1/min - 1/max) + 1/max.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from dvmvs_tpu.models.layers import ConvBnRelu, DecoderBlock, DepthHead
from dvmvs_tpu.ops.sampling import resize_bilinear_align_corners

HYPER_CHANNELS = 32


class CostVolumeDecoder(nn.Module):
    min_depth: float = 0.25
    max_depth: float = 20.0
    hyper_channels: int = HYPER_CHANNELS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, skip0, skip1, skip2, skip3, bottom,
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        hc = self.hyper_channels
        inv_base = 1.0 / self.max_depth
        inv_mult = 1.0 / self.min_depth - 1.0 / self.max_depth

        d1 = DecoderBlock(hc * 8, 3, True, False, self.dtype, name="decoder_block1")(
            bottom, skip3, None, train)
        sig_one_sixteen = DepthHead(self.dtype, name="depth_layer_one_sixteen")(d1)
        inv_one_sixteen = inv_mult * sig_one_sixteen + inv_base

        d2 = DecoderBlock(hc * 4, 3, True, True, self.dtype, name="decoder_block2")(
            d1, skip2, sig_one_sixteen, train)
        sig_one_eight = DepthHead(self.dtype, name="depth_layer_one_eight")(d2)
        inv_one_eight = inv_mult * sig_one_eight + inv_base

        d3 = DecoderBlock(hc * 2, 3, True, True, self.dtype, name="decoder_block3")(
            d2, skip1, sig_one_eight, train)
        sig_quarter = DepthHead(self.dtype, name="depth_layer_quarter")(d3)
        inv_quarter = inv_mult * sig_quarter + inv_base

        d4 = DecoderBlock(hc, 5, True, True, self.dtype, name="decoder_block4")(
            d3, skip0, sig_quarter, train)
        sig_half = DepthHead(self.dtype, name="depth_layer_half")(d4)
        inv_half = inv_mult * sig_half + inv_base

        B, Hh, Wh, _ = sig_half.shape
        scaled_depth = resize_bilinear_align_corners(sig_half, 2 * Hh, 2 * Wh)
        scaled_decoder = resize_bilinear_align_corners(d4, 2 * Hh, 2 * Wh)
        combined = jnp.concatenate([scaled_decoder, scaled_depth, image], axis=-1)
        combined = ConvBnRelu(hc, 5, 1, True, self.dtype, name="refine0")(combined, train)
        combined = ConvBnRelu(hc, 5, 1, True, self.dtype, name="refine1")(combined, train)
        inv_full = inv_mult * DepthHead(self.dtype, name="depth_layer_full")(combined) + inv_base

        # metric depths always leave the network in f32 (consumers: losses,
        # metrics, splat geometry), regardless of the compute dtype
        depth_full = (1.0 / inv_full.astype(jnp.float32))[..., 0]
        depth_half = (1.0 / inv_half.astype(jnp.float32))[..., 0]
        depth_quarter = (1.0 / inv_quarter.astype(jnp.float32))[..., 0]
        depth_one_eight = (1.0 / inv_one_eight.astype(jnp.float32))[..., 0]
        depth_one_sixteen = (1.0 / inv_one_sixteen.astype(jnp.float32))[..., 0]
        return depth_full, depth_half, depth_quarter, depth_one_eight, depth_one_sixteen
