"""Cost-volume hourglass encoder (reference: dvmvs/fusionnet/model.py:167-224).

At each of 4 scales: concat the FPN skip with the incoming tensor, aggregate
with a conv, then a stride-2 EncoderBlock. Channels 32->64->128->256->512;
kernel 5 at the half-res level, 3 elsewhere. Returns the 4 aggregated skips
and the 1/32 bottleneck.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dvmvs_tpu.models.layers import ConvBnRelu, EncoderBlock

HYPER_CHANNELS = 32


class CostVolumeEncoder(nn.Module):
    hyper_channels: int = HYPER_CHANNELS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features_half, features_quarter, features_one_eight,
                 features_one_sixteen, cost_volume, train: bool = False):
        hc = self.hyper_channels

        inp0 = jnp.concatenate([features_half, cost_volume], axis=-1)
        inp0 = ConvBnRelu(hc, 5, 1, True, self.dtype, name="aggregator0")(inp0, train)
        out0 = EncoderBlock(hc * 2, 5, self.dtype, name="encoder_block0")(inp0, train)

        inp1 = jnp.concatenate([features_quarter, out0], axis=-1)
        inp1 = ConvBnRelu(hc * 2, 3, 1, True, self.dtype, name="aggregator1")(inp1, train)
        out1 = EncoderBlock(hc * 4, 3, self.dtype, name="encoder_block1")(inp1, train)

        inp2 = jnp.concatenate([features_one_eight, out1], axis=-1)
        inp2 = ConvBnRelu(hc * 4, 3, 1, True, self.dtype, name="aggregator2")(inp2, train)
        out2 = EncoderBlock(hc * 8, 3, self.dtype, name="encoder_block2")(inp2, train)

        inp3 = jnp.concatenate([features_one_sixteen, out2], axis=-1)
        inp3 = ConvBnRelu(hc * 8, 3, 1, True, self.dtype, name="aggregator3")(inp3, train)
        out3 = EncoderBlock(hc * 16, 3, self.dtype, name="encoder_block3")(inp3, train)

        return inp0, inp1, inp2, inp3, out3
