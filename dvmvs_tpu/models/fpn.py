"""Feature pyramid network (FeatureShrinker).

Mirrors torchvision's FeaturePyramidNetwork over the 5 MnasNet stages with
out_channels=32: 1x1 lateral convs (with bias), nearest-neighbor top-down
merge to the exact lateral size, 3x3 output convs (with bias). The 1/32
output is dropped (reference: dvmvs/fusionnet/model.py:143-164).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from dvmvs_tpu.ops.sampling import resize_nearest


class FeatureShrinker(nn.Module):
    out_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, l1, l2, l3, l4, l5) -> Tuple[jnp.ndarray, ...]:
        levels = [l1, l2, l3, l4, l5]
        inners = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"inner{i}")(x)
            for i, x in enumerate(levels)
        ]

        outs = [None] * 5
        last = inners[4]
        outs[4] = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, name="layer4")(last)
        for i in range(3, -1, -1):
            lateral = inners[i]
            top_down = resize_nearest(last, lateral.shape[1], lateral.shape[2])
            last = lateral + top_down
            outs[i] = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name=f"layer{i}")(last)

        # half, quarter, one-eighth, one-sixteenth (1/32 dropped)
        return outs[0], outs[1], outs[2], outs[3]
