"""MnasNet-1.0 feature trunk.

The reference slices torchvision's mnasnet1_0 into 5 stages at strides
2/4/8/16/32 with output channels [16, 24, 40, 96, 320]
(reference: dvmvs/fusionnet/model.py:122-140). This is a from-scratch Flax
implementation of the same architecture (Tan et al., MnasNet, CVPR 2019 /
torchvision layer plan), organized so a torch state_dict can be mapped onto
it module-by-module for parity evaluation.

Stage plan (stride, out_channels):
  stem        s2   32 -> dw 3x3 -> 1x1 -> 16      (torchvision layers 0..7)
  stack1      s2   24  (k3, expand 3, repeats 3)  (layers[8])
  stack2      s2   40  (k5, expand 3, repeats 3)  (layers[9])
  stack3      s2   80  (k5, expand 6, repeats 3)  (layers[10])
  stack4      s1   96  (k3, expand 6, repeats 2)  (layers[11])
  stack5      s2  192  (k5, expand 6, repeats 4)  (layers[12])
  stack6      s1  320  (k3, expand 6, repeats 1)  (layers[13])

Feature taps: l1=stem(16, /2), l2=stack1(24, /4), l3=stack2(40, /8),
l4=stack4(96, /16), l5=stack6(320, /32).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

# torchvision mnasnet uses momentum 1-0.9997
MNAS_BN_MOMENTUM = 0.9997
BN_EPS = 1e-5


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=MNAS_BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expansion: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.in_ch * self.expansion
        p = self.kernel // 2
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(x)
        y = _bn(train, self.dtype, "expand_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(y)
        y = _bn(train, self.dtype, "depthwise_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = _bn(train, self.dtype, "project_bn")(y)
        if self.in_ch == self.out_ch and self.stride == 1:
            y = x + y
        return y


class Stack(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expansion: int
    repeats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = InvertedResidual(
            self.in_ch, self.out_ch, self.kernel, self.stride, self.expansion,
            self.dtype, name="block0",
        )(x, train)
        for i in range(1, self.repeats):
            x = InvertedResidual(
                self.out_ch, self.out_ch, self.kernel, 1, self.expansion,
                self.dtype, name=f"block{i}",
            )(x, train)
        return x


class MnasFeatureExtractor(nn.Module):
    """5-stage trunk; input NHWC image, returns (l1..l5)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(image)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=32,
                    use_bias=False, dtype=self.dtype, name="stem_dw")(x)
        x = _bn(train, self.dtype, "stem_dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (1, 1), use_bias=False, dtype=self.dtype, name="stem_proj")(x)
        l1 = _bn(train, self.dtype, "stem_proj_bn")(x)

        l2 = Stack(16, 24, 3, 2, 3, 3, self.dtype, name="stack1")(l1, train)
        l3 = Stack(24, 40, 5, 2, 3, 3, self.dtype, name="stack2")(l2, train)
        x = Stack(40, 80, 5, 2, 6, 3, self.dtype, name="stack3")(l3, train)
        l4 = Stack(80, 96, 3, 1, 6, 2, self.dtype, name="stack4")(x, train)
        x = Stack(96, 192, 5, 2, 6, 4, self.dtype, name="stack5")(l4, train)
        l5 = Stack(192, 320, 3, 1, 6, 1, self.dtype, name="stack6")(x, train)
        return l1, l2, l3, l4, l5
