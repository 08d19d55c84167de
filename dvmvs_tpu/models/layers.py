"""Convolution building blocks (reference: dvmvs/layers.py:1-65).

NHWC Flax linen modules. All convs are bias-free and followed by
BatchNorm+ReLU unless noted; kernels are odd so padding is SAME-equivalent
to the reference's (k-1)//2.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dvmvs_tpu.ops.sampling import resize_bilinear_align_corners

BN_MOMENTUM = 0.9  # torch BatchNorm2d default momentum 0.1 == keep 0.9
BN_EPS = 1e-5


class ConvBnRelu(nn.Module):
    """conv_layer (reference: dvmvs/layers.py:39-59)."""

    features: int
    kernel_size: int
    stride: int = 1
    apply_bn_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.apply_bn_relu:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="bn",
            )(x)
            x = nn.relu(x)
        return x


class StandardLayer(nn.Module):
    """Two same-channel convs (reference: fusionnet/model.py:15-32)."""

    channels: int
    kernel_size: int
    apply_bn_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(self.channels, self.kernel_size, 1, True, self.dtype, name="conv1")(x, train)
        x = ConvBnRelu(self.channels, self.kernel_size, 1, self.apply_bn_relu, self.dtype, name="conv2")(x, train)
        return x


class EncoderBlock(nn.Module):
    """Stride-2 down conv + StandardLayer (reference: fusionnet/model.py:64-78)."""

    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(self.features, self.kernel_size, 2, True, self.dtype, name="down_convolution")(x, train)
        x = StandardLayer(self.features, self.kernel_size, True, self.dtype, name="standard_convolution")(x, train)
        return x


class UpconvolutionLayer(nn.Module):
    """Bilinear x2 (align_corners) + conv (reference: fusionnet/model.py:49-61)."""

    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        x = resize_bilinear_align_corners(x, 2 * H, 2 * W)
        x = ConvBnRelu(self.features, self.kernel_size, 1, True, self.dtype, name="conv")(x, train)
        return x


class DecoderBlock(nn.Module):
    """Upsample + skip/depth aggregation (reference: fusionnet/model.py:81-119)."""

    features: int
    kernel_size: int
    apply_bn_relu: bool = True
    plus_one: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, depth, train: bool = False):
        x = UpconvolutionLayer(self.features, self.kernel_size, self.dtype, name="up_convolution")(x, train)
        if depth is None:
            x = jnp.concatenate([x, skip], axis=-1)
        else:
            B, H, W, _ = depth.shape
            depth = resize_bilinear_align_corners(depth, 2 * H, 2 * W)
            x = jnp.concatenate([x, skip, depth], axis=-1)
        x = ConvBnRelu(self.features, self.kernel_size, 1, True, self.dtype, name="convolution1")(x, train)
        x = ConvBnRelu(self.features, self.kernel_size, 1, self.apply_bn_relu, self.dtype, name="convolution2")(x, train)
        return x


class DepthHead(nn.Module):
    """3x3 conv (with bias) + sigmoid (reference: dvmvs/layers.py:62-65)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv")(x)
        return nn.sigmoid(x)
