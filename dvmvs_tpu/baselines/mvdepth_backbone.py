"""MVDepthNet U-Net backbone, shared by MVDepthNet and GP-MVS
(reference: dvmvs/baselines/mvdepthnet/{encoder,decoder}.py and the
identical copies under baselines/gpmvs/).

Encoder: image(3) + L1 cost volume(64) -> 5 stride-2 double-conv stages
(channels 128/256/512/512/512, kernels 7/5/3/3/3).
Decoder: U-Net with bilinear x2 upconvs (align_corners=True), skip concats,
4 sigmoid disparity heads scaled x2, nearest-upsampled disparity feedback.
Output disp1 is inverse depth; callers clamp to [0.02, 2] and invert.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from dvmvs_tpu.ops.sampling import resize_bilinear_align_corners, resize_nearest

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _conv_bn_relu(x, features, kernel, stride, train, name_prefix, mdl):
    p = (kernel - 1) // 2
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=[(p, p), (p, p)], use_bias=False,
                name=f"{name_prefix}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                     epsilon=BN_EPS, name=f"{name_prefix}_bn")(x)
    return nn.relu(x)


class DownConv(nn.Module):
    """stride-1 conv + stride-2 conv, both BN+ReLU."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        for i, stride in enumerate((1, 2)):
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(stride, stride), padding=[(p, p), (p, p)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class ConvBnRelu(nn.Module):
    features: int
    kernel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(p, p), (p, p)], use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(x)
        return nn.relu(x)


class UpConv(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        x = resize_bilinear_align_corners(x, 2 * H, 2 * W)
        return ConvBnRelu(self.features, self.kernel, name="conv")(x, train)


class DispHead(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(x)
        return nn.sigmoid(x)


class MVDepthEncoder(nn.Module):
    @nn.compact
    def __call__(self, image, cost_volume, train: bool = False):
        x = jnp.concatenate([image, cost_volume], axis=-1)  # 3 + 64 = 67ch
        conv1 = DownConv(128, 7, name="conv1")(x, train)
        conv2 = DownConv(256, 5, name="conv2")(conv1, train)
        conv3 = DownConv(512, 3, name="conv3")(conv2, train)
        conv4 = DownConv(512, 3, name="conv4")(conv3, train)
        conv5 = DownConv(512, 3, name="conv5")(conv4, train)
        return conv5, conv4, conv3, conv2, conv1


class MVDepthDecoder(nn.Module):
    @nn.compact
    def __call__(self, conv5, conv4, conv3, conv2, conv1, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        up5 = UpConv(512, name="upconv5")(conv5, train)
        iconv5 = ConvBnRelu(512, 3, name="iconv5")(
            jnp.concatenate([up5, conv4], axis=-1), train)

        up4 = UpConv(512, name="upconv4")(iconv5, train)
        iconv4 = ConvBnRelu(512, 3, name="iconv4")(
            jnp.concatenate([up4, conv3], axis=-1), train)
        disp4 = 2.0 * DispHead(name="disp4")(iconv4)
        udisp4 = resize_nearest(disp4, 2 * disp4.shape[1], 2 * disp4.shape[2])

        up3 = UpConv(256, name="upconv3")(iconv4, train)
        iconv3 = ConvBnRelu(256, 3, name="iconv3")(
            jnp.concatenate([up3, conv2, udisp4], axis=-1), train)
        disp3 = 2.0 * DispHead(name="disp3")(iconv3)
        udisp3 = resize_nearest(disp3, 2 * disp3.shape[1], 2 * disp3.shape[2])

        up2 = UpConv(128, name="upconv2")(iconv3, train)
        iconv2 = ConvBnRelu(128, 3, name="iconv2")(
            jnp.concatenate([up2, conv1, udisp3], axis=-1), train)
        disp2 = 2.0 * DispHead(name="disp2")(iconv2)
        udisp2 = resize_nearest(disp2, 2 * disp2.shape[1], 2 * disp2.shape[2])

        up1 = UpConv(64, name="upconv1")(iconv2, train)
        iconv1 = ConvBnRelu(64, 3, name="iconv1")(
            jnp.concatenate([up1, udisp2], axis=-1), train)
        disp1 = 2.0 * DispHead(name="disp1")(iconv1)

        return disp1, disp2, disp3, disp4
