"""DPSNet baseline (reference: dvmvs/baselines/dpsnet/dpsnet.py).

SPP feature extractor (ResNet basic blocks + 4 pooled branches) at 1/4 res,
true 3D cost volume (concat ref + warped target features per each of 64
depth labels, depth_i = mindepth*nlabel/(i+1e-16)), 5 residual 3D-conv
stages + classify, per-view-summed costs, a dilated 2D context network
refining each label slice, trilinear upsample, softmax + soft-argmin
disparity regression, depth = mindepth*nlabel/disparity.

TPU notes: 3D convs lower to lax.conv_general_dilated over NDHWC; the label
loop of the context network is a vmap over labels. The inverse warp matches
the reference's cam2pixel: z clamp 1e-3, (size-1) normalization, and
out-of-bounds coords pushed to 2 before zeros-padding grid_sample.
"""

from __future__ import annotations

from typing import List

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvmvs_tpu.baselines.registry import DepthEstimator, register_baseline
from dvmvs_tpu.ops.sampling import grid_sample

BN_EPS = 1e-5


def convbn(x, features, kernel, stride, dilation, train, name):
    pad = dilation if dilation > 1 else (kernel - 1) // 2
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(dilation, dilation), use_bias=False,
                name=f"{name}_conv")(x)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=BN_EPS, name=f"{name}_bn")(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(convbn(x, self.planes, 3, self.stride, self.dilation, train, "c1"))
        out = convbn(out, self.planes, 3, 1, self.dilation, train, "c2")
        if self.downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=BN_EPS, name="down_bn")(x)
        return out + x


class SPPFeatures(nn.Module):
    """DPSNet feature_extraction: 1/4-res 32-channel features."""

    @nn.compact
    def __call__(self, image, train: bool = False):
        x = nn.relu(convbn(image, 32, 3, 2, 1, train, "first0"))
        x = nn.relu(convbn(x, 32, 3, 1, 1, train, "first1"))
        x = nn.relu(convbn(x, 32, 3, 1, 1, train, "first2"))

        for i in range(3):
            x = BasicBlock(32, 1, 1, False, name=f"layer1_{i}")(x, train)
        raw = BasicBlock(64, 2, 1, True, name="layer2_0")(x, train)
        for i in range(1, 16):
            raw = BasicBlock(64, 1, 1, False, name=f"layer2_{i}")(raw, train)
        x = BasicBlock(128, 1, 1, True, name="layer3_0")(raw, train)
        for i in range(1, 3):
            x = BasicBlock(128, 1, 1, False, name=f"layer3_{i}")(x, train)
        skip = BasicBlock(128, 1, 2, False, name="layer4_0")(x, train)
        for i in range(1, 3):
            skip = BasicBlock(128, 1, 2, False, name=f"layer4_{i}")(skip, train)

        H, W = skip.shape[1:3]
        branches = []
        for i, pool in enumerate((32, 16, 8, 4)):
            b = nn.avg_pool(skip, (pool, pool), strides=(pool, pool))
            b = nn.relu(convbn(b, 32, 1, 1, 1, train, f"branch{i}"))
            b = jax.image.resize(b, (b.shape[0], H, W, 32), method="bilinear")
            branches.append(b)

        feat = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)  # 320ch
        feat = nn.relu(convbn(feat, 128, 3, 1, 1, train, "last0"))
        return nn.Conv(32, (1, 1), use_bias=False, name="last1")(feat)


def convbn_3d(x, features, train, name):
    x = nn.Conv(features, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                name=f"{name}_conv")(x)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=BN_EPS, name=f"{name}_bn")(x)


class Hourglass3D(nn.Module):
    """dres0..4 + classify over NDHWC cost volumes."""

    @nn.compact
    def __call__(self, cost, train: bool = False):
        c0 = nn.relu(convbn_3d(cost, 32, train, "dres0a"))
        c0 = nn.relu(convbn_3d(c0, 32, train, "dres0b"))
        for i in range(1, 5):
            r = nn.relu(convbn_3d(c0, 32, train, f"dres{i}a"))
            r = convbn_3d(r, 32, train, f"dres{i}b")
            c0 = c0 + r
        c = nn.relu(convbn_3d(c0, 32, train, "classify0"))
        return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                       name="classify1")(c)


class ContextNet(nn.Module):
    """Dilated 2D refinement of each label slice (reference convs)."""

    @nn.compact
    def __call__(self, x):
        # every convtext — INCLUDING the final 1-channel one — ends in
        # LeakyReLU(0.1) in the reference (dpsnet.py:260-283, applied
        # before the residual add at :371)
        for i, (feats, dil) in enumerate(
                [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1),
                 (1, 1)]):
            pad = ((3 - 1) * dil) // 2
            x = nn.Conv(feats, (3, 3), padding=[(pad, pad)] * 2,
                        kernel_dilation=(dil, dil), use_bias=False,
                        name=f"convtext{i}")(x)
            x = nn.leaky_relu(x, 0.1)
        return x


def inverse_warp(feat, depth, rel_pose34, K):
    """Reference inverse_warp: feat (B,h,w,C), depth (B,h,w),
    rel_pose34 (B,3,4) target<-ref, K (B,3,3) at feature res."""
    B, h, w, C = feat.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ones = jnp.ones((1, h, w), jnp.float32)
    pix = jnp.stack([jnp.broadcast_to(xs, (1, h, w)),
                     jnp.broadcast_to(ys, (1, h, w)), ones], axis=1)  # (1,3,h,w)
    Kinv = jnp.linalg.inv(K)
    with jax.default_matmul_precision("highest"):
        cam = jnp.einsum("bij,bjhw->bihw", Kinv, jnp.broadcast_to(pix, (B, 3, h, w)))
        cam = cam * depth[:, None]
        proj = jnp.einsum("bij,bjk->bik", K, rel_pose34)  # (B,3,4)
        p = jnp.einsum("bij,bjhw->bihw", proj[:, :, :3], cam) + proj[:, :, 3][:, :, None, None]
    X, Y, Z = p[:, 0], p[:, 1], jnp.maximum(p[:, 2], 1e-3)
    xn = 2 * (X / Z) / (w - 1) - 1
    yn = 2 * (Y / Z) / (h - 1) - 1
    xn = jnp.where((xn > 1) | (xn < -1), 2.0, xn)
    yn = jnp.where((yn > 1) | (yn < -1), 2.0, yn)
    grid = jnp.stack([xn, yn], axis=-1)  # (B,h,w,2)
    return grid_sample(feat, grid, mode="bilinear", align_corners=True)


class DPSNetModel(nn.Module):
    nlabel: int = 64
    mindepth: float = 0.5

    def setup(self):
        self.features = SPPFeatures(name="feature_extraction")
        self.hourglass = Hourglass3D(name="hourglass")
        self.context = ContextNet(name="context")

    def __call__(self, ref, targets, rel_poses, K, view_mask=None,
                 train: bool = False):
        """ref (B,H,W,3); targets (B,V,H,W,3); rel_poses (B,V,3,4)
        target<-ref; K (B,3,3) full res. Returns (depth0, depth) (B,H,W)."""
        B, V = targets.shape[:2]
        H, W = ref.shape[1:3]
        K4 = K * jnp.asarray([0.25, 0.25, 1.0], K.dtype)[None, :, None]

        ref_fea = self.features(ref, train)  # (B,h,w,32)
        h, w = ref_fea.shape[1:3]
        disp2depth = jnp.ones((B, h, w), jnp.float32) * self.mindepth * self.nlabel

        costs = 0.0
        denom = 0.0
        for j in range(V):
            tgt_fea = self.features(targets[:, j], train)

            def label_slice(i):
                depth = disp2depth / (i + 1e-16)
                warped = inverse_warp(tgt_fea, depth, rel_poses[:, j], K4)
                return jnp.concatenate([ref_fea, warped], axis=-1)  # (B,h,w,64)

            labels = jnp.arange(self.nlabel, dtype=jnp.float32)
            cost = jax.vmap(label_slice, out_axes=1)(labels)  # (B,L,h,w,64)
            out = self.hourglass(cost, train)  # (B,L,h,w,1)
            m = 1.0 if view_mask is None else view_mask[:, j][:, None, None, None, None]
            costs = costs + out * m
            denom = denom + (1.0 if view_mask is None else view_mask[:, j].reshape(B, 1, 1, 1, 1))
        costs = costs / (denom if view_mask is not None else V)

        # context refinement per label slice
        def refine(slice_lhw1):
            return self.context(jnp.concatenate([ref_fea, slice_lhw1], axis=-1)) + slice_lhw1

        costss = jax.vmap(refine, in_axes=1, out_axes=1)(costs)  # (B,L,h,w,1)

        def regress(c):
            # reference trilinear upsample (align_corners=False): labels dim
            # is size-preserving (identity), spatial dims are half-pixel
            # bilinear -> jax.image.resize semantics
            c = c[..., 0]  # (B,L,h,w)
            c = jax.image.resize(c, (B, self.nlabel, H, W), method="bilinear")
            p = jax.nn.softmax(c, axis=1)
            disp = jnp.sum(p * labels[None, :, None, None], axis=1)
            return self.mindepth * self.nlabel / (disp + 1e-16)

        labels = jnp.arange(self.nlabel, dtype=jnp.float32)
        return regress(costs), regress(costss)


@register_baseline("dpsnet")
class DPSNet(DepthEstimator):
    image_width = 320
    image_height = 256
    scale_rgb = 255.0
    mean_rgb = (0.5, 0.5, 0.5)
    std_rgb = (0.5, 0.5, 0.5)

    def __init__(self, n_measurement_frames: int = 2, variables=None, seed: int = 0):
        self.V = n_measurement_frames
        self.model = DPSNetModel()
        H, W = self.image_height, self.image_width
        dummy = (
            jnp.zeros((1, H, W, 3), jnp.float32),
            jnp.zeros((1, self.V, H, W, 3), jnp.float32),
            jnp.tile(jnp.eye(4, dtype=jnp.float32)[:3][None, None], (1, self.V, 1, 1)),
            jnp.asarray(np.array([[256.0, 0, W / 2], [0, 256.0, H / 2], [0, 0, 1]],
                                 np.float32))[None],
        )
        self.variables = variables or self.model.init(jax.random.PRNGKey(seed), *dummy)
        self._fwd = jax.jit(
            lambda v, *a: self.model.apply(v, *a)[1])

    def predict(self, ref_image, meas_images: List[np.ndarray], ref_pose,
                meas_poses, K) -> np.ndarray:
        n = len(meas_images)
        mask = np.zeros((1, self.V), np.float32)
        mask[0, :n] = 1.0
        imgs = list(meas_images) + [meas_images[0]] * (self.V - n)
        poses = list(meas_poses) + [meas_poses[0]] * (self.V - n)
        rel = np.stack([
            (np.linalg.inv(p) @ ref_pose)[:3].astype(np.float32) for p in poses
        ])
        out = self._fwd(
            self.variables,
            jnp.asarray(ref_image.astype(np.float32))[None],
            jnp.asarray(np.stack(imgs).astype(np.float32))[None],
            jnp.asarray(rel)[None],
            jnp.asarray(K.astype(np.float32))[None],
            jnp.asarray(mask),
        )
        return np.asarray(out[0])
