"""DELTAS baseline (reference: dvmvs/baselines/deltas/, 3-stage
sparse-then-dense depth):

  1. SuperPoint interest points + descriptors (superpoint.py:43-248):
     shared VGG trunk, 65-way detector head with dustbin + depth-to-space,
     max-pool NMS, fixed-K top-k keypoints, L2-normalized 256-d descriptors
     sampled at keypoint locations.
  2. Triangulation (triangulation.py): depth-guided epipolar matching —
     descriptors sampled along the segment between each keypoint's
     reprojections at min/max depth in the measurement views, correlated
     with the reference descriptor, soft-argmax over samples
     (integrate_tensor_2d), then confidence-weighted multi-view linear DLT
     triangulation (SVD; triangulation.py:25-60).
  3. Sparse-to-dense densification (densedepth.py): encoder over
     image+sparse-depth, ASPP bottleneck, up-projection decoder with skips.

Documented deviations from the reference (whose pretrained torch weights are
not portable here anyway): the epipolar search samples S points along the
segment directly instead of rasterizing rotated ROI patches
(patch_for_depth_guided_range) — same search geometry, simpler sampler;
the densifier uses a ResNet-18-depth encoder instead of ResNet-50.

Static shapes throughout: fixed keypoint count K with validity masking.
"""

from __future__ import annotations

from typing import List

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvmvs_tpu.baselines.registry import DepthEstimator, register_baseline
from dvmvs_tpu.ops.sampling import grid_sample, resize_bilinear_align_corners

N_KEYPOINTS = 512
N_EPI_SAMPLES = 64
MIN_DEPTH, MAX_DEPTH = 0.5, 10.0


# ------------------------------------------------------------- SuperPoint
class SuperPoint(nn.Module):
    @nn.compact
    def __call__(self, image):
        """image (B,H,W,3) -> (scores (B,H,W), descriptors (B,H/8,W/8,256))."""
        gray = jnp.mean(image, axis=-1, keepdims=True)
        x = gray
        chans = [(64, 64), (64, 64), (128, 128), (128, 128)]
        for i, (c1, c2) in enumerate(chans):
            x = nn.relu(nn.Conv(c1, (3, 3), padding="SAME", name=f"conv{i}a")(x))
            x = nn.relu(nn.Conv(c2, (3, 3), padding="SAME", name=f"conv{i}b")(x))
            if i < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        cPa = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="convPa")(x))
        logits = nn.Conv(65, (1, 1), name="convPb")(cPa)  # (B,H/8,W/8,65)
        probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin
        B, h8, w8, _ = probs.shape
        scores = probs.reshape(B, h8, w8, 8, 8).transpose(0, 1, 3, 2, 4)
        scores = scores.reshape(B, h8 * 8, w8 * 8)

        cDa = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="convDa")(x))
        desc = nn.Conv(256, (1, 1), name="convDb")(cDa)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return scores, desc


def simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep only local maxima within a (2r+1) window
    (reference: superpoint.py:7-26, single-pass form)."""
    k = 2 * radius + 1
    pooled = nn.max_pool(scores[..., None], (k, k), strides=(1, 1), padding="SAME")[..., 0]
    return jnp.where(scores == pooled, scores, 0.0)


def top_k_keypoints(scores: jnp.ndarray, k: int, border: int):
    """(B,H,W) scores -> ((B,k,2) xy keypoints, (B,k) scores)."""
    B, H, W = scores.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = (xs >= border) & (xs < W - border) & (ys >= border) & (ys < H - border)
    masked = jnp.where(valid[None], scores, -1.0)
    flat = masked.reshape(B, H * W)
    vals, idx = jax.lax.top_k(flat, k)
    kp = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    return kp, vals


def sample_descriptors(keypoints: jnp.ndarray, desc: jnp.ndarray, stride: int = 8):
    """Bilinearly sample L2-normalized descriptors at pixel keypoints
    (reference: superpoint.py sample at s=8 with align_corners=False grid)."""
    B, h8, w8, C = desc.shape
    # map pixel coords to descriptor-grid normalized coords (cell centers)
    gx = (keypoints[..., 0] - stride / 2 + 0.5) / (w8 * stride - stride) * 2 - 1
    gy = (keypoints[..., 1] - stride / 2 + 0.5) / (h8 * stride - stride) * 2 - 1
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (B,K,1,2)
    out = grid_sample(desc, grid, mode="bilinear", align_corners=True)[:, :, 0, :]
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)


# ----------------------------------------------------- epipolar triangulation
def reproject_at_depth(keypoints, rel_pose, K, depth):
    """Project ref keypoints assumed at `depth` into the other view
    (reference: triangulation.py:125-143). keypoints (B,K,2)."""
    B, Kn, _ = keypoints.shape
    fx, fy = K[:, 0, 0, None], K[:, 1, 1, None]
    cx, cy = K[:, 0, 2, None], K[:, 1, 2, None]
    X = (keypoints[..., 0] - cx) / fx * depth
    Y = (keypoints[..., 1] - cy) / fy * depth
    pts = jnp.stack([X, Y, jnp.full_like(X, depth)], axis=-1)  # (B,K,3)
    R = rel_pose[:, :3, :3]
    t = rel_pose[:, :3, 3]
    cam = jnp.einsum("bij,bkj->bki", R, pts) + t[:, None]
    z = jnp.maximum(cam[..., 2], 1e-3)
    u = cam[..., 0] / z * fx + cx
    v = cam[..., 1] / z * fy + cy
    return jnp.stack([u, v], axis=-1), z


def triangulate_dlt(proj_matrices, points, confidences):
    """Confidence-weighted multi-view linear triangulation
    (reference: triangulation.py:25-60). proj_matrices (V,3,4);
    points (Kn,V,2); confidences (Kn,V). Returns (Kn,3)."""
    rows2 = proj_matrices[:, 2:3]  # (V,1,4)
    A = points[..., None] * rows2[None]  # (Kn,V,2,4)
    A = A - proj_matrices[None, :, :2]
    A = A * confidences[..., None, None]
    A = A.reshape(points.shape[0], -1, 4)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    hom = -Vt[:, 3]  # (Kn,4)
    return hom[:, :3] / (hom[:, 3:4] + 1e-12)


# ------------------------------------------------------------ densification
class UpProjBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        B, H, W, C = x.shape
        x = resize_bilinear_align_corners(x, 2 * H, 2 * W)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        branch = nn.relu(nn.Conv(self.features, (5, 5), padding="SAME", name="conv5")(x))
        branch = nn.Conv(self.features, (3, 3), padding="SAME", name="conv3")(branch)
        short = nn.Conv(self.features, (5, 5), padding="SAME", name="short")(x)
        return nn.relu(branch + short)


class ASPP(nn.Module):
    @nn.compact
    def __call__(self, x):
        outs = [nn.relu(nn.Conv(64, (1, 1), name="aspp1")(x))]
        for i, d in enumerate((6, 12, 18)):
            outs.append(nn.relu(nn.Conv(
                64, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d),
                name=f"aspp_d{d}")(x)))
        x = jnp.concatenate(outs, axis=-1)
        return nn.relu(nn.Conv(256, (1, 1), name="aspp_out")(x))


class SparseToDenseNet(nn.Module):
    min_depth: float = MIN_DEPTH
    max_depth: float = MAX_DEPTH

    @nn.compact
    def __call__(self, image, sparse_depth, sparse_mask, train: bool = False):
        """image (B,H,W,3); sparse_depth/mask (B,H,W)."""
        x = jnp.concatenate(
            [image, sparse_depth[..., None], sparse_mask[..., None]], axis=-1)

        def block(x, feats, stride, name):
            y = nn.Conv(feats, (3, 3), strides=(stride, stride), padding="SAME",
                        use_bias=False, name=f"{name}_c1")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"{name}_bn1")(y)
            y = nn.relu(y)
            y = nn.Conv(feats, (3, 3), padding="SAME", use_bias=False,
                        name=f"{name}_c2")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"{name}_bn2")(y)
            if x.shape[-1] != feats or stride != 1:
                x = nn.Conv(feats, (1, 1), strides=(stride, stride),
                            use_bias=False, name=f"{name}_proj")(x)
            return nn.relu(x + y)

        s1 = block(block(x, 64, 2, "e1a"), 64, 1, "e1b")      # 1/2
        s2 = block(block(s1, 128, 2, "e2a"), 128, 1, "e2b")   # 1/4
        s3 = block(block(s2, 256, 2, "e3a"), 256, 1, "e3b")   # 1/8
        s4 = block(block(s3, 512, 2, "e4a"), 512, 1, "e4b")   # 1/16

        bott = ASPP(name="aspp")(s4)
        d = UpProjBlock(256, name="up1")(bott, s3)
        d = UpProjBlock(128, name="up2")(d, s2)
        d = UpProjBlock(64, name="up3")(d, s1)
        d = UpProjBlock(32, name="up4")(d)
        sig = nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME", name="depth_head")(d))
        inv = sig[..., 0] * (1.0 / self.min_depth - 1.0 / self.max_depth) + 1.0 / self.max_depth
        return 1.0 / inv


# ------------------------------------------------------------------ estimator
class DeltasModel(nn.Module):
    n_keypoints: int = N_KEYPOINTS
    n_samples: int = N_EPI_SAMPLES
    nms_radius: int = 9

    def setup(self):
        self.superpoint = SuperPoint(name="superpoint")
        self.densifier = SparseToDenseNet(name="sparse_to_dense")

    def __call__(self, ref_image, meas_images, rel_poses, K, view_mask=None,
                 train: bool = False):
        """rel_poses (B,V,4,4): measurement <- reference transforms."""
        B, V = meas_images.shape[:2]
        H, W = ref_image.shape[1:3]
        Kn = self.n_keypoints

        scores, ref_desc = self.superpoint(ref_image)
        scores = simple_nms(scores, self.nms_radius)
        kp, kp_scores = top_k_keypoints(scores, Kn, border=4)
        ref_d = sample_descriptors(kp, ref_desc)  # (B,Kn,256)

        inv_d = 1.0 / MAX_DEPTH + (1.0 / MIN_DEPTH - 1.0 / MAX_DEPTH) * (
            jnp.arange(self.n_samples, dtype=jnp.float32) / (self.n_samples - 1))
        depths_s = 1.0 / inv_d  # (S,)

        matched_pts = []
        matched_conf = []
        for v in range(V):
            _, mdesc = self.superpoint(meas_images[:, v])

            # sample S candidate locations along the depth-guided epipolar
            # segment and correlate descriptors
            def at_depth(d):
                uv, _ = reproject_at_depth(kp, rel_poses[:, v], K, d)
                return uv

            cand = jax.vmap(at_depth, out_axes=2)(depths_s)  # (B,Kn,S,2)
            cand_desc = sample_descriptors(
                cand.reshape(B, Kn * self.n_samples, 2), mdesc)
            cand_desc = cand_desc.reshape(B, Kn, self.n_samples, 256)
            corr = jnp.einsum("bkc,bksc->bks", ref_d, cand_desc)
            w_soft = jax.nn.softmax(corr * 10.0, axis=-1)
            pt = jnp.einsum("bks,bksq->bkq", w_soft, cand)  # soft-argmax (B,Kn,2)
            conf = jax.nn.sigmoid(jnp.max(corr, axis=-1))   # match confidence
            in_bounds = (
                (pt[..., 0] >= 0) & (pt[..., 0] < W)
                & (pt[..., 1] >= 0) & (pt[..., 1] < H))
            conf = conf * in_bounds
            if view_mask is not None:
                conf = conf * view_mask[:, v][:, None]
            matched_pts.append(pt)
            matched_conf.append(conf)

        # projection matrices: ref = K[I|0]; views = K [R|t]
        eye34 = jnp.concatenate(
            [jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], axis=1)
        proj_ref = jnp.einsum("bij,jk->bik", K, eye34)
        projs = [proj_ref] + [
            jnp.einsum("bij,bjk->bik", K, rel_poses[:, v, :3, :]) for v in range(V)
        ]
        all_pts = jnp.stack([kp] + matched_pts, axis=2)          # (B,Kn,V+1,2)
        all_conf = jnp.stack(
            [jnp.ones_like(kp_scores)] + matched_conf, axis=2)    # (B,Kn,V+1)

        def tri_one(proj_b, pts_b, conf_b):
            return triangulate_dlt(proj_b, pts_b, conf_b)

        pts3d = jax.vmap(tri_one)(jnp.stack(projs, axis=1), all_pts, all_conf)
        z = jnp.clip(pts3d[..., 2], 0.0, MAX_DEPTH)  # (B,Kn) ref-frame depth
        valid = (z > MIN_DEPTH) & (kp_scores > 0)

        # scatter sparse depth
        lin = (kp[..., 1].astype(jnp.int32) * W + kp[..., 0].astype(jnp.int32))
        lin = jnp.where(valid, lin, H * W)

        def scatter_one(lin_b, z_b):
            buf = jnp.zeros((H * W + 1,), jnp.float32).at[lin_b].set(z_b)
            msk = jnp.zeros((H * W + 1,), jnp.float32).at[lin_b].set(1.0)
            return buf[:-1].reshape(H, W), msk[:-1].reshape(H, W)

        sparse_depth, sparse_mask = jax.vmap(scatter_one)(lin, z)
        return self.densifier(ref_image, sparse_depth, sparse_mask, train)


@register_baseline("deltas")
class Deltas(DepthEstimator):
    image_width = 320
    image_height = 240
    scale_rgb = 255.0
    mean_rgb = (0.5, 0.5, 0.5)
    std_rgb = (0.5, 0.5, 0.5)

    def __init__(self, n_measurement_frames: int = 2, variables=None, seed: int = 0):
        self.V = n_measurement_frames
        self.model = DeltasModel()
        H, W = self.image_height, self.image_width
        dummy = (
            jnp.zeros((1, H, W, 3), jnp.float32),
            jnp.zeros((1, self.V, H, W, 3), jnp.float32),
            jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, None], (1, self.V, 1, 1)),
            jnp.asarray(np.array([[240.0, 0, W / 2], [0, 240.0, H / 2], [0, 0, 1]],
                                 np.float32))[None],
        )
        self.variables = variables or self.model.init(jax.random.PRNGKey(seed), *dummy)
        self._fwd = jax.jit(lambda v, *a: self.model.apply(v, *a))

    def predict(self, ref_image, meas_images: List[np.ndarray], ref_pose,
                meas_poses, K) -> np.ndarray:
        n = len(meas_images)
        mask = np.zeros((1, self.V), np.float32)
        mask[0, :n] = 1.0
        imgs = list(meas_images) + [meas_images[0]] * (self.V - n)
        poses = list(meas_poses) + [meas_poses[0]] * (self.V - n)
        rel = np.stack([
            (np.linalg.inv(p) @ ref_pose).astype(np.float32) for p in poses])
        out = self._fwd(
            self.variables,
            jnp.asarray(ref_image.astype(np.float32))[None],
            jnp.asarray(np.stack(imgs).astype(np.float32))[None],
            jnp.asarray(rel)[None],
            jnp.asarray(K.astype(np.float32))[None],
            jnp.asarray(mask),
        )
        return np.asarray(out[0])
