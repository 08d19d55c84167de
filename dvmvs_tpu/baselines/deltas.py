"""DELTAS baseline (reference: dvmvs/baselines/deltas/, 3-stage
sparse-then-dense depth):

  1. SuperPoint-style detection/description over a ResNet-50 trunk
     (superpoint.py:63-190): bottleneck stages expose skip_half/quarter/
     eighth/sixteenth + 2048-ch features; the detector head (65-way with
     dustbin + depth-to-space) and descriptor head (concat with skips) run
     at H/8; iterative max-pool NMS; fixed-K top-k keypoints (static
     shapes); L2-normalized 128-d descriptors sampled at keypoints.
  2. Triangulation (triangulation.py:234-560): ROTATED-ROI depth-guided
     epipolar matching — each keypoint's search region is the epipolar
     segment between its reprojections at min/max depth, represented as a
     rotated box (xc, yc, h=2*dist+1, w=len, theta from the fundamental
     matrix's epiline), sampled as an out_length x (2*dist+1) patch;
     descriptor correlation + BatchNorm'd match map; confidence =
     sigmoid(global max of the match map) gated by segment validity
     (triangulation.py:485-497 — the convD_confa layers exist in the
     reference state_dict but its inference forward never applies them);
     2-D soft-argmax (integrate_tensor_2d) mapped back through the ROI
     transform; then confidence-weighted multi-view linear DLT
     triangulation (SVD, triangulation.py:25-60).
  3. Sparse-to-dense densification (densedepth.py:205-355): the learnt
     sparse depth runs through a NARROW 1-channel ResNet-50 trunk
     (resnet_s2d.py:104-120: widths 16/16/32/64/128, i.e. stage outputs
     64/128/256/512); its skips are concatenated with the image trunk's
     skips; Gudi up-projection decoder (zero-stuffed 2x unpool, 5x5 conv,
     concat skip, 3x3 convs, 5x5 shortcut) with dense-cascade ASPP at 1/8
     (daspp_1..5, dilations 3/6/12/18/24, densedepth.py:167-203) and
     multiscale 1x1 heads; conv_final emits RAW depth
     (densedepth.py:345-352 — no output activation).

Module/parameter layout mirrors the reference state_dict 1:1, so the
released pretrained checkpoint (one file holding state_dict /
state_dict_tri / state_dict_depth, run-testing.py:103-109) converts via
utils/baseline_convert.convert_deltas. Deliberate behavioral deviations
(static shapes): fixed keypoint count K taken as a plain top-k instead of
threshold -> top-k -> random refill (superpoint.py:205-232), and validity
masking instead of data-dependent keypoint lists.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvmvs_tpu.baselines.registry import DepthEstimator, register_baseline
from dvmvs_tpu.ops.sampling import grid_sample, resize_bilinear_align_corners

N_KEYPOINTS = 512
OUT_LENGTH = 100       # samples along the epipolar segment (reference out_length)
DIST_ORTHO = 1         # rows each side of the segment (reference dist_ortogonal)
MIN_DEPTH, MAX_DEPTH = 0.5, 10.0


def _nearest_resize_torch(x, out_h, out_w):
    """F.interpolate(mode='nearest') index rule: src = floor(dst * in/out)
    (used by Gudi_UpProj_Block_Cat.forward when the skip size is not a
    multiple of the input size, densedepth.py:126-133)."""
    B, H, W, C = x.shape
    ih = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, ih][:, :, iw]


def _unpool_zero(x, out_h, out_w):
    """Zero-stuffed 2x unpool then crop (reference Unpool,
    densedepth.py:17-32: conv_transpose with a [1,0;0,0] kernel — value at
    the top-left of every 2x2 cell, zeros elsewhere; the simple block's
    masked nearest upsample, densedepth.py:59-70, is the same map)."""
    B, H, W, C = x.shape
    up = jnp.zeros((B, 2 * H, 2 * W, C), x.dtype).at[:, ::2, ::2, :].set(x)
    return up[:, :out_h, :out_w]


# --------------------------------------------------------- ResNet-50 trunk
class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + skip.
    Explicit torch padding so stride-2 windows align with the reference
    (SAME pads (0,1) where torch pads (1,1))."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, name=name)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="c1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="c2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="c3")(y)
        y = bn("bn3")(y)
        if x.shape[-1] != self.features * 4 or self.stride != 1:
            x = nn.Conv(self.features * 4, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="proj")(x)
            x = bn("bn_proj")(x)
        return nn.relu(x + y)


class ResNet50Trunk(nn.Module):
    """conv1..layer4 of ResNet-50 ([3,4,6,3] bottlenecks), returning the
    skip pyramid the reference taps (superpoint.py:131-154). width=64 is
    the torchvision image trunk (stage outputs 256/512/1024/2048);
    width=16 is the narrow 1-channel sparse-depth trunk of the densifier
    (resnet_s2d.py:115-138: c1..c5 = 16,16,32,64,128 -> stage outputs
    64/128/256/512)."""

    in_features: int = 3
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = nn.relu(x)
        skip_half = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (blocks, feats, stride) in enumerate(
                [(3, w, 1), (4, 2 * w, 2), (6, 4 * w, 2), (3, 8 * w, 2)]):
            for b in range(blocks):
                x = Bottleneck(feats, stride if b == 0 else 1,
                               name=f"layer{i + 1}_{b}")(x, train)
            if i == 0:
                skip_quarter = x
            elif i == 1:
                skip_eighth = x
            elif i == 2:
                skip_sixteenth = x
        return {
            "half": skip_half, "quarter": skip_quarter, "eighth": skip_eighth,
            "sixteenth": skip_sixteenth, "features": x,
        }


# ------------------------------------------------------------- SuperPoint
class SuperPoint(nn.Module):
    """Detector + descriptor heads over the ResNet-50 trunk
    (reference superpoint.py:98-190, descriptor_dim=128). Returns
    (scores (B,H8*8,W8*8), descriptors (B,H/8,W/8,128), skips dict)."""

    descriptor_dim: int = 128

    @nn.compact
    def __call__(self, image, train: bool = False):
        B, H, W, _ = image.shape
        h8, w8 = H // 8, W // 8
        skips = ResNet50Trunk(name="trunk")(image, train)
        x = skips["features"]
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, name=name)

        # Detector head: convPa/bnPa at 1/32, upsample to 1/8, convPb/convPc
        cPa = nn.relu(bn("bnPa")(nn.Conv(
            256, (3, 3), padding=[(1, 1), (1, 1)], name="convPa")(x)))
        cPa = resize_bilinear_align_corners(cPa, h8, w8, align_corners=False)
        cPa = nn.relu(bn("bnPb")(nn.Conv(
            128, (3, 3), padding=[(1, 1), (1, 1)], name="convPb")(cPa)))
        logits = nn.Conv(65, (1, 1), name="convPc")(cPa)

        probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin
        scores = probs.reshape(B, h8, w8, 8, 8).transpose(0, 1, 3, 2, 4)
        scores = scores.reshape(B, h8 * 8, w8 * 8)

        # Descriptor head: convDa at 1/32 -> 1/8, concat skip_eighth, then
        # convDb/convDc, concat downsampled quarter+half skips, convDd
        cDa = nn.relu(bn("bnDa")(nn.Conv(
            128, (3, 3), padding=[(1, 1), (1, 1)], name="convDa")(x)))
        cDa = resize_bilinear_align_corners(cDa, h8, w8, align_corners=False)
        cDa = jnp.concatenate([cDa, skips["eighth"]], axis=-1)
        cDa = nn.relu(bn("bnDb")(nn.Conv(256, (1, 1), name="convDb")(cDa)))
        cDa = nn.relu(bn("bnDc")(nn.Conv(
            256, (3, 3), padding=[(1, 1), (1, 1)], name="convDc")(cDa)))
        skip4 = resize_bilinear_align_corners(skips["quarter"], h8, w8, align_corners=False)
        skip2 = resize_bilinear_align_corners(skips["half"], h8, w8, align_corners=False)
        cDa = jnp.concatenate([cDa, skip4, skip2], axis=-1)
        desc = nn.Conv(self.descriptor_dim, (1, 1), name="convDd")(cDa)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return scores, desc, skips


def simple_nms(scores: jnp.ndarray, radius: int, iterations: int = 2) -> jnp.ndarray:
    """Max-pool NMS with the reference's iterative suppression refinement
    (superpoint.py:7-26): after the initial local-max mask, twice re-detect
    maxima among unsuppressed pixels."""
    k = 2 * radius + 1

    def max_pool(x):
        return nn.max_pool(x[..., None], (k, k), strides=(1, 1), padding="SAME")[..., 0]

    max_mask = scores == max_pool(scores)
    for _ in range(iterations):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, 0.0, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, 0.0)


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


def sample_descriptors(points: jnp.ndarray, desc: jnp.ndarray, stride: int = 8,
                       normalize: bool = True):
    """Bilinearly sample descriptors at pixel locations (B, N, 2)
    (reference sample_descriptors_epi, triangulation.py:328-345,
    align_corners=False convention)."""
    B, h, w, C = desc.shape
    kp = points - stride / 2 + 0.5
    gx = kp[..., 0] / (w * stride - stride / 2 - 0.5) * 2 - 1
    gy = kp[..., 1] / (h * stride - stride / 2 - 0.5) * 2 - 1
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (B,N,1,2)
    out = grid_sample(desc, grid, mode="bilinear", align_corners=False)[:, :, 0, :]
    if normalize:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)
    return out


# ----------------------------------------------------- epipolar triangulation
def fundamental_matrix(rel_pose, K):
    """F = K^-T [t]x R K^-1, normalized by F[2,2]
    (reference get_fundamental_matrix, triangulation.py:358-380).
    rel_pose (B,4,4): measurement <- reference."""
    Kinv = jnp.linalg.inv(K)
    R = rel_pose[:, :3, :3]
    t = rel_pose[:, :3, 3]
    zero = jnp.zeros_like(t[:, 0])
    t_skew = jnp.stack([
        zero, -t[:, 2], t[:, 1],
        t[:, 2], zero, -t[:, 0],
        -t[:, 1], t[:, 0], zero,
    ], axis=1).reshape(-1, 3, 3)
    E = t_skew @ R
    F = jnp.swapaxes(Kinv, 1, 2) @ E @ Kinv
    f22 = F[:, 2:, 2:]
    f22 = jnp.where(f22 == 0.0, 1.0, f22)
    return F / f22


def reproject_at_depth(keypoints, rel_pose, K, depth):
    """Homogeneous planar reprojection K R K^-1 uv + K t / Z with division
    by the third coordinate (reference reproject_points,
    triangulation.py:125-143). keypoints (B,N,2) -> (B,N,2)."""
    ones = jnp.ones_like(keypoints[..., :1])
    uv1 = jnp.concatenate([keypoints, ones], axis=-1)  # (B,N,3)
    A = K @ rel_pose[:, :3, :3] @ jnp.linalg.inv(K)
    Kt = (K @ rel_pose[:, :3, 3:4])[..., 0]  # (B,3)
    proj = jnp.einsum("bij,bnj->bni", A, uv1) + Kt[:, None] / depth
    return proj[..., :2] / proj[..., 2:3]


def epipolar_roi(keypoints, rel_pose, K, height, width, min_depth, max_depth):
    """Rotated-ROI search box per keypoint
    (reference patch_for_depth_guided_range, triangulation.py:234-325):
    endpoints = reprojections at min/max depth ordered by x, zeroed unless
    BOTH endpoints are in bounds (align_corners=False bounds); returns
    (xc, yc, w, theta) with theta = atan2(-line_a, line_b) from the
    fundamental-matrix epiline."""
    F = fundamental_matrix(rel_pose, K)
    ones = jnp.ones_like(keypoints[..., :1])
    uv1 = jnp.concatenate([keypoints, ones], axis=-1)
    lines = jnp.einsum("bij,bnj->bni", F, uv1)  # (B,N,3)
    theta = jnp.arctan2(-lines[..., 0], lines[..., 1])

    p2 = reproject_at_depth(keypoints, rel_pose, K, min_depth)
    p3 = reproject_at_depth(keypoints, rel_pose, K, max_depth)
    swap = p2[..., 0] > p3[..., 0]
    lo = jnp.where(swap[..., None], p3, p2)
    hi = jnp.where(swap[..., None], p2, p3)

    def in_b(p):
        return ((p[..., 0] >= -0.5) & (p[..., 0] < width - 0.5)
                & (p[..., 1] >= -0.5) & (p[..., 1] < height - 0.5))

    valid = in_b(lo) & in_b(hi)
    lo = jnp.where(valid[..., None], lo, 0.0)
    hi = jnp.where(valid[..., None], hi, 0.0)
    xc = (lo[..., 0] + hi[..., 0]) / 2.0
    yc = (lo[..., 1] + hi[..., 1]) / 2.0
    w = jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=-1))
    return xc, yc, w, theta


def roi_patch_coords(xc, yc, w, theta, out_length, distance):
    """Sample grid of the rotated ROI (reference patch_sampler,
    triangulation.py:205-232): out_length steps of w*linspace(-.5,.5) along
    the segment direction x rows linspace(-distance, distance) across it,
    rotated by theta and centered at (xc, yc). Returns (..., R, S, 2)."""
    R = 2 * distance + 1
    sx = jnp.linspace(-0.5, 0.5, out_length)
    sy = jnp.linspace(-float(distance), float(distance), R)
    gx = jnp.broadcast_to(
        w[..., None, None] * sx[None, :], w.shape + (R, out_length))
    gy = jnp.broadcast_to(sy[:, None], w.shape + (R, out_length))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    u = xc[..., None, None] + cos[..., None, None] * gx - sin[..., None, None] * gy
    v = yc[..., None, None] + sin[..., None, None] * gx + cos[..., None, None] * gy
    return jnp.stack([u, v], axis=-1)


def soft_argmax_2d(heatmap):
    """integrate_tensor_2d with softmax (reference triangulation.py:76-113):
    softmax over the flattened map, expected (x, y). heatmap (..., R, S)."""
    shape = heatmap.shape
    flat = jax.nn.softmax(heatmap.reshape(shape[:-2] + (-1,)), axis=-1)
    m = flat.reshape(shape)
    xs = jnp.arange(shape[-1], dtype=heatmap.dtype)
    ys = jnp.arange(shape[-2], dtype=heatmap.dtype)
    x = jnp.sum(jnp.sum(m, axis=-2) * xs, axis=-1)
    y = jnp.sum(jnp.sum(m, axis=-1) * ys, axis=-1)
    return x, y


def triangulate_dlt(proj_matrices, points, confidences):
    """Confidence-weighted multi-view linear triangulation
    (reference triangulation.py:25-60). proj_matrices (V,3,4);
    points (Kn,V,2); confidences (Kn,V). Returns (Kn,3)."""
    rows2 = proj_matrices[:, 2:3]  # (V,1,4)
    A = points[..., None] * rows2[None]  # (Kn,V,2,4)
    A = A - proj_matrices[None, :, :2]
    A = A * confidences[..., None, None]
    A = A.reshape(points.shape[0], -1, 4)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    hom = -Vt[:, 3]  # (Kn,4)
    return hom[:, :3] / (hom[:, 3:4] + 1e-12)


class TriangulationNet(nn.Module):
    """Rotated-ROI epipolar matching + DLT (reference TriangulationNet,
    triangulation.py:382-560; config dist_ortogonal=1, kernel_size=1,
    out_length=100, has_confidence=True). The only parameters are the
    match-map BatchNorm's — the reference's convD_confa/bnconvD_confa
    layers are declared (triangulation.py:410-412) but its inference
    forward never applies them: confidence is the sigmoid of the match
    map's global max (triangulation.py:485-497)."""

    out_length: int = OUT_LENGTH
    distance: int = DIST_ORTHO
    min_depth: float = MIN_DEPTH
    max_depth: float = MAX_DEPTH
    arg_max_weight: float = 1.0

    @nn.compact
    def __call__(self, keypoints, kp_scores, ref_desc_at_kp, meas_descs,
                 rel_poses, K, height, width, view_mask=None,
                 train: bool = False):
        """keypoints (B,Kn,2); ref_desc_at_kp (B,Kn,C); meas_descs
        (B,V,h8,w8,C); rel_poses (B,V,4,4). Returns (points3d (B,Kn,3),
        range_mask (B,Kn))."""
        B, Kn = keypoints.shape[:2]
        V = meas_descs.shape[1]
        R = 2 * self.distance + 1
        S = self.out_length

        bn_match = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                name="bn_match")

        matched, confs, widths = [], [], []
        for v in range(V):
            rel = rel_poses[:, v]
            xc, yc, w, theta = epipolar_roi(
                keypoints, rel, K, height, width, self.min_depth, self.max_depth)
            coords = roi_patch_coords(xc, yc, w, theta, S, self.distance)  # (B,Kn,R,S,2)
            cand = sample_descriptors(
                coords.reshape(B, Kn * R * S, 2), meas_descs[:, v])
            cand = cand.reshape(B, Kn, R, S, -1)
            # kernel_size=1 anchor: plain dot correlation per patch location
            match = jnp.einsum("bkc,bkrsc->bkrs", ref_desc_at_kp, cand)
            match = nn.relu(bn_match(match.reshape(B * Kn, R, S, 1)))

            # confidence: sigmoid(global max of the match map), gated by a
            # non-degenerate segment (w > 0) (+0.001 like the reference,
            # triangulation.py:485-497)
            c = jnp.max(match.reshape(B, Kn, -1), axis=-1)
            c = jax.nn.sigmoid(c) * ((w > 0).astype(c.dtype) + 0.001)
            if view_mask is not None:
                c = c * view_mask[:, v][:, None]

            # 2-D soft-argmax in patch coords -> normalize -> ROI transform
            mx, my = soft_argmax_2d(
                (match[..., 0] * self.arg_max_weight).reshape(B, Kn, R, S))
            mx = mx / (S - 1.0) - 0.5
            my = my / max(R - 1.0, 1.0) - 0.5
            gated = (w > 0).astype(mx.dtype)
            px = mx * w          # local x scaled by segment length
            py = my * gated      # reference zeroes y when the segment is null
            cos, sin = jnp.cos(theta), jnp.sin(theta)
            u = xc + cos * px - sin * py
            v_ = yc + sin * px + cos * py
            matched.append(jnp.stack([u, v_], axis=-1))
            confs.append(c)
            widths.append(w)

        eye34 = jnp.concatenate(
            [jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], axis=1)
        proj_ref = jnp.einsum("bij,jk->bik", K, eye34)
        projs = [proj_ref] + [
            jnp.einsum("bij,bjk->bik", K, rel_poses[:, v, :3, :]) for v in range(V)]
        all_pts = jnp.stack([keypoints] + matched, axis=2)          # (B,Kn,V+1,2)
        all_conf = jnp.stack(
            [jnp.ones_like(kp_scores)] + confs, axis=2)              # (B,Kn,V+1)

        pts3d = jax.vmap(triangulate_dlt)(
            jnp.stack(projs, axis=1), all_pts, all_conf)
        # range_kp: a keypoint is usable if ANY view had a real segment
        range_mask = jnp.sum(jnp.stack(widths, axis=-1) > 0, axis=-1) > 0
        return pts3d, range_mask


# ------------------------------------------------------------ densification
class GudiUpProjCat(nn.Module):
    """Gudi up-projection block with skip concatenation (reference
    Gudi_UpProj_Block_Cat, densedepth.py:86-146): zero-stuffed 2x unpool
    (plain nearest resize when the skip size is not a multiple of the
    input size), 5x5 conv, CONCAT the skip, 3x3 + 3x3 convs, 5x5 shortcut
    from the upsampled input, BN everywhere."""

    features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, name=name)
        out_h, out_w = skip.shape[1], skip.shape[2]
        if out_h % x.shape[1] == 0:
            x = _unpool_zero(x, out_h, out_w)
        else:
            x = _nearest_resize_torch(x, out_h, out_w)
        y = nn.relu(bn("bn1")(nn.Conv(
            self.features, (5, 5), padding=[(2, 2), (2, 2)],
            use_bias=False, name="conv1")(x)))
        y = jnp.concatenate([y, skip], axis=-1)
        y = nn.relu(bn("bn1_1")(nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv1_1")(y)))
        y = bn("bn2")(nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv2")(y))
        short = bn("sc_bn1")(nn.Conv(
            self.features, (5, 5), padding=[(2, 2), (2, 2)],
            use_bias=False, name="sc_conv1")(x))
        return nn.relu(y + short)


class GudiUpProjSimple(nn.Module):
    """Skip-less Gudi up-projection (reference Gudi_UpProj_Block,
    densedepth.py:34-83; its masked nearest upsample equals the
    zero-stuffed unpool)."""

    features: int

    @nn.compact
    def __call__(self, x, out_h, out_w, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, name=name)
        x = _unpool_zero(x, out_h, out_w)
        y = nn.relu(bn("bn1")(nn.Conv(
            self.features, (5, 5), padding=[(2, 2), (2, 2)],
            use_bias=False, name="conv1")(x)))
        y = bn("bn2")(nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv2")(y))
        short = bn("sc_bn1")(nn.Conv(
            self.features, (5, 5), padding=[(2, 2), (2, 2)],
            use_bias=False, name="sc_conv1")(x))
        return nn.relu(y + short)


class DilatedConv3x3(nn.Module):
    """1x1 reduce + dilated 3x3, BN+ReLU after each (reference
    dilated_conv3x3, densedepth.py:147-164)."""

    features: int
    rate: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, name=name)
        x = nn.relu(bn("bn1")(nn.Conv(
            self.features, (1, 1), use_bias=False, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            self.features, (3, 3), padding=[(self.rate, self.rate)] * 2,
            kernel_dilation=(self.rate, self.rate),
            use_bias=False, name="conv2")(x)))
        return x


class ASPP(nn.Module):
    """Dense-cascade atrous pyramid (reference ASPP, densedepth.py:167-203):
    five dilated_conv3x3 stages (rates 3/6/12/18/24, each fed the running
    concat, each emitting features//2), final concat of the input + all
    five -> 3x3 convf + bnf + relu."""

    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        x_inp = x
        outs = []
        for i, rate in enumerate((3, 6, 12, 18, 24)):
            y = DilatedConv3x3(half, rate, name=f"daspp_{i + 1}")(x, train)
            outs.append(y)
            x = jnp.concatenate([x, y], axis=-1)
        x = jnp.concatenate([x_inp] + outs, axis=-1)
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="convf")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bnf")(x)
        return nn.relu(x)


class SparseToDenseNet(nn.Module):
    """Narrow ResNet-50 sparse-depth trunk + image-skip concat + Gudi
    up-projection decoder with dense ASPP at 1/8 and multiscale heads
    (reference densedepth.py:205-355). Concat order matches the reference:
    sparse trunk first for the skips (densedepth.py:308-320), image
    features first at the bottleneck (densedepth.py:322-324). conv_final
    emits RAW depth — the reference applies no output activation
    (densedepth.py:345-352)."""

    min_depth: float = MIN_DEPTH
    max_depth: float = MAX_DEPTH

    @nn.compact
    def __call__(self, sparse_depth, sparse_mask, image_skips,
                 train: bool = False):
        B, H, W = sparse_depth.shape
        x = sparse_depth[..., None]
        d = ResNet50Trunk(in_features=1, width=16, name="depth_trunk")(x, train)

        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)  # noqa: E731
        skip_half = cat(d["half"], image_skips["half"])
        skip_quarter = cat(d["quarter"], image_skips["quarter"])
        skip_eighth = cat(d["eighth"], image_skips["eighth"])
        skip_sixteenth = cat(d["sixteenth"], image_skips["sixteenth"])
        x = cat(image_skips["features"], d["features"])

        x = GudiUpProjCat(512, name="gud_up_proj_layer1")(x, skip_sixteenth, train)
        x = GudiUpProjCat(256, name="gud_up_proj_layer2")(x, skip_eighth, train)
        x = ASPP(256, name="ASPP")(x, train)
        out8 = nn.Conv(1, (1, 1), name="conv_scale8")(x)[..., 0]
        x = GudiUpProjCat(128, name="gud_up_proj_layer3")(x, skip_quarter, train)
        out4 = nn.Conv(1, (1, 1), name="conv_scale4")(x)[..., 0]
        x = GudiUpProjCat(64, name="gud_up_proj_layer4")(x, skip_half, train)
        out2 = nn.Conv(1, (1, 1), name="conv_scale2")(x)[..., 0]
        x = GudiUpProjSimple(32, name="gud_up_proj_layer5")(x, H, W, train)
        out = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                      name="conv_final")(x)[..., 0]
        return out, [out2, out4, out8]


# ------------------------------------------------------------------ estimator
class DeltasModel(nn.Module):
    n_keypoints: int = N_KEYPOINTS
    nms_radius: int = 9  # reference run-testing.py:49 / superpoint config

    def setup(self):
        self.superpoint = SuperPoint(name="superpoint")
        self.triangulation = TriangulationNet(name="triangulation")
        self.densifier = SparseToDenseNet(name="sparse_to_dense")

    def __call__(self, ref_image, meas_images, rel_poses, K, view_mask=None,
                 train: bool = False):
        """rel_poses (B,V,4,4): measurement <- reference transforms."""
        B, V = meas_images.shape[:2]
        H, W = ref_image.shape[1:3]
        Kn = self.n_keypoints

        scores, ref_desc, image_skips = self.superpoint(ref_image, train)
        scores = simple_nms(scores, self.nms_radius)
        kp, kp_scores = top_k_keypoints(scores, Kn, border=4)
        ref_d = sample_descriptors(kp, ref_desc)  # (B,Kn,128)

        meas_descs = []
        for v in range(V):
            _, mdesc, _ = self.superpoint(meas_images[:, v], train)
            meas_descs.append(mdesc)
        meas_descs = jnp.stack(meas_descs, axis=1)

        pts3d, range_mask = self.triangulation(
            kp, kp_scores, ref_d, meas_descs, rel_poses, K, H, W,
            view_mask, train)

        # impute the learnt sparse depth (reference densedepth.py:288-305:
        # clamp to [0, max], keep range-valid keypoints inside (min, max))
        z = jnp.clip(pts3d[..., 2], 0.0, self.densifier.max_depth)  # (B,Kn)
        valid = (range_mask
                 & (z > self.densifier.min_depth)
                 & (z < self.densifier.max_depth))
        z = z * valid

        lin = (kp[..., 1].astype(jnp.int32) * W + kp[..., 0].astype(jnp.int32))
        lin = jnp.where(valid, lin, H * W)

        def scatter_one(lin_b, z_b):
            buf = jnp.zeros((H * W + 1,), jnp.float32).at[lin_b].set(z_b)
            msk = jnp.zeros((H * W + 1,), jnp.float32).at[lin_b].set(1.0)
            return buf[:-1].reshape(H, W), msk[:-1].reshape(H, W)

        sparse_depth, sparse_mask = jax.vmap(scatter_one)(lin, z)
        depth, _ = self.densifier(sparse_depth, sparse_mask, image_skips, train)
        return depth


@register_baseline("deltas")
class Deltas(DepthEstimator):
    image_width = 320
    image_height = 240
    scale_rgb = 255.0
    # the reference stacks two normalizations: (x/255 - 0.5)/0.5 in
    # preprocessing (run-testing.py:197-199) then ImageNet stats inside the
    # model (superpoint.py:91-92,127); folded into one affine here:
    # mean' = 0.5 + 0.5*m, std' = 0.5*s
    mean_rgb = tuple(0.5 + 0.5 * m for m in (0.485, 0.456, 0.406))
    std_rgb = tuple(0.5 * s for s in (0.229, 0.224, 0.225))

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
        # the reference feeds the raw network output straight to the error
        # metrics; downstream consumers here (TSDF, inverse-depth metrics)
        # need strictly positive depth, so clamp to the model's range
        return np.clip(np.asarray(out[0]), MIN_DEPTH, MAX_DEPTH)
