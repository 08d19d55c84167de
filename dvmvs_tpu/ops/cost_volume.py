"""Plane-sweep cost volume — the hot op of the system.

Reference semantics (dvmvs/utils.py:45-107): for each of ``n_depth_levels``
planes uniform in inverse depth between 1/max_depth and 1/min_depth, warp the
measurement feature map into the reference view with the plane-induced
homography, bilinearly sample it (zeros padding, align_corners=True), and
reduce against the reference features — dot-product correlation / channels
(dvmvs mode) or L1 absolute difference (MVDepthNet/GPMVS mode). Multi-view
fusion is the mean over measurement views.

TPU-native design: the reference runs a 64-iteration Python loop issuing one
grid_sample per plane. Here all plane coordinates are produced by one batched
einsum, and the warp+reduce runs as a `lax.map` over plane *chunks* so the
(V, P, H, W, C) warped stack is never materialized in HBM — peak extra
memory is one chunk. A fused Pallas kernel for the sample+reduce lives in
ops/pallas/ (same contract, diffed against this implementation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dvmvs_tpu.ops.geometry import inverse_pose, make_warp_grid
from dvmvs_tpu.ops.sampling import grid_sample


def inverse_depth_planes(min_depth: float, max_depth: float, n_levels: int) -> jnp.ndarray:
    """(P,) inverse depths, uniform in 1/d from 1/max_depth to 1/min_depth."""
    base = 1.0 / max_depth
    step = (1.0 / min_depth - 1.0 / max_depth) / (n_levels - 1)
    return base + step * jnp.arange(n_levels, dtype=jnp.float32)


def _plane_grids(
    ref_pose: jnp.ndarray,
    meas_pose: jnp.ndarray,
    K: jnp.ndarray,
    height: int,
    width: int,
    inv_depths: jnp.ndarray,
) -> jnp.ndarray:
    """Normalized sampling grids for every depth plane.

    Returns (B, P, H, W, 2) grid-sample coordinates in [-1, 1] using the
    reference's W/2, H/2 normalizers (dvmvs/utils.py:62-73).
    """
    B = ref_pose.shape[0]
    P = inv_depths.shape[0]
    grid = jnp.asarray(make_warp_grid(width, height))  # (3, H*W)

    # Geometry matmuls must run at full f32 precision: the TPU default
    # (bf16 MXU passes) injects ~1e-3-relative coordinate error, which moves
    # sample positions by ~0.1 px and visibly corrupts the cost volume.
    with jax.default_matmul_precision("highest"):
        extrinsic = inverse_pose(meas_pose) @ ref_pose  # ref-cam -> meas-cam
        R = extrinsic[:, :3, :3]
        t = extrinsic[:, :3, 3:4]
        Kt = K @ t  # (B, 3, 1)
        K_R_Kinv = K @ R @ inverse_pose(K)
        base = jnp.einsum("bij,jn->bin", K_R_Kinv, grid)  # (B, 3, N)

    # coords[b, p] = base[b] + Kt[b] * inv_depth[p]
    coords = base[:, None, :, :] + Kt[:, None, :, :] * inv_depths[None, :, None, None]
    xy = coords[:, :, 0:2, :] / (coords[:, :, 2:3, :] + 1e-8)
    x = xy[:, :, 0, :] / (width / 2.0) - 1.0
    y = xy[:, :, 1, :] / (height / 2.0) - 1.0
    return jnp.stack([x, y], axis=-1).reshape(B, P, height, width, 2)


def plane_sweep_cost_volume(
    ref_feat: jnp.ndarray,
    meas_feat: jnp.ndarray,
    ref_pose: jnp.ndarray,
    meas_pose: jnp.ndarray,
    K: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    n_depth_levels: int,
    dot_product: bool = True,
    plane_chunk: int = 8,
) -> jnp.ndarray:
    """Single-view plane-sweep cost volume.

    ref_feat / meas_feat: (B, H, W, C) NHWC features at cost-volume
    resolution; poses are camera-to-world (B, 4, 4); K is (B, 3, 3) at the
    same resolution. Returns (B, H, W, P).
    """
    B, H, W, C = ref_feat.shape
    inv_depths = inverse_depth_planes(min_depth, max_depth, n_depth_levels)
    grids = _plane_grids(ref_pose, meas_pose, K, H, W, inv_depths)

    P = n_depth_levels
    chunk = min(plane_chunk, P)
    assert P % chunk == 0, f"n_depth_levels {P} must be divisible by plane_chunk {chunk}"
    n_chunks = P // chunk

    # (n_chunks, B, chunk, H, W, 2)
    grids = grids.reshape(B, n_chunks, chunk, H, W, 2).transpose(1, 0, 2, 3, 4, 5)

    # rematerialized in backward: the (B, chunk, H, W, C) warped slab is the
    # peak-memory term of this path's VJP; recomputing the gather per chunk
    # keeps the training tier-switch (which includes this branch as its
    # exact fallback) within HBM at reference shapes.
    @jax.checkpoint
    def chunk_fn(g):
        gg = g.reshape(B, chunk * H, W, 2)
        warped = grid_sample(meas_feat, gg, mode="bilinear", align_corners=True)
        warped = warped.reshape(B, chunk, H, W, C)
        if dot_product:
            return jnp.einsum("bhwc,bphwc->bphw", ref_feat, warped) / C
        return jnp.sum(jnp.abs(ref_feat[:, None] - warped), axis=-1)

    cost = jax.lax.map(chunk_fn, grids)  # (n_chunks, B, chunk, H, W)
    cost = cost.transpose(1, 0, 2, 3, 4).reshape(B, P, H, W)
    return cost.transpose(0, 2, 3, 1)  # NHWC: planes as channels


def plane_sweep_cost_volume_banded(
    ref_feat: jnp.ndarray,
    meas_feat: jnp.ndarray,
    ref_pose: jnp.ndarray,
    meas_pose: jnp.ndarray,
    K: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    n_depth_levels: int,
    band_h: int = 8,
    plane_chunk: int = 8,
    x_tiles: int = 1,
) -> jnp.ndarray:
    """DIFFERENTIABLE banded hat-matmul plane sweep (pure XLA).

    Same math as the Pallas kernel (gather-free: dynamic source-row bands +
    hat-function interpolation matmuls on the MXU) but expressed in jnp so
    gradients flow to both feature maps — this is the fast TRAINING path;
    inference uses the Pallas kernel. Exact iff every row's (per column
    tile, when x_tiles > 1) in-bounds y-span fits in ``band_h`` (see
    pallas.cost_volume_kernel.max_row_span with the same x_tiles); training
    drivers wrap it in a span-checked lax.cond against the gather path.

    Returns (B, H, W, P).
    """
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import build_plane_matrices

    B, H, W, C = ref_feat.shape
    P = n_depth_levels
    T = x_tiles
    Wt = W // T
    assert W % T == 0
    inv_depths = inverse_depth_planes(min_depth, max_depth, n_depth_levels)
    Ms = jax.vmap(build_plane_matrices, in_axes=(0, 0, 0, None))(
        ref_pose, meas_pose, K, inv_depths)  # (B, P, 3, 3)

    x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    jw = jnp.arange(W, dtype=jnp.float32)
    ks = jnp.arange(band_h, dtype=jnp.float32)

    def one_batch(ref, meas, M):
        # coords for all planes: (P, H, W) -> tiled (P, H, T, Wt)
        den = M[:, None, None, 2, 0] * x + M[:, None, None, 2, 1] * y \
            + M[:, None, None, 2, 2] + 1e-8
        xs = (M[:, None, None, 0, 0] * x + M[:, None, None, 0, 1] * y
              + M[:, None, None, 0, 2]) / den * ((W - 1.0) / W)
        ys = (M[:, None, None, 1, 0] * x + M[:, None, None, 1, 1] * y
              + M[:, None, None, 1, 2]) / den * ((H - 1.0) / H)
        xs = xs.reshape(P, H, T, Wt)
        ys = ys.reshape(P, H, T, Wt)
        in_b = (ys > -1.0) & (ys < float(H))
        ys_in = jnp.where(in_b, ys, float(H))
        lo = jnp.clip(jnp.floor(jnp.min(ys_in, axis=-1)), 0, H - band_h
                      ).astype(jnp.int32)  # (P, H, T)

        n_chunks = P // plane_chunk
        xs_c = xs.reshape(n_chunks, plane_chunk, H, T, Wt)
        ys_c = ys.reshape(n_chunks, plane_chunk, H, T, Wt)
        lo_c = lo.reshape(n_chunks, plane_chunk, H, T)

        # rematerialized in backward: the (chunk,H,T,band,W,C) band gather
        # and its x-interp are the training step's peak-memory hogs (the
        # tiled band-64 branch of the tier switch OOMed a 16 GB chip);
        # recomputing them costs a fraction of the network backward.
        @jax.checkpoint
        def chunk_fn(args):
            cxs, cys, clo = args  # (c,H,T,Wt), (c,H,T,Wt), (c,H,T)
            hatx = jnp.maximum(0.0, 1.0 - jnp.abs(cxs[..., None] - jw))  # (c,H,T,Wt,Win)
            bands = jax.vmap(jax.vmap(jax.vmap(
                lambda l: jax.lax.dynamic_slice(meas, (l, 0, 0), (band_h, W, C))
            )))(clo)  # (c,H,T,band_h,Win,C)
            xint = jnp.einsum("pytxj,pytkjc->pytxkc", hatx, bands)
            ky = clo[..., None].astype(jnp.float32) + ks  # (c,H,T,band_h)
            haty = jnp.maximum(
                0.0, 1.0 - jnp.abs(cys[..., None] - ky[:, :, :, None, :]))  # (c,H,T,Wt,band_h)
            warped = jnp.einsum("pytxk,pytxkc->pytxc", haty, xint)
            ref_t = ref.reshape(H, T, Wt, C)
            return jnp.einsum("ytxc,pytxc->pytx", ref_t, warped).reshape(
                plane_chunk, H, W) / C

        cost = jax.lax.map(chunk_fn, (xs_c, ys_c, lo_c))  # (n_chunks, c, H, W)
        return cost.reshape(P, H, W)

    cost = jax.vmap(one_batch)(ref_feat, meas_feat, Ms)  # (B, P, H, W)
    return cost.transpose(0, 2, 3, 1)


# Default path selection for plane_sweep_cost_volume_train when the caller
# passes method=None (the training heads do): overridable for A/B
# benchmarking of the training ladder (scripts/bench_train_step.py) without
# threading a config through every model layer. Read at TRACE time.
TRAIN_CV_METHOD = "auto"


def plane_sweep_cost_volume_train(
    ref_feat, meas_feat, ref_pose, meas_pose, K,
    min_depth, max_depth, n_depth_levels,
    plane_chunk: int = 8,
    method: str | None = None,
):
    """Differentiable plane sweep with PER-ELEMENT runtime path selection:
    each batch element independently takes the smallest band tier whose
    y-span check passes (cost is linear in the band height; real keyframe
    geometry routinely needs 16-64 source rows, docs/PERF.md), or the
    dynamic-trip kernel under extreme rotation. All branches are
    differentiable; lax.switch inside the batch map executes one per
    element.

    Every rung runs Pallas forward AND backward (custom-VJP kernels,
    ops/pallas/cost_volume_vjp.py) — training rides the same MXU band
    matmuls as inference and never falls back to the XLA gather path
    (fallback rates measured in docs/train_fallback.json; the gather
    ladder OOMed a 16 GB chip without remat and is ~2x slower).

    method: 'auto' (Pallas VJP ladder on TPU, gather elsewhere),
    'pallas_interpret' (the Pallas ladder in interpret mode — CPU
    conformance tests), 'gather', 'xla_banded' (the round-2 einsum ladder,
    batch-level switch — kept as a benchmarking oracle).
    """
    from dvmvs_tpu.ops.pallas.cost_volume_kernel import (
        BAND_TIERS,
        build_plane_matrices,
        max_row_spans,
    )
    from dvmvs_tpu.ops.pallas.cost_volume_vjp import (
        make_diff_plane_sweep,
        make_diff_plane_sweep_dyn,
    )

    if method is None:
        method = TRAIN_CV_METHOD
    if method == "gather" or (
            method == "auto" and jax.default_backend() != "tpu"):
        return plane_sweep_cost_volume(
            ref_feat, meas_feat, ref_pose, meas_pose, K,
            min_depth, max_depth, n_depth_levels, plane_chunk=plane_chunk)
    interpret = method == "pallas_interpret"

    H, W = ref_feat.shape[1:3]
    inv_depths = inverse_depth_planes(min_depth, max_depth, n_depth_levels)
    Ms = jax.vmap(build_plane_matrices, in_axes=(0, 0, 0, None))(
        ref_pose, meas_pose, K, inv_depths)
    tiers = [b for b in BAND_TIERS if b <= H]
    # NO column tiling in the training ladder: the span check must stay in
    # sync with the kernels (the VJP kernels are untiled).
    spans = jax.vmap(
        lambda m: jnp.stack(max_row_spans(m, H, W, tuple(tiers))))(Ms)

    if method == "xla_banded":
        # benchmarking oracle for the round-2 einsum ladder: batch-level
        # switch, gather last rung (the historical behavior)
        tier_span = [jnp.max(spans[..., i]) for i in range(len(tiers))]

        def banded(band_h):
            def branch():
                return plane_sweep_cost_volume_banded(
                    ref_feat, meas_feat, ref_pose, meas_pose, K,
                    min_depth, max_depth, n_depth_levels, band_h, plane_chunk)
            return branch

        def gather():
            return plane_sweep_cost_volume(
                ref_feat, meas_feat, ref_pose, meas_pose, K,
                min_depth, max_depth, n_depth_levels, plane_chunk=plane_chunk)

        index = jnp.full((), len(tiers), jnp.int32)
        for i in range(len(tiers) - 1, -1, -1):
            index = jnp.where(tier_span[i] <= tiers[i], i, index)
        return jax.lax.switch(index, [banded(b) for b in tiers] + [gather])

    # PER-ELEMENT tier switch inside the batch map: one rotation-heavy pair
    # no longer drags the whole batch to a large band (measured on the
    # proxy training streams: the batch-max decision lands on gather 19%
    # of fusionnet scan steps and 52% of pairnet directions, while
    # per-element rates are ~5% — docs/train_fallback.json). The last rung
    # is the dynamic-trip Pallas VJP pair, so training NEVER falls back to
    # the XLA gather path (which OOMed without remat and measured ~2x
    # slower); cost per element tracks its own geometry.
    dyn = make_diff_plane_sweep_dyn(interpret)

    def one_elem(t):
        rf, mf, M, sp = t

        def tier_branch(band_h):
            f = make_diff_plane_sweep(band_h, interpret)
            return lambda: f(rf, mf, M)

        idx = jnp.full((), len(tiers), jnp.int32)
        for i in range(len(tiers) - 1, -1, -1):
            idx = jnp.where(sp[i] <= tiers[i], i, idx)
        return jax.lax.switch(
            idx, [tier_branch(b) for b in tiers] + [lambda: dyn(rf, mf, M)])

    cost = jax.lax.map(one_elem, (ref_feat, meas_feat, Ms, spans))
    return cost.transpose(0, 2, 3, 1)  # (B, H, W, P)


def _gather_fused(
    ref_feat, meas_feats, ref_pose, meas_poses, K,
    min_depth, max_depth, n_depth_levels, dot_product, view_mask, plane_chunk,
):
    V = meas_feats.shape[1]

    def one_view(mf, mp):
        return plane_sweep_cost_volume(
            ref_feat, mf, ref_pose, mp, K,
            min_depth, max_depth, n_depth_levels,
            dot_product=dot_product, plane_chunk=plane_chunk,
        )

    per_view = jax.vmap(one_view, in_axes=(1, 1), out_axes=0)(meas_feats, meas_poses)
    return _masked_view_mean(per_view, view_mask)


def _masked_view_mean(per_view, view_mask):
    """per_view: (V, B, H, W, P) -> masked mean (B, H, W, P)."""
    if view_mask is None:
        return jnp.mean(per_view, axis=0)
    m = view_mask.astype(per_view.dtype)  # (B, V)
    weighted = jnp.einsum("vbhwp,bv->bhwp", per_view, m)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)[:, None, None, None]
    return weighted / denom


def cost_volume_fused(
    ref_feat: jnp.ndarray,
    meas_feats: jnp.ndarray,
    ref_pose: jnp.ndarray,
    meas_poses: jnp.ndarray,
    K: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    n_depth_levels: int,
    dot_product: bool = True,
    view_mask: Optional[jnp.ndarray] = None,
    plane_chunk: int = 8,
    method: str = "auto",
) -> jnp.ndarray:
    """Multi-view fused cost volume: masked mean over measurement views.

    meas_feats: (B, V, H, W, C); meas_poses: (B, V, 4, 4);
    view_mask: optional (B, V) float/bool — padded (invalid) views contribute
    zero and the mean divides by the number of valid views. With no mask this
    is the reference's plain mean over views (dvmvs/utils.py:89-107).

    Static view count V + mask replaces the reference's Python-variable view
    list, so one compiled program serves every keyframe cardinality.

    method: 'pallas' | 'gather' | 'auto'. 'auto' uses the fused Pallas TPU
    kernel (gather-free, ~7x faster) with a runtime band-validity check that
    falls back to the gather path under extreme inter-view rotation
    (lax.cond — both branches compiled, one executed). The Pallas kernel is
    forward-only; training paths use the differentiable gather
    implementation directly.
    """
    B, V = meas_feats.shape[:2]
    H, W = ref_feat.shape[1:3]

    use_pallas = (
        method == "pallas"
        or (method == "auto" and jax.default_backend() == "tpu")
    )
    if not use_pallas:
        return _gather_fused(
            ref_feat, meas_feats, ref_pose, meas_poses, K,
            min_depth, max_depth, n_depth_levels, dot_product, view_mask,
            plane_chunk)

    from dvmvs_tpu.ops.pallas.cost_volume_kernel import (
        BAND_TIERS,
        build_plane_matrices,
        max_row_spans,
        pallas_plane_sweep_multiview,
        pallas_plane_sweep_multiview_dyn,
    )

    inv_depths = inverse_depth_planes(min_depth, max_depth, n_depth_levels)
    Ms = jax.vmap(
        jax.vmap(build_plane_matrices, in_axes=(None, 0, None, None)),
        in_axes=(0, 0, 0, None),
    )(ref_pose, meas_poses, K, inv_depths)  # (B, V, P, 3, 3)
    tiers = [b for b in BAND_TIERS if b <= H]
    # Column tiling: independent band starts per half-row halve the needed
    # band under roll (y-span is ~linear along x), dropping rotation-heavy
    # frames a tier lower at identical MXU lane utilization (docs/PERF.md).
    x_tiles = 2 if (W % 2 == 0 and W >= 64) else 1
    spans = jax.vmap(jax.vmap(
        lambda m: jnp.stack(max_row_spans(m, H, W, tuple(tiers),
                                          x_tiles=x_tiles))))(Ms)
    # per-element tier requirement: max over this element's (V, P) only —
    # in scene-batch lockstep serving (B up to 16 distinct scenes) one
    # rotation-heavy scene no longer drags every scene to a large band
    elem_spans = jnp.max(spans, axis=1)  # (B, n_tiers)

    if view_mask is None:
        weights = jnp.full((B, V), 1.0 / V, jnp.float32)
    else:
        m = view_mask.astype(jnp.float32)
        weights = m / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)

    # Pick the cheapest exact implementation for each element's geometry:
    # the smallest band tier whose y-span check passes (kernel cost scales
    # linearly with band height; the static band's single dynamic-start
    # slice beats predicated chunking for spans that fit a tier), else the
    # dynamic-trip kernel under extreme inter-view rotation (exact for ANY
    # span, ~1.2x faster than XLA gather at span>100, docs/PERF.md). Real
    # trajectories need the large tiers often: on the hololens sample's
    # keyframes the per-row source span is 27 px at the median and 53 at
    # p90 (see docs/PERF.md).
    def one_elem(t):
        rf, mfs, M_b, w_b, sp = t

        def tier_branch(band_h):
            return lambda: pallas_plane_sweep_multiview(
                rf, mfs, M_b, w_b, band_h=band_h,
                dot_product=dot_product, x_tiles=x_tiles)

        idx = jnp.full((), len(tiers), jnp.int32)  # default: dynamic-trip
        for i in range(len(tiers) - 1, -1, -1):
            idx = jnp.where(sp[i] <= tiers[i], i, idx)
        return jax.lax.switch(
            idx,
            [tier_branch(b) for b in tiers]
            + [lambda: pallas_plane_sweep_multiview_dyn(
                rf, mfs, M_b, w_b, dot_product=dot_product)])

    cvs = jax.lax.map(
        one_elem, (ref_feat, meas_feats, Ms, weights, elem_spans))
    return cvs.transpose(0, 2, 3, 1)
