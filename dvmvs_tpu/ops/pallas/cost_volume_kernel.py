"""Fused Pallas TPU kernel for the plane-sweep cost volume.

Replaces the reference's 64-iteration grid_sample loop (dvmvs/utils.py:65-84)
and our XLA gather path with a gather-free formulation:

  bilinear sampling == two hat-function interpolations
      warped(x) = sum_k hat(ys(x)-k) * sum_j hat(xs(x)-j) * img[k, j]
  with hat(t) = max(0, 1-|t|). The inner sum over j is a dense
  (band*C x W_in) @ (W_in x W_out) matmul on the MXU; the outer sum runs
  over a height-BAND_H source-row *band* dynamically sliced from the
  VMEM-resident measurement features around each output row's y-span.

Per grid step (plane p, row-block): compute the homography coordinates on
the VPU from per-plane 3x3 matrices (scalar-prefetched to SMEM), slice the
band, build the hat matrix, matmul, collapse with the y-hat weights, and
dot-reduce against the reference features — emitting (planes, H, W) cost
directly. The warped feature stack never exists in HBM, and there is not a
single gather in the program.

Layout: features enter as (H, C, W) — channel-major rows — so every kernel
value is a 2-D (sublane x lane) tile; Mosaic has no 3-D dot/reshape.

Zeros-padding + align_corners=True semantics match torch grid_sample
exactly: out-of-range corners receive zero hat weight, and the reference's
W/2-normalizer convention is folded into the coordinate scale factors
(x_sample = x_pix * (W-1)/W).

Correctness domain: any output row's in-bounds y-span must fit in BAND_H
source rows (roll between views up to ~atan(BAND_H/W) ~ 5.7 deg at 320x256).
Callers check `max_row_span` and fall back to the XLA gather path when
exceeded, so results are always exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND_H = 16       # default source rows per band (max supported roll)
BAND_H_SMALL = 8  # fast-path band for translation-dominated motion
# Runtime tier ladder: kernel cost scales linearly with band height, so the
# callers pick the smallest tier whose span check passes. Real trajectories
# (hololens keyframes) need the middle tiers often — with column tiling
# (x_tiles=2) 36% of keyframes land in (16, 32], so the 24 rung saves ~25%
# on those; 48 does the same for the (32, 64] tail.
BAND_TIERS = (BAND_H_SMALL, BAND_H, 24, 32, 48, 64)
ROW_BLOCK = 8     # output rows per grid step


def build_plane_matrices(ref_pose, meas_pose, K, inv_depths):
    """(P, 3, 3) pixel-warp matrices M_p: coords_p = M_p @ [x, y, 1]^T.

    M_p = K R K^-1 + inv_depth_p * (K t) e3^T  — the loop-invariant
    decomposition of the reference's per-plane homography
    (dvmvs/utils.py:51-68). Unbatched (single ref/meas pair).
    """
    with jax.default_matmul_precision("highest"):
        extrinsic = jnp.linalg.inv(meas_pose) @ ref_pose
        R = extrinsic[:3, :3]
        t = extrinsic[:3, 3:4]
        Kt = K @ t  # (3, 1)
        A = K @ R @ jnp.linalg.inv(K)  # (3, 3)
    e3 = jnp.zeros((1, 3), A.dtype).at[0, 2].set(1.0)
    return A[None, :, :] + inv_depths[:, None, None] * (Kt @ e3)[None]


def _kernel(params_ref, ref_ref, meas_ref, out_ref, *, H, W, C, inv_channels, band_h,
            dot_product):
    p = pl.program_id(0)
    rb = pl.program_id(1)

    xw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)   # pixel x
    jw = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)   # (j, x)

    m00 = params_ref[p * 9 + 0]
    m01 = params_ref[p * 9 + 1]
    m02 = params_ref[p * 9 + 2]
    m10 = params_ref[p * 9 + 3]
    m11 = params_ref[p * 9 + 4]
    m12 = params_ref[p * 9 + 5]
    m20 = params_ref[p * 9 + 6]
    m21 = params_ref[p * 9 + 7]
    m22 = params_ref[p * 9 + 8]

    x_scale = (W - 1.0) / W  # reference W/2-normalizer + align_corners fold
    y_scale = (H - 1.0) / H

    for r in range(ROW_BLOCK):
        y = (rb * ROW_BLOCK + r).astype(jnp.float32)
        den = m20 * xw + m21 * y + m22 + 1e-8          # (1, W)
        xs = (m00 * xw + m01 * y + m02) / den * x_scale
        ys = (m10 * xw + m11 * y + m12) / den * y_scale

        # Only in-bounds samples need band coverage (out-of-bounds rows get
        # zero hat weight regardless); sentinel H keeps floor() finite.
        in_bounds = (ys > -1.0) & (ys < jnp.float32(H))
        ys_in = jnp.where(in_bounds, ys, jnp.float32(H))
        lo = jnp.clip(jnp.floor(jnp.min(ys_in)), 0, H - band_h).astype(jnp.int32)

        # hat matrix over source columns: (j, x_out)
        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - jw))  # (W_in, W_out)

        ky = lo.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (band_h, 1), 0).astype(jnp.float32)   # (Bh, 1)
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(ys - ky))      # (Bh, W_out)

        # meas is stored pre-flattened (H*C, W), so the band slice is already
        # the 2-D matmul operand — one (Bh*C, W_in) @ (W_in, W_out) MXU op
        # per row. (An in-kernel (Bh,C,W)->(Bh*C,W) reshape miscompiles in
        # Mosaic for >128-lane tiles, hence the host-side layout.)
        start = pl.multiple_of(lo * C, 8)  # C is padded to a multiple of 8
        band = meas_ref[pl.ds(start, band_h * C), :]         # (Bh*C, W_in)
        xint = jax.lax.dot_general(
            band, hatx,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bh*C, W_out)

        warped = jnp.zeros((C, W), jnp.float32)
        for k in range(band_h):
            warped = warped + haty[k:k + 1, :] * xint[k * C:(k + 1) * C, :]

        if dot_product:
            cost = jnp.sum(ref_ref[r] * warped, axis=0, keepdims=True) * inv_channels
        else:  # L1 mode (MVDepthNet/GPMVS, dvmvs/utils.py:84)
            cost = jnp.sum(jnp.abs(ref_ref[r] - warped), axis=0, keepdims=True)
        out_ref[0, pl.ds(r, 1), :] = cost  # (1, W)


@functools.partial(jax.jit, static_argnames=("interpret", "band_h", "dot_product"))
def pallas_plane_sweep(ref_feat, meas_feat, plane_matrices, interpret: bool = False,
                       band_h: int = BAND_H, dot_product: bool = True):
    """Cost volume for one (ref, meas) pair, all planes.

    ref_feat/meas_feat: (H, W, C) f32 NHWC; plane_matrices: (P, 3, 3).
    Returns (P, H, W) dot-product cost.
    """
    H, W, C = ref_feat.shape
    P = plane_matrices.shape[0]
    assert H % ROW_BLOCK == 0

    # Pad channels to a multiple of the f32 sublane tile (8) so the dynamic
    # band start lo*C is provably aligned; zero channels contribute nothing
    # to either the dot product or the L1 reduction.
    if C % 8 != 0:
        pad = 8 - C % 8
        zeros = jnp.zeros(ref_feat.shape[:2] + (pad,), ref_feat.dtype)
        n_real = C
        ref_feat = jnp.concatenate([ref_feat, zeros], axis=-1)
        meas_feat = jnp.concatenate([meas_feat, zeros], axis=-1)
        C = C + pad
    else:
        n_real = C

    ref_hcw = jnp.swapaxes(ref_feat, 1, 2)    # (H, C, W)
    meas_flat = jnp.swapaxes(meas_feat, 1, 2).reshape(H * C, W)  # (H*C, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, H // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda p, rb, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),   # ref rows for this block
            pl.BlockSpec(memory_space=pltpu.VMEM),   # meas: full, band-sliced
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_BLOCK, W), lambda p, rb, *_: (p, rb, 0),
            memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_kernel, H=H, W=W, C=C, inv_channels=1.0 / n_real,
                               band_h=band_h, dot_product=dot_product)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, H, W), jnp.float32),
        interpret=interpret,
    )(plane_matrices.reshape(-1), ref_hcw, meas_flat)


def _kernel_mv(params_ref, weights_ref, ref_ref, meas_ref, out_ref, *,
               H, W, C, inv_channels, band_h, dot_product, n_views,
               x_tiles=1):
    """Multi-view variant: grid (P, H//ROW_BLOCK, V) with the view axis
    innermost, accumulating the weighted per-view cost into the same output
    block (which therefore stays resident in VMEM across views).

    meas enters as ONE whole-array VMEM operand (V*H*C, W): a per-view
    BlockSpec would alternate view blocks every grid step (v is innermost)
    and re-fetch ~2.6 MB from HBM each time — measured as a flat ~11.6 ms
    floor that dwarfed the band matmuls. Whole-array residency loads each
    view once for the entire kernel.

    x_tiles: split each output row into column tiles with INDEPENDENT band
    starts. Roll-induced y-span varies ~linearly along x, so a tile only
    needs ~span/x_tiles band rows — the ladder then picks a tier one rung
    lower for rotation-heavy frames at identical MXU lane utilization
    (W_out/tile pads to the same 128-lane groups). The span check must use
    the same tiling (max_row_spans(..., x_tiles=...))."""
    p = pl.program_id(0)
    rb = pl.program_id(1)
    v = pl.program_id(2)

    W_t = W // x_tiles
    xw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    jw = jax.lax.broadcasted_iota(jnp.int32, (W, W_t), 0).astype(jnp.float32)

    base = (v * pl.num_programs(0) + p) * 9
    m00 = params_ref[base + 0]
    m01 = params_ref[base + 1]
    m02 = params_ref[base + 2]
    m10 = params_ref[base + 3]
    m11 = params_ref[base + 4]
    m12 = params_ref[base + 5]
    m20 = params_ref[base + 6]
    m21 = params_ref[base + 7]
    m22 = params_ref[base + 8]
    w_view = weights_ref[v]

    x_scale = (W - 1.0) / W
    y_scale = (H - 1.0) / H

    @pl.when(v == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for r in range(ROW_BLOCK):
        y = (rb * ROW_BLOCK + r).astype(jnp.float32)
        den = m20 * xw + m21 * y + m22 + 1e-8
        xs = (m00 * xw + m01 * y + m02) / den * x_scale
        ys = (m10 * xw + m11 * y + m12) / den * y_scale

        costs = []
        for t in range(x_tiles):
            xs_t = xs[:, t * W_t:(t + 1) * W_t]
            ys_t = ys[:, t * W_t:(t + 1) * W_t]
            in_bounds = (ys_t > -1.0) & (ys_t < jnp.float32(H))
            ys_in = jnp.where(in_bounds, ys_t, jnp.float32(H))
            lo = jnp.clip(jnp.floor(jnp.min(ys_in)), 0, H - band_h).astype(jnp.int32)

            hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xs_t - jw))  # (W_in, W_t)
            ky = lo.astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (band_h, 1), 0).astype(jnp.float32)
            haty = jnp.maximum(0.0, 1.0 - jnp.abs(ys_t - ky))  # (Bh, W_t)

            start = pl.multiple_of(v * (H * C) + lo * C, 8)
            band = meas_ref[pl.ds(start, band_h * C), :]
            xint = jax.lax.dot_general(
                band, hatx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Bh*C, W_t)

            warped = jnp.zeros((C, W_t), jnp.float32)
            for k in range(band_h):
                warped = warped + haty[k:k + 1, :] * xint[k * C:(k + 1) * C, :]

            ref_t = ref_ref[r][:, t * W_t:(t + 1) * W_t]
            if dot_product:
                costs.append(
                    jnp.sum(ref_t * warped, axis=0, keepdims=True) * inv_channels)
            else:
                costs.append(
                    jnp.sum(jnp.abs(ref_t - warped), axis=0, keepdims=True))
        cost = costs[0] if x_tiles == 1 else jnp.concatenate(costs, axis=1)
        out_ref[0, pl.ds(r, 1), :] += cost * w_view


@functools.partial(jax.jit, static_argnames=(
    "interpret", "band_h", "dot_product", "x_tiles"))
def pallas_plane_sweep_multiview(ref_feat, meas_feats, plane_matrices, weights,
                                 interpret: bool = False, band_h: int = BAND_H,
                                 dot_product: bool = True, x_tiles: int = 1):
    """Fused multi-view cost volume in ONE kernel launch.

    ref_feat (H, W, C); meas_feats (V, H, W, C); plane_matrices (V, P, 3, 3);
    weights (V,) — per-view weights (e.g. mask/valid_count for the masked
    mean). Returns (P, H, W) of sum_v weights[v] * cost_v.
    x_tiles: independent band starts per column tile (see _kernel_mv); the
    caller must have validated spans with the SAME tiling.
    """
    H, W, C = ref_feat.shape
    V, P = plane_matrices.shape[:2]
    assert H % ROW_BLOCK == 0 and W % x_tiles == 0

    if C % 8 != 0:
        pad = 8 - C % 8
        n_real = C
        ref_feat = jnp.concatenate(
            [ref_feat, jnp.zeros(ref_feat.shape[:2] + (pad,), ref_feat.dtype)], axis=-1)
        meas_feats = jnp.concatenate(
            [meas_feats, jnp.zeros(meas_feats.shape[:3] + (pad,), meas_feats.dtype)],
            axis=-1)
        C = C + pad
    else:
        n_real = C

    ref_hcw = jnp.swapaxes(ref_feat, 1, 2)  # (H, C, W)
    meas_flat = jnp.swapaxes(meas_feats, 2, 3).reshape(V * H * C, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, H // ROW_BLOCK, V),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda p, rb, v, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # meas: whole, resident
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_BLOCK, W), lambda p, rb, v, *_: (p, rb, 0),
            memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel_mv, H=H, W=W, C=C, inv_channels=1.0 / n_real,
        band_h=band_h, dot_product=dot_product, n_views=V, x_tiles=x_tiles)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, H, W), jnp.float32),
        interpret=interpret,
    )(plane_matrices.reshape(-1), weights.astype(jnp.float32),
      ref_hcw, meas_flat)


def _kernel_mv_dyn(params_ref, weights_ref, ref_ref, meas_ref, out_ref,
                   *, H, W, C, inv_channels, dot_product):
    """Dynamic-trip multi-view variant, exact for ANY geometry: source rows
    are processed in absolute 8-row-aligned chunks, and per (plane, row) a
    ``fori_loop`` with RUNTIME bounds executes only the chunks intersecting
    that row's real y-span (the accumulator rides the loop carry — no VMEM
    scratch, no predicated dead regions). Cost is proportional to the
    actual span, not a band ceiling, and there is no gather fallback to
    keep in sync."""
    p = pl.program_id(0)
    rb = pl.program_id(1)
    v = pl.program_id(2)

    xw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    jw = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)

    base = (v * pl.num_programs(0) + p) * 9
    m00 = params_ref[base + 0]
    m01 = params_ref[base + 1]
    m02 = params_ref[base + 2]
    m10 = params_ref[base + 3]
    m11 = params_ref[base + 4]
    m12 = params_ref[base + 5]
    m20 = params_ref[base + 6]
    m21 = params_ref[base + 7]
    m22 = params_ref[base + 8]
    w_view = weights_ref[v]

    x_scale = (W - 1.0) / W
    y_scale = (H - 1.0) / H

    @pl.when(v == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for r in range(ROW_BLOCK):
        y = (rb * ROW_BLOCK + r).astype(jnp.float32)
        den = m20 * xw + m21 * y + m22 + 1e-8
        xs = (m00 * xw + m01 * y + m02) / den * x_scale
        ys = (m10 * xw + m11 * y + m12) / den * y_scale

        # chunk range: in-bounds samples touch source rows
        # floor(ys)..floor(ys)+1; out-of-bounds samples contribute zero hat
        # weight (sentinels make the range empty when nothing is in bounds).
        in_bounds = (ys > -1.0) & (ys < jnp.float32(H))
        ys_lo = jnp.where(in_bounds, ys, jnp.float32(H))
        lo = jnp.clip(jnp.floor(jnp.min(ys_lo)), 0, H - 1).astype(jnp.int32)
        ys_hi = jnp.where(in_bounds, ys, -1.0)
        hi = jnp.clip(jnp.floor(jnp.max(ys_hi)) + 1.0, -1.0, H - 1.0).astype(jnp.int32)
        c0 = lo // 8
        c1 = hi // 8  # -1//8 == -1 when nothing is in bounds -> 0 trips

        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - jw))

        def chunk_body(c, acc):
            start = pl.multiple_of(v * (H * C) + c * (8 * C), 8)
            band = meas_ref[pl.ds(start, 8 * C), :]
            xint = jax.lax.dot_general(
                band, hatx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ky = (8 * c).astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0).astype(jnp.float32)
            haty = jnp.maximum(0.0, 1.0 - jnp.abs(ys - ky))  # (8, W)
            for k in range(8):
                acc = acc + haty[k:k + 1, :] * xint[k * C:(k + 1) * C, :]
            return acc

        warped = jax.lax.fori_loop(
            jnp.maximum(c0, 0), c1 + 1, chunk_body,
            jnp.zeros((C, W), jnp.float32))
        if dot_product:
            cost = jnp.sum(ref_ref[r] * warped, axis=0, keepdims=True) * inv_channels
        else:
            cost = jnp.sum(jnp.abs(ref_ref[r] - warped), axis=0, keepdims=True)
        out_ref[0, pl.ds(r, 1), :] += cost * w_view


@functools.partial(jax.jit, static_argnames=("interpret", "dot_product"))
def pallas_plane_sweep_multiview_dyn(ref_feat, meas_feats, plane_matrices, weights,
                                     interpret: bool = False,
                                     dot_product: bool = True):
    """Dynamic-trip fused multi-view cost volume: exact for any geometry
    (chunks cover the full source height), with per-row cost proportional
    to the ACTUAL y-span. Same contract as pallas_plane_sweep_multiview."""
    H, W, C = ref_feat.shape
    V, P = plane_matrices.shape[:2]
    assert H % ROW_BLOCK == 0

    if C % 8 != 0:
        pad = 8 - C % 8
        n_real = C
        ref_feat = jnp.concatenate(
            [ref_feat, jnp.zeros(ref_feat.shape[:2] + (pad,), ref_feat.dtype)], axis=-1)
        meas_feats = jnp.concatenate(
            [meas_feats, jnp.zeros(meas_feats.shape[:3] + (pad,), meas_feats.dtype)],
            axis=-1)
        C = C + pad
    else:
        n_real = C

    ref_hcw = jnp.swapaxes(ref_feat, 1, 2)
    meas_flat = jnp.swapaxes(meas_feats, 2, 3).reshape(V * H * C, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, H // ROW_BLOCK, V),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda p, rb, v, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # meas: whole, resident
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_BLOCK, W), lambda p, rb, v, *_: (p, rb, 0),
            memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel_mv_dyn, H=H, W=W, C=C, inv_channels=1.0 / n_real,
        dot_product=dot_product)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, H, W), jnp.float32),
        interpret=interpret,
    )(plane_matrices.reshape(-1), weights.astype(jnp.float32),
      ref_hcw, meas_flat)


def _kernel_dyn(params_ref, ref_ref, meas_ref, out_ref, *, H, W, C,
                inv_channels, dot_product):
    """Single-view dynamic-trip variant (the training ladder's last rung —
    see cost_volume_vjp.make_diff_plane_sweep_dyn for the backward pass).
    Same chunked fori_loop structure as _kernel_mv_dyn without the view
    axis: exact for ANY geometry, per-row cost tracks the real y-span."""
    p = pl.program_id(0)
    rb = pl.program_id(1)

    xw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(jnp.float32)
    jw = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)

    m00 = params_ref[p * 9 + 0]
    m01 = params_ref[p * 9 + 1]
    m02 = params_ref[p * 9 + 2]
    m10 = params_ref[p * 9 + 3]
    m11 = params_ref[p * 9 + 4]
    m12 = params_ref[p * 9 + 5]
    m20 = params_ref[p * 9 + 6]
    m21 = params_ref[p * 9 + 7]
    m22 = params_ref[p * 9 + 8]

    x_scale = (W - 1.0) / W
    y_scale = (H - 1.0) / H

    for r in range(ROW_BLOCK):
        y = (rb * ROW_BLOCK + r).astype(jnp.float32)
        den = m20 * xw + m21 * y + m22 + 1e-8
        xs = (m00 * xw + m01 * y + m02) / den * x_scale
        ys = (m10 * xw + m11 * y + m12) / den * y_scale

        in_bounds = (ys > -1.0) & (ys < jnp.float32(H))
        ys_lo = jnp.where(in_bounds, ys, jnp.float32(H))
        lo = jnp.clip(jnp.floor(jnp.min(ys_lo)), 0, H - 1).astype(jnp.int32)
        ys_hi = jnp.where(in_bounds, ys, -1.0)
        hi = jnp.clip(jnp.floor(jnp.max(ys_hi)) + 1.0, -1.0, H - 1.0).astype(jnp.int32)
        c0 = lo // 8
        c1 = hi // 8  # -1//8 == -1 when nothing is in bounds -> 0 trips

        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - jw))

        def chunk_body(c, acc):
            start = pl.multiple_of(c * (8 * C), 8)
            band = meas_ref[pl.ds(start, 8 * C), :]
            xint = jax.lax.dot_general(
                band, hatx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ky = (8 * c).astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0).astype(jnp.float32)
            haty = jnp.maximum(0.0, 1.0 - jnp.abs(ys - ky))  # (8, W)
            for k in range(8):
                acc = acc + haty[k:k + 1, :] * xint[k * C:(k + 1) * C, :]
            return acc

        warped = jax.lax.fori_loop(
            jnp.maximum(c0, 0), c1 + 1, chunk_body,
            jnp.zeros((C, W), jnp.float32))
        if dot_product:
            cost = jnp.sum(ref_ref[r] * warped, axis=0, keepdims=True) * inv_channels
        else:
            cost = jnp.sum(jnp.abs(ref_ref[r] - warped), axis=0, keepdims=True)
        out_ref[0, pl.ds(r, 1), :] = cost


@functools.partial(jax.jit, static_argnames=("interpret", "dot_product"))
def pallas_plane_sweep_dyn(ref_feat, meas_feat, plane_matrices,
                           interpret: bool = False, dot_product: bool = True):
    """Single-view dynamic-trip cost volume: exact for any geometry.
    Same contract as pallas_plane_sweep, no band_h precondition."""
    H, W, C = ref_feat.shape
    P = plane_matrices.shape[0]
    assert H % ROW_BLOCK == 0

    if C % 8 != 0:
        pad = 8 - C % 8
        n_real = C
        ref_feat = jnp.concatenate(
            [ref_feat, jnp.zeros(ref_feat.shape[:2] + (pad,), ref_feat.dtype)], axis=-1)
        meas_feat = jnp.concatenate(
            [meas_feat, jnp.zeros(meas_feat.shape[:2] + (pad,), meas_feat.dtype)], axis=-1)
        C = C + pad
    else:
        n_real = C

    ref_hcw = jnp.swapaxes(ref_feat, 1, 2)
    meas_flat = jnp.swapaxes(meas_feat, 1, 2).reshape(H * C, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, H // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda p, rb, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # meas: whole, resident
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_BLOCK, W), lambda p, rb, *_: (p, rb, 0),
            memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel_dyn, H=H, W=W, C=C, inv_channels=1.0 / n_real,
        dot_product=dot_product)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, H, W), jnp.float32),
        interpret=interpret,
    )(plane_matrices.reshape(-1), ref_hcw, meas_flat)


def _row_extremes(plane_matrices, H: int, W: int, x_tiles: int = 1):
    """Per-(plane, row, column-tile) in-bounds y extremes
    (min-floor, hi-needed). With x_tiles > 1 each tile has an independent
    band start, mirroring the kernel's per-tile ``lo``."""
    x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    M = plane_matrices
    den = M[:, None, None, 2, 0] * x + M[:, None, None, 2, 1] * y + M[:, None, None, 2, 2] + 1e-8
    ys = (M[:, None, None, 1, 0] * x + M[:, None, None, 1, 1] * y + M[:, None, None, 1, 2]) / den
    ys = ys * (H - 1.0) / H
    P = ys.shape[0]
    ys = ys.reshape(P, H, x_tiles, W // x_tiles)
    in_bounds = (ys > -1.0) & (ys < jnp.float32(H))
    ys_in = jnp.where(in_bounds, ys, jnp.float32(H))
    lo_f = jnp.floor(jnp.min(ys_in, axis=-1))
    ys_hi = jnp.where(in_bounds, ys, -1.0)
    hi = jnp.clip(jnp.floor(jnp.max(ys_hi, axis=-1)) + 1.0, 0, H - 1)
    return lo_f, hi  # (P, H, x_tiles) each


def max_row_span(plane_matrices, H: int, W: int, band_h: int = BAND_H,
                 x_tiles: int = 1):
    """Max rows of band coverage any (plane, row[, tile]) needs. The Pallas
    kernel with band ``band_h`` (and the same x_tiles) is exact iff this is
    <= band_h; only in-bounds samples count (mirrors the kernel's masked
    band minimum)."""
    lo_f, hi = _row_extremes(plane_matrices, H, W, x_tiles)
    lo = jnp.clip(lo_f, 0, H - band_h)
    return jnp.max(hi - lo) + 1.0


def max_row_spans(plane_matrices, H: int, W: int, band_hs, x_tiles: int = 1):
    """Spans for several candidate band sizes from ONE coordinate
    evaluation (the field eval dominates the check's cost)."""
    lo_f, hi = _row_extremes(plane_matrices, H, W, x_tiles)
    return [
        jnp.max(hi - jnp.clip(lo_f, 0, H - b)) + 1.0 for b in band_hs
    ]
