"""Differentiable Pallas plane-sweep: custom VJP with a hand-written
backward kernel.

The forward is `pallas_plane_sweep` (cost_volume_kernel.py) — the gather-free
banded hat-matmul formulation of the reference's 64-plane grid_sample loop
(dvmvs/utils.py:65-84). This module adds the missing piece for TRAINING: the
backward pass as a second Pallas kernel, so the hot training op runs the same
MXU band matmuls as inference instead of the XLA einsum ladder (whose column
handling lowers ~3.8x worse, docs/PERF.md).

Math. Forward, per (plane p, output row y), single view:

    warped[c, x] = sum_k haty[k, x] * sum_j hatx[j, x] * band[k, c, j]
    cost[p, y, x] = (1/C) * sum_c ref[c, x] * warped[c, x]

with hat(t) = max(0, 1 - |t|), band = meas rows [lo, lo+band_h). With
upstream cotangent g[p, y, x]:

    d ref[c, y, x]        = (1/C) * sum_p g[p, y, x] * warped_p[c, x]
    d meas[lo+k, c, j]    = (1/C) * sum_{p, x} g[p, y, x] * haty[k, x]
                                     * hatx[j, x] * ref[c, y, x]

Both reuse the forward's band structure: the backward kernel recomputes
warped (one band @ hatx matmul) for d_ref, and computes d_meas as
M @ hatx^T where M[k*C+c, x] = haty[k, x] * ref[c, x] * g[x] / C — the
exact transpose of the forward collapse, again a single MXU matmul per
(plane, row). Total backward cost ~2x forward; no gather anywhere.

Accumulation layout: grid is (row_blocks, P) with p innermost, so the d_ref
output block stays VMEM-resident while all planes accumulate into it;
d_meas is a whole-array VMEM output accumulated with dynamic-start stores
(TPU grids execute sequentially, so read-modify-write is race-free).

Exactness contract is the forward's: every (plane, row)'s in-bounds y-span
must fit in band_h source rows — callers run the same `max_row_spans` check
and fall back to the differentiable gather path otherwise
(ops/cost_volume.py::plane_sweep_cost_volume_train).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvmvs_tpu.ops.pallas.cost_volume_kernel import (
    BAND_H,
    ROW_BLOCK,
    pallas_plane_sweep,
    pallas_plane_sweep_dyn,
)


def _kernel_bwd(params_ref, ref_ref, meas_ref, g_ref, dref_ref, dmeas_ref, *,
                H, W, C, inv_channels, band_h):
    rb = pl.program_id(0)
    p = pl.program_id(1)

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

    @pl.when(p == 0)
    def _():
        dref_ref[...] = jnp.zeros_like(dref_ref)

    @pl.when((p == 0) & (rb == 0))
    def _():
        dmeas_ref[...] = jnp.zeros_like(dmeas_ref)

    for r in range(ROW_BLOCK):
        y = (rb * ROW_BLOCK + r).astype(jnp.float32)
        den = m20 * xw + m21 * y + m22 + 1e-8
        xs = (m00 * xw + m01 * y + m02) / den * x_scale
        ys = (m10 * xw + m11 * y + m12) / den * y_scale

        in_bounds = (ys > -1.0) & (ys < jnp.float32(H))
        ys_in = jnp.where(in_bounds, ys, jnp.float32(H))
        lo = jnp.clip(jnp.floor(jnp.min(ys_in)), 0, H - band_h).astype(jnp.int32)

        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - jw))      # (W_in, W_out)
        ky = lo.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (band_h, 1), 0).astype(jnp.float32)
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(ys - ky))      # (Bh, W_out)

        g = g_ref[0, r:r + 1, :]                             # (1, W_out)

        # d_ref needs warped — recompute the forward band matmul.
        start = pl.multiple_of(lo * C, 8)
        band = meas_ref[pl.ds(start, band_h * C), :]
        xint = jax.lax.dot_general(
            band, hatx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Bh*C, W_out)
        warped = jnp.zeros((C, W), jnp.float32)
        for k in range(band_h):
            warped = warped + haty[k:k + 1, :] * xint[k * C:(k + 1) * C, :]
        dref_ref[r] += g * warped * inv_channels

        # d_meas: M[k*C+c, x] = haty[k,x] * ref[c,x] * g[x] / C; then the
        # transposed interpolation matmul M @ hatx^T scatters the cotangent
        # back over source columns; the dynamic-start store covers rows.
        t = ref_ref[r] * (g * inv_channels)                  # (C, W_out)
        rows = [haty[k:k + 1, :] * t for k in range(band_h)]
        M = jnp.concatenate(rows, axis=0)                    # (Bh*C, W_out)
        dband = jax.lax.dot_general(
            M, hatx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Bh*C, W_in)
        dmeas_ref[pl.ds(start, band_h * C), :] += dband


@functools.partial(jax.jit, static_argnames=("interpret", "band_h", "n_real"))
def _plane_sweep_bwd_padded(ref_hcw, meas_flat, plane_matrices, g,
                            interpret: bool, band_h: int, n_real: int):
    """Backward kernel on pre-padded, layout-swapped operands.

    ref_hcw (H, C, W); meas_flat (H*C, W); g (P, H, W).
    Returns (dref (H, C, W), dmeas (H*C, W)) with padded channels.
    """
    H, C, W = ref_hcw.shape
    P = plane_matrices.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // ROW_BLOCK, P),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda rb, p, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # meas: whole, resident
            pl.BlockSpec((1, ROW_BLOCK, W), lambda rb, p, *_: (p, rb, 0),
                         memory_space=pltpu.VMEM),   # cotangent rows
        ],
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda rb, p, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),   # d_ref: resident over p
            pl.BlockSpec(memory_space=pltpu.VMEM),   # d_meas: whole, resident
        ],
    )

    kernel = functools.partial(
        _kernel_bwd, H=H, W=W, C=C, inv_channels=1.0 / n_real, band_h=band_h)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, C, W), jnp.float32),
            jax.ShapeDtypeStruct((H * C, W), jnp.float32),
        ],
        interpret=interpret,
    )(plane_matrices.reshape(-1), ref_hcw, meas_flat, g)


def _kernel_dyn_bwd(params_ref, ref_ref, meas_ref, g_ref, dref_ref,
                    dmeas_ref, *, H, W, C, inv_channels):
    """Dynamic-trip backward: the same absolute 8-row-aligned chunk loop as
    the forward (_kernel_dyn), with per-chunk transposed-interpolation
    matmuls accumulated into d_meas by dynamic-start stores. Exact for ANY
    geometry — the last rung of the training ladder never leaves Pallas."""
    rb = pl.program_id(0)
    p = pl.program_id(1)

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

    @pl.when(p == 0)
    def _():
        dref_ref[...] = jnp.zeros_like(dref_ref)

    @pl.when((p == 0) & (rb == 0))
    def _():
        dmeas_ref[...] = jnp.zeros_like(dmeas_ref)

    for r in range(ROW_BLOCK):
        y = (rb * ROW_BLOCK + r).astype(jnp.float32)
        den = m20 * xw + m21 * y + m22 + 1e-8
        xs = (m00 * xw + m01 * y + m02) / den * x_scale
        ys = (m10 * xw + m11 * y + m12) / den * y_scale

        in_bounds = (ys > -1.0) & (ys < jnp.float32(H))
        ys_lo = jnp.where(in_bounds, ys, jnp.float32(H))
        lo = jnp.clip(jnp.floor(jnp.min(ys_lo)), 0, H - 1).astype(jnp.int32)
        ys_hi = jnp.where(in_bounds, ys, -1.0)
        hi = jnp.clip(jnp.floor(jnp.max(ys_hi)) + 1.0, -1.0,
                      H - 1.0).astype(jnp.int32)
        c0 = lo // 8
        c1 = hi // 8

        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - jw))      # (W_in, W_out)
        g = g_ref[0, r:r + 1, :]                             # (1, W_out)
        t = ref_ref[r] * (g * inv_channels)                  # (C, W_out)

        def chunk_body(c, acc):
            start = pl.multiple_of(c * (8 * C), 8)
            band = meas_ref[pl.ds(start, 8 * C), :]
            xint = jax.lax.dot_general(
                band, hatx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (8C, W_out)
            ky = (8 * c).astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0).astype(jnp.float32)
            haty = jnp.maximum(0.0, 1.0 - jnp.abs(ys - ky))  # (8, W_out)
            # d_meas chunk: M[k*C+c', x] = haty[k, x] * t[c', x]; the
            # transposed interpolation M @ hatx^T scatters over columns,
            # the dynamic-start read-modify-write covers the chunk rows
            # (the TPU grid is sequential, so the RMW is race-free).
            rows = [haty[k:k + 1, :] * t for k in range(8)]
            M = jnp.concatenate(rows, axis=0)                # (8C, W_out)
            dband = jax.lax.dot_general(
                M, hatx, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (8C, W_in)
            dmeas_ref[pl.ds(start, 8 * C), :] += dband
            # d_ref needs warped — accumulate the forward collapse
            for k in range(8):
                acc = acc + haty[k:k + 1, :] * xint[k * C:(k + 1) * C, :]
            return acc

        warped = jax.lax.fori_loop(
            jnp.maximum(c0, 0), c1 + 1, chunk_body,
            jnp.zeros((C, W), jnp.float32))
        dref_ref[r] += g * warped * inv_channels


@functools.partial(jax.jit, static_argnames=("interpret", "n_real"))
def _plane_sweep_dyn_bwd_padded(ref_hcw, meas_flat, plane_matrices, g,
                                interpret: bool, n_real: int):
    """Dynamic-trip backward kernel on pre-padded, layout-swapped operands
    (same contract as _plane_sweep_bwd_padded, no band_h precondition)."""
    H, C, W = ref_hcw.shape
    P = plane_matrices.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // ROW_BLOCK, P),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda rb, p, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # meas: whole, resident
            pl.BlockSpec((1, ROW_BLOCK, W), lambda rb, p, *_: (p, rb, 0),
                         memory_space=pltpu.VMEM),   # cotangent rows
        ],
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, C, W), lambda rb, p, *_: (rb, 0, 0),
                         memory_space=pltpu.VMEM),   # d_ref: resident over p
            pl.BlockSpec(memory_space=pltpu.VMEM),   # d_meas: whole, resident
        ],
    )

    kernel = functools.partial(
        _kernel_dyn_bwd, H=H, W=W, C=C, inv_channels=1.0 / n_real)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, C, W), jnp.float32),
            jax.ShapeDtypeStruct((H * C, W), jnp.float32),
        ],
        interpret=interpret,
    )(plane_matrices.reshape(-1), ref_hcw, meas_flat, g)


def _pad_channels(feat):
    C = feat.shape[-1]
    if C % 8 == 0:
        return feat, C
    pad = 8 - C % 8
    zeros = jnp.zeros(feat.shape[:-1] + (pad,), feat.dtype)
    return jnp.concatenate([feat, zeros], axis=-1), C


@functools.lru_cache(maxsize=None)
def make_diff_plane_sweep(band_h: int = BAND_H, interpret: bool = False):
    """Differentiable single-view plane sweep (custom VJP, both passes Pallas).

    Returned fn: (ref_feat (H, W, C), meas_feat (H, W, C),
    plane_matrices (P, 3, 3)) -> (P, H, W) dot-product cost. Gradients flow
    to both feature maps; plane matrices get zero cotangent (poses/K are
    data, the reference never backprops camera geometry either).
    """

    @jax.custom_vjp
    def f(ref_feat, meas_feat, plane_matrices):
        return pallas_plane_sweep(ref_feat, meas_feat, plane_matrices,
                                  interpret=interpret, band_h=band_h)

    def f_fwd(ref_feat, meas_feat, plane_matrices):
        return f(ref_feat, meas_feat, plane_matrices), (
            ref_feat, meas_feat, plane_matrices)

    def f_bwd(res, g):
        ref_feat, meas_feat, Ms = res
        ref_p, n_real = _pad_channels(ref_feat)
        meas_p, _ = _pad_channels(meas_feat)
        H, W, C = ref_p.shape
        ref_hcw = jnp.swapaxes(ref_p, 1, 2)
        meas_flat = jnp.swapaxes(meas_p, 1, 2).reshape(H * C, W)
        dref_hcw, dmeas_flat = _plane_sweep_bwd_padded(
            ref_hcw, meas_flat, Ms, g, interpret, band_h, n_real)
        dref = jnp.swapaxes(dref_hcw, 1, 2)[..., :n_real]
        dmeas = jnp.swapaxes(
            dmeas_flat.reshape(H, C, W), 1, 2)[..., :n_real]
        return dref, dmeas, jnp.zeros_like(Ms)

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=None)
def make_diff_plane_sweep_dyn(interpret: bool = False):
    """Differentiable single-view plane sweep with the DYNAMIC-TRIP kernels
    (forward: pallas_plane_sweep_dyn; backward: _kernel_dyn_bwd). Exact for
    any geometry — no band precondition — so the training ladder's last
    rung stays on Pallas instead of falling back to XLA gather (which OOMed
    a 16 GB chip without remat and measured ~2x slower, docs/PERF.md).
    Same contract as make_diff_plane_sweep."""

    @jax.custom_vjp
    def f(ref_feat, meas_feat, plane_matrices):
        return pallas_plane_sweep_dyn(ref_feat, meas_feat, plane_matrices,
                                      interpret=interpret)

    def f_fwd(ref_feat, meas_feat, plane_matrices):
        return f(ref_feat, meas_feat, plane_matrices), (
            ref_feat, meas_feat, plane_matrices)

    def f_bwd(res, g):
        ref_feat, meas_feat, Ms = res
        ref_p, n_real = _pad_channels(ref_feat)
        meas_p, _ = _pad_channels(meas_feat)
        H, W, C = ref_p.shape
        ref_hcw = jnp.swapaxes(ref_p, 1, 2)
        meas_flat = jnp.swapaxes(meas_p, 1, 2).reshape(H * C, W)
        dref_hcw, dmeas_flat = _plane_sweep_dyn_bwd_padded(
            ref_hcw, meas_flat, Ms, g, interpret, n_real)
        dref = jnp.swapaxes(dref_hcw, 1, 2)[..., :n_real]
        dmeas = jnp.swapaxes(
            dmeas_flat.reshape(H, C, W), 1, 2)[..., :n_real]
        return dref, dmeas, jnp.zeros_like(Ms)

    f.defvjp(f_fwd, f_bwd)
    return f
