"""Pallas TPU kernels for the binned rasterizers.

The gather-only rasterizers (ops/rasterize.py) bin primitives into image
cells and evaluate per-pixel candidate lists.  In pure XLA the
(C, cap, P) candidate-x-pixel intermediates stream through HBM; these
kernels keep that entire computation in VMEM — per grid step they read one
block of pre-gathered candidate attributes, evaluate all cap x P terms
on the VPU, reduce, and write only the per-pixel results.

Layouts (chosen for TPU tiling: last dim = lanes = candidate axis, padded
to 128):

* mesh fragments:  tri   (C, 16, cap)  f32 rows =
      [p0x p0y p1x p1y p2x p2y z0 z1 z2 face_id valid pad...]
  -> z (C, P), face (C, P) (f32-encoded id, -1 = miss), bary (C, P, 3)
* point splat:     pts   (C, 2, cap)   f32 rows = [col row]; invalid
  entries carry col = BIG (checked in-kernel)
  -> acc (C, P) accumulated log(1 - w) terms
  backward: cot (C, P) -> per-candidate (gcol, grow) (C, 2, cap)

P = cs*cs pixels per cell (cell-major pixel order, reshaped to the image
by the caller).  Cells are processed CB per grid step; C must be padded to
a CB multiple by the caller (extra cells produce garbage rows that the
caller slices off).

On CPU (tests) the kernels run in the Pallas interpreter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # SRTPU_PALLAS_INTERPRET=1 forces interpreter mode even when the default
    # backend is a TPU — needed when a program is lowered for CPU devices
    # (e.g. the multi-chip dryrun on a virtual CPU mesh) while a real chip is
    # also present: `interpret` is static, the backend check alone is wrong.
    import os
    if os.environ.get("SRTPU_PALLAS_INTERPRET", "") == "1":
        return True
    return jax.default_backend() == "cpu"


BIG = 3.0e38  # sentinel depth for misses (finite: inf breaks min/select)


# ---------------------------------------------------------------------------
# Mesh fragments
# ---------------------------------------------------------------------------

def _mesh_kernel(tri_ref, z_ref, face_ref, b0_ref, b1_ref, b2_ref,
                 *, cb: int, cs: int, ncx: int, cap: int):
    P = cs * cs
    i = pl.program_id(0)
    # pixel offsets within a cell, shared by every cell in the block
    pix = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 1)
    lx = (pix % cs).astype(jnp.float32)            # (cap, P)
    ly = (pix // cs).astype(jnp.float32)

    for j in range(cb):
        blk = tri_ref[j]                           # (16, cap)
        c = i * cb + j
        cx0 = ((c % ncx) * cs).astype(jnp.float32)
        cy0 = ((c // ncx) * cs).astype(jnp.float32)
        X = cx0 + lx                               # (cap, P) pixel x
        Y = cy0 + ly
        ax, ay = blk[0][:, None], blk[1][:, None]  # (cap, 1)
        bx, by = blk[2][:, None], blk[3][:, None]
        cx, cy = blk[4][:, None], blk[5][:, None]
        z0, z1, z2 = blk[6][:, None], blk[7][:, None], blk[8][:, None]
        fid = blk[9]                               # (cap,)
        valid = blk[10][:, None] > 0.5

        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        w0 = (cx - bx) * (Y - by) - (cy - by) * (X - bx)
        w1 = (ax - cx) * (Y - cy) - (ay - cy) * (X - cx)
        w2 = (bx - ax) * (Y - ay) - (by - ay) * (X - ax)
        ok_area = jnp.abs(area) > 1e-12
        denom = jnp.where(ok_area, area, 1.0)
        b0 = w0 / denom
        b1 = w1 / denom
        b2 = w2 / denom
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & ok_area & valid
        inv_z = b0 / z0 + b1 / z1 + b2 / z2
        zpix = 1.0 / jnp.maximum(inv_z, 1e-12)
        zm = jnp.where(inside, zpix, BIG)          # (cap, P)

        zmin = jnp.min(zm, axis=0)                 # (P,)
        slot = jnp.argmin(zm, axis=0)              # (P,)
        rows = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 0)
        win = rows == slot[None, :]                # one-hot winner select
        hit = zmin < BIG

        def sel(v):                                # (cap,P) -> (P,)
            return jnp.sum(jnp.where(win, v, 0.0), axis=0)

        fw = sel(jnp.broadcast_to(fid[:, None], (cap, P)))
        # perspective-correct barycentrics of the winner
        t0 = sel(b0 / z0)
        t1 = sel(b1 / z1)
        t2 = sel(b2 / z2)
        ts = jnp.maximum(t0 + t1 + t2, 1e-12)
        z_ref[j] = jnp.where(hit, zmin, BIG)
        face_ref[j] = jnp.where(hit, fw, -1.0)
        b0_ref[j] = jnp.where(hit, t0 / ts, 0.0)
        b1_ref[j] = jnp.where(hit, t1 / ts, 0.0)
        b2_ref[j] = jnp.where(hit, t2 / ts, 0.0)


def mesh_fragments_cells(tri: jnp.ndarray, cs: int, ncx: int,
                         cb: int = 16):
    """tri (C, 16, cap) -> (z, face, b0, b1, b2) each (C, cs*cs).

    C must be a multiple of cb; cap a multiple of 128.
    """
    C, A, cap = tri.shape
    assert A == 16 and C % cb == 0 and cap % 128 == 0, (tri.shape, cb)
    P = cs * cs
    kern = functools.partial(_mesh_kernel, cb=cb, cs=cs, ncx=ncx, cap=cap)
    outs = [jax.ShapeDtypeStruct((C, P), jnp.float32) for _ in range(5)]
    return pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[pl.BlockSpec((cb, 16, cap), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((cb, P), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=outs,
        interpret=_interpret(),
    )(tri)


# ---------------------------------------------------------------------------
# Point splat: forward accumulation + per-candidate backward
# ---------------------------------------------------------------------------

def _splat_fwd_kernel(pts_ref, acc_ref, *, cb: int, cs: int, ncx: int,
                      cap: int, r2_inv: float):
    P = cs * cs
    i = pl.program_id(0)
    pix = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 1)
    lx = (pix % cs).astype(jnp.float32)
    ly = (pix // cs).astype(jnp.float32)
    for j in range(cb):
        blk = pts_ref[j]                           # (2, cap)
        c = i * cb + j
        cx0 = ((c % ncx) * cs).astype(jnp.float32)
        cy0 = ((c // ncx) * cs).astype(jnp.float32)
        col = blk[0][:, None]
        row = blk[1][:, None]
        valid = col < BIG / 2                      # sentinel -> invalid
        dc = col - (cx0 + lx)
        dr = row - (cy0 + ly)
        w = 1.0 - (dc * dc + dr * dr) * r2_inv
        w = jnp.clip(w, 0.0, 1.0 - 1e-5)
        lt = jnp.where(valid, jnp.log1p(-w), 0.0)  # (cap, P)
        acc_ref[j] = jnp.sum(lt, axis=0)


# Per-grid-step VMEM scales with cb * cap * cs^2 (the unrolled cell loop
# keeps several (cap, P) intermediates live); the trainer GROWS cap from
# occupancy telemetry, so large caps are split into <=_CAP_SLICE slices
# OUTSIDE the kernel.  Valid because every candidate contributes an
# independent additive log term (fwd) / independent gradient rows (bwd).
# Measured: cap=1152 at cb=16 needed 19.23M scoped VMEM (> the 16M limit);
# 512 puts a slice at ~8.5M.
_CAP_SLICE = 512


def splat_fwd_cells(pts: jnp.ndarray, cs: int, ncx: int, r_pix: float,
                    cb: int = 16):
    """pts (C, 2, cap) -> acc (C, cs*cs) accumulated log(1-w)."""
    C, A, cap = pts.shape
    assert A == 2 and C % cb == 0 and cap % 64 == 0, (pts.shape, cb)
    if cap > _CAP_SLICE:
        acc = None
        for lo in range(0, cap, _CAP_SLICE):
            part = splat_fwd_cells(pts[:, :, lo:lo + _CAP_SLICE], cs, ncx,
                                   r_pix, cb)
            acc = part if acc is None else acc + part
        return acc
    P = cs * cs
    kern = functools.partial(_splat_fwd_kernel, cb=cb, cs=cs, ncx=ncx,
                             cap=cap, r2_inv=1.0 / float(r_pix * r_pix))
    return pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[pl.BlockSpec((cb, 2, cap), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cb, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, P), jnp.float32),
        interpret=_interpret(),
    )(pts)


def _splat_fwd_kernel_idx(ids_ref, pts_ref, acc_ref, *, cb: int, cs: int,
                          ncx: int, cap: int, r2_inv: float):
    """Like _splat_fwd_kernel, but each block row's CELL ID comes from the
    scalar-prefetched ids vector instead of the grid index — the caller
    passes only ACTIVE cells (cells with any candidate), so kernel work and
    DMA scale with silhouette coverage (~10% of cells at 1080p), not the
    image area."""
    P = cs * cs
    i = pl.program_id(0)
    pix = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 1)
    lx = (pix % cs).astype(jnp.float32)
    ly = (pix // cs).astype(jnp.float32)
    for j in range(cb):
        blk = pts_ref[j]                           # (2, cap)
        c = ids_ref[i * cb + j]
        cx0 = ((c % ncx) * cs).astype(jnp.float32)
        cy0 = ((c // ncx) * cs).astype(jnp.float32)
        col = blk[0][:, None]
        row = blk[1][:, None]
        valid = col < BIG / 2                      # sentinel -> invalid
        dc = col - (cx0 + lx)
        dr = row - (cy0 + ly)
        w = 1.0 - (dc * dc + dr * dr) * r2_inv
        w = jnp.clip(w, 0.0, 1.0 - 1e-5)
        lt = jnp.where(valid, jnp.log1p(-w), 0.0)  # (cap, P)
        acc_ref[j] = jnp.sum(lt, axis=0)


def splat_fwd_cells_idx(pts: jnp.ndarray, cell_ids: jnp.ndarray, cs: int,
                        ncx: int, r_pix: float, cb: int = 16):
    """pts (A, 2, cap) for the ACTIVE cells cell_ids (A,) int32 -> acc
    (A, cs*cs).  Padding rows carry an arbitrary id + sentinel pts."""
    A, n, cap = pts.shape
    assert n == 2 and A % cb == 0 and cap % 64 == 0, (pts.shape, cb)
    assert cell_ids.shape == (A,)
    if cap > _CAP_SLICE:
        acc = None
        for lo in range(0, cap, _CAP_SLICE):
            part = splat_fwd_cells_idx(pts[:, :, lo:lo + _CAP_SLICE],
                                       cell_ids, cs, ncx, r_pix, cb)
            acc = part if acc is None else acc + part
        return acc
    P = cs * cs
    kern = functools.partial(_splat_fwd_kernel_idx, cb=cb, cs=cs, ncx=ncx,
                             cap=cap, r2_inv=1.0 / float(r_pix * r_pix))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // cb,),
        in_specs=[pl.BlockSpec((cb, 2, cap), lambda i, ids: (i, 0, 0))],
        out_specs=pl.BlockSpec((cb, P), lambda i, ids: (i, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, P), jnp.float32),
        interpret=_interpret(),
    )(cell_ids.astype(jnp.int32), pts)


def _splat_bwd_kernel_idx(ids_ref, pts_ref, cot_ref, g_ref, *, cb: int,
                          cs: int, ncx: int, cap: int, r2_inv: float):
    P = cs * cs
    i = pl.program_id(0)
    pix = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 1)
    lx = (pix % cs).astype(jnp.float32)
    ly = (pix // cs).astype(jnp.float32)
    for j in range(cb):
        blk = pts_ref[j]                           # (2, cap)
        cot = cot_ref[j][None, :]                  # (1, P)
        c = ids_ref[i * cb + j]
        cx0 = ((c % ncx) * cs).astype(jnp.float32)
        cy0 = ((c // ncx) * cs).astype(jnp.float32)
        col = blk[0][:, None]
        row = blk[1][:, None]
        valid = col < BIG / 2
        dc = col - (cx0 + lx)
        dr = row - (cy0 + ly)
        w = 1.0 - (dc * dc + dr * dr) * r2_inv
        act = (w > 0.0) & (w < 1.0 - 1e-5) & valid
        coef = jnp.where(act, 2.0 * r2_inv / (1.0 - jnp.clip(w, 0.0, 1.0 - 1e-5)),
                         0.0) * cot                # (cap, P)
        g_ref[j, 0] = jnp.sum(coef * dc, axis=1)   # (cap,)
        g_ref[j, 1] = jnp.sum(coef * dr, axis=1)


def splat_bwd_cells_idx(pts: jnp.ndarray, cell_ids: jnp.ndarray,
                        cot: jnp.ndarray, cs: int, ncx: int, r_pix: float,
                        cb: int = 16):
    """pts (A,2,cap), cell_ids (A,), cot (A, cs*cs) -> grads (A, 2, cap)."""
    A, n, cap = pts.shape
    assert n == 2 and A % cb == 0 and cap % 64 == 0, (pts.shape, cb)
    if cap > _CAP_SLICE:
        parts = [splat_bwd_cells_idx(pts[:, :, lo:lo + _CAP_SLICE], cell_ids,
                                     cot, cs, ncx, r_pix, cb)
                 for lo in range(0, cap, _CAP_SLICE)]
        return jnp.concatenate(parts, axis=2)
    kern = functools.partial(_splat_bwd_kernel_idx, cb=cb, cs=cs, ncx=ncx,
                             cap=cap, r2_inv=1.0 / float(r_pix * r_pix))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // cb,),
        in_specs=[pl.BlockSpec((cb, 2, cap), lambda i, ids: (i, 0, 0)),
                  pl.BlockSpec((cb, cs * cs), lambda i, ids: (i, 0))],
        out_specs=pl.BlockSpec((cb, 2, cap), lambda i, ids: (i, 0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, 2, cap), jnp.float32),
        interpret=_interpret(),
    )(cell_ids.astype(jnp.int32), pts, cot)


def _splat_bwd_kernel(pts_ref, cot_ref, g_ref, *, cb: int, cs: int,
                      ncx: int, cap: int, r2_inv: float):
    P = cs * cs
    i = pl.program_id(0)
    pix = jax.lax.broadcasted_iota(jnp.int32, (cap, P), 1)
    lx = (pix % cs).astype(jnp.float32)
    ly = (pix // cs).astype(jnp.float32)
    for j in range(cb):
        blk = pts_ref[j]                           # (2, cap)
        cot = cot_ref[j][None, :]                  # (1, P)
        c = i * cb + j
        cx0 = ((c % ncx) * cs).astype(jnp.float32)
        cy0 = ((c // ncx) * cs).astype(jnp.float32)
        col = blk[0][:, None]
        row = blk[1][:, None]
        valid = col < BIG / 2                      # sentinel -> invalid
        dc = col - (cx0 + lx)
        dr = row - (cy0 + ly)
        w = 1.0 - (dc * dc + dr * dr) * r2_inv
        # d log1p(-w) / d col = (dw/dcol) * (-1/(1-w)); dw/dcol = -2 dc r2_inv
        # active only where 0 < w < 1-1e-5 (clip zeroes the gradient outside)
        act = (w > 0.0) & (w < 1.0 - 1e-5) & valid
        coef = jnp.where(act, 2.0 * r2_inv / (1.0 - jnp.clip(w, 0.0, 1.0 - 1e-5)),
                         0.0) * cot                # (cap, P)
        g_ref[j, 0] = jnp.sum(coef * dc, axis=1)   # (cap,)
        g_ref[j, 1] = jnp.sum(coef * dr, axis=1)


def splat_bwd_cells(pts: jnp.ndarray, cot: jnp.ndarray, cs: int, ncx: int,
                    r_pix: float, cb: int = 16):
    """pts (C,2,cap), cot (C, cs*cs) -> per-candidate grads (C, 2, cap)."""
    C, A, cap = pts.shape
    assert A == 2 and C % cb == 0 and cap % 64 == 0, (pts.shape, cb)
    if cap > _CAP_SLICE:
        parts = [splat_bwd_cells(pts[:, :, lo:lo + _CAP_SLICE], cot, cs, ncx,
                                 r_pix, cb)
                 for lo in range(0, cap, _CAP_SLICE)]
        return jnp.concatenate(parts, axis=2)
    kern = functools.partial(_splat_bwd_kernel, cb=cb, cs=cs, ncx=ncx,
                             cap=cap, r2_inv=1.0 / float(r_pix * r_pix))
    return pl.pallas_call(
        kern,
        grid=(C // cb,),
        in_specs=[pl.BlockSpec((cb, 2, cap), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cb, cs * cs), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cb, 2, cap), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 2, cap), jnp.float32),
        interpret=_interpret(),
    )(pts, cot)
