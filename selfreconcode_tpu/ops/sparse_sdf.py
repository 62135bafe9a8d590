"""Coarse-to-fine sparse SDF grid evaluation (octree sweep).

Parity target: MCAcc/seg3d_lossless.py (Seg3dLossless) — evaluate the SDF on
a coarse grid, repeatedly 2x-upsample, detect sign-boundary voxels, and
re-query only those, so the MLP eval count scales with surface area instead
of volume.  World mapping matches the reference exactly
(seg3d_lossless.py:91-103, align_corners=False):
    world(idx) = b_min + (idx + 0.5) * spacing,  spacing = (b_max-b_min)/R
with R the finest resolution; every level's indices live on the finest grid
(stride = (R-1)/(r_l-1), a power of two since r_l = 2^k+1).

TPU-first: every level has a *static* re-query budget (cap); boundary voxels
are compacted to the cap with a prefix-sum scatter, queried in one padded
batch, and scattered back.  No dynamic shapes, no host syncs; the returned
volume feeds marching_cubes directly.  (The reference's per-level
`nonzero()` + conflict-resolution loop is replaced by a slightly wider
boundary dilation, which over-queries a hair but keeps the whole sweep one
XLA program — the reference itself ships a no-conflict "faster" mode,
seg3d_lossless.py:116-230.)
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_world_coords(res_full: Tuple[int, int, int], b_min, b_max):
    """(spacing (3,), origin (3,)) for the finest grid."""
    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    r = jnp.asarray(res_full, jnp.float32)
    spacing = (b_max - b_min) / r
    origin = b_min + spacing / 2.0
    return spacing, origin


def _upsample2(vol: jnp.ndarray) -> jnp.ndarray:
    """(n1,n2,n3) -> (2n1-1, 2n2-1, 2n3-1), exact at even indices, linear
    between (align_corners=True trilinear on 2^k+1 grids)."""
    for axis in range(3):
        a = jnp.moveaxis(vol, axis, 0)
        mid = (a[:-1] + a[1:]) / 2.0
        n = a.shape[0]
        out = jnp.zeros((2 * n - 1,) + a.shape[1:], vol.dtype)
        out = out.at[0::2].set(a)
        out = out.at[1::2].set(mid)
        vol = jnp.moveaxis(out, 0, axis)
    return vol


def _boundary_mask(vol: jnp.ndarray, balance: float, dilate: int) -> jnp.ndarray:
    """True where the 3^3 neighborhood straddles `balance`, dilated."""
    big = jnp.asarray(1e10, vol.dtype)

    def pool(v, op, pad_val):
        for axis in range(3):
            a = jnp.moveaxis(v, axis, 0)
            p = jnp.pad(a, ((1, 1),) + ((0, 0),) * (a.ndim - 1),
                        constant_values=pad_val)
            v = jnp.moveaxis(op(op(p[:-2], p[1:-1]), p[2:]), 0, axis)
        return v

    mx = pool(vol, jnp.maximum, -big)
    mn = pool(vol, jnp.minimum, big)
    mask = (mx > balance) & (mn <= balance)
    for _ in range(dilate):
        mask = pool(mask, jnp.logical_or, False)
    return mask


def sparse_sdf_grid(query_fn: Callable[[jnp.ndarray], jnp.ndarray],
                    resolutions: Sequence[Tuple[int, int, int]],
                    b_min, b_max, balance: float,
                    caps: Sequence[int], dilate: int = 1) -> jnp.ndarray:
    """Evaluate query_fn on the finest grid, sparsely.

    query_fn: (N,3) world points -> (N,) values (will be called with padded
      fixed-size batches; must be jittable).
    resolutions: per level (W,H,D), each dim 2x-1 of the previous, odd.
    caps[l]: static re-query budget for level l (l >= 1).
    Returns volume (W,H,D) float32 at the finest resolution.
    """
    res_full = tuple(int(v) for v in resolutions[-1])
    spacing, origin = grid_world_coords(res_full, b_min, b_max)

    # level 0: dense
    r0 = resolutions[0]
    stride0 = (res_full[0] - 1) // (r0[0] - 1)
    idx = jnp.stack(jnp.meshgrid(
        jnp.arange(r0[0]) * stride0,
        jnp.arange(r0[1]) * ((res_full[1] - 1) // (r0[1] - 1)),
        jnp.arange(r0[2]) * ((res_full[2] - 1) // (r0[2] - 1)),
        indexing="ij"), axis=-1).astype(jnp.float32)
    pts = origin + idx * spacing
    vol = query_fn(pts.reshape(-1, 3)).reshape(r0)

    for lvl in range(1, len(resolutions)):
        r = tuple(int(v) for v in resolutions[lvl])
        cap = int(caps[min(lvl - 1, len(caps) - 1)])
        vol = _upsample2(vol)
        assert vol.shape == r, (vol.shape, r)
        stride = (res_full[0] - 1) // (r[0] - 1)
        mask = _boundary_mask(vol, balance, dilate)
        flat = mask.reshape(-1)
        pos = jnp.cumsum(flat.astype(jnp.int32)) - flat.astype(jnp.int32)
        lin = jnp.arange(flat.shape[0], dtype=jnp.int32)
        sel = jnp.full((cap,), -1, jnp.int32)
        sel = sel.at[jnp.where(flat, pos, cap)].set(lin, mode="drop")
        valid = sel >= 0
        sel_safe = jnp.maximum(sel, 0)
        kz = sel_safe % r[2]
        ky = (sel_safe // r[2]) % r[1]
        kx = sel_safe // (r[2] * r[1])
        q_idx = jnp.stack([kx, ky, kz], axis=-1).astype(jnp.float32) * stride
        q_pts = origin + q_idx * spacing
        q_vals = query_fn(q_pts)
        new_flat = vol.reshape(-1)
        new_flat = new_flat.at[jnp.where(valid, sel_safe, flat.shape[0])].set(
            jnp.where(valid, q_vals, 0.0), mode="drop")
        vol = new_flat.reshape(r)

    return vol


def interp2x_boundary3d(vol: jnp.ndarray, balance: float, dilate: int = 1):
    """Fused 2x trilinear upsample + sign-boundary flags.

    Parity target: MCAcc/cuda/interp2x_boundary3d*.cu — the reference's
    optional CUDA fast path for Seg3dLossless (use_cuda_impl=True; every
    shipped call site disables it, SURVEY §2.2).  Returns
    (up (2n-1,...), is_boundary mask).  One fused jnp op here — XLA fuses the
    upsample and the min/max sign test into a single kernel, which is exactly
    what the hand-written CUDA achieved.
    """
    up = _upsample2(vol)
    return up, _boundary_mask(up, balance, dilate)


def default_caps(resolutions) -> list:
    """Heuristic static budgets: ~surface-area scaling per level, padded 4x."""
    caps = []
    for r in resolutions[1:]:
        n = int(np.prod(r))
        # surface voxels ~ n^(2/3); budget 8x that, clamped
        caps.append(int(min(n, max(16384, 8 * round(n ** (2.0 / 3.0))))))
    return caps
