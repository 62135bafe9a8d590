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
volume feeds marching_cubes directly.

Conflict resolution (seg3d_lossless.py:348-422 — the reference's shipped
default, `faster=False` at network.py:874): a queried voxel whose true value
flips sign against its interpolated estimate means the boundary mask
under-covered the surface there; the reference re-queries the not-yet-
calculated 3^3 neighborhood of each conflict and repeats until no flips
remain.  Here that is a `lax.while_loop` over fixed-capacity query batches
(carrying the volume, a `queried` exactness mask, and the conflict flags),
bounded by `conflict_iters`; zero conflicts = zero extra query batches, so
the smooth-surface common case pays only the loop condition.
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


def _pool3(v, op, pad_val):
    """Separable 3^3 neighborhood reduction (same shape, edge-padded)."""
    for axis in range(3):
        a = jnp.moveaxis(v, axis, 0)
        p = jnp.pad(a, ((1, 1),) + ((0, 0),) * (a.ndim - 1),
                    constant_values=pad_val)
        v = jnp.moveaxis(op(op(p[:-2], p[1:-1]), p[2:]), 0, axis)
    return v


def _dilate3(mask: jnp.ndarray) -> jnp.ndarray:
    """Binary dilation by the 3^3 structuring element."""
    return _pool3(mask, jnp.logical_or, False)


def _boundary_mask(vol: jnp.ndarray, balance: float, dilate: int) -> jnp.ndarray:
    """True where the 3^3 neighborhood straddles `balance`, dilated."""
    big = jnp.asarray(1e10, vol.dtype)
    mx = _pool3(vol, jnp.maximum, -big)
    mn = _pool3(vol, jnp.minimum, big)
    mask = (mx > balance) & (mn <= balance)
    for _ in range(dilate):
        mask = _dilate3(mask)
    return mask


def _compact(flat: jnp.ndarray, cap: int):
    """Compact True positions of a flat bool mask into a (cap,) index buffer.

    Returns (sel (cap,) int32 linear indices [-1 padded], valid (cap,) bool,
    n_true () int32 — the TRUE count, for overflow telemetry)."""
    pos = jnp.cumsum(flat.astype(jnp.int32)) - flat.astype(jnp.int32)
    lin = jnp.arange(flat.shape[0], dtype=jnp.int32)
    sel = jnp.full((cap,), -1, jnp.int32)
    sel = sel.at[jnp.where(flat, pos, cap)].set(lin, mode="drop")
    return sel, sel >= 0, flat.sum().astype(jnp.int32)


def sparse_sdf_grid(query_fn: Callable[[jnp.ndarray], jnp.ndarray],
                    resolutions: Sequence[Tuple[int, int, int]],
                    b_min, b_max, balance: float,
                    caps: Sequence[int], dilate: int = 1,
                    conflict_iters: int = 4,
                    conflict_cap: int | None = None) -> jnp.ndarray:
    """Evaluate query_fn on the finest grid, sparsely.

    query_fn: (N,3) world points -> (N,) values (will be called with padded
      fixed-size batches; must be jittable).
    resolutions: per level (W,H,D), each dim 2x-1 of the previous, odd.
    caps[l]: static re-query budget for level l (l >= 1).
    conflict_iters: max conflict-resolution rounds per level (0 disables —
      the reference's `faster=True` mode); each round re-queries the 3^3
      neighborhoods of sign-flipped voxels (seg3d_lossless.py:348-422).
    conflict_cap: static budget per conflict round (default cap//4).
    Returns volume (W,H,D) float32 at the finest resolution.
    """
    res_full = tuple(int(v) for v in resolutions[-1])
    spacing, origin = grid_world_coords(res_full, b_min, b_max)

    # level 0: dense (everything exact)
    r0 = resolutions[0]
    stride0 = (res_full[0] - 1) // (r0[0] - 1)
    idx = jnp.stack(jnp.meshgrid(
        jnp.arange(r0[0]) * stride0,
        jnp.arange(r0[1]) * ((res_full[1] - 1) // (r0[1] - 1)),
        jnp.arange(r0[2]) * ((res_full[2] - 1) // (r0[2] - 1)),
        indexing="ij"), axis=-1).astype(jnp.float32)
    pts = origin + idx * spacing
    vol = query_fn(pts.reshape(-1, 3)).reshape(r0)
    queried = jnp.ones(r0, bool)  # voxels holding TRUE (not interp) values

    for lvl in range(1, len(resolutions)):
        r = tuple(int(v) for v in resolutions[lvl])
        cap = int(caps[min(lvl - 1, len(caps) - 1)])
        vol = _upsample2(vol)
        assert vol.shape == r, (vol.shape, r)
        # exactness carries over only at even indices (= the coarser grid)
        q_up = jnp.zeros(r, bool).at[0::2, 0::2, 0::2].set(queried)
        queried = q_up
        stride = (res_full[0] - 1) // (r[0] - 1)
        # already-exact voxels don't need re-query (parity:
        # seg3d_lossless.py:299-301 is_boundary[coords_accum] = False)
        mask = _boundary_mask(vol, balance, dilate) & ~queried
        n = int(np.prod(r))

        def query_at(sel, valid, vol_flat):
            """Padded query at compacted linear indices; returns
            (q_vals, flips) — flips = sign change vs the stored interp."""
            sel_safe = jnp.maximum(sel, 0)
            kz = sel_safe % r[2]
            ky = (sel_safe // r[2]) % r[1]
            kx = sel_safe // (r[2] * r[1])
            q_idx = jnp.stack([kx, ky, kz], axis=-1).astype(jnp.float32) * stride
            q_vals = query_fn(origin + q_idx * spacing)
            interp = vol_flat[sel_safe]
            flips = valid & ((interp - balance) * (q_vals - balance) < 0)
            return q_vals, flips

        def scatter_at(vol_flat, sel, valid, q_vals):
            sel_safe = jnp.maximum(sel, 0)
            return vol_flat.at[jnp.where(valid, sel_safe, n)].set(
                jnp.where(valid, q_vals, 0.0), mode="drop")

        vol_flat = vol.reshape(-1)
        q_flat = queried.reshape(-1)
        sel, valid, _ = _compact(mask.reshape(-1), cap)
        q_vals, flips = query_at(sel, valid, vol_flat)
        vol_flat = scatter_at(vol_flat, sel, valid, q_vals)
        sel_safe = jnp.maximum(sel, 0)
        q_flat = q_flat.at[jnp.where(valid, sel_safe, n)].set(
            True, mode="drop")
        # conflict flags as a grid mask (seed for the resolution loop)
        conf_flat = jnp.zeros((n,), bool).at[
            jnp.where(flips, sel_safe, n)].set(True, mode="drop")

        if conflict_iters > 0:
            ccap = int(conflict_cap or max(1024, cap // 4))

            def cond(carry):
                _, _, conf, it = carry
                return jnp.any(conf) & (it < conflict_iters)

            def body(carry):
                vol_flat, q_flat, conf, it = carry
                # not-yet-exact 3^3 neighborhoods of the conflicts
                cand = _dilate3(conf.reshape(r)).reshape(-1) & ~q_flat
                sel, valid, _ = _compact(cand, ccap)
                q_vals, flips = query_at(sel, valid, vol_flat)
                vol_flat = scatter_at(vol_flat, sel, valid, q_vals)
                sel_safe = jnp.maximum(sel, 0)
                q_flat = q_flat.at[jnp.where(valid, sel_safe, n)].set(
                    True, mode="drop")
                conf = jnp.zeros((n,), bool).at[
                    jnp.where(flips, sel_safe, n)].set(True, mode="drop")
                return vol_flat, q_flat, conf, it + 1

            vol_flat, q_flat, conf_flat, _ = jax.lax.while_loop(
                cond, body,
                (vol_flat, q_flat, conf_flat, jnp.asarray(0, jnp.int32)))

        vol = vol_flat.reshape(r)
        queried = q_flat.reshape(r)

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
