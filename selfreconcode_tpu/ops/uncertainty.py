"""PointRend-style uncertainty point selection on regular grids.

TPU-native equivalents of the reference's MCAcc helpers
(`MCAcc/utils.py:172-296` — `get_uncertain_point_coords_on_grid{2D,3D}`,
their `_faster` clip-min variants, and `calculate_uncertainty`
`MCAcc/utils.py:298-318`).  These are the PointRend-heritage utilities the
reference's octree evaluator can drive refinement with; the shipped
SelfRecon pipeline selects by sign-boundary instead (see
`ops/sparse_sdf.py`), but a complete framework exposes both.

TPU-first deviations from the reference (all documented per-function):
  * Everything is jittable with STATIC output shapes.  The reference's
    `_faster` variants return a data-dependent number of points
    (`nonzero` + truncating top-k); here every call returns exactly
    `num_points` rows plus a boolean validity mask — the XLA-friendly
    encoding of the same information (invalid rows are the lowest-scoring
    padding and must be masked by the consumer).
  * Coordinates come back as integer grid positions in x-fastest order,
    matching the reference's (x, y[, z]) column convention.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "calculate_uncertainty",
    "uncertain_points_grid2d",
    "uncertain_points_grid3d",
]


def calculate_uncertainty(logits: jnp.ndarray,
                          classes: Optional[jnp.ndarray] = None,
                          balance_value: float = 0.5) -> jnp.ndarray:
    """Uncertainty = −|logit − balance_value| (highest at the decision
    boundary).  `logits` is (R, C, ...); class-agnostic when C == 1,
    otherwise `classes` (R,) picks the foreground channel per row.
    Mirrors `MCAcc/utils.py:298-318`."""
    if logits.shape[1] == 1:
        gt = logits
    else:
        gt = jnp.take_along_axis(
            logits, classes.astype(jnp.int32).reshape(-1, 1, *([1] * (logits.ndim - 2))),
            axis=1)
    return -jnp.abs(gt - balance_value)


def _topk_points(flat: jnp.ndarray, num_points: int,
                 clip_min: Optional[float]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared core: (R, M) scores -> (R, P) indices + (R, P) valid mask.

    The reference's `_faster` path does `nonzero(u >= clip_min)` then a
    truncating top-k — a dynamic shape.  Masking sub-threshold scores to
    −inf before a full top-k selects the identical set; entries that fail
    the clip land at the tail with valid=False instead of being dropped.
    """
    if clip_min is not None:
        scores = jnp.where(flat >= clip_min, flat, -jnp.inf)
    else:
        scores = flat
    num_points = min(num_points, flat.shape[-1])
    top, idx = jax.lax.top_k(scores, num_points)
    return idx, jnp.isfinite(top)


@partial(jax.jit, static_argnames=("num_points",))
def uncertain_points_grid2d(uncertainty_map: jnp.ndarray, num_points: int,
                            clip_min: Optional[float] = None):
    """`num_points` most-uncertain grid positions of an (R, 1, H, W) map.

    Returns (point_indices (R, P) int32 into the flattened H*W grid,
    point_coords (R, P, 2) int32 as (x, y), valid (R, P) bool).
    `clip_min=None` matches `get_uncertain_point_coords_on_grid2D`
    (`MCAcc/utils.py:239-262`); a float matches the `_faster` variant
    (`:264-296`) with padding instead of truncation (see `_topk_points`).
    """
    R = uncertainty_map.shape[0]
    H, W = uncertainty_map.shape[-2:]
    idx, valid = _topk_points(uncertainty_map.reshape(R, H * W),
                              num_points, clip_min)
    coords = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.int32)
    return idx.astype(jnp.int32), coords, valid


@partial(jax.jit, static_argnames=("num_points",))
def uncertain_points_grid3d(uncertainty_map: jnp.ndarray, num_points: int,
                            clip_min: Optional[float] = None):
    """3-D analogue for an (R, 1, D, H, W) map.

    Returns (point_indices (R, P) int32 into the flattened D*H*W grid,
    point_coords (R, P, 3) int32 as (x, y, z), valid (R, P) bool).
    Matches `get_uncertain_point_coords_on_grid3D[_faster]`
    (`MCAcc/utils.py:172-238`).
    """
    R = uncertainty_map.shape[0]
    D, H, W = uncertainty_map.shape[-3:]
    idx, valid = _topk_points(uncertainty_map.reshape(R, D * H * W),
                              num_points, clip_min)
    coords = jnp.stack([idx % W, idx % (H * W) // W, idx // (H * W)],
                       axis=-1).astype(jnp.int32)
    return idx.astype(jnp.int32), coords, valid
