"""Loss terms for per-subject avatar optimization.

Each function is a pure piece of OptimNetwork.forward / computeTmpPcLoss
(model/network.py:451-697), with reference line citations.  All take padded
tensors + validity masks; means are computed over valid entries only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import gm_robust, log_singular_values_sq_sum


def masked_mean(x, valid, axis=None, eps=1e-8):
    w = valid.astype(x.dtype)
    return (x * w).sum(axis) / jnp.clip(w.sum(axis), eps, None)


def iou_mask_loss(pred_masks, gt_masks):
    """1 - IoU per frame, averaged.  Parity: network.py:648-650."""
    N = pred_masks.shape[0]
    p = pred_masks.reshape(N, -1)
    g = gt_masks.reshape(N, -1)
    inter = (p * g).sum(1)
    union = jnp.abs(p + g - p * g).sum(1)
    return (1.0 - inter / jnp.clip(union, 1e-8, None)).mean()


def max_pool_mask(mask, radius_px: int):
    """(B,H,W) max-pool with kernel 2r+1, stride 1, same padding.

    Parity: the gt-mask dilation at network.py:499-501 (the soft point splat
    widens the silhouette by the splat radius, so the gt is dilated to match).
    """
    if radius_px <= 0:
        return mask
    k = 2 * radius_px + 1
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (radius_px, radius_px), (radius_px, radius_px)])


def eikonal_loss(grads, valid):
    """((|grad| - 1)^2) mean. Parity: network.py:543-549."""
    norms = jnp.linalg.norm(grads, axis=-1)
    return masked_mean((norms - 1.0) ** 2, valid)


def offset_norm_loss(offsets, valid):
    """Mean L2 norm of the MLP offsets. Parity: network.py:552-561."""
    return masked_mean(jnp.linalg.norm(offsets, axis=-1), valid)


def def_regu_loss(jacobians, valid, c: float):
    """GM-robustified sum of squared log singular values of the translator
    Jacobian.  Parity: network.py:565-582, with eigvalsh replacing the
    reference's CPU SVD round-trip (see utils/math.py).
    """
    s2 = log_singular_values_sq_sum(jacobians)
    return masked_mean(gm_robust(s2, c, square=True), valid)


def dct_prior_loss(dctnull, posed_joints_windows):
    """Temporal smoothness: |DCTNull @ J(t)| averaged.

    dctnull (K', Nw); posed_joints_windows (B, Nw, 24, 3).
    Parity: network.py:585-593.
    """
    B, Nw = posed_joints_windows.shape[:2]
    traj = posed_joints_windows.reshape(B, Nw, 72)
    out = jnp.einsum("kn,bnj->bkj", dctnull, traj)
    return jnp.abs(out).mean()


def color_l1_loss(pred, gt, batch_inds, valid, num_frames: int):
    """Per-ray L1 summed over channels, scatter-mean per frame, then mean.

    Parity: network.py:615-619.
    """
    per_ray = jnp.abs(gt - pred).sum(-1) * valid.astype(pred.dtype)
    sums = jax.ops.segment_sum(per_ray, batch_inds, num_segments=num_frames)
    cnts = jax.ops.segment_sum(valid.astype(pred.dtype), batch_inds,
                               num_segments=num_frames)
    per_frame = sums / jnp.clip(cnts, 1e-8, None)
    frame_has = cnts > 0
    return masked_mean(per_frame, frame_has)


def normal_loss(gt_normals_pulled, sdf_normals, weights, batch_inds, valid,
                num_frames: int):
    """||J^T n_gt - n_sdf||_2 weighted, scatter-mean per frame.

    Parity: network.py:621-639.
    """
    per_ray = jnp.linalg.norm(gt_normals_pulled - sdf_normals, axis=-1) * weights
    per_ray = per_ray * valid.astype(per_ray.dtype)
    sums = jax.ops.segment_sum(per_ray, batch_inds, num_segments=num_frames)
    cnts = jax.ops.segment_sum(valid.astype(per_ray.dtype), batch_inds,
                               num_segments=num_frames)
    per_frame = sums / jnp.clip(cnts, 1e-8, None)
    return masked_mean(per_frame, cnts > 0)


def def_consistency_loss(def_verts, lbs_only_verts, vert_valid, c: float):
    """GM(||D(v) - LBS(v)||^2) mean over template verts (squared-distance
    form).  Parity: network.py:674-683.
    def_verts, lbs_only_verts: (B, V, 3); vert_valid (V,).
    """
    off2 = ((def_verts - lbs_only_verts) ** 2).sum(-1)  # (B,V)
    if c > 0:
        per = gm_robust(off2, c, square=True)
    else:
        per = jnp.sqrt(jnp.clip(off2, 1e-12, None))
    return masked_mean(per, vert_valid[None, :])


def sdf_anchor_loss(sdf_at_verts, vert_valid, shrink_radius: float):
    """|sdf(TmpVs) + shrink| mean — couples the explicit template verts (moved
    by the inner SGD) back to the implicit SDF.  Parity: network.py:690-694.
    """
    return masked_mean(jnp.abs(sdf_at_verts + shrink_radius), vert_valid)
