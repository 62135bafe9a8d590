"""SMPL-driven LBS skinning warp with a precomputed weight volume.

Parity targets (model/Deformer.py):
  LBSkinner.forward :167-233    — FK chain, weight-volume lookup, per-point
                                  blend + translation
  LBSkinner.init_pose_inverse :125-141 — A-pose inverse handling
  posedSkeleton :144-165        — FK joints only (DCT temporal prior input)
  compute_lbswField :246-284    — kNN inverse-distance diffusion of SMPL
                                  weights onto a grid + smoothing
  smooth_weights :235-244       — neighbor-mean relaxation, renormalized
  initialLBSkinner :286-295     — builder from gender/shape/A-pose

TPU-first design:
  * the 24-joint FK is unrolled at trace time (tiny matmuls, fused by XLA);
  * the weight lookup is the differentiable jnp trilinear sampler (infinite
    AD order — replaces the custom double-backward CUDA sampler);
  * the per-point blend contracts (N,24,B)x(B,24,16) as one MXU matmul
    instead of the reference's per-batch boolean-mask loop
    (model/Deformer.py:222-233);
  * the one-time weight-field build is chunked with lax.map so the pairwise
    distance matrix never exceeds a few hundred MB.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.trilinear import (pack_corners, flatten_packed,
                             trilinear_sample_packed2d)
from ..utils.math import batch_rodrigues, make_homo, rigid_inverse_homo
from .smpl import SMPLModel, global_rigid_transform, shaped_verts_and_joints


@dataclass(frozen=True)
class Skinner:
    """Immutable constants, registered as a pytree.

    IMPORTANT: always pass the Skinner (or a Deformer holding it) INTO jitted
    functions as an argument — never capture it in a jit closure.  Closed-over
    arrays are inlined as HLO constants; with the remote-compile tunnel that
    serializes the whole weight volume into every compile request (and at the
    corner-packed production size exceeds the request limit outright)."""
    ws: jnp.ndarray            # (D*H*W, 8*24) corner-packed FLAT weight table
    b_min: jnp.ndarray         # (3,)
    b_max: jnp.ndarray         # (3,)
    joints: jnp.ndarray        # (24, 3) rest skeleton
    init_pose_inv: jnp.ndarray  # (24, 4, 4) inverse of the A-pose transforms
    parents: tuple             # (24,) static kinematic tree
    ws_dims: tuple             # static (D, H, W) of the weight grid


jax.tree_util.register_pytree_node(
    Skinner,
    lambda s: ((s.ws, s.b_min, s.b_max, s.joints, s.init_pose_inv),
               (tuple(int(p) for p in s.parents), tuple(s.ws_dims))),
    lambda aux, leaves: Skinner(*leaves, parents=aux[0], ws_dims=aux[1]))


def fk_transforms(skinner: Skinner, poses: jnp.ndarray, trans: jnp.ndarray):
    """poses (B,24,3) axis-angle, trans (B,3) -> blendable A (B,24,4,4).

    A maps template(A-pose) space -> posed space (before +trans), i.e.
    results(pose) @ inverse(results(A-pose)).
    Parity: model/Deformer.py:167-205.
    """
    B = poses.shape[0]
    Rs = batch_rodrigues(poses.reshape(-1, 3)).reshape(B, 24, 3, 3)
    results = [make_homo(Rs[:, 0], jnp.broadcast_to(skinner.joints[0], (B, 3)))]
    for i in range(1, len(skinner.parents)):
        j_rel = jnp.broadcast_to(
            skinner.joints[i] - skinner.joints[skinner.parents[i]], (B, 3))
        a_here = make_homo(Rs[:, i], j_rel)
        results.append(jnp.einsum("bij,bjk->bik", results[skinner.parents[i]], a_here))
    results = jnp.stack(results, axis=1)  # (B,24,4,4)
    A = jnp.einsum("bjik,jkl->bjil", results, skinner.init_pose_inv)
    return A, results


def posed_skeleton(skinner: Skinner, poses: jnp.ndarray, trans: jnp.ndarray):
    """FK joint positions (B,24,3) (without +trans, matching the reference's
    posedSkeleton which ignores trans; model/Deformer.py:144-165)."""
    _, results = fk_transforms(skinner, poses, trans)
    return results[:, :, :3, 3]


def sample_skin_weights(skinner: Skinner, pts: jnp.ndarray) -> jnp.ndarray:
    """pts (N,3) world/template coords -> (N,24) LBS weights."""
    nps = 2.0 * (pts - skinner.b_min) / (skinner.b_max - skinner.b_min) - 1.0
    return trilinear_sample_packed2d(skinner.ws, skinner.ws_dims, nps)


def skinner_apply(skinner: Skinner, pts: jnp.ndarray, batch_inds: jnp.ndarray,
                  poses: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """pts (N,3) flat, batch_inds (N,) int frame index, poses (B,24,3),
    trans (B,3) -> deformed (N,3)."""
    B = poses.shape[0]
    A, _ = fk_transforms(skinner, poses, trans)          # (B,24,4,4)
    w = sample_skin_weights(skinner, pts)                 # (N,24)
    onehot = jax.nn.one_hot(batch_inds, B, dtype=pts.dtype)  # (N,B)
    # (N,24,B) x (B*24,16) as a single MXU-friendly matmul
    wb = (w[:, :, None] * onehot[:, None, :]).reshape(pts.shape[0], 24 * B)
    A16 = jnp.swapaxes(A, 0, 1).reshape(24 * B, 16)
    T = (wb @ A16).reshape(-1, 4, 4)
    out = jnp.einsum("nij,nj->ni", T[:, :3, :3], pts) + T[:, :3, 3]
    return out + trans[batch_inds]


def skinner_apply_shared(skinner: Skinner, pts: jnp.ndarray,
                         poses: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """pts (V,3) shared by ALL B frames -> (B,V,3).

    Equivalent to skinner_apply(tile(pts, B), repeat(arange(B), V), ...) but
    the weight-volume gather — the hottest memory op on TPU, row-size-bound —
    runs ONCE on V rows instead of B*V; the per-frame part is B MXU matmuls
    (V,24)x(24,16)."""
    A, _ = fk_transforms(skinner, poses, trans)          # (B,24,4,4)
    w = sample_skin_weights(skinner, pts)                 # (V,24)
    T = jnp.einsum("vj,bjkl->bvkl", w, A)                 # (B,V,4,4)
    out = jnp.einsum("bvij,vj->bvi", T[:, :, :3, :3], pts) + T[:, :, :3, 3]
    return out + trans[:, None, :]


# ---------------------------------------------------------------------------
# Weight-field construction (one-time, cached to disk by the caller)
# ---------------------------------------------------------------------------

def smooth_weights(weights: jnp.ndarray, times: int = 3) -> jnp.ndarray:
    """Interior-neighbor-mean relaxation with 0.7 mixing, renormalized.

    weights (D, H, W, C) channel-last. Parity: model/Deformer.py:235-244.
    """
    def body(w, _):
        mean = (w[2:, 1:-1, 1:-1] + w[:-2, 1:-1, 1:-1]
                + w[1:-1, 2:, 1:-1] + w[1:-1, :-2, 1:-1]
                + w[1:-1, 1:-1, 2:] + w[1:-1, 1:-1, :-2]) / 6.0
        interior = (w[1:-1, 1:-1, 1:-1] - mean) * 0.7 + mean
        w = w.at[1:-1, 1:-1, 1:-1].set(interior)
        w = w / w.sum(-1, keepdims=True)
        return w, None

    weights, _ = jax.lax.scan(body, weights, None, length=times)
    return weights


@partial(jax.jit, static_argnames=("resolution", "mean_neighbor",
                                   "smooth_times", "chunk"))
def compute_lbs_weight_field(b_min, b_max, resolution, smpl_verts, smpl_ws,
                             mean_neighbor: int = 30, smooth_times: int = 30,
                             chunk: int = 4096) -> jnp.ndarray:
    """Diffuse per-vertex SMPL weights onto a regular grid.

    resolution: (W, H, D); returns (D, H, W, 24) channel-last.
    Grid coords use align_corners=False voxel centers.
    Parity: model/Deformer.py:246-284.  jit-wrapped: the one-time build is a
    single XLA program (eager dispatch over a remote TPU is pathological).
    """
    W, H, D = resolution
    b_min = jnp.asarray(b_min, jnp.float32).reshape(1, 3)
    b_max = jnp.asarray(b_max, jnp.float32).reshape(1, 3)
    res = jnp.asarray([W, H, D], jnp.float32)
    zz, yy, xx = jnp.meshgrid(jnp.arange(D), jnp.arange(H), jnp.arange(W),
                              indexing="ij")
    coords = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(jnp.float32)
    coords = (coords / res + 0.5 / res) * (b_max - b_min) + b_min

    n = coords.shape[0]
    pad = (-n) % chunk
    coords_p = jnp.pad(coords, ((0, pad), (0, 0)))
    chunks = coords_p.reshape(-1, chunk, 3)

    def per_chunk(c):
        d = jnp.linalg.norm(c[:, None, :] - smpl_verts[None, :, :], axis=-1)
        neg_d, idx = jax.lax.top_k(-d, mean_neighbor)
        dists = jnp.clip(-neg_d, 1e-4, 1.0)
        w = 1.0 / dists
        w = w / w.sum(-1, keepdims=True)
        return jnp.einsum("nk,nkj->nj", w, smpl_ws[idx])

    fws = jax.lax.map(per_chunk, chunks).reshape(-1, smpl_ws.shape[-1])[:n]
    fws = fws.reshape(D, H, W, smpl_ws.shape[-1])
    return smooth_weights(fws, smooth_times)


def build_skinner(model: SMPLModel, shape: jnp.ndarray, init_pose: np.ndarray,
                  resolution=(129, 225, 65), b_min=None, b_max=None,
                  margin=(0.15, 0.15, 0.20), table_dtype=jnp.float16):
    """Construct the Skinner + A-pose template cloud.

    Returns (Skinner, tmp_body_verts (V,3), tmp_body_faces (F,3) np.int32).
    Parity: model/Deformer.py:286-295 (adaptive bbox = A-pose verts ± margin).
    The whole device-side build runs as two jitted programs (eager dispatch
    over a remote TPU is pathological — 7.7 ms/op measured).

    table_dtype: storage dtype of the corner-packed weight table.  float16
    (default) halves the gather row bytes (the hottest memory op is
    row-size-bound) at ~5e-4 relative weight error — sub-millimeter posed-
    vertex error, far below pixel scale.  Pass jnp.float32 for exact parity.
    """
    from .smpl import smpl_forward

    init_pose_j = jnp.asarray(init_pose).reshape(1, 24, 3)
    parents = model.parents

    @jax.jit
    def _fwd(shape_):
        joints = shaped_verts_and_joints(model, shape_)[1][0]
        verts = smpl_forward(model, shape_, init_pose_j)[0][0]
        # init-pose inverse: accumulate FK of the A-pose, invert each joint
        init_R = batch_rodrigues(init_pose_j.reshape(-1, 3)).reshape(24, 3, 3)
        Rs_acc = [init_R[0]]
        Ts_acc = [joints[0]]
        for i in range(1, 24):
            p = int(parents[i])
            j_rel = joints[i] - joints[p]
            Rs_acc.append(Rs_acc[p] @ init_R[i])
            Ts_acc.append(Rs_acc[p] @ j_rel + Ts_acc[p])
        inv = rigid_inverse_homo(jnp.stack(Rs_acc), jnp.stack(Ts_acc))
        return verts, joints, inv

    verts, joints, inv = _fwd(shape.reshape(1, -1))
    if b_min is None or b_max is None:
        m = np.asarray(margin, np.float32)
        v = np.asarray(verts)
        b_min = v.min(0) - m
        b_max = v.max(0) + m
    ws = compute_lbs_weight_field(
        jnp.asarray(b_min, jnp.float32), jnp.asarray(b_max, jnp.float32),
        resolution=tuple(int(r) for r in resolution), smpl_verts=verts,
        smpl_ws=model.weights)
    ws8 = jax.jit(pack_corners)(ws)
    ws_dims = tuple(int(v) for v in ws8.shape[:3])
    ws_flat = jax.jit(lambda v: flatten_packed(v).astype(table_dtype))(ws8)
    skinner = Skinner(
        ws=ws_flat,
        b_min=jnp.asarray(b_min, jnp.float32).reshape(3),
        b_max=jnp.asarray(b_max, jnp.float32).reshape(3),
        joints=joints,
        init_pose_inv=inv,
        parents=tuple(int(p) for p in model.parents),
        ws_dims=ws_dims,
    )
    return skinner, verts, model.faces


def SMPL_parents_of(model: SMPLModel) -> np.ndarray:
    return model.parents
