"""Rasterization on TPU: point-splat soft masks + mesh fragments.

This replaces the reference's pytorch3d dependency (the single largest
external build item, SURVEY §2.3):

* `splat_mask` — differentiable soft silhouette from a point cloud.
  Parity: PointsRasterizer(radius, points_per_pixel=50) + AlphaCompositor
  with unit features and weights w = 1 - d^2/r^2 (model/CameraMine.py:285-304,
  model/network.py:495-498).  With unit features, alpha-compositing K
  z-sorted splats equals 1 - prod_k (1 - w_k), which is *order-independent* —
  so instead of a z-sorted top-50 buffer we scatter-accumulate
  log(1 - w) over a fixed per-point pixel footprint and exponentiate.
  (All covering points contribute, not just the nearest 50 — a strict
  refinement of the reference, and exactly differentiable.)

* `rasterize_mesh` — non-differentiable fragments (pix_to_face, perspective-
  correct barycentrics, zbuf) with faces_per_pixel=1.
  Parity: pytorch3d MeshRasterizer as consumed by utils/FindSurfacePs.py:5-29
  (the contract is "nearest face + barys per pixel", not general rendering).
  Deterministic two-pass scatter z-buffer: pass 1 scatter-min depth,
  pass 2 scatter-min face-id among exact-depth winners, then barys are
  recomputed for the winner.  This is the TPU replacement for the CUDA
  atomic z-buffer race the reference inherits from pytorch3d.

Both rasterizers run per frame; the training step vmaps/loops over the small
frame batch (<= 3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..render.camera import Camera, transform_points_screen


class Fragments(NamedTuple):
    pix_to_face: jnp.ndarray  # (H, W) int32, -1 for empty
    bary: jnp.ndarray         # (H, W, 3) perspective-correct barycentrics
    zbuf: jnp.ndarray         # (H, W) depth (+inf empty)


def splat_mask(cam: Camera, points: jnp.ndarray, point_valid: jnp.ndarray,
               radius_ndc: float, footprint: int = 9,
               image_scale: int = 1) -> jnp.ndarray:
    """Soft mask (H/s, W/s) in [0, 1] from world-space points.

    radius_ndc: splat radius in NDC units (the reference's
    point_render.radius config value).  image_scale s renders at reduced
    resolution (pixel centers move accordingly) for cheap coarse stages.
    """
    H, W = cam.H // image_scale, cam.W // image_scale
    screen = transform_points_screen(cam, points)  # (N,3) col,row,z full-res
    col = screen[:, 0] / image_scale
    row = screen[:, 1] / image_scale
    z = screen[:, 2]
    r_pix = radius_ndc * (cam.W / image_scale) / 2.0

    k = footprint
    half = (k - 1) // 2
    base_c = jnp.floor(col)
    base_r = jnp.floor(row)
    offs = jnp.arange(k, dtype=jnp.float32) - half
    # (N, k) candidate cols/rows
    cand_c = base_c[:, None] + offs[None, :]
    cand_r = base_r[:, None] + offs[None, :]
    # (N, k, k) squared pixel distance
    dc = cand_c[:, None, :] - col[:, None, None]
    dr = cand_r[:, :, None] - row[:, None, None]
    d2 = dc * dc + dr * dr
    w = 1.0 - d2 / (r_pix * r_pix)
    ok = (
        (w > 0.0)
        & (z[:, None, None] > 0.0)
        & point_valid[:, None, None]
        & (cand_c[:, None, :] >= 0) & (cand_c[:, None, :] <= W - 1)
        & (cand_r[:, :, None] >= 0) & (cand_r[:, :, None] <= H - 1)
    )
    log_term = jnp.log1p(-jnp.clip(w, 0.0, 1.0 - 1e-5))
    ci = jnp.clip(cand_c.astype(jnp.int32), 0, W - 1)
    ri = jnp.clip(cand_r.astype(jnp.int32), 0, H - 1)
    pix = ri[:, :, None] * W + ci[:, None, :]
    pix = jnp.where(ok, pix, H * W)  # drop
    acc = jnp.zeros((H * W,), points.dtype)
    acc = acc.at[pix.reshape(-1)].add(
        jnp.where(ok, log_term, 0.0).reshape(-1), mode="drop")
    return (1.0 - jnp.exp(acc)).reshape(H, W)


def rasterize_mesh(cam: Camera, verts: jnp.ndarray, faces: jnp.ndarray,
                   face_valid: jnp.ndarray, footprint: int = 10,
                   image_scale: int = 1) -> Fragments:
    """Nearest-face fragments at (H/s, W/s). Non-differentiable by design
    (the reference also rasterizes under no_grad, model/network.py:491-493).
    """
    H, W = cam.H // image_scale, cam.W // image_scale
    screen = transform_points_screen(cam, verts)
    sxy = screen[:, :2] / image_scale
    sz = screen[:, 2]

    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    p0, p1, p2 = sxy[f0], sxy[f1], sxy[f2]       # (F,2)
    z0, z1, z2 = sz[f0], sz[f1], sz[f2]
    front = (z0 > 0) & (z1 > 0) & (z2 > 0) & face_valid

    k = footprint
    # footprint anchored at the triangle bbox min corner
    bb_min_c = jnp.floor(jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0]))
    bb_min_r = jnp.floor(jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1]))
    offs = jnp.arange(k, dtype=jnp.float32)
    cand_c = bb_min_c[:, None] + offs[None, :]            # (F,k)
    cand_r = bb_min_r[:, None] + offs[None, :]

    # 2D barycentrics at each candidate pixel center: solve via edge functions
    def edge(a, b, px, py):
        return ((b[:, 0] - a[:, 0])[:, None, None] * (py - a[:, 1][:, None, None])
                - (b[:, 1] - a[:, 1])[:, None, None] * (px - a[:, 0][:, None, None]))

    px = cand_c[:, None, :]                                # (F,1,k) cols
    py = cand_r[:, :, None]                                # (F,k,1) rows
    area = ((p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
            - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))  # signed, (F,)
    w0 = edge(p1, p2, px, py)
    w1 = edge(p2, p0, px, py)
    w2 = edge(p0, p1, px, py)
    denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)[:, None, None]
    b0 = w0 / denom
    b1 = w1 / denom
    b2 = w2 / denom
    # >= so pixels exactly on a shared edge belong to both faces (the z-buffer
    # + min-face-id pass picks one deterministically); strict > would leave
    # holes along interior edges.
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area) > 1e-12)[:, None, None]

    # perspective-correct interpolated depth: 1/z = sum b_i / z_i
    inv_z = (b0 / z0[:, None, None] + b1 / z1[:, None, None]
             + b2 / z2[:, None, None])
    zpix = 1.0 / jnp.clip(inv_z, 1e-12, None)

    ok = (inside & front[:, None, None]
          & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1))
    ci = jnp.clip(cand_c.astype(jnp.int32), 0, W - 1)[:, None, :]
    ri = jnp.clip(cand_r.astype(jnp.int32), 0, H - 1)[:, :, None]
    pix = jnp.broadcast_to(ri * W + ci, zpix.shape)
    pix_ok = jnp.where(ok, pix, H * W)

    big = jnp.asarray(jnp.inf, verts.dtype)
    zmin = jnp.full((H * W,), big, verts.dtype)
    zmin = zmin.at[pix_ok.reshape(-1)].min(
        jnp.where(ok, zpix, big).reshape(-1), mode="drop")

    # pass 2: among contributions matching zmin exactly, take min face id
    fids = jnp.broadcast_to(
        jnp.arange(faces.shape[0], dtype=jnp.int32)[:, None, None], zpix.shape)
    is_winner = ok & (zpix == zmin[pix_ok])
    face_win = jnp.full((H * W,), jnp.iinfo(jnp.int32).max, jnp.int32)
    face_win = face_win.at[jnp.where(is_winner, pix_ok, H * W).reshape(-1)].min(
        fids.reshape(-1), mode="drop")
    hit = face_win != jnp.iinfo(jnp.int32).max
    face_win = jnp.where(hit, face_win, -1)

    # recompute perspective-correct barys for the winning face per pixel
    fw = jnp.maximum(face_win, 0)
    q0, q1, q2 = sxy[faces[fw, 0]], sxy[faces[fw, 1]], sxy[faces[fw, 2]]
    y0_, y1_, y2_ = sz[faces[fw, 0]], sz[faces[fw, 1]], sz[faces[fw, 2]]
    gr = jnp.arange(H * W)
    pcx = (gr % W).astype(verts.dtype)
    pcy = (gr // W).astype(verts.dtype)

    def edge1(a, b, px_, py_):
        return (b[:, 0] - a[:, 0]) * (py_ - a[:, 1]) - (b[:, 1] - a[:, 1]) * (px_ - a[:, 0])

    area1 = (q1[:, 0] - q0[:, 0]) * (q2[:, 1] - q0[:, 1]) - (q1[:, 1] - q0[:, 1]) * (q2[:, 0] - q0[:, 0])
    denom1 = jnp.where(jnp.abs(area1) > 1e-12, area1, 1.0)
    c0 = edge1(q1, q2, pcx, pcy) / denom1
    c1 = edge1(q2, q0, pcx, pcy) / denom1
    c2 = edge1(q0, q1, pcx, pcy) / denom1
    # perspective correction: b_i ∝ c_i / z_i
    t0 = c0 / jnp.clip(y0_, 1e-12, None)
    t1 = c1 / jnp.clip(y1_, 1e-12, None)
    t2 = c2 / jnp.clip(y2_, 1e-12, None)
    ts = jnp.clip(t0 + t1 + t2, 1e-12, None)
    bary = jnp.stack([t0 / ts, t1 / ts, t2 / ts], axis=-1)
    bary = jnp.where(hit[:, None], bary, 0.0)

    return Fragments(
        pix_to_face=face_win.reshape(H, W),
        bary=bary.reshape(H, W, 3),
        zbuf=jnp.where(hit, zmin, big).reshape(H, W),
    )
