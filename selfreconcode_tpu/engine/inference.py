"""Inference: per-frame mesh renders, offset-only renders, IDR colors.

Parity target: OptimNetwork.infer (model/network.py:306-372) + infer.py's
output conventions: 'meshs' Phong renders of the deformed template (+ mask
IoU vs gt), 'def1meshs' renders of the MLP-offset-only deformation from a
fixed frontal camera, and IDR colors at ray-surface intersections composited
over white.

Structure (mirrors the reference's chunking at model/network.py:342-363):
a jitted GEOMETRY pass renders both meshes and produces per-pixel surface
inits, then the expensive 30-iter ray solve + color net runs only on the
pixels the rasterizer actually hit, in fixed-size jitted CHUNKS driven by a
host loop.  At 1080p a person covers ~15-25% of pixels, so chunking the hit
set is a ~4-6x cut in solve FLOPs vs solving the full H*W grid, with zero
recompiles (chunk shape is static; only the chunk COUNT varies per frame).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sdf import sdf_apply, sdf_value_only
from ..models.translator import translator_apply
from ..models.render import render_apply
from ..models.deformer import deformer_apply, deformer_jacobian
from ..render.camera import Camera, cam_pos, view_rays
from ..render.shading import phong_shade
from ..ops.rasterize import rasterize_mesh
from ..engine.surface import (SurfaceConfig, optimize_surface_points,
                              surface_inits_from_fragments)
from ..utils.math import inv3x3, normalize


def make_infer_fn(trainer, footprint: int = 8, notcolor: bool = False,
                  chunk: int = 65536):
    """Returns fn(params, bank, tmp, fid, gt_mask) -> per-frame outputs dict.

    One frame per call (infer batches are loops; shapes stay static).  The
    returned fn is a host orchestrator over two jitted programs; `chunk` is
    the color-solve batch size (clamped to H*W).
    """
    sdf_net = trainer.sdf_net
    trans_net = trainer.trans_net
    render_net = trainer.render_net
    H, W = trainer.dataset.H, trainer.dataset.W
    chunk = int(min(chunk, H * W))
    # The reference loosens the distance threshold 5e-5 -> 1e-4 and runs 30
    # iters at inference (model/network.py:342-363); w1/w2 stay at the
    # SurfaceConfig defaults shared with training.
    cfg = SurfaceConfig(n_iters=30, dthreshold=1e-4,
                        athreshold_deg=trainer.ang_thresh, early_exit=True)

    def _camera(bank):
        return Camera(
            focal=bank["camera"]["focal_length"],
            principal=bank["camera"]["princeple_points"],
            R=_quat_R(bank["camera"]["cam2world_coord_quat"]),
            T=bank["camera"]["world2cam_coord_trans"], H=H, W=W)

    @jax.jit
    def _geom(params, bank, tmp, fid, gt_mask, deformer):
        cam = _camera(bank)
        poses = bank["poses"][fid][None]
        trans = bank["trans"][fid][None]
        dcond = bank["cond_deformer"][fid][None]
        vcap = tmp.verts.shape[0]
        binds = jnp.zeros((vcap,), jnp.int32)
        def_verts, _ = deformer_apply(params["trans"], deformer, tmp.verts,
                                      binds, dcond, poses, trans, 1.0)

        frags = rasterize_mesh(cam, def_verts, tmp.faces, tmp.face_valid,
                               footprint)
        light = cam_pos(cam)
        mesh_img, hit = phong_shade(cam, def_verts, tmp.faces,
                                    tmp.face_valid, frags, light)
        # mask IoU error (network.py:322-324)
        m = hit.astype(jnp.float32)
        inter = (m * gt_mask).sum()
        union = jnp.abs(m + gt_mask - m * gt_mask).sum()
        mask_err = 1.0 - inter / jnp.clip(union, 1e-8, None)

        # def1: translator-only deformation from a fixed frontal camera
        # (network.py:332-339): R = diag(-1,1,-1), T = mean trans
        tverts, _ = translator_apply(params["trans"], trans_net, tmp.verts,
                                     jnp.broadcast_to(
                                         dcond[0], (vcap, dcond.shape[-1])),
                                     1.0)
        newT = bank["trans"].mean(0)
        cam1 = Camera(focal=cam.focal, principal=cam.principal,
                      R=jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0],
                                     [0, 0, -1.0]]),
                      T=newT, H=H, W=W)
        frags1 = rasterize_mesh(cam1, tverts, tmp.faces, tmp.face_valid,
                                footprint)
        def1_img, _ = phong_shade(cam1, tverts, tmp.faces, tmp.face_valid,
                                  frags1, cam_pos(cam1) + jnp.asarray([0., 1., 0.]))

        out = {"mesh_img": mesh_img, "hit": hit, "mask_err": mask_err,
               "def1_img": def1_img, "def_verts": def_verts}
        if notcolor:
            return out

        init_pts, valid = surface_inits_from_fragments(
            tmp.verts, tmp.faces, frags.pix_to_face, frags.bary)
        rows = jnp.arange(H * W) // W
        cols = jnp.arange(H * W) % W
        pix = jnp.stack([cols.astype(jnp.float32), rows.astype(jnp.float32),
                         jnp.ones((H * W,), jnp.float32)], -1)
        out["init_pts"] = init_pts.reshape(-1, 3)
        out["valid"] = valid.reshape(-1)
        out["rays"] = view_rays(cam, pix)
        return out

    @jax.jit
    def _color_chunk(params, bank, fid, init_pts, rays, idx, deformer):
        """Solve + shade one fixed-size chunk of hit-pixel indices."""
        cam = _camera(bank)
        poses = bank["poses"][fid][None]
        trans = bank["trans"][fid][None]
        dcond = bank["cond_deformer"][fid][None]
        pts0 = init_pts[idx]
        v = rays[idx]
        c = cam_pos(cam)
        bflat = jnp.zeros((idx.shape[0],), jnp.int32)
        pts, done = optimize_surface_points(
            params["sdf"], params["trans"], sdf_net, deformer, pts0,
            bflat, dcond, poses, trans, v, c, 1.0, 1.0, cfg)
        nx = jax.grad(lambda p: sdf_value_only(params["sdf"], sdf_net, p,
                                               1.0).sum())(pts)
        nx = normalize(nx)
        _, feat = sdf_apply(params["sdf"], sdf_net, pts, 1.0)
        jac, _ = deformer_jacobian(params["trans"], deformer, pts, bflat,
                                   dcond, poses, trans, 1.0)
        jinv, ok = inv3x3(jac)
        crays = jnp.where(ok[:, None],
                          jnp.einsum("nij,nj->ni", jinv, v), v)
        crays = normalize(crays)
        colors = render_apply(params["render"], render_net, pts, nx, crays,
                              feat, 1.0)
        colors = jnp.clip(colors / 2.0 + 0.5, 0.0, 1.0)
        return colors, done

    def infer_frame(params, bank, tmp, fid, gt_mask):
        # deformer passed as an argument (never closed over: the weight
        # volume would be inlined as an HLO constant, see Skinner docstring)
        out = _geom(params, bank, tmp, fid, gt_mask, trainer.deformer)
        return _finish(params, bank, fid, out)

    def infer_batch(params, bank, tmp, fids, gt_masks):
        """Frame batching (reference infer.py:132 batches frames through the
        loader): dispatch the geom pass for EVERY frame of the batch before
        fetching any result, so the expensive tunnel round-trip (the `valid`
        sync in _finish) overlaps the remaining frames' device work.  Shapes
        stay static — batching here is dispatch pipelining, not vmap (batched
        sort/gather rasterization lowers worse on TPU, PERF.md round 1)."""
        geoms = [_geom(params, bank, tmp, jnp.asarray(fid, jnp.int32),
                       gt_mask, trainer.deformer)
                 for fid, gt_mask in zip(fids, gt_masks)]
        return [_finish(params, bank, fid, out)
                for fid, out in zip(fids, geoms)]

    def _finish(params, bank, fid, out):
        if notcolor:
            return out
        init_pts = out.pop("init_pts")
        rays = out.pop("rays")
        valid = np.asarray(out.pop("valid"))
        img = np.ones((H * W, 3), np.float32)
        (hit_idx,) = np.nonzero(valid)
        # dispatch every chunk back-to-back BEFORE fetching any result: the
        # device queue stays full and the host<->device round-trip (which on
        # the remote tunnel is the expensive part) is paid once per frame,
        # not once per chunk
        pending = []
        for lo in range(0, hit_idx.size, chunk):
            sel = hit_idx[lo:lo + chunk]
            n = sel.size
            if n < chunk:  # pad the tail chunk; padded lanes discarded below
                sel = np.concatenate([sel, np.zeros(chunk - n, sel.dtype)])
            colors, done = _color_chunk(params, bank, fid,
                                        init_pts, rays,
                                        jnp.asarray(sel, jnp.int32),
                                        trainer.deformer)
            pending.append((sel, n, colors, done))
        for sel, n, colors, done in pending:
            colors = np.asarray(colors)[:n]
            done = np.asarray(done)[:n]
            img[sel[:n][done]] = colors[done]
        # host array already — callers device_get the dict, numpy passes through
        out["color_img"] = img.reshape(H, W, 3)
        return out

    infer_frame.batched = infer_batch
    return infer_frame


def _quat_R(quat):
    from ..utils.math import quat2mat
    return quat2mat(quat.reshape(1, 4))[0]
