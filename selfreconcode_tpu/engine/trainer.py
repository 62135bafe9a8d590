"""Per-subject avatar optimization: the OptimNetwork-equivalent trainer.

Parity target: model/network.py:149-814 (OptimNetwork) + train.py's epoch
loop, re-architected TPU-first:

  * ONE jit-compiled training step covers everything between remeshes —
    deform, rasterize, splat-mask + inner template-vertex SGD, ray surface
    root-finding with implicit differentiation (custom_vjp, replacing the
    hand-rolled propagateTmpPsGrad at model/network.py:702-814), eikonal,
    deformation regularizers, DCT prior, color + normal losses, and the Adam
    update.  No host syncs inside.
  * Remeshing (discretizeSDF: octree sweep + marching cubes,
    model/network.py:292-302,463-478) is the only host boundary: fixed-
    capacity padded buffers keep shapes static; host rebuilds the edge
    topology (replacing openmesh, model/network.py:472-477).
  * The reference's CPU SVD round-trip (network.py:575-576) becomes
    eigvalsh(JᵀJ) on device; the triple-autograd Jacobians become jacfwd.
  * The inner SGD on template verts (network.py:686-688) is carried as
    (verts, momentum) in the train state; its backward's side-gradients into
    deformer/pose/camera parameters are reproduced exactly by adding
    grad(inner_loss) w.r.t. the shared leaves into the outer gradient.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.sdf import (SDFNet, init_sdf_params, sdf_apply, sdf_value_only,
                          sdf_grad)
from ..models.translator import (TranslatorNet, init_translator_params,
                                 translator_apply)
from ..models.render import RenderNet, init_render_params, render_apply
from ..models.skinner import Skinner, skinner_apply_shared, posed_skeleton
from ..models.deformer import Deformer, deformer_apply, deformer_jacobian
from ..render.camera import (Camera, cam_pos, view_rays, ang_threshold,
                             transform_points_screen)
from ..ops.rasterize import rasterize_mesh, splat_mask
from ..ops.sparse_sdf import sparse_sdf_grid, grid_world_coords, default_caps
from ..ops.marching_cubes import marching_cubes
from ..engine.surface import (SurfaceConfig, make_surface_points_fn,
                              surface_inits_from_fragments)
from ..engine import losses as L
from ..utils.math import (quat2mat, inv3x3, gm_robust,
                          log_singular_values_sq_sum, dct_null_space,
                          normalize)
from ..utils.sampling import sample_points, subsample_mask_topk
from ..utils.meshops import (build_edge_topology,
                             build_edge_topology_device)
from ..utils import meshops


# ---------------------------------------------------------------------------
# Static stage configuration
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LossWeights:
    """One loss_{stage} block of config.conf (reference lines 68-134)."""
    color_weight: float = 0.5
    normal_weight: float = 0.1
    weighted_normal: bool = True
    grad_weight: float = 1.0
    offset_weight: float = 0.0
    def_regu_weight: float = 0.1
    def_regu_c: float = 0.5
    dct_weight: float = 2.0
    pc_weight: float = 60.0
    pc_mask_weight: float = 1.0
    laplacian_weight: float = -10.0
    edge_weight: float = -10.0
    norm_weight: float = -0.001
    def_consistent_weight: float = 0.6
    def_consistent_c: float = 0.01
    sample_pix_num: int = 0  # 0 -> use train.sample_pix_num


@dataclass(frozen=True)
class StageStatic:
    """Everything that specializes the jitted step (shapes + weights)."""
    name: str
    N: int                      # frame batch size
    H: int
    W: int
    sample_pix: int             # rays per step (total across batch)
    radius: float               # point-splat radius (NDC)
    remesh_intersect: int
    vcap: int
    fcap: int
    ecap: int
    mc_active_cap: int
    resolutions: Tuple[Tuple[int, int, int], ...]
    sweep_caps: Tuple[int, ...]
    raster_footprint: int
    weights: LossWeights
    eik_tmp: int = 4096         # template-vert eikonal subsample
    anchor_sub: int = 16384     # sdf-anchor vertex subsample (0 = all)
    point_inits: bool = True    # vertex-projection ray seeding (False =
                                # fragment rasterization, reference exact)
    splat_cap: int = 64         # splat bin-cell candidate slots; grown by the
                                # remesh-tick watermark from measured max cell
                                # occupancy (reference parity: the exhaustive
                                # per-pixel scatter never drops coverage,
                                # model/CameraMine.py:266-304)
    splat_cells: int = 4096     # ACTIVE-cell compaction capacity (cells the
                                # splat cloud touches; ~10% of cells at 1080p)
                                # — grown by the same watermark from stats[2]
    splat_cap_max: int = 256    # growth ceiling for splat_cap.  Measured A/B
                                # at 1080p acceptance density (tools/
                                # bench_splat.py, PERF.md): cap 256 vs the
                                # exact occupancy-sized cap differs by
                                # loss d=1e-6, grad cos 0.99976 — the mask
                                # saturates under overlapping splats, so
                                # candidates beyond ~256/cell carry no
                                # gradient.  (The reference itself keeps only
                                # the 50 nearest splats per PIXEL,
                                # CameraMine.py:266-304.)  Raise via
                                # SRTPU_SPLAT_CAP_MAX to go exact.
    window: int = 30            # DCT temporal window
    dct_k: int = 10
    opt_pose: bool = True
    opt_trans: bool = True
    opt_cam_focal: bool = True
    opt_cam_principal: bool = True
    opt_cam_quat: bool = False
    opt_cam_T: bool = True
    has_normals: bool = False
    surf_iters: int = 10
    surf_newton: bool = True    # False = reference-exact Cauchy surface solve
                                # (utils/FindSurfacePs.py:114-163); the A/B
                                # harness toggles this per variant


class TemplateState(NamedTuple):
    verts: jnp.ndarray        # (vcap, 3)
    vert_valid: jnp.ndarray   # (vcap,)
    faces: jnp.ndarray        # (fcap, 3)
    face_valid: jnp.ndarray   # (fcap,)
    edges: jnp.ndarray        # (ecap, 2)
    edge_valid: jnp.ndarray
    edge_faces: jnp.ndarray   # (ecap, 2)
    ef_valid: jnp.ndarray
    momentum: jnp.ndarray     # (vcap, 3) inner-SGD momentum


class TrainState(NamedTuple):
    params: Any               # {"sdf","trans","render"}
    bank: Any                 # per-frame parameter bank + camera
    opt_state: Any
    tmp: TemplateState


# ---------------------------------------------------------------------------
# Camera plumbing
# ---------------------------------------------------------------------------

def camera_from_bank(bank, H: int, W: int, cfg: StageStatic) -> Camera:
    """Build the (shared) camera, stop-gradient-ing frozen parameters.

    Mirrors dataset.get_camera_parameters + opt flags
    (dataset/dataset.py:64-74,125-127)."""
    cam = bank["camera"]
    sg = jax.lax.stop_gradient
    focal = cam["focal_length"] if cfg.opt_cam_focal else sg(cam["focal_length"])
    princ = (cam["princeple_points"] if cfg.opt_cam_principal
             else sg(cam["princeple_points"]))
    quat = (cam["cam2world_coord_quat"] if cfg.opt_cam_quat
            else sg(cam["cam2world_coord_quat"]))
    T = (cam["world2cam_coord_trans"] if cfg.opt_cam_T
         else sg(cam["world2cam_coord_trans"]))
    R = quat2mat(quat.reshape(1, 4))[0]
    return Camera(focal=focal.reshape(2), principal=princ.reshape(2),
                  R=R, T=T.reshape(3), H=H, W=W)


def grad_mask_tree(state: TrainState, cfg: StageStatic):
    """0/1 mask pytree marking trainable leaves of (params, bank)."""
    ones = lambda t: jax.tree_util.tree_map(lambda x: jnp.ones_like(x), t)
    zeros = lambda t: jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), t)
    params_mask = ones(state.params)
    bank = state.bank
    bank_mask = {}
    for k, v in bank.items():
        if k == "poses":
            bank_mask[k] = (jnp.ones_like(v) if cfg.opt_pose else jnp.zeros_like(v))
        elif k == "trans":
            bank_mask[k] = (jnp.ones_like(v) if cfg.opt_trans else jnp.zeros_like(v))
        elif k == "camera":
            bank_mask[k] = {
                "focal_length": jnp.full_like(v["focal_length"],
                                              1.0 if cfg.opt_cam_focal else 0.0),
                "princeple_points": jnp.full_like(
                    v["princeple_points"],
                    1.0 if cfg.opt_cam_principal else 0.0),
                "cam2world_coord_quat": jnp.full_like(
                    v["cam2world_coord_quat"],
                    1.0 if cfg.opt_cam_quat else 0.0),
                "world2cam_coord_trans": jnp.full_like(
                    v["world2cam_coord_trans"],
                    1.0 if cfg.opt_cam_T else 0.0),
            }
        else:  # conds always trainable (dataset/dataset.py:18-24)
            bank_mask[k] = jnp.ones_like(v)
    return params_mask, bank_mask


# ---------------------------------------------------------------------------
# The jit-compiled training step factory
# ---------------------------------------------------------------------------

def make_train_step(sdf_net: SDFNet, trans_net: TranslatorNet,
                    render_net: RenderNet, deformer: Deformer,
                    cfg: StageStatic, dctnull: np.ndarray,
                    ang_thresh_deg: float, optimizer):
    """Returns step(state, batch, step_in) -> (state, info).

    The deformer (LBS weight volume) is threaded through the jitted passes as
    an ARGUMENT — closure capture would inline it as an HLO constant (fatal
    with the remote compiler; see Skinner's docstring)."""
    # dthreshold/w1/w2 come from SurfaceConfig defaults (the reference's
    # training values, utils/FindSurfacePs.py:121 / model/network.py:539);
    # inference overrides dthreshold only (see engine/inference.py).
    surf_cfg = SurfaceConfig(n_iters=cfg.surf_iters,
                             athreshold_deg=ang_thresh_deg,
                             newton=cfg.surf_newton)
    surface_points = make_surface_points_fn(sdf_net, trans_net, surf_cfg)
    w = cfg.weights
    N, H, W = cfg.N, cfg.H, cfg.W
    P = cfg.sample_pix * N if w.sample_pix_num == 0 else w.sample_pix_num * N
    dctnull_j = jnp.asarray(dctnull)
    radius_px = int(np.round(cfg.radius / 2.0 * float(min(H, W)) / 1.2))
    vcap = cfg.vcap

    def frame_params(bank, fids):
        poses = bank["poses"][fids]
        trans = bank["trans"][fids]
        if not cfg.opt_pose:
            poses = jax.lax.stop_gradient(poses)
        if not cfg.opt_trans:
            trans = jax.lax.stop_gradient(trans)
        dcond = bank["cond_deformer"][fids]
        rcond = bank["cond_renderer"][fids]
        return poses, trans, dcond, rcond

    # -- inner (pc) loss: mask IoU + mesh regus + def-consistency ----------
    def inner_loss(tmp_verts, params, bank, tmp: TemplateState, fids,
                   mgtMs, ratios, deformer):
        _, r_def, _ = ratios
        cam = camera_from_bank(bank, H, W, cfg)
        poses, trans, dcond, _ = frame_params(bank, fids)
        flat = jnp.tile(tmp_verts, (N, 1))
        binds = jnp.repeat(jnp.arange(N), vcap)
        def_flat, _ = deformer_apply(params["trans"], deformer, flat, binds,
                                     dcond, poses, trans, r_def)
        def_verts = def_flat.reshape(N, vcap, 3)
        splat_outs = [
            splat_mask(cam, def_verts[i], tmp.vert_valid, cfg.radius,
                       cell_cap=cfg.splat_cap, active_cells=cfg.splat_cells,
                       return_overflow=True)
            for i in range(N)]
        masks = jnp.stack([m for m, _ in splat_outs])
        stats = jnp.stack([s for _, s in splat_outs])          # (N, 3)
        mask_loss = L.iou_mask_loss(masks, mgtMs)
        loss = mask_loss * w.pc_mask_weight
        info = {"pc_mask_loss": mask_loss,
                # dropped splat candidates (overfull bin cells + cells beyond
                # the active-cell capacity); nonzero = scene denser than the
                # stage caps.  The trainer's remesh-tick watermark reads
                # these and grows both caps (rejit) so the decimation repairs
                # itself instead of degrading the mask gradient silently.
                "splat_overflow": stats[:, 0].sum(),
                "splat_max_cell": stats[:, 1].max(),
                "splat_active": stats[:, 2].max()}
        if w.laplacian_weight > 0.0:
            lap = meshops.uniform_laplacian_loss(
                tmp_verts, tmp.edges, tmp.edge_valid, tmp.vert_valid)
            loss = loss + w.laplacian_weight * lap
            info["pc_lap_loss"] = lap
        if w.edge_weight > 0.0:
            el = meshops.edge_length_loss(tmp_verts, tmp.edges, tmp.edge_valid)
            loss = loss + w.edge_weight * el
            info["pc_edge_loss"] = el
        if w.norm_weight > 0.0:
            nc = meshops.normal_consistency_loss(
                tmp_verts, tmp.faces, tmp.edge_faces, tmp.ef_valid)
            loss = loss + w.norm_weight * nc
            info["pc_norm_loss"] = nc
        if w.def_consistent_weight > 0.0:
            lbs_b = skinner_apply_shared(deformer.skinner, tmp_verts,
                                         poses, trans)
            dc = L.def_consistency_loss(
                def_verts, lbs_b, tmp.vert_valid, w.def_consistent_c)
            loss = loss + w.def_consistent_weight * dc
            info["pc_defconst_loss"] = dc
        return loss, (masks, info)

    # -- outer loss ---------------------------------------------------------
    def outer_loss(params, bank, new_verts_sg, vert_valid, fids, init_pts,
                   init_valid, ray_rows, ray_cols, ray_binds, gtCs, gtNs,
                   windows, ratios, key, deformer):
        r_sdf, r_def, r_ren = ratios
        cam = camera_from_bank(bank, H, W, cfg)
        poses, trans, dcond, rcond = frame_params(bank, fids)
        info = {}

        # rays from the (possibly learnable) camera — gradients flow to
        # focal/principal/T through view_rays + cam_pos (network.py:536,715-719)
        pix = jnp.stack([ray_cols.astype(jnp.float32),
                         ray_rows.astype(jnp.float32),
                         jnp.ones((P,), jnp.float32)], axis=-1)
        rays = view_rays(cam, pix)
        c = cam_pos(cam)

        # implicit-diff surface points (OptimizeSurfacePs + propagateTmpPsGrad)
        pts, done = surface_points(
            jnp.stack([jnp.asarray(r_sdf, jnp.float32),
                       jnp.asarray(r_def, jnp.float32)]),
            deformer, params["sdf"], params["trans"], dcond, poses, trans,
            rays, c, init_pts, ray_binds)
        done = done & init_valid
        info["ray_converged"] = done.sum()

        # eikonal on local+global samples around (surface pts + template verts)
        k1, k2, k3 = jax.random.split(key, 3)
        tidx, tsel = subsample_mask_topk(k1, vert_valid, cfg.eik_tmp)
        tmp_sub = new_verts_sg[tidx]
        seeds = jnp.concatenate([jax.lax.stop_gradient(pts), tmp_sub], axis=0)
        nonmnfld = sample_points(k2, seeds, 1.8, 0.01)
        # forward-mode: this gradient is differentiated again (see sdf_grad)
        g_eik = sdf_grad(params["sdf"], sdf_net, nonmnfld, r_sdf)
        grad_loss = ((jnp.linalg.norm(g_eik, axis=-1) - 1.0) ** 2).mean()
        info["grad_loss"] = grad_loss
        total = grad_loss * w.grad_weight

        # offset norm (reference computes it for info even at weight 0,
        # network.py:552-561; we skip the weight-0 eval to save compute)
        if w.offset_weight > 0.0:
            flatn = jnp.tile(nonmnfld, (N, 1))
            bindsn = jnp.repeat(jnp.arange(N), nonmnfld.shape[0])
            _, off = translator_apply(params["trans"], trans_net, flatn,
                                      dcond[bindsn], r_def)
            off_l = jnp.linalg.norm(off, axis=-1).mean()
            info["offset_loss"] = off_l
            total = total + off_l * w.offset_weight

        # def_regu: GM(log-singular-values of translator Jacobian)
        # (network.py:565-582; CPU SVD -> eigvalsh(JtJ) on device)
        if w.def_regu_weight > 0.0:
            base = jnp.concatenate(
                [jax.lax.stop_gradient(pts), tmp_sub], axis=0)
            jit_pts = sample_points(k3, base, 1.8, 0.01, ratio=0)
            dr_pts = jnp.concatenate([base, jit_pts], axis=0)
            M = dr_pts.shape[0]
            flatd = jnp.tile(dr_pts, (N, 1))
            bindsd = jnp.repeat(jnp.arange(N), M)
            conds = dcond[bindsd]

            def tfun(q):
                out, _ = translator_apply(params["trans"], trans_net, q,
                                          conds, r_def)
                return out

            cols = []
            for i in range(3):
                e = jnp.zeros_like(flatd).at[:, i].set(1.0)
                _, col = jax.jvp(tfun, (flatd,), (e,))
                cols.append(col)
            jac = jnp.stack(cols, axis=-1)
            s2 = log_singular_values_sq_sum(jac)
            def_loss = gm_robust(s2, w.def_regu_c, square=True).mean()
            info["def_loss"] = def_loss
            total = total + def_loss * w.def_regu_weight

        # DCT temporal prior on posed joints (network.py:585-593)
        if (cfg.opt_pose or cfg.opt_trans) and w.dct_weight > 0.0:
            wposes = bank["poses"][windows]      # (N, Nw, 24, 3)
            wtrans = bank["trans"][windows]      # (N, Nw, 3)
            if not cfg.opt_pose:
                wposes = jax.lax.stop_gradient(wposes)
            if not cfg.opt_trans:
                wtrans = jax.lax.stop_gradient(wtrans)
            Nw = cfg.window
            pj = posed_skeleton(deformer.skinner,
                                wposes.reshape(N * Nw, 24, 3),
                                wtrans.reshape(N * Nw, 3))
            dct_loss = L.dct_prior_loss(dctnull_j,
                                        pj.reshape(N, Nw, 24, 3))
            info["dct_loss"] = dct_loss
            total = total + dct_loss * w.dct_weight

        # surface color / normal losses at converged rays (network.py:598-639)
        sdf_v, feat = sdf_apply(params["sdf"], sdf_net, pts, r_sdf)
        nx = normalize(sdf_grad(params["sdf"], sdf_net, pts, r_sdf))
        jac_d, dpts = deformer_jacobian(params["trans"], deformer, pts,
                                        ray_binds, dcond, poses, trans, r_def)
        jinv, inv_ok = inv3x3(jac_d)
        info["inv_ok"] = inv_ok.sum()
        crays = jnp.einsum("nij,nj->ni", jinv, rays)
        crays = jnp.where(inv_ok[:, None], crays, rays)
        crays = normalize(crays)

        if w.color_weight > 0.0:
            colors = render_apply(params["render"], render_net, pts, nx,
                                  crays, feat, r_ren)
            gt = gtCs[ray_binds, ray_rows, ray_cols]
            color_loss = L.color_l1_loss(colors, gt, ray_binds, done, N)
            info["color_loss"] = color_loss
            total = total + w.color_weight * color_loss

        if cfg.has_normals and w.normal_weight > 0.0:
            # deformed normal (world) for the view weight, detached
            ndef = jnp.einsum("nji,nj->ni", jinv, nx)   # J^-T n
            ndef = jnp.where(inv_ok[:, None],
                             ndef, jnp.einsum("nij,nj->ni", jac_d, nx))
            ndef = normalize(jax.lax.stop_gradient(ndef))
            if w.weighted_normal:
                wgt = jnp.clip((-rays * ndef).sum(-1), 0.0, 1.0) ** 2
                wgt = jax.lax.stop_gradient(wgt)
            else:
                wgt = jnp.ones((P,))
            cam_f = camera_from_bank(bank, H, W, cfg)
            gtn = gtNs[ray_binds, ray_rows, ray_cols]   # (P,3) in [-1,1]
            flip = jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
            gtn_w = jnp.einsum("ij,nj->ni", cam_f.R @ flip, gtn)
            norms = jnp.linalg.norm(gtn_w, axis=-1, keepdims=True)
            nvalid = (norms[..., 0] > 1e-4) & done
            gtn_w = gtn_w / jnp.clip(norms, 1e-4, None)
            gtn_c = jnp.einsum("nji,nj->ni", jac_d, gtn_w)  # J^T n_gt
            normal_loss = L.normal_loss(gtn_c, nx, wgt, ray_binds, nvalid, N)
            info["normal_loss"] = normal_loss
            total = total + w.normal_weight * normal_loss

        return total, info

    # uint8 batches are converted to float ON DEVICE (8x less host->device
    # traffic at 1080p); float inputs (tests) pass through unchanged
    def _img_f32(x):   # (B,H,W,3) uint8 BGR -> [-1,1]
        if x.dtype == jnp.uint8:
            return (x.astype(jnp.float32) / 255.0 - 0.5) * 2.0
        return x

    def _mask_f32(x):
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32)
        return x

    def _normal_f32(x):  # uint8-encoded RGB -> [-1,1]
        if x.dtype == jnp.uint8:
            return 2.0 * x.astype(jnp.float32) / 255.0 - 1.0
        return x

    # The step is TWO jitted programs split at the natural no-grad boundary
    # (the reference also rasterizes under no_grad, network.py:491-493):
    # one giant program triggers an XLA TPU priority-fusion compiler crash
    # (SIGILL in TpuPriorityFusionQueue::NormalizedComputationCost), and the
    # split also re-compiles faster per stage.  Only device arrays cross the
    # boundary — no host syncs.

    @jax.jit
    def geom_pass(state: TrainState, deformer, gtMs, fids, ratios, key):
        """No-grad geometry: deform template, rasterize, surface inits, ray
        selection, gt-mask dilation."""
        params, bank, _, tmp = state
        gtMs = _mask_f32(gtMs)
        _, r_def, _ = ratios
        cam_sg = jax.tree_util.tree_map(
            jax.lax.stop_gradient, camera_from_bank(bank, H, W, cfg))
        poses_sg, trans_sg, dcond_sg, _ = jax.tree_util.tree_map(
            jax.lax.stop_gradient, frame_params(bank, fids))
        flat = jnp.tile(tmp.verts, (N, 1))
        binds = jnp.repeat(jnp.arange(N), vcap)
        def_flat, _ = deformer_apply(params["trans"], deformer,
                                     jax.lax.stop_gradient(flat), binds,
                                     dcond_sg, poses_sg, trans_sg, r_def)
        def_verts = jax.lax.stop_gradient(def_flat).reshape(N, vcap, 3)
        if cfg.point_inits:
            # TPU-first ray seeding: per-pixel nearest-z PROJECTED VERTEX
            # instead of triangle fragments.  The Newton surface solve only
            # needs a near-surface canonical start (the reference's own
            # bary-interpolated init, FindSurfacePs.py:5-29, is approximate
            # too); two 178k-row scatters replace the 355k-face rasterization
            # (75 ms -> ~4 ms per frame at the fine stage).
            tmp_verts_sg = jax.lax.stop_gradient(tmp.verts)
            big = jnp.asarray(3e38, jnp.float32)

            def point_frags(def_v):
                screen = transform_points_screen(cam_sg, def_v)
                col = jnp.round(screen[:, 0]).astype(jnp.int32)
                row = jnp.round(screen[:, 1]).astype(jnp.int32)
                z = screen[:, 2]
                ok = (tmp.vert_valid & (z > 0.0) & (col >= 0) & (col < W)
                      & (row >= 0) & (row < H))
                pix = jnp.clip(row, 0, H - 1) * W + jnp.clip(col, 0, W - 1)
                tgt = jnp.where(ok, pix, H * W)
                zimg = jnp.full((H * W,), big).at[tgt].min(z, mode="drop")
                win = ok & (z <= zimg[pix])
                vidimg = jnp.full((H * W,), vcap, jnp.int32).at[
                    jnp.where(win, pix, H * W)].min(
                        jnp.arange(vcap, dtype=jnp.int32), mode="drop")
                cover = (zimg < big).reshape(H, W)
                init = tmp_verts_sg[jnp.clip(vidimg, 0, vcap - 1)]
                return init.reshape(H, W, 3), cover

            outs = [point_frags(def_verts[i]) for i in range(N)]
            init_all = jnp.stack([o[0] for o in outs])
            valid_all = jnp.stack([o[1] for o in outs])
            frag_ovf = jnp.zeros((), jnp.int32)  # scatter-min path is exact
        else:
            # fragment-based inits (reference FindSurfacePs semantics)
            # per-frame loop beats vmap here: batched sort/gather/pallas
            # lowers worse than N independent launches (205 vs 180 ms)
            frags = [rasterize_mesh(cam_sg, def_verts[i], tmp.faces,
                                    tmp.face_valid, cfg.raster_footprint)
                     for i in range(N)]
            p2f = jnp.stack([f.pix_to_face for f in frags])   # (N,H,W)
            bary = jnp.stack([f.bary for f in frags])
            init_all, valid_all = surface_inits_from_fragments(
                jax.lax.stop_gradient(tmp.verts), tmp.faces, p2f, bary)
            frag_ovf = sum(f.overflow for f in frags)
        mgtMs = L.max_pool_mask(gtMs, radius_px) if radius_px > 0 else gtMs
        # ray selection: rasterized AND inside gt mask, subsampled to P
        sel_valid_px = valid_all & (gtMs > 0.0)
        idx, sel_ok = subsample_mask_topk(key, sel_valid_px.reshape(-1), P)
        ray_binds = (idx // (H * W)).astype(jnp.int32)
        rem = idx % (H * W)
        ray_rows = (rem // W).astype(jnp.int32)
        ray_cols = (rem % W).astype(jnp.int32)
        init_pts = init_all.reshape(-1, 3)[idx]
        return init_pts, sel_ok, ray_binds, ray_rows, ray_cols, mgtMs, frag_ovf

    @jax.jit
    def inner_pass(state: TrainState, deformer, fids, mgtMs, ratios):
        """Inner pc loss: grads w.r.t. template verts AND shared params;
        template-vertex SGD update."""
        params, bank, _, tmp = state

        def inner_wrap(tv, pr, bk):
            return inner_loss(tv, pr, bk, tmp, fids, mgtMs, ratios, deformer)

        (pc_loss_val, (masks, pc_info)), inner_grads = jax.value_and_grad(
            inner_wrap, argnums=(0, 1, 2), has_aux=True)(
                tmp.verts, params, bank)
        g_verts, g_params_in, g_bank_in = inner_grads
        g_verts = g_verts * tmp.vert_valid[:, None]
        # torch SGD(momentum=0.9, lr=0.05): buf = 0.9*buf + g; v -= lr*buf
        new_mom = 0.9 * tmp.momentum + g_verts
        new_verts = tmp.verts - 0.05 * new_mom
        new_verts = jnp.where(tmp.vert_valid[:, None], new_verts, tmp.verts)
        new_tmp = tmp._replace(verts=new_verts, momentum=new_mom)
        return new_tmp, g_params_in, g_bank_in, pc_loss_val, masks, pc_info

    @jax.jit
    def outer_pass(state: TrainState, deformer, new_tmp, g_params_in,
                   g_bank_in, gtCs, gtNs, fids, init_pts, sel_ok, ray_rows,
                   ray_cols, ray_binds, windows, ratios, lr, key):
        """Outer loss (surface + field losses) + combined Adam update."""
        params, bank, opt_state, _ = state
        gtCs = _img_f32(gtCs)
        gtNs = _normal_f32(gtNs)
        r_sdf = ratios[0]
        new_verts_sg = jax.lax.stop_gradient(new_tmp.verts)

        k_loss, k_anchor = jax.random.split(key)

        def outer_wrap(pr, bk):
            total, info = outer_loss(
                pr, bk, new_verts_sg, new_tmp.vert_valid, fids, init_pts,
                sel_ok, ray_rows, ray_cols, ray_binds, gtCs, gtNs, windows,
                ratios, k_loss, deformer)
            # sdf anchor (network.py:690-694).  The reference evaluates every
            # template vertex; at fine-stage vert counts the MLP fwd+grad on
            # all of them was ~100 ms/step (the whole outer-pass mystery gap),
            # so the mean is estimated on a fresh random subsample each step —
            # expectation-identical, and the anchor is a mean-field glue term.
            if cfg.anchor_sub > 0 and cfg.anchor_sub < vcap:
                aidx, asel = subsample_mask_topk(
                    k_anchor, new_tmp.vert_valid, cfg.anchor_sub)
                averts = new_verts_sg[aidx]
                avalid = asel
            else:
                averts, avalid = new_verts_sg, new_tmp.vert_valid
            sdf_tv = sdf_value_only(pr["sdf"], sdf_net, averts, r_sdf)
            anchor = L.sdf_anchor_loss(sdf_tv, avalid, 0.0)
            info["pc_loss_sdf"] = anchor
            total = total + anchor * w.pc_weight
            return total, info

        (outer_val, info), (g_params_out, g_bank_out) = jax.value_and_grad(
            outer_wrap, argnums=(0, 1), has_aux=True)(params, bank)

        g_params = jax.tree_util.tree_map(jnp.add, g_params_in, g_params_out)
        g_bank = jax.tree_util.tree_map(jnp.add, g_bank_in, g_bank_out)
        pm, bm = grad_mask_tree(state, cfg)
        g_params = jax.tree_util.tree_map(jnp.multiply, g_params, pm)
        g_bank = jax.tree_util.tree_map(jnp.multiply, g_bank, bm)
        updates, opt_state = optimizer.update(
            (g_params, g_bank), opt_state, (params, bank))
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params, bank = optax.apply_updates((params, bank), updates)
        return TrainState(params, bank, opt_state, new_tmp), info, outer_val

    def step(state: TrainState, gtCs, gtMs, gtNs, fids, windows,
             ratios, lr, key):
        k_sel, k_loss = jax.random.split(key)
        (init_pts, sel_ok, ray_binds, ray_rows, ray_cols, mgtMs,
         frag_ovf) = geom_pass(state, deformer, gtMs, fids, ratios, k_sel)
        (new_tmp, g_params_in, g_bank_in, pc_loss_val, masks,
         pc_info) = inner_pass(state, deformer, fids, mgtMs, ratios)
        new_state, info, outer_val = outer_pass(
            state, deformer, new_tmp, g_params_in, g_bank_in, gtCs, gtNs,
            fids, init_pts, sel_ok, ray_rows, ray_cols, ray_binds, windows,
            ratios, lr, k_loss)
        info.update(pc_info)
        info["loss"] = outer_val + pc_loss_val
        info["pred_mask_sum"] = masks.sum()
        info["frag_overflow"] = frag_ovf
        return new_state, info

    def make_fused(has_normal_cache: bool):
        """Scheduled-epoch wrapper for the device-cached path: 3 dispatches
        per step instead of ~10 host ops.

        The plain `step` needs ~10 host ops per call (3 pass dispatches +
        per-step uploads of fids/windows/ratios/lr + 3 cache gathers + key
        split); through the remote tunnel each costs ~8 ms — measured as the
        0.077 s/step wall-vs-device gap of the acceptance run.  Here the
        whole epoch schedule lives on device; the prologue (schedule reads,
        batch gather, window lookup, RNG fold) is fused INTO the geom pass
        and the step index feeds back as an output.  (Inlining all three
        passes into one program was tried and reverted: XLA's fusion pass
        exploring the cross-pass graph blew the compile up ~16x.)"""

        @jax.jit
        def sched_geom(state, deformer, di, cache, sched, win_table, lr,
                       rdef, key_ep):
            # deformer MUST be an argument: closure-capturing it inlines the
            # skinner weight volume as an HLO constant and the remote compile
            # request blows past the HTTP body limit (PERF.md single-op
            # findings; reproduced here as an HTTP 413)
            fids = sched[di]                            # (N,)
            windows = win_table[fids]                   # (N, window)
            ratios = jnp.stack([jnp.asarray(1.0, jnp.float32),
                                rdef[di],
                                jnp.asarray(1.0, jnp.float32)])
            key = jax.random.fold_in(key_ep, di)
            k_sel, k_loss = jax.random.split(key)
            gtCs = cache["img"][fids]
            gtMs = cache["mask"][fids]
            if has_normal_cache:
                gtNs = cache["normal"][fids]
            else:
                gtNs = jnp.zeros((N, H, W, 3), jnp.float32)
            # Force the batch gathers to materialize ONCE: without the
            # barrier XLA is free to fuse the (frame_num,H,W,3) cache gather
            # into every downstream image consumer, re-gathering from the
            # full device cache per consumer — the prime suspect for the
            # 0.9-3.3 s/it scheduled-path regression (PERF.md round 4).
            gtCs, gtMs, gtNs = jax.lax.optimization_barrier(
                (gtCs, gtMs, gtNs))
            geom = geom_pass(state, deformer, gtMs, fids, ratios, k_sel)
            return (di + 1, fids, windows, ratios, k_loss, gtCs, gtNs, geom)

        def fused(state, di, cache, sched, win_table, lr, rdef, key_ep):
            (di1, fids, windows, ratios, k_loss, gtCs, gtNs,
             (init_pts, sel_ok, ray_binds, ray_rows, ray_cols, mgtMs,
              frag_ovf)) = sched_geom(state, deformer, di, cache, sched,
                                      win_table, lr, rdef, key_ep)
            (new_tmp, g_params_in, g_bank_in, pc_loss_val, masks,
             pc_info) = inner_pass(state, deformer, fids, mgtMs, ratios)
            new_state, info, outer_val = outer_pass(
                state, deformer, new_tmp, g_params_in, g_bank_in, gtCs,
                gtNs, fids, init_pts, sel_ok, ray_rows, ray_cols, ray_binds,
                windows, ratios, lr, k_loss)
            info.update(pc_info)
            info["loss"] = outer_val + pc_loss_val
            info["pred_mask_sum"] = masks.sum()
            info["frag_overflow"] = frag_ovf
            return new_state, di1, info

        fused.sched_geom = sched_geom     # exposed for diagnostics
        return fused

    step.geom_pass = geom_pass        # exposed for diagnostics
    step.inner_pass = inner_pass
    step.outer_pass = outer_pass
    step.make_fused = make_fused
    return step


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------

class Trainer:
    """Host-side orchestrator: remeshing, stage switching, epoch loop.

    Construction mirrors getOptNet (model/network.py:828-907)."""

    def __init__(self, dataset, smpl_model, conf, resolutions: Dict[str, list],
                 save_root: Optional[str] = None, seed: int = 0,
                 skinner_res=(129, 225, 65), data_root: Optional[str] = None):
        from ..models.smpl import smpl_tmp_apose
        from ..models.skinner import build_skinner

        self.dataset = dataset
        self.conf = conf
        self.save_root = save_root
        self.resolutions = resolutions
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)

        self.sdf_net = SDFNet(multires=conf.get_int("sdf_net.multires"))
        self.trans_net = TranslatorNet(
            cond_size=conf.get_int("mlp_deformer.condlen"),
            multires=conf.get_int("mlp_deformer.multires"))
        self.render_net = RenderNet(
            feature_size=conf.get_int("render_net.condlen"),
            multires_v=conf.get_int("render_net.multires_v"))

        pose_type = conf.get_int("train.skinner_pose_type")
        init_pose = smpl_tmp_apose(pose_type)
        shape = jnp.asarray(dataset.shape)
        # _v5: flat corner-packed weight table, float16 storage
        skinner_cache = (osp.join(data_root,
                                  f"initial_skinner_{pose_type}_v5.npz")
                         if data_root else None)
        self.skinner, self.body_vs, self.body_fs = self._build_or_load_skinner(
            smpl_model, shape, init_pose, skinner_res, skinner_cache)
        self.deformer = Deformer(translator=self.trans_net,
                                 skinner=self.skinner)
        self.b_min = np.asarray(self.skinner.b_min)
        self.b_max = np.asarray(self.skinner.b_max)

        params = {
            "sdf": init_sdf_params(k1, self.sdf_net),
            "trans": init_translator_params(k2, self.trans_net),
            "render": init_render_params(k3, self.render_net),
        }
        bank = jax.tree_util.tree_map(jnp.asarray, dataset.param_bank())
        self.optimizer = optax.adam(1.0)  # lr injected per step
        opt_state = self.optimizer.init((params, bank))
        self.state = TrainState(params, bank, opt_state,
                                self._empty_template(1024, 2048, 4096))
        self.stage_cfg: Optional[StageStatic] = None
        self._step_fn = None
        self.step_rejits = 0
        self.opt_times = 0
        self.forward_time = 0
        self.remesh_time = 0.0
        self.info: Dict[str, float] = {}
        self._mc_caps = {}
        self._disc_cache = {}
        self._tmpl_cache = {}
        self.mc_cap_floor = 32768  # tests lower this for tiny grids
        self._warned_boundary = False
        self.mc_boundary_crossings = 0

        nw = min(30, dataset.frame_num - 1)
        self.window = nw
        self.dctnull = dct_null_space(min(10, max(1, nw // 3)), nw)
        self._frame_cache = None   # optional device-resident frame store
        self._take_fn = None
        self.mesh = None           # optional jax.sharding.Mesh (dp axis)
        self._shard_img = None     # NamedSharding P(None,"dp") over H
        self._shard_repl = None

        cam = self._host_camera()
        self.ang_thresh = ang_threshold(cam, 0.5)

    # -- helpers ------------------------------------------------------------
    def _host_camera(self) -> Camera:
        cp = self.dataset.camera_params
        R = np.asarray(quat2mat(jnp.asarray(
            cp["cam2world_coord_quat"]).reshape(1, 4))[0])
        return Camera(focal=jnp.asarray(cp["focal_length"]),
                      principal=jnp.asarray(cp["princeple_points"]),
                      R=jnp.asarray(R),
                      T=jnp.asarray(cp["world2cam_coord_trans"]),
                      H=self.dataset.H, W=self.dataset.W)

    def _build_or_load_skinner(self, smpl_model, shape, init_pose, res, cache):
        from ..models.skinner import build_skinner, Skinner
        if cache and osp.isfile(cache):
            z = np.load(cache)
            sk = Skinner(ws=jnp.asarray(z["ws"]), b_min=jnp.asarray(z["b_min"]),
                         b_max=jnp.asarray(z["b_max"]),
                         joints=jnp.asarray(z["joints"]),
                         init_pose_inv=jnp.asarray(z["init_pose_inv"]),
                         parents=tuple(int(p) for p in z["parents"]),
                         ws_dims=tuple(int(v) for v in z["ws_dims"]))
            return sk, jnp.asarray(z["body_vs"]), z["body_fs"]
        sk, vs, fs = build_skinner(smpl_model, shape, init_pose, resolution=res)
        if cache:
            np.savez(cache, ws=np.asarray(sk.ws), b_min=np.asarray(sk.b_min),
                     b_max=np.asarray(sk.b_max), joints=np.asarray(sk.joints),
                     init_pose_inv=np.asarray(sk.init_pose_inv),
                     parents=np.asarray(sk.parents),
                     ws_dims=np.asarray(sk.ws_dims),
                     body_vs=np.asarray(vs), body_fs=fs)
        return sk, vs, fs

    def _empty_template(self, vcap, fcap, ecap) -> TemplateState:
        return TemplateState(
            verts=jnp.zeros((vcap, 3)), vert_valid=jnp.zeros((vcap,), bool),
            faces=jnp.zeros((fcap, 3), jnp.int32),
            face_valid=jnp.zeros((fcap,), bool),
            edges=jnp.zeros((ecap, 2), jnp.int32),
            edge_valid=jnp.zeros((ecap,), bool),
            edge_faces=jnp.zeros((ecap, 2), jnp.int32),
            ef_valid=jnp.zeros((ecap,), bool),
            momentum=jnp.zeros((vcap, 3)))

    # -- SDF initialization (cached) ----------------------------------------
    def initialize_sdf(self, n_iters: int, cache_path: Optional[str] = None,
                       with_normals: bool = True, key=None):
        """IGR pretraining to the A-pose body cloud (network.py:207-290)."""
        from .igr_init import igr_pretrain
        if cache_path and osp.isfile(cache_path):
            z = np.load(cache_path, allow_pickle=True)
            flat = [jnp.asarray(z[k]) for k in sorted(
                z.files, key=lambda s: int(s.split("_")[0]))]
            treedef = jax.tree_util.tree_structure(self.state.params["sdf"])
            sdf_params = jax.tree_util.tree_unflatten(treedef, flat)
            self.state = self.state._replace(
                params={**self.state.params, "sdf": sdf_params})
            return {"cached": True}
        ns = self._body_vertex_normals()
        params, info = igr_pretrain(
            key if key is not None else jax.random.PRNGKey(7),
            self.state.params["sdf"], self.sdf_net,
            jnp.asarray(self.body_vs), jnp.asarray(ns), n_iters=n_iters,
            with_normals=with_normals)
        self.state = self.state._replace(
            params={**self.state.params, "sdf": params})
        # re-init Adam so pretraining doesn't leak moments
        self.state = self.state._replace(opt_state=self.optimizer.init(
            (self.state.params, self.state.bank)))
        if cache_path:
            flat, _ = jax.tree_util.tree_flatten(params)
            np.savez(cache_path, **{f"{i}_": np.asarray(x)
                                    for i, x in enumerate(flat)})
        return info

    def _body_vertex_normals(self):
        fv = jnp.ones((self.body_fs.shape[0],), bool)
        return meshops.vertex_normals(jnp.asarray(self.body_vs),
                                      jnp.asarray(self.body_fs), fv)

    # -- remesh -------------------------------------------------------------
    def _discretize_jit(self, res: tuple, caps: tuple, mc_caps: tuple):
        """One jitted program: octree sweep + marching cubes (no eager ops —
        eager dispatch over the remote-TPU tunnel is pathological)."""
        # bbox is part of the key: the boundary-crossing watermark grows
        # self.b_min/b_max, which would otherwise leave stale closures cached
        key = (res, caps, mc_caps,
               tuple(float(v) for v in self.b_min),
               tuple(float(v) for v in self.b_max))
        if key not in self._disc_cache:
            spacing, origin = grid_world_coords(res[-1], self.b_min,
                                                self.b_max)
            sdf_net, b_min, b_max = self.sdf_net, self.b_min, self.b_max
            vcap_mc, fcap_mc, acap_mc = mc_caps

            @jax.jit
            def fn(params, ratio):
                def qf(p):
                    return sdf_value_only(params, sdf_net, p, ratio)
                vol = sparse_sdf_grid(qf, res, b_min, b_max, 0.0, caps)
                return marching_cubes(vol, origin, spacing, 0.0, vcap_mc,
                                      fcap_mc, acap_mc)

            self._disc_cache[key] = fn
        return self._disc_cache[key]

    def _mc_device(self, ratio_sdf: float, resolutions=None):
        """Run the jitted sweep+MC with capacity growth; returns the
        device-resident MCResult plus host nv/nf (the only scalars fetched)."""
        res = resolutions or self.stage_cfg.resolutions
        res = tuple(tuple(int(v) for v in r) for r in res)
        caps = tuple(default_caps(res))
        key_caps = self._mc_caps.get(res[-1], None)
        if key_caps is None:
            n = int(np.prod(res[-1]))
            a = max(self.mc_cap_floor, int(8 * n ** (2 / 3)))
            key_caps = (2 * a, 4 * a, a)
            self._mc_caps[res[-1]] = key_caps
        params = self.state.params["sdf"]
        ratio = jnp.asarray(ratio_sdf, jnp.float32)
        bbox_tries = 0
        while True:
            mc = self._discretize_jit(res, caps, key_caps)(params, ratio)
            nv, nf, na = int(mc.nv), int(mc.nf), int(mc.na)
            vcap_mc, fcap_mc, acap_mc = key_caps
            # na must be checked too: dropped active cubes leave their owned
            # crossing-edge vertices at (0,0,0) while neighbors' faces still
            # reference the vids (silent corruption), and nv/nf can both fit
            # while na overflows.
            if nv > vcap_mc or nf > fcap_mc or na > acap_mc:
                key_caps = (max(vcap_mc, 2 * nv), max(fcap_mc, 2 * nf),
                            max(acap_mc, 2 * na))
                self._mc_caps[res[-1]] = key_caps
                continue
            n_boundary = int(mc.n_boundary)
            sides = np.asarray(mc.boundary_sides)
            # lifetime per-side growth budget IN WORLD UNITS: an IGR
            # far-field that is negative far from the body (unconstrained)
            # would otherwise re-trigger growth at EVERY remesh (bbox_tries
            # resets per call) and inflate the bbox/voxel size without
            # bound.  Each side may move at most 50% of the ORIGINAL extent
            # over the whole run — enough for any genuine clipping repair
            # (a count budget was tried and failed: an early healthy-margin
            # repair exhausted it and later real clipping went unrepaired).
            if getattr(self, "_bbox_grow_left", None) is None:
                ext0 = (np.asarray(self.b_max)
                        - np.asarray(self.b_min)).astype(np.float64)
                self._bbox_grow_left = np.concatenate([0.5 * ext0,
                                                       0.5 * ext0])  # lo,hi
            grow_left = self._bbox_grow_left
            if n_boundary > 0 and not sides.any():
                # ownerless crossings with ZERO plane inside-counts: the
                # surface crosses inside the boundary voxel layer without an
                # inside sample ON the plane itself, so the per-side metric
                # is blind to it.  Ownerless edges live on the max faces
                # (cubes own their min-corner edges) — grow the hi sides.
                sides = sides.copy()
                sides[[1, 3, 5]] = 1
            # grow_left layout [lo_xyz, hi_xyz] -> sides layout (x-,x+,...)
            sides = np.where(grow_left[[0, 3, 1, 4, 2, 5]] > 0, sides, 0)
            if sides.any() and nv > 0 and bbox_tries < 3:
                # margin-invariant violation: the surface is clipped by a
                # bbox face (inside samples on the plane; on +sides this
                # also leaves ownerless boundary-edge crossings whose MC
                # vertices stay at the world origin — corrupt template).
                # Watermark-repair like the na/nv/nf caps, but DIRECTIONAL:
                # grow only the violated sides by 8% of the extent — an
                # all-sides grow inflates the voxel size (fixed res over a
                # larger bbox) and with it the raster footprint, which cost
                # ~10% step throughput in the r3 bench.  Only the SWEEP bbox
                # grows — the skinner's weight-volume bbox (normalized-
                # coordinate domain) is untouched.
                ext = self.b_max - self.b_min
                lo_hit = sides[[0, 2, 4]] > 0
                hi_hit = sides[[1, 3, 5]] > 0
                lo_amt = np.where(lo_hit,
                                  np.minimum(0.08 * ext, grow_left[:3]), 0.0)
                hi_amt = np.where(hi_hit,
                                  np.minimum(0.08 * ext, grow_left[3:]), 0.0)
                self.b_min = (self.b_min - lo_amt).astype(np.float32)
                self.b_max = (self.b_max + hi_amt).astype(np.float32)
                grow_left[:3] -= lo_amt
                grow_left[3:] -= hi_amt
                bbox_tries += 1
                print(f"growing sweep bbox 8% on clipped sides "
                      f"(attempt {bbox_tries}): plane inside-counts "
                      f"(x-,x+,y-,y+,z-,z+)={sides.tolist()}, "
                      f"{n_boundary} ownerless crossings", flush=True)
                # bigger bbox -> bigger voxels -> MC triangles may exceed the
                # stage's raster footprint (the binning's 2x2-cell guarantee);
                # recompute it from the new spacing
                if self.stage_cfg is not None:
                    fp = self._stage_footprint(self.stage_cfg.resolutions)
                    if fp > self.stage_cfg.raster_footprint:
                        self.stage_cfg = dataclass_replace(
                            self.stage_cfg, raster_footprint=fp)
                        self._step_fn = None
                continue
            break
        assert nv > 0, "tmp sdf vanished..."  # network.py:466-468
        if (n_boundary > 0 or sides.any()) and not self._warned_boundary:
            # still touching after 3 growths — visible instead of silent
            print(f"WARNING: surface touches the sweep bbox after growth "
                  f"({n_boundary} ownerless crossings, plane inside-counts "
                  f"{sides.tolist()})", flush=True)
            self._warned_boundary = True
        self.mc_boundary_crossings = n_boundary
        return mc, nv, nf

    def discretize_sdf(self, ratio_sdf: float, resolutions=None,
                       iso: float = 0.0):
        """Octree sweep + fixed-capacity MC; returns (verts np, faces np)."""
        mc, nv, nf = self._mc_device(ratio_sdf, resolutions)
        return (np.asarray(mc.verts[:nv]), np.asarray(mc.faces[:nf]),
                nv, nf)

    def _template_jit(self, vcap, fcap, ecap, mc_shapes):
        """Jitted MCResult -> TemplateState (pad/slice + device edge
        topology).  Remesh transfers two scalars, nothing else."""
        key = (vcap, fcap, ecap, mc_shapes)
        if key not in self._tmpl_cache:

            @jax.jit
            def fn(mc_verts, mc_faces, nv, nf):
                nvc = min(vcap, mc_verts.shape[0])
                nfc = min(fcap, mc_faces.shape[0])
                verts = jnp.zeros((vcap, 3)).at[:nvc].set(mc_verts[:nvc])
                faces = jnp.zeros((fcap, 3), jnp.int32).at[:nfc].set(
                    mc_faces[:nfc])
                vv = jnp.arange(vcap) < nv
                fv = jnp.arange(fcap) < nf
                verts = jnp.where(vv[:, None], verts, 0.0)
                faces = jnp.where(fv[:, None], faces, 0)
                topo = build_edge_topology_device(faces, fv, ecap)
                return TemplateState(
                    verts=verts, vert_valid=vv, faces=faces, face_valid=fv,
                    edges=topo["edges"], edge_valid=topo["edge_valid"],
                    edge_faces=topo["edge_faces"], ef_valid=topo["ef_valid"],
                    momentum=jnp.zeros((vcap, 3))), topo["num_edges"]

            self._tmpl_cache[key] = fn
        return self._tmpl_cache[key]

    def remesh(self, ratio_sdf: float):
        self._check_splat_cap()
        self._check_splat_cells_shrink()
        mc, nv, nf = self._mc_device(ratio_sdf)
        cfg = self._update_template_caps(nv, nf)
        tmpl, num_edges = self._template_jit(
            cfg.vcap, cfg.fcap, cfg.ecap,
            (mc.verts.shape[0], mc.faces.shape[0]))(
                mc.verts, mc.faces, mc.nv, mc.nf)
        # Edge-capacity watermark: nv/nf/na all have grow+rejit repair, but a
        # num_edges > ecap overflow would silently drop unique edges from the
        # Laplacian/edge/normal-consistency regularizers (VERDICT r4 weak #4).
        # Manifold MC output keeps E = 1.5F under the nf-derived ecap, so this
        # never fires today — but a non-manifold template (E up to 3F) must
        # repair loudly, exactly like the vcap/fcap policy above.
        ne = int(num_edges)
        if ne > cfg.ecap:
            print(f"growing ecap {cfg.ecap} -> edge watermark {ne} +25%",
                  flush=True)
            self.stage_cfg = cfg = dataclass_replace(
                cfg, ecap=_round_up(int(ne * 5 // 4) + 4096, 4096))
            self._step_fn = None
            tmpl, num_edges = self._template_jit(
                cfg.vcap, cfg.fcap, cfg.ecap,
                (mc.verts.shape[0], mc.faces.shape[0]))(
                    mc.verts, mc.faces, mc.nv, mc.nf)
        if self._shard_repl is not None:
            # keep the template replicated over the mesh — the discretize
            # program runs unsharded, and a device-0-committed template would
            # force a reshard (or a recompile) of the step every remesh
            tmpl = jax.device_put(tmpl, self._shard_repl)
        self.state = self.state._replace(tmp=tmpl)
        self.remesh_time = 1.0 + np.floor(self.remesh_time)
        return nv, nf

    def _update_template_caps(self, nv: int, nf: int) -> "StageStatic":
        """Remesh-tick capacity policy (grow AND shrink, both rejit)."""
        cfg = self.stage_cfg
        self._nv_recent = (getattr(self, "_nv_recent", []) + [(nv, nf)])[-3:]
        if nv > cfg.vcap or nf > cfg.fcap:
            # grow capacities (forces a re-jit of the step).  Grow with 25%
            # headroom, NOT exact-fit: the template inflates steadily during
            # coarse training and a re-jit costs ~minutes through the remote-
            # compile tunnel, so exact-fit growth re-jitted every +4096 verts
            # (measured: 5 rejits in one coarse stage).  Geometric slack makes
            # rejit count logarithmic in template growth; padded-lane waste is
            # a few MB.
            nv_t = max(int(nv * 1.25), cfg.vcap)
            nf_t = max(int(nf * 1.25), cfg.fcap)
            self.stage_cfg = cfg = dataclass_replace(
                cfg, vcap=_round_up(nv_t, 4096),
                fcap=_round_up(nf_t, 4096),
                ecap=_round_up(3 * nf_t // 2 + 4096, 4096))
            self._step_fn = None
        elif len(self._nv_recent) == 3:
            # SHRINK when the template has settled far below capacity.  The
            # vert-batched paths (deformer over the tiled template, splat
            # binning+kernels) do padded work proportional to vcap, and a
            # transient early-stage inflation sticks forever under a
            # grow-only policy: the round-3 acceptance run finished fine
            # with nv=72830 under vcap=217088 — 3x padded work for 94% of
            # all steps.  Hysteresis: shrink only when the 25%-headroom
            # target (over the MAX of the last 3 remeshes, so one noisy dip
            # can't trigger) is <= half the current cap; after a shrink,
            # growth re-triggers only past +60%, so no thrash.
            nv_hi = max(v for v, _ in self._nv_recent)
            nf_hi = max(f for _, f in self._nv_recent)
            nv_t = _round_up(max(int(nv_hi * 1.25), 4096), 4096)
            nf_t = _round_up(max(int(nf_hi * 1.25), 4096), 4096)
            if nv_t <= cfg.vcap // 2 and nf_t <= cfg.fcap // 2:
                print(f"shrinking template caps vcap {cfg.vcap} -> {nv_t}, "
                      f"fcap {cfg.fcap} -> {nf_t} (settled at nv={nv_hi}, "
                      f"nf={nf_hi})", flush=True)
                self.stage_cfg = cfg = dataclass_replace(
                    cfg, vcap=nv_t, fcap=nf_t,
                    ecap=_round_up(3 * int(nf_hi * 1.25) // 2 + 4096, 4096))
                self._step_fn = None
        return cfg

    def _check_splat_cap(self):
        """Remesh-tick watermark: if any step since the last remesh dropped
        splat candidates, grow the stage's splat cell cap to 1.25x the
        measured max cell occupancy (rounded to the kernel's lane multiple)
        and force a rejit.  Remesh is already a host sync + natural rejit
        boundary, so the repair costs nothing extra; decimation persists for
        at most remesh_intersect steps.  Mirrors the vcap/fcap growth policy
        above and closes the acceptance-run OVERFLOW finding (VERDICT r2 #2).
        """
        info = self.info
        if not info or "splat_overflow" not in info:
            return
        if int(info["splat_overflow"]) <= 0:
            return
        cfg = self.stage_cfg
        need = int(info.get("splat_max_cell", 0))
        new_cap = min(cfg.splat_cap_max,
                      max(-(-int(need * 1.25) // 64) * 64, cfg.splat_cap))
        n_act = int(info.get("splat_active", 0))
        # Grow the active-cell list ONLY when cells were actually dropped
        # (n_act saturated the capacity).  Demanding 25% headroom over the
        # measured count unconditionally caused a ~180 s recompile for a 5%
        # bump (2560 -> 2688 with only 2109 active) in the round-3 acceptance
        # run — overflow from certified-saturated candidate drops (cap at
        # splat_cap_max) must not trigger cell growth.
        if n_act >= cfg.splat_cells:
            new_cells = min(65536, max(-(-int(n_act * 1.25) // 64) * 64,
                                       -(-int(cfg.splat_cells * 5 // 4)
                                         // 64) * 64))
        else:
            new_cells = cfg.splat_cells
        if new_cap > cfg.splat_cap or new_cells > cfg.splat_cells:
            print(f"growing splat caps cell_cap {cfg.splat_cap} -> "
                  f"{new_cap} (max occupancy {need}), active_cells "
                  f"{cfg.splat_cells} -> {new_cells} (active {n_act})",
                  flush=True)
            self.stage_cfg = dataclass_replace(cfg, splat_cap=new_cap,
                                               splat_cells=new_cells)
            self._step_fn = None
        elif need > cfg.splat_cap and cfg.splat_cap >= cfg.splat_cap_max:
            # saturated at the certified policy cap: candidate drops persist
            # for the rest of the stage.  Surface it once per stage (not per
            # remesh) so a density regression is visible without spamming —
            # the per-step OVERFLOW counter still reports the magnitude.
            if not getattr(self, "_splat_sat_warned", False):
                print(f"WARNING: splat cell cap saturated at splat_cap_max="
                      f"{cfg.splat_cap_max} (max occupancy {need}); dropping "
                      f"~{int(info['splat_overflow'])} candidates/step under "
                      f"the even-stride policy for the rest of the stage",
                      flush=True)
                self._splat_sat_warned = True

    def _check_splat_cells_shrink(self):
        """SHRINK the active-cell capacity when the measured active count has
        settled far below it — the splat kernels' work, DMA and (especially)
        backward gathers scale with the CAPACITY, not the true count, and the
        4096 default cost ~12% whole-step throughput at 512² where the
        silhouette only touches ~1k cells (the r2->r3 bench regression,
        bisected to the compaction commit).  Same hysteresis scheme as
        _update_template_caps: 25% headroom over the max of the last 3
        remesh ticks, shrink only when that target is <= half the capacity.
        """
        info = self.info
        if not info or "splat_active" not in info:
            return
        self._act_recent = (getattr(self, "_act_recent", [])
                            + [int(info["splat_active"])])[-3:]
        cfg = self.stage_cfg
        if len(self._act_recent) < 3:
            return
        tgt = max(64, -(-int(max(self._act_recent) * 1.25) // 64) * 64)
        if tgt <= cfg.splat_cells // 2:
            print(f"shrinking splat active_cells {cfg.splat_cells} -> {tgt} "
                  f"(settled at {max(self._act_recent)})", flush=True)
            self.stage_cfg = dataclass_replace(cfg, splat_cells=tgt)
            self._step_fn = None
            self._act_recent = []

    def _stage_footprint(self, res) -> int:
        """Static raster footprint from the MC voxel size: triangles from MC
        never exceed one voxel, so the projected bbox is bounded by
        voxel_diag * f / z_min (host estimate, fixed per stage)."""
        spacing, _ = grid_world_coords(tuple(res[-1]), self.b_min, self.b_max)
        cam = self._host_camera()
        z_min = max(float(np.asarray(cam.T)[2]) - float(self.b_max[2]), 0.3)
        vox = float(np.max(np.asarray(spacing)))
        return int(np.clip(np.ceil(
            2.0 * vox * float(np.asarray(cam.focal)[0]) / z_min) + 2, 6, 48))

    # -- stages -------------------------------------------------------------
    def set_stage(self, name: str):
        """Parity: utils.set_hierarchical_config + update_hierarchical_config."""
        conf = self.conf
        tr = conf.get_config(f"train.{name}.point_render")
        wconf = conf.get_config(f"loss_{name}")
        lw = LossWeights(
            color_weight=wconf.get_float("color_weight"),
            normal_weight=wconf.get_float("normal_weight"),
            weighted_normal=wconf.get_bool("weighted_normal"),
            grad_weight=wconf.get_float("grad_weight"),
            offset_weight=wconf.get_float("offset_weight"),
            def_regu_weight=wconf.get_float("def_regu.weight"),
            def_regu_c=wconf.get_float("def_regu.c"),
            dct_weight=wconf.get_float("dct_weight"),
            pc_weight=wconf.get_float("pc_weight.weight"),
            laplacian_weight=wconf.get_float("pc_weight.laplacian_weight"),
            edge_weight=wconf.get_float("pc_weight.edge_weight"),
            norm_weight=wconf.get_float("pc_weight.norm_weight"),
            def_consistent_weight=wconf.get_float(
                "pc_weight.def_consistent.weight"),
            def_consistent_c=wconf.get_float("pc_weight.def_consistent.c"),
            sample_pix_num=(wconf.get_int("sample_pix_num")
                            if "sample_pix_num" in wconf else 0),
        )
        res = tuple(tuple(r) for r in self.resolutions[name])
        fp = self._stage_footprint(res)

        occ = conf.get_config("train.opt_camera")
        prev = self.stage_cfg
        self.stage_cfg = StageStatic(
            name=name,
            N=tr.get_int("batch_size"),
            H=self.dataset.H, W=self.dataset.W,
            sample_pix=conf.get_int("train.sample_pix_num"),
            radius=tr.get_float("radius"),
            remesh_intersect=tr.get_int("remesh_intersect"),
            vcap=prev.vcap if prev else 16384,
            fcap=prev.fcap if prev else 32768,
            ecap=prev.ecap if prev else 49152,
            # SRTPU_SPLAT_CAP0 seeds the first stage's cap with a known
            # scene density (e.g. a previous run's grown value) so the run
            # skips the cap-64 compile + watermark-growth rejit (~10 min
            # through the remote-compile tunnel at production scale)
            splat_cap=prev.splat_cap if prev
            else _env_lanes("SRTPU_SPLAT_CAP0", 64),
            splat_cells=prev.splat_cells if prev
            else _env_lanes("SRTPU_SPLAT_CELLS0", 4096),
            splat_cap_max=prev.splat_cap_max if prev
            else _env_lanes("SRTPU_SPLAT_CAP_MAX", 256),
            mc_active_cap=65536,
            resolutions=res,
            sweep_caps=tuple(default_caps(res)),
            raster_footprint=fp,
            weights=lw,
            window=self.window,
            dct_k=min(10, max(1, self.window // 3)),
            opt_pose=conf.get_bool("train.opt_pose"),
            opt_trans=conf.get_bool("train.opt_trans"),
            opt_cam_focal=occ.get_bool("focal_length"),
            opt_cam_principal=occ.get_bool("princeple_points"),
            opt_cam_quat=occ.get_bool("quat"),
            opt_cam_T=occ.get_bool("T"),
            has_normals=self.dataset.has_normals,
        )
        self._step_fn = None
        self.forward_time = 0
        self._nv_recent = []  # per-stage shrink watermark history
        self._splat_sat_warned = False  # re-warn once per stage

    def set_mesh(self, mesh):
        """Train data-parallel over a 1-D device mesh ("dp").

        The production layout validated by parallel/dryrun.trainer_step_on_mesh:
        image tensors sharded over their H axis with P(None, "dp") —
        rasterization, splatting, and the per-pixel losses are row-local so
        GSPMD splits them cleanly and inserts the gradient all-reduces —
        while params/bank/template stay replicated (MLPs are 512-wide,
        SURVEY §2.4: tensor parallelism is pointless at this scale).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh
        self._shard_img = NamedSharding(mesh, P(None, "dp"))
        self._shard_repl = NamedSharding(mesh, P())
        self.state = jax.device_put(self.state, self._shard_repl)
        if self._frame_cache is not None:
            self._frame_cache = {
                k: jax.device_put(v, NamedSharding(mesh, P(None, "dp")))
                for k, v in self._frame_cache.items()}

    def _put_img(self, x):
        x = jnp.asarray(x)
        return (x if self._shard_img is None
                else jax.device_put(x, self._shard_img))

    def override_stage(self, **kw):
        """Override static stage fields (tests/bench shrink sample counts and
        capacities; production leaves config.conf values untouched)."""
        self.stage_cfg = dataclass_replace(self.stage_cfg, **kw)
        self._step_fn = None

    def _get_step_fn(self):
        if self._step_fn is None:
            cfg = self.stage_cfg
            self.step_rejits += 1
            # one visible line per step-fn build: the acceptance log must show
            # how often the stage rejits (headroom-policy verification —
            # target is <=2 per stage after the first compile)
            print(f"[rejit #{self.step_rejits}] step fn for stage "
                  f"{cfg.name}: vcap={cfg.vcap} fcap={cfg.fcap} "
                  f"ecap={cfg.ecap} splat_cap={cfg.splat_cap}", flush=True)
            self._step_fn = make_train_step(
                self.sdf_net, self.trans_net, self.render_net, self.deformer,
                self.stage_cfg, self.dctnull, self.ang_thresh, self.optimizer)
        return self._step_fn

    # -- debug artifacts (parity: save_debug, model/network.py:374-447) -----
    def save_debug(self, debug_root: str, fids, batch):
        """Dump template + per-frame deformed meshes + splat masks as files.
        Host-side, called at remesh ticks by the CLI when draw is enabled."""
        import jax
        os.makedirs(debug_root, exist_ok=True)
        tmp = self.state.tmp
        vv = np.asarray(tmp.vert_valid)
        fv = np.asarray(tmp.face_valid)
        verts = np.asarray(tmp.verts)[vv]
        faces = np.asarray(tmp.faces)[fv]
        _export_mesh(osp.join(debug_root, "tmp.ply"), verts, faces)
        cfg = self.stage_cfg
        bank = self.state.bank
        poses = bank["poses"][jnp.asarray(fids)]
        trans = bank["trans"][jnp.asarray(fids)]
        dcond = bank["cond_deformer"][jnp.asarray(fids)]
        N = len(fids)
        flat = jnp.tile(tmp.verts, (N, 1))
        binds = jnp.repeat(jnp.arange(N), tmp.verts.shape[0])
        def_flat, off = deformer_apply(
            self.state.params["trans"], self.deformer, flat, binds, dcond,
            poses, trans, 1.0)
        dv = np.asarray(def_flat).reshape(N, -1, 3)
        offs = np.asarray(off).reshape(N, -1, 3)
        for i in range(N):
            _export_mesh(osp.join(debug_root, f"def_{i}.ply"), dv[i][vv],
                         faces)
            _export_mesh(osp.join(debug_root, f"def1_{i}.ply"),
                         (np.asarray(tmp.verts) + offs[i])[vv], faces)
        try:
            import cv2
            cam = self._host_camera()
            for i in range(N):
                m = np.asarray(splat_mask(
                    cam, jnp.asarray(dv[i]), tmp.vert_valid, cfg.radius,
                    cell_cap=cfg.splat_cap))
                cv2.imwrite(osp.join(debug_root, f"m{i}.png"),
                            (np.clip(m, 0, 1) * 255).astype(np.uint8))
                if batch is not None:
                    cv2.imwrite(osp.join(debug_root, f"gm{i}.png"),
                                (batch["mask"][i] * 255).astype(np.uint8))
                # rgb + normal debug renders (network.py:374-447 dumps these
                # too): Phong shading of the deformed mesh and a world-space
                # face-normal visualization of the same fragments
                from ..ops.rasterize import rasterize_mesh
                from ..render.shading import phong_shade
                from ..render.camera import cam_pos
                from ..utils import meshops
                dvi = jnp.asarray(dv[i])
                frags = rasterize_mesh(cam, dvi, tmp.faces, tmp.face_valid,
                                       cfg.raster_footprint)
                rgb, hit = phong_shade(cam, dvi, tmp.faces, tmp.face_valid,
                                       frags, cam_pos(cam))
                fn = meshops.face_normals(dvi, tmp.faces)
                nimg = jnp.where(
                    (frags.pix_to_face >= 0)[..., None],
                    fn[jnp.maximum(frags.pix_to_face, 0)] * 0.5 + 0.5, 1.0)
                rgb, nimg = jax.device_get((rgb, nimg))
                cv2.imwrite(osp.join(debug_root, f"rgb{i}.png"),
                            (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
                cv2.imwrite(osp.join(debug_root, f"n{i}.png"),
                            (np.clip(nimg, 0, 1) * 255).astype(np.uint8))
        except ImportError:
            pass

    # -- device-resident frame cache ----------------------------------------
    def preload_frames(self, max_bytes: int = 9 << 30,
                       chunk: int = 16, verbose: bool = True) -> bool:
        """Upload the WHOLE dataset (uint8 frames) to device memory once.

        TPU-first data path: HBM holds every decoded frame; each step then
        gathers its batch on device — zero per-step host->device traffic.
        (The reference re-collates and re-uploads every DataLoader batch;
        at 1080p that is ~10 MB/step.)  Returns False (host path kept) when
        the estimate exceeds max_bytes.
        """
        ds = self.dataset
        F, H, W = ds.frame_num, ds.H, ds.W
        per = H * W * (3 + 1 + (3 if ds.has_normals else 0))
        if F * per > max_bytes:
            return False
        # Preallocate the full buffers once and write chunks in place
        # (donated dynamic_update_slice): peak HBM stays ~1x dataset size +
        # one chunk, so the max_bytes guard budget is honest.  The previous
        # list+concatenate formulation peaked at ~2x.
        upd = jax.jit(
            lambda buf, c, s: jax.lax.dynamic_update_slice(
                buf, c, (s,) + (0,) * (buf.ndim - 1)),
            donate_argnums=0)
        cache = {"img": jnp.zeros((F, H, W, 3), jnp.uint8),
                 "mask": jnp.zeros((F, H, W), jnp.uint8)}
        if ds.has_normals:
            cache["normal"] = jnp.zeros((F, H, W, 3), jnp.uint8)
        for s in range(0, F, chunk):
            ids = np.arange(s, min(s + chunk, F))
            raw = ds.batch_raw(ids)
            cache["img"] = upd(cache["img"], jnp.asarray(raw["img"]), s)
            cache["mask"] = upd(cache["mask"],
                                jnp.asarray(raw["mask"].astype(np.uint8)), s)
            if ds.has_normals and "normal" in raw:
                cache["normal"] = upd(cache["normal"],
                                      jnp.asarray(raw["normal"]), s)
            if verbose and (s // chunk) % 8 == 0:
                print(f"  preload {s + len(ids)}/{F} frames", flush=True)
        self._frame_cache = cache
        if self._take_fn is None:
            self._take_fn = jax.jit(lambda stack, ids: stack[ids])
        return True

    def _batch_from_cache(self, fids) -> dict:
        ids = jnp.asarray(np.asarray(fids), jnp.int32)
        out = {k: self._take_fn(v, ids) for k, v in self._frame_cache.items()}
        return out

    # -- scheduled (device-resident) epoch path -----------------------------
    def begin_scheduled_epoch(self, groups: np.ndarray, lr: float, key):
        """Upload one epoch's shuffled fid batches (G, N) + lr + RNG key to
        the device so each step is a single dispatch (see make_fused).
        Requires the device frame cache; not available on a sharded mesh
        (the mesh path device_puts images with an explicit sharding)."""
        assert self._frame_cache is not None, "preload_frames first"
        assert getattr(self, "_mesh", None) is None, \
            "scheduled epochs are single-device; use train_step on a mesh"
        cfg = self.stage_cfg
        groups = np.asarray(groups, np.int32)
        assert groups.ndim == 2 and groups.shape[1] == cfg.N, groups.shape
        self._sched_host = groups
        self._sched_dev = jnp.asarray(groups)
        if (getattr(self, "_win_dev", None) is None
                or self._win_dev.shape[1] != cfg.window):
            wt, _ = self.dataset.window_indices(
                np.arange(self.dataset.frame_num), cfg.window)
            self._win_dev = jnp.asarray(wt.astype(np.int32))
        self._lr_dev = jnp.asarray(lr, jnp.float32)
        # per-step deformer-ratio schedule precomputed on the HOST with the
        # exact reference formula (opt_times/2500+0.5, train.py:165) — an
        # on-device f32 recomputation rounds differently by ~1 ulp, which is
        # enough to break bit-parity with the plain path
        G = groups.shape[0]
        self._rdef_dev = jnp.asarray(
            np.asarray([(self.opt_times + i) / 2500.0 + 0.5
                        for i in range(G)], np.float32))
        self._key_ep = key
        self._di_dev = jnp.asarray(0, jnp.int32)

    def train_step_scheduled(self):
        """One step of the scheduled epoch: a single jitted dispatch; the
        info dict stays on device (fetch it one-step-delayed)."""
        cfg = self.stage_cfg
        if self.forward_time % cfg.remesh_intersect == 0:
            self.remesh(1.0)
        fused = self._get_fused_fn()
        self.state, self._di_dev, info = fused(
            self.state, self._di_dev, self._frame_cache, self._sched_dev,
            self._win_dev, self._lr_dev, self._rdef_dev, self._key_ep)
        self.remesh_time = (np.floor(self.remesh_time)
                            + (self.forward_time % cfg.remesh_intersect)
                            / cfg.remesh_intersect)
        self.forward_time += 1
        self.opt_times += 1
        info["remesh"] = self.remesh_time
        self.info = info
        return info

    def _get_fused_fn(self):
        step = self._get_step_fn()
        if (getattr(self, "_fused_fn", None) is None
                or self._fused_fn_src is not step):
            has_n = "normal" in (self._frame_cache or {})
            self._fused_fn = step.make_fused(has_n)
            self._fused_fn_src = step
        return self._fused_fn

    # -- one optimization step ---------------------------------------------
    def train_step(self, fids: np.ndarray, batch: dict, lr: float, key,
                   sync: bool = True):
        """One optimizer step.  sync=False leaves the info dict as device
        arrays so the next step can be dispatched while this one still
        computes (hides dispatch + transfer latency); the caller converts
        with float() when it actually prints."""
        return self._train_step_impl(fids, batch, lr, key, sync)

    def _train_step_impl(self, fids, batch, lr, key, sync):
        cfg = self.stage_cfg
        if self.forward_time % cfg.remesh_intersect == 0:
            self.remesh(1.0)
        step = self._get_step_fn()
        # traced (not static) so the deformer-ratio annealing never re-jits
        ratios = jnp.asarray([1.0, self.opt_times / 2500.0 + 0.5, 1.0],
                             jnp.float32)
        windows, _ = self.dataset.window_indices(fids, cfg.window)
        if self._frame_cache is not None:
            batch = self._batch_from_cache(fids)  # device gather, no H2D
        if "normal" in batch:
            gtNs = self._put_img(batch["normal"])
        else:
            # device-resident zero normals, uploaded once (not 42 MB/step)
            if getattr(self, "_gtNs_zero", None) is None or \
                    self._gtNs_zero.shape != (cfg.N, cfg.H, cfg.W, 3):
                self._gtNs_zero = self._put_img(
                    jnp.zeros((cfg.N, cfg.H, cfg.W, 3)))
            gtNs = self._gtNs_zero
        self.state, info = step(
            self.state, self._put_img(batch["img"]),
            self._put_img(batch["mask"]),
            gtNs, jnp.asarray(fids, jnp.int32), jnp.asarray(windows, jnp.int32),
            ratios, jnp.asarray(lr, jnp.float32), key)
        self.remesh_time = (np.floor(self.remesh_time)
                            + (self.forward_time % cfg.remesh_intersect)
                            / cfg.remesh_intersect)
        self.forward_time += 1
        self.opt_times += 1
        if sync:
            # one batched device_get (async copies + single sync), not ~15
            # serial per-scalar round-trips through the tunnel
            info = {k: float(v) for k, v in jax.device_get(info).items()}
        self.info = info
        self.info["remesh"] = self.remesh_time
        return self.info


def dataclass_replace(dc, **kw):
    import dataclasses
    return dataclasses.replace(dc, **kw)


def _export_mesh(path, verts, faces):
    from ..utils.meshops import write_mesh
    write_mesh(path, verts, faces)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _env_lanes(name: str, default: int) -> int:
    """Integer env override rounded up to the splat kernels' 64-lane
    multiple — a raw value like 1000 would otherwise fail the kernel's
    cap % 64 assert at jit time, deep inside the first compile."""
    raw = int(os.environ.get(name, default))
    val = max(64, _round_up(raw, 64))
    if val != raw:
        print(f"{name}={raw} rounded up to the 64-lane multiple {val}",
              flush=True)
    return val


# ---------------------------------------------------------------------------
# Synthetic end-to-end (tests + bench)
# ---------------------------------------------------------------------------

_DEFAULT_TEST_RES = [(9, 9, 9), (17, 17, 17), (33, 33, 33)]


def build_synthetic_trainer(tmp_root: str, n_frames: int = 8, H: int = 96,
                            W: int = 96, resolutions=None,
                            smpl_verts: int = 400,
                            conf_name: str = "config.conf"):
    """A full trainer on a synthetic scene + toy SMPL (no assets needed)."""
    from ..data import SceneDataset, make_synthetic_scene
    from ..models.smpl import toy_smpl_model
    from ..config import parse_hocon

    scene = osp.join(tmp_root, "scene")
    if not osp.isdir(osp.join(scene, "imgs")):
        os.makedirs(scene, exist_ok=True)
        make_synthetic_scene(scene, n_frames=n_frames, H=H, W=W)
    ds = SceneDataset(scene, conds_lens={"deformer": 128, "renderer": 256})
    smpl = toy_smpl_model(n_verts=smpl_verts)
    conf = parse_hocon(open(osp.join(
        osp.dirname(__file__), "..", "..", "configs", conf_name)).read())
    res = resolutions or {
        "coarse": _DEFAULT_TEST_RES, "medium": _DEFAULT_TEST_RES,
        "fine": _DEFAULT_TEST_RES}
    tr = Trainer(ds, smpl, conf, res, skinner_res=(17, 29, 9))
    return tr, ds


def build_synthetic_bench_step(sample_rays: int = 6144, H: int = 512,
                               W: int = 512):
    """The real jitted train step at production-ish scale for bench.py."""
    import tempfile
    root = osp.join(tempfile.gettempdir(), f"srtpu_bench_{H}")
    os.makedirs(root, exist_ok=True)
    tr, ds = build_synthetic_trainer(root, n_frames=32, H=H, W=W,
                                     resolutions={
                                         "coarse": [(17, 17, 17),
                                                    (33, 33, 33),
                                                    (65, 65, 65)],
                                         "medium": [(17, 17, 17),
                                                    (33, 33, 33),
                                                    (65, 65, 65)],
                                         "fine": [(17, 17, 17),
                                                  (33, 33, 33),
                                                  (65, 65, 65)]})
    tr.set_stage("fine")
    tr.remesh(1.0)
    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    fids = np.arange(cfg.N)
    batch = ds.batch(fids)
    windows, _ = ds.window_indices(fids, cfg.window)
    args = (tr.state, jnp.asarray(batch["img"]), jnp.asarray(batch["mask"]),
            jnp.zeros((cfg.N, cfg.H, cfg.W, 3)), jnp.asarray(fids, jnp.int32),
            jnp.asarray(windows, jnp.int32),
            jnp.asarray([1.0, 0.5, 1.0], jnp.float32),
            jnp.asarray(1e-4, jnp.float32), jax.random.PRNGKey(0))

    def run(*a):
        state, info = step(*a)
        return info["loss"]

    run.step = step
    run.trainer = tr
    return run, args


def bench_throughput(sample_rays: int = 6144, H: int = 512, W: int = 512,
                     iters: int = 30, n_batches: int = 8):
    """Honest steady-state throughput for bench.py.

    Unlike a fixed-args loop this measures a real optimization trajectory:
    the optimizer state threads through, every iteration feeds a DIFFERENT
    frame batch (rotating through the synthetic scene) with its own RNG key,
    and the warm remesh cost is measured and amortized at the stage's
    remesh_intersect cadence — the number is what a user would see per
    optimizer step, not a best-case replay of one batch.
    """
    import tempfile
    root = osp.join(tempfile.gettempdir(), f"srtpu_bench_{H}")
    os.makedirs(root, exist_ok=True)
    res = [(17, 17, 17), (33, 33, 33), (65, 65, 65)]
    tr, ds = build_synthetic_trainer(
        root, n_frames=32, H=H, W=W,
        resolutions={s: res for s in ("coarse", "medium", "fine")})
    tr.set_stage("fine")
    tr.remesh(1.0)
    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    ratios = jnp.asarray([1.0, 0.5, 1.0], jnp.float32)
    lr = jnp.asarray(1e-4, jnp.float32)

    batches = []
    for i in range(n_batches):
        fids = (np.arange(cfg.N) + i * cfg.N) % ds.frame_num
        batch = ds.batch(fids)
        windows, _ = ds.window_indices(fids, cfg.window)
        batches.append((jnp.asarray(batch["img"]),
                        jnp.asarray(batch["mask"]),
                        jnp.zeros((cfg.N, cfg.H, cfg.W, 3)),
                        jnp.asarray(fids, jnp.int32),
                        jnp.asarray(windows, jnp.int32),
                        jax.random.PRNGKey(1000 + i)))

    def fetch(x):
        return float(np.asarray(x))  # value fetch = the only tunnel sync

    state = tr.state
    gtCs, gtMs, gtNs, fids, windows, key = batches[0]
    state, info = step(state, gtCs, gtMs, gtNs, fids, windows, ratios, lr,
                       key)
    fetch(info["loss"])

    # Settle the capacity watermarks to the fixed point a real run's remesh
    # ticks converge to: the probe step above measured the true splat
    # occupancy + active-cell coverage, so apply the grow/shrink policies
    # directly and re-specialize once.  (Training THROUGH several remesh
    # ticks here instead collapses the fresh synthetic SDF — the fine stage
    # on an untrained scene has no business remeshing every step; the
    # coarse->medium schedule exists for a reason.)
    tr.info = {k: int(v) if "splat" in k else v for k, v in info.items()}
    tr._check_splat_cap()
    tr._act_recent = [int(info["splat_active"])] * 3
    tr._check_splat_cells_shrink()
    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    gtCs, gtMs, gtNs, fids, windows, key = batches[1]
    state, info = step(state, gtCs, gtMs, gtNs, fids, windows, ratios, lr,
                       key)
    fetch(info["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        gtCs, gtMs, gtNs, fids, windows, key = batches[i % n_batches]
        state, info = step(state, gtCs, gtMs, gtNs, fids, windows, ratios,
                           lr, key)
    fetch(info["loss"])
    step_s = (time.perf_counter() - t0) / iters

    # warm remesh at the trained state, amortized at the stage cadence
    tr.state = state
    t0 = time.perf_counter()
    tr.remesh(1.0)
    remesh_s = time.perf_counter() - t0
    eff_s = step_s + remesh_s / max(cfg.remesh_intersect, 1)
    return 1.0 / eff_s, {"step_s": step_s, "remesh_s": remesh_s,
                         "remesh_intersect": cfg.remesh_intersect}
