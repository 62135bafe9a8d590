"""Realistic-fidelity synthetic subject (the acceptance-run scene).

`make_synthetic_scene` (dataset.py) draws disk masks — enough to smoke the
optimizer, useless for judging reconstruction quality.  This module renders a
PeopleSnapshot-style subject at real fidelity from the watertight
`synthetic_body_model` (6890 verts, SMPL schema): a self-rotating clothed
person, Lambert-shaded with a procedural canonical-space albedo (so the IDR
color loss has real signal), hard silhouette masks from our own mesh
rasterizer, and PIFuHD-convention camera-space normal maps.

Ground truth built in: the `smpl_rec.npz` poses describe the UNDERLYING body
(what a pose estimator would output) while the rendered surface wears a
smooth clothing displacement field on top — exactly the residual the
MLP-translator deformer exists to learn (reference model/Deformer.py:43-76).
The clothed template mesh is saved as `gt_mesh.npz` for Chamfer evaluation.

Layout written (what SceneDataset consumes, dataset/dataset.py:41-62 of the
reference): imgs/%d.png masks/%d.png normals/%d.png camera.npz smpl_rec.npz.
"""
from __future__ import annotations

import os
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def subdiv_topology(faces: np.ndarray, n_verts: int):
    """One midpoint-subdivision level: returns (edges (E,2) int, faces4
    (4F,3) int).  New vertex i of the level sits at the midpoint of
    edges[i] and gets index n_verts+i; the SURFACE IS UNCHANGED (planar
    split) — this exists purely to bound projected-triangle extent for
    rasterization.
    """
    F = faces.shape[0]
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    uniq, inv = np.unique(np.sort(e, 1), axis=0, return_inverse=True)
    V_off = n_verts
    m01, m12, m20 = (inv[:F] + V_off, inv[F:2 * F] + V_off,
                     inv[2 * F:] + V_off)
    v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
    faces4 = np.concatenate([
        np.stack([v0, m01, m20], 1), np.stack([v1, m12, m01], 1),
        np.stack([v2, m20, m12], 1), np.stack([m01, m12, m20], 1)])
    return uniq.astype(np.int32), faces4.astype(np.int32)


def clothing_offsets(verts: np.ndarray, normals: np.ndarray,
                     amp: float = 0.012, seed: int = 0) -> np.ndarray:
    """Smooth outward displacement field: base inflation + low-frequency
    wrinkle modes, tapered to zero on head/hands/feet (cloth, not skin)."""
    rng = np.random.default_rng(seed)
    y = verts[:, 1]
    # torso/limb taper: 1 inside the clothed band, 0 at extremities
    band = np.clip((y + 0.95) / 0.15, 0.0, 1.0) * np.clip((0.45 - y) / 0.15,
                                                          0.0, 1.0)
    wave = np.zeros(len(verts))
    for _ in range(3):
        f = rng.normal(0, 4.0, 3)
        ph = rng.uniform(0, 2 * np.pi)
        wave += np.sin(verts @ f + ph)
    d = amp * band * (1.0 + 0.35 * wave)
    return (d[:, None] * normals).astype(np.float32)


def make_synthetic_subject(root: str, n_frames: int = 450, H: int = 1080,
                           W: int = 1080, n_verts: int = 6890,
                           body_res: int = 72, seed: int = 0,
                           write_normals: bool = True, verbose: bool = True):
    """Render and write the subject; returns the scene root.

    The render runs on the default JAX device (one jitted pass per frame);
    with a TPU attached, 450 frames at 1080^2 take a few minutes.
    """
    import json

    import jax
    import jax.numpy as jnp

    from ..models.synthetic_body import synthetic_body_model
    from ..models.smpl import smpl_forward, smpl_tmp_apose, SMPLModel
    from ..render.camera import make_camera, cam_pos
    from ..ops.rasterize import rasterize_mesh
    from ..utils.meshops import vertex_normals
    from ..utils.math import quat2mat

    body = synthetic_body_model(n_verts=n_verts, res=body_res, seed=seed)
    verts0 = np.asarray(body.v_template)
    faces = np.asarray(body.faces)
    fv = jnp.ones((faces.shape[0],), bool)
    vn0 = np.asarray(vertex_normals(jnp.asarray(verts0), jnp.asarray(faces),
                                    fv))
    cloth = clothing_offsets(verts0, vn0, seed=seed)
    clothed = SMPLModel(
        v_template=jnp.asarray(verts0 + cloth), shapedirs=body.shapedirs,
        posedirs=body.posedirs, j_regressor=body.j_regressor,
        weights=body.weights, faces=body.faces, parents=body.parents)

    # -- per-frame SMPL params: self-rotation + limb swing + sway -----------
    rng = np.random.default_rng(seed + 7)
    t = np.linspace(0.0, 1.0, n_frames, endpoint=False)
    poses = np.tile(smpl_tmp_apose(1)[None], (n_frames, 1, 1)).astype(
        np.float32)
    poses[:, 0, 1] = 2.0 * np.pi * t                      # full turn
    swing = 0.25 * np.sin(2 * np.pi * 6 * t)
    poses[:, 16, 2] += 0.3 * swing                         # shoulders
    poses[:, 17, 2] -= 0.3 * swing
    poses[:, 18, 1] += 0.4 * swing                         # elbows
    poses[:, 19, 1] -= 0.4 * swing
    poses[:, 1, 0] += 0.08 * np.sin(2 * np.pi * 3 * t)     # hips
    poses[:, 2, 0] -= 0.08 * np.sin(2 * np.pi * 3 * t)
    poses += rng.normal(0, 0.01, poses.shape).astype(np.float32)  # est. noise
    trans = np.zeros((n_frames, 3), np.float32)
    trans[:, 0] = 0.03 * np.sin(2 * np.pi * 2 * t)
    trans[:, 1] = 0.02 * np.sin(2 * np.pi * 5 * t)

    # -- camera (PeopleSnapshot-like) ---------------------------------------
    fx = fy = float(W)
    cx, cy = W / 2.0, H / 2.0
    quat = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    T = np.array([0.0, 0.18, 2.6], np.float32)  # center the body vertically
    cam = make_camera(np.array([fx, fy], np.float32),
                      np.array([cx, cy], np.float32), quat, T, H, W)
    R = np.asarray(quat2mat(jnp.asarray(quat)))
    flip = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)

    os.makedirs(osp.join(root, "imgs"), exist_ok=True)
    os.makedirs(osp.join(root, "masks"), exist_ok=True)
    if write_normals:
        os.makedirs(osp.join(root, "normals"), exist_ok=True)

    # The pose trajectory depends on every one of these parameters, so frames
    # from a run with DIFFERENT parameters are inconsistent with the
    # smpl_rec.npz / gt_mesh.npz written below.  Frame-level resume is only
    # allowed when the manifest matches the previous run; otherwise every
    # frame is re-rendered (overwritten), never mixed.
    manifest = {"n_frames": n_frames, "H": H, "W": W, "n_verts": n_verts,
                "body_res": body_res, "seed": seed,
                "write_normals": bool(write_normals),
                "renderer": 2}  # v2 = subdivided + overflow-asserted masks
    mpath = osp.join(root, "subject_manifest.json")
    dpath = osp.join(root, "subject_done.json")
    resume_ok = False
    if osp.isfile(mpath):
        try:
            resume_ok = json.load(open(mpath)) == manifest
        except (ValueError, OSError):
            resume_ok = False
    if not resume_ok and osp.isfile(dpath):
        os.remove(dpath)  # stale done-marker from a different-parameter run
    json.dump(manifest, open(mpath, "w"))
    np.savez(osp.join(root, "camera.npz"), fx=fx, fy=fy, cx=cx, cy=cy,
             quat=quat, T=T)
    # estimator output = the UNDERLYING body's poses (surface wears cloth)
    np.savez(osp.join(root, "smpl_rec.npz"), poses=poses, trans=trans,
             shape=np.zeros(10, np.float32), gender="neutral")
    np.savez(osp.join(root, "gt_mesh.npz"), verts=verts0 + cloth, faces=faces,
             cloth=cloth)

    # procedural canonical albedo: stable across frames -> color loss signal
    light = jnp.asarray([1.5, 2.0, -2.5])
    Rf = jnp.asarray(flip @ R.T)

    # footprint must bound the projected triangle bbox (2x2 cell coverage in
    # the binning): longest template edge x focal / nearest depth, inflated
    # 1.5x for pose deformation.  Round-5 fix: the raw template's longest
    # edge demands footprint 64, which lands on the XLA fallback with 64px
    # cells whose default cell_cap silently DROPPED most candidate faces —
    # every mask was speckled with triangle holes (63% of the true
    # silhouette missing) and the r5 acceptance run trained against them.
    # Now the render-time mesh is midpoint-subdivided (surface unchanged)
    # until the footprint is small, the cell cap is set from a measured
    # bound, and the frame loop ASSERTS zero candidate overflow.
    cv = verts0 + cloth
    z_min = max(float(T[2]) - 1.1, 0.5)

    def _emax(cvv, ff):
        e = np.concatenate([cvv[ff[:, 1]] - cvv[ff[:, 0]],
                            cvv[ff[:, 2]] - cvv[ff[:, 1]],
                            cvv[ff[:, 0]] - cvv[ff[:, 2]]])
        return float(np.linalg.norm(e, axis=-1).max())

    def _foot(em):
        return int(np.clip(np.ceil(1.5 * em * fx / z_min) + 2, 8, 64))

    sub_edges = []              # per-level midpoint edge lists (device)
    faces_r = faces             # render topology (host)
    canon_np = (verts0 + cloth).astype(np.float32)
    n_v = canon_np.shape[0]
    while _foot(_emax(canon_np, faces_r)) > 24 and len(sub_edges) < 4:
        edges, faces_r = subdiv_topology(faces_r, n_v)
        canon_np = np.concatenate(
            [canon_np, 0.5 * (canon_np[edges[:, 0]] + canon_np[edges[:, 1]])])
        n_v = canon_np.shape[0]
        sub_edges.append(jnp.asarray(edges))
    footprint = _foot(_emax(canon_np, faces_r))
    canon = jnp.asarray(canon_np)
    faces_j = jnp.asarray(faces_r)
    fv = jnp.ones((faces_r.shape[0],), bool)

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def render_frame(pose, tr, cell_cap, use_pallas=True):
        v, _, _ = smpl_forward(clothed, jnp.zeros((1, 10)),
                               pose.reshape(1, 24, 3))
        v = v[0] + tr[None]
        for edges in sub_edges:   # refine AFTER posing: pure planar splits
            v = jnp.concatenate(
                [v, 0.5 * (v[edges[:, 0]] + v[edges[:, 1]])])
        frags = rasterize_mesh(cam, v, faces_j, fv, footprint=footprint,
                               cell_cap=cell_cap, use_pallas=use_pallas)
        hit = frags.pix_to_face >= 0
        f = jnp.maximum(frags.pix_to_face, 0)
        tri = faces_j[f]
        b = frags.bary[..., :, None]
        vn = vertex_normals(v, faces_j, fv)
        n = (vn[tri] * b).sum(-2)
        n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6,
                         None)
        p = (v[tri] * b).sum(-2)
        pc = (canon[tri] * b).sum(-2)          # canonical-space position
        albedo = 0.5 + 0.45 * jnp.stack([
            jnp.sin(7.0 * pc[..., 0] + 3.0 * pc[..., 1]),
            jnp.sin(5.0 * pc[..., 1] + 1.0),
            jnp.sin(6.0 * pc[..., 2] + 2.0 * pc[..., 0])], axis=-1)
        l = light - p
        l = l / jnp.clip(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-6,
                         None)
        view = cam_pos(cam) - p
        view = view / jnp.clip(jnp.linalg.norm(view, axis=-1, keepdims=True),
                               1e-6, None)
        nf = jnp.where((n * view).sum(-1, keepdims=True) < 0, -n, n)
        shade = 0.35 + 0.65 * jnp.clip((nf * l).sum(-1), 0.0, 1.0)
        img = jnp.clip(albedo * shade[..., None], 0.0, 1.0)
        img = jnp.where(hit[..., None], img, 0.0)
        img8 = (img * 255.0 + 0.5).astype(jnp.uint8)
        # PIFuHD-convention camera-frame normals: n_cam = flip @ R^T @ n_w
        # (trainer.py decodes with R @ flip, engine/trainer.py:398-399)
        ncam = jnp.einsum("ij,hwj->hwi", Rf, nf)
        n8 = jnp.where(hit[..., None],
                       ((ncam * 0.5 + 0.5) * 255.0 + 0.5), 0.0
                       ).astype(jnp.uint8)
        return img8, hit.astype(jnp.uint8), n8, frags.overflow

    # candidate-capacity ladder: a dropped candidate = a hole in the gt
    # data, so overflow MUST reach zero (use_pallas=False retries use the
    # XLA path whose cell_cap is a real parameter)
    raster_cfg = {"cell_cap": 256, "use_pallas": True}

    def render_checked(pose, tr):
        while True:
            img8, m8, n8, ovf = render_frame(
                pose, tr, raster_cfg["cell_cap"], raster_cfg["use_pallas"])
            if int(ovf) == 0:
                return img8, m8, n8
            if not raster_cfg["use_pallas"] and raster_cfg["cell_cap"] >= 4096:
                raise RuntimeError(
                    f"subject render overflow {int(ovf)} at cell_cap "
                    f"{raster_cfg['cell_cap']}: raise the subdivision depth")
            if raster_cfg["use_pallas"] and footprint <= 16:
                # the pallas kernels' per-cell caps are fixed; an overflow
                # there moves the render to the XLA path, whose cap is real
                raster_cfg["use_pallas"] = False
            else:
                raster_cfg["use_pallas"] = False  # >16 was XLA all along
                raster_cfg["cell_cap"] *= 2
            if verbose:
                print(f"  subject render: overflow {int(ovf)}, retry with "
                      f"{raster_cfg}", flush=True)

    for fid in range(n_frames):
        # resumable: a frame whose files all exist already is skipped, so an
        # interrupted generation restarts where it left off — but only when
        # the manifest above matched (same trajectory)
        have = [osp.join(root, "imgs/%d.png" % fid),
                osp.join(root, "masks/%d.png" % fid)]
        if write_normals:
            have.append(osp.join(root, "normals/%d.png" % fid))
        if resume_ok and all(osp.exists(p) for p in have):
            continue
        img8, m8, n8 = render_checked(jnp.asarray(poses[fid]),
                                      jnp.asarray(trans[fid]))
        img_np = np.asarray(img8)
        cv2.imwrite(osp.join(root, "imgs/%d.png" % fid),
                    img_np[:, :, ::-1])  # dataset reads BGR like cv2 writes
        cv2.imwrite(osp.join(root, "masks/%d.png" % fid),
                    np.asarray(m8) * 255)
        if write_normals:
            cv2.imwrite(osp.join(root, "normals/%d.png" % fid),
                        np.asarray(n8)[:, :, ::-1])  # stored RGB; cv2=BGR
        if verbose and fid % 25 == 0:
            print(f"  subject render {fid}/{n_frames}", flush=True)
    # done-marker AFTER the loop: img/mask/normal for a frame are written in
    # sequence, so "last img exists" does not imply the scene is complete
    json.dump(manifest, open(dpath, "w"))
    return root
