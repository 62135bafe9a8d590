"""UV texture baking from posed renders.

Parity target: texture_mesh_prepare.py + texture_mesh_extract.py of the
reference.  The reference extracts textures inside the VideoAvatar/opendr
environment (visibility render -> Isomapper unwrap -> best-normal 50-slot
aggregation -> median -> Telea inpaint).  Here the whole pipeline is
self-contained: our mesh rasterizer provides visibility + barycentrics, the
texel aggregation is a view-angle-weighted scatter (weight = (n.v)^p sharply
favouring frontal views — a streaming analogue of the reference's
keep-best-50 + median), and holes are Telea-inpainted with cv2.

Robust aggregation (texture_mesh_extract.py:62-153 parity): per texel, the
K=8 best-viewing-angle samples are kept in fixed slots (one candidate per
frame — the frame's own best-weight sample for that texel) and the final
color is the per-channel median over the filled slots, exactly the
reference's keep-best + nan-median scheme at K=8 instead of 50.  A median
over the best-K is robust to specular highlights and misregistered frames
that a weighted mean smears in.  `k_best=1` falls back to the streaming
view-angle-weighted mean (O(texture) memory, fine for clean diffuse input).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..render.camera import Camera, cam_pos
from ..ops.rasterize import rasterize_mesh
from ..utils.meshops import vertex_normals


def load_obj_with_uv(path: str):
    """Minimal OBJ parser for `v`, `vt`, and `f v/vt ...` (the uvmap.obj the
    reference asks the user to produce, texture_mesh_prepare.py:30-41)."""
    verts, uvs, faces_v, faces_vt = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif parts[0] == "f":
                vi, ti = [], []
                for p in parts[1:4]:
                    comps = p.split("/")
                    vi.append(int(comps[0]) - 1)
                    ti.append(int(comps[1]) - 1 if len(comps) > 1 and comps[1]
                              else int(comps[0]) - 1)
                faces_v.append(vi)
                faces_vt.append(ti)
    return (np.asarray(verts, np.float32), np.asarray(uvs, np.float32),
            np.asarray(faces_v, np.int32), np.asarray(faces_vt, np.int32))


def bake_texture(cam: Camera, def_verts_per_frame, images, faces_v, faces_vt,
                 uvs, tex_size: int = 1024, weight_pow: float = 8.0,
                 footprint: int = 64, k_best: int = 8):
    # footprint must bound the projected triangle size; user-decimated UV
    # meshes have much larger triangles than MC output, hence 64 by default.
    """Accumulate a UV texture from posed frames.

    def_verts_per_frame: list of (V,3) np arrays (deformed template verts);
    images: list of (H,W,3) float images in [0,1] (same camera).
    k_best > 1: per-texel median over the k best-viewing-angle frame samples
    (the reference's 50-slot best-normal + nan-median aggregation,
    texture_mesh_extract.py:62-153, at k=8); k_best <= 1: streaming
    view-angle-weighted mean.
    Returns (texture (tex,tex,3) float in [0,1], weight (tex,tex)).
    """
    use_median = k_best > 1
    if use_median:
        slot_w = np.zeros((tex_size, tex_size, k_best), np.float32)
        slot_c = np.zeros((tex_size, tex_size, k_best, 3), np.float32)
    acc = np.zeros((tex_size, tex_size, 3), np.float64)
    wacc = np.zeros((tex_size, tex_size), np.float64)
    faces_v_j = jnp.asarray(faces_v)
    fv_valid = jnp.ones((faces_v.shape[0],), bool)

    @jax.jit
    def frame_pass(verts, img):
        frags = rasterize_mesh(cam, verts, faces_v_j, fv_valid, footprint)
        hit = frags.pix_to_face >= 0
        f = jnp.maximum(frags.pix_to_face, 0)
        vn = vertex_normals(verts, faces_v_j, fv_valid)
        tri = faces_v_j[f]
        n = (vn[tri] * frags.bary[..., :, None]).sum(-2)
        n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6,
                         None)
        p = (verts[tri] * frags.bary[..., :, None]).sum(-2)
        v = cam_pos(cam) - p
        v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6,
                         None)
        # |n.v|: MC meshes are consistently oriented but sign depends on the
        # iso convention; visibility is already z-buffer-resolved
        w = jnp.clip(jnp.abs((n * v).sum(-1)), 0.0, 1.0) ** weight_pow
        w = jnp.where(hit, w, 0.0)
        return f, frags.bary, w

    uvs_np = np.asarray(uvs)
    for verts, img in zip(def_verts_per_frame, images):
        f, bary, w = frame_pass(jnp.asarray(verts), jnp.asarray(img))
        f = np.asarray(f)
        bary = np.asarray(bary)
        w = np.asarray(w)
        sel = w > 0
        fs = f[sel]
        uv_tri = uvs_np[faces_vt[fs]]             # (M,3,2)
        uv = (uv_tri * bary[sel][..., None]).sum(-2)  # (M,2)
        tx = np.clip((uv[:, 0] * (tex_size - 1)).round().astype(np.int64),
                     0, tex_size - 1)
        ty = np.clip(((1.0 - uv[:, 1]) * (tex_size - 1)).round().astype(
            np.int64), 0, tex_size - 1)
        cols = img[sel]
        ws = w[sel]
        if use_median:
            # ONE candidate per texel per frame (its best-weight pixel), then
            # a vectorized insert into each texel's weakest slot if better.
            lin = ty * tex_size + tx
            order = np.lexsort((-ws, lin))
            lin_s = lin[order]
            first = np.r_[True, lin_s[1:] != lin_s[:-1]]
            pick = order[first]
            py, px = ty[pick], tx[pick]
            pw = ws[pick].astype(np.float32)
            pc = cols[pick].astype(np.float32)
            smin = slot_w[py, px].argmin(-1)
            better = pw > slot_w[py, px, smin]
            py, px, smin = py[better], px[better], smin[better]
            slot_w[py, px, smin] = pw[better]
            slot_c[py, px, smin] = pc[better]
        else:
            np.add.at(acc, (ty, tx), cols * ws[:, None])
            np.add.at(wacc, (ty, tx), ws)

    if use_median:
        import warnings
        filled = slot_w > 0.0
        cand = np.where(filled[..., None], slot_c, np.nan)
        with warnings.catch_warnings():
            # unobserved texels are all-NaN by design; they become holes
            warnings.simplefilter("ignore", RuntimeWarning)
            tex = np.nanmedian(cand, axis=2)
        tex = np.nan_to_num(tex, nan=0.0)
        return tex.astype(np.float32), slot_w.sum(-1).astype(np.float32)
    tex = acc / np.clip(wacc[..., None], 1e-8, None)
    return tex.astype(np.float32), wacc.astype(np.float32)


def inpaint_texture(tex: np.ndarray, weight: np.ndarray,
                    min_weight: float = 1e-6) -> np.ndarray:
    """Telea-inpaint texels no frame observed (texture_mesh_extract.py:150)."""
    import cv2
    img8 = np.clip(tex * 255.0, 0, 255).astype(np.uint8)
    hole = (weight <= min_weight).astype(np.uint8)
    return cv2.inpaint(img8, hole, 3, cv2.INPAINT_TELEA)
