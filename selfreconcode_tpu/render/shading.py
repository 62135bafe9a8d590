"""Hard Phong shading over rasterized fragments.

Parity target: pytorch3d HardPhongShader as used by infer.py:90 and
OptimNetwork.infer (model/network.py:317-339): white vertex textures, a
point light, one face per pixel.  Interpolates vertex normals with the
fragment barycentrics and applies ambient + diffuse + specular.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.rasterize import rasterize_mesh, Fragments
from ..render.camera import Camera, cam_pos
from ..utils.meshops import vertex_normals


def phong_shade(cam: Camera, verts, faces, face_valid, frags: Fragments,
                light_pos, ambient=0.3, diffuse=0.7, specular=0.2,
                shininess=64.0, color=(1.0, 1.0, 1.0)):
    """Shade fragments -> (H, W, 3) in [0, 1] plus hit mask (H, W)."""
    H, W = frags.pix_to_face.shape
    vn = vertex_normals(verts, faces, face_valid)
    hit = frags.pix_to_face >= 0
    f = jnp.maximum(frags.pix_to_face, 0)
    tri = faces[f]                                   # (H,W,3)
    n = (vn[tri] * frags.bary[..., :, None]).sum(-2)
    n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6, None)
    p = (verts[tri] * frags.bary[..., :, None]).sum(-2)
    l = light_pos - p
    l = l / jnp.clip(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-6, None)
    c = cam_pos(cam)
    v = c - p
    v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6, None)
    # double-sided shading (pytorch3d shades |n.l| on backfaces as 0; use
    # flipped normals toward the camera for visual parity on open meshes)
    n = jnp.where((n * v).sum(-1, keepdims=True) < 0, -n, n)
    ndotl = jnp.clip((n * l).sum(-1), 0.0, 1.0)
    h = l + v
    h = h / jnp.clip(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-6, None)
    spec = jnp.clip((n * h).sum(-1), 0.0, 1.0) ** shininess
    base = jnp.asarray(color)
    img = (ambient + diffuse * ndotl[..., None]) * base + specular * spec[..., None]
    img = jnp.clip(img, 0.0, 1.0)
    img = jnp.where(hit[..., None], img, 1.0)  # white background
    return img, hit


def render_mesh_phong(cam: Camera, verts, faces, face_valid, light_pos,
                     footprint: int = 8):
    frags = rasterize_mesh(cam, verts, faces, face_valid, footprint)
    return phong_shade(cam, verts, faces, face_valid, frags, light_pos)
