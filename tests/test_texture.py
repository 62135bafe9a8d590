"""Texture baking: OBJ parsing + UV scatter aggregation sanity."""
import os.path as osp

import numpy as np
import jax.numpy as jnp

from selfreconcode_tpu.render.camera import make_camera
from selfreconcode_tpu.texture.uv import (load_obj_with_uv, bake_texture,
                                          inpaint_texture)


def test_load_obj_with_uv(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
vt 0.1 0.1
vt 0.9 0.1
vt 0.1 0.9
f 1/1 2/2 3/3
""")
    v, uv, fv, fvt = load_obj_with_uv(str(p))
    assert v.shape == (3, 3) and uv.shape == (3, 2)
    np.testing.assert_array_equal(fv, [[0, 1, 2]])
    np.testing.assert_array_equal(fvt, [[0, 1, 2]])


def test_bake_texture_flat_color():
    # one front-facing square textured by a flat red image -> red texels
    H = W = 64
    cam = make_camera(np.array([60.0, 60.0], np.float32),
                      np.array([W / 2, H / 2], np.float32),
                      np.array([1.0, 0, 0, 0], np.float32),
                      np.array([0.0, 0.0, 2.0], np.float32), H, W)
    s = 0.5
    verts = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                     np.float32)
    faces_v = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces_vt = faces_v.copy()
    img = np.zeros((H, W, 3), np.float32)
    img[..., 0] = 1.0  # red
    tex, w = bake_texture(cam, [verts], [img], faces_v, faces_vt, uvs,
                          tex_size=64, footprint=40)
    covered = w > 0
    assert covered.mean() > 0.1
    np.testing.assert_allclose(tex[covered][:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(tex[covered][:, 1], 0.0, atol=1e-5)
    out = inpaint_texture(tex, w)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.uint8


def test_bake_texture_median_rejects_corrupted_frame():
    """Best-K median parity (texture_mesh_extract.py:62-153): one corrupted
    frame among many must NOT bleed into the texture; the weighted mean
    (k_best=1) does bleed — that contrast is the property under test."""
    H = W = 64
    cam = make_camera(np.array([60.0, 60.0], np.float32),
                      np.array([W / 2, H / 2], np.float32),
                      np.array([1.0, 0, 0, 0], np.float32),
                      np.array([0.0, 0.0, 2.0], np.float32), H, W)
    s = 0.5
    verts = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                     np.float32)
    faces_v = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces_vt = faces_v.copy()
    gray = np.full((H, W, 3), 0.5, np.float32)
    red = np.zeros((H, W, 3), np.float32)
    red[..., 0] = 1.0  # the corrupted (e.g. specular/misregistered) frame
    frames = [gray] * 4 + [red]
    vlist = [verts] * 5

    tex_med, w_med = bake_texture(cam, vlist, frames, faces_v, faces_vt, uvs,
                                  tex_size=64, footprint=40, k_best=8)
    covered = w_med > 0
    assert covered.mean() > 0.1
    # median over [0.5 x4, 1.0 x1] = 0.5: the outlier is rejected exactly
    np.testing.assert_allclose(tex_med[covered][:, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(tex_med[covered][:, 2], 0.5, atol=1e-5)

    tex_mean, w_mean = bake_texture(cam, vlist, frames, faces_v, faces_vt,
                                    uvs, tex_size=64, footprint=40, k_best=1)
    cov2 = w_mean > 0
    # the mean DOES bleed (red channel pulled above 0.5) — median required
    assert tex_mean[cov2][:, 0].mean() > 0.55
