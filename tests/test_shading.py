import numpy as np
import jax.numpy as jnp

from selfreconcode_tpu.render.camera import make_camera, cam_pos
from selfreconcode_tpu.render.shading import render_mesh_phong


def _cam(H=64, W=64):
    return make_camera(np.array([60.0, 60.0], np.float32),
                       np.array([W / 2, H / 2], np.float32),
                       np.array([1.0, 0, 0, 0], np.float32),
                       np.array([0.0, 0.0, 2.0], np.float32), H, W)


def test_phong_shades_square():
    cam = _cam()
    s = 0.5
    verts = jnp.asarray(np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    fv = jnp.ones((2,), bool)
    img, hit = render_mesh_phong(cam, verts, faces, fv,
                                 light_pos=cam_pos(cam), footprint=40)
    h = np.asarray(hit)
    im = np.asarray(img)
    assert h.sum() > 100
    # lit face: brighter than ambient alone, within [0,1]
    assert im[h].mean() > 0.5
    assert im.min() >= 0.0 and im.max() <= 1.0
    # background is white
    assert np.allclose(im[~h], 1.0)


def test_phong_frontal_brighter_than_grazing():
    cam = _cam()
    s = 0.4
    # two quads: one frontal (z=0 plane), one steeply tilted
    verts = jnp.asarray(np.array([
        [-s, -s, 0], [0, -s, 0], [0, s, 0], [-s, s, 0],        # frontal
        [0.05, -s, 0], [s, -s, -1.5], [s, s, -1.5], [0.05, s, 0],  # tilted
    ], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3],
                                  [4, 5, 6], [4, 6, 7]], np.int32))
    fv = jnp.ones((4,), bool)
    # diffuse-only shading so saturation can't mask the angle difference
    from selfreconcode_tpu.ops.rasterize import rasterize_mesh
    from selfreconcode_tpu.render.shading import phong_shade
    # footprint must bound the projected bbox: the tilted quad spans ~46 px
    frags = rasterize_mesh(cam, verts, faces, fv, 64)
    img, hit = phong_shade(cam, verts, faces, fv, frags,
                           light_pos=cam_pos(cam), ambient=0.1, diffuse=0.7,
                           specular=0.0)
    im = np.asarray(img)
    h = np.asarray(hit)
    # world +x maps to -col (SfM negation): the frontal quad (x<0) lands on
    # the RIGHT image half, the tilted quad on the left
    frontal = im[:, 33:][h[:, 33:]]
    tilted = im[:, :32][h[:, :32]]
    assert len(frontal) > 20 and len(tilted) > 20
    assert frontal.mean() > tilted.mean() + 0.05
