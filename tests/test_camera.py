import jax.numpy as jnp
import numpy as np

from selfreconcode_tpu.render.camera import (
    Camera, ang_threshold, cam_pos, make_camera, project,
    transform_points_screen, view_rays, world_to_cam)


def _cam():
    # quat: 180deg about x (the PeopleSnapshot convention,
    # people_snapshot_process.py:72)
    quat = np.array([np.cos(np.pi / 2), np.sin(np.pi / 2), 0, 0], np.float32)
    return make_camera(
        focal=np.array([910.0, 910.0], np.float32),
        principal=np.array([540.0, 540.0], np.float32),
        quat=quat, T=np.array([0.0, 0.2, 2.5], np.float32), H=1080, W=1080)


def test_project_viewray_roundtrip(rng):
    cam = _cam()
    pix = rng.uniform(100, 900, size=(64, 2)).astype(np.float32)
    pix3 = jnp.asarray(np.concatenate([pix, np.ones((64, 1), np.float32)], -1))
    rays = view_rays(cam, pix3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays), axis=1), 1.0, atol=1e-5)
    c = cam_pos(cam)
    # march along the rays, project back: must hit the same pixel
    pts = c[None, :] + rays * 3.0
    pix_back = np.asarray(project(cam, pts))
    np.testing.assert_allclose(pix_back, pix, atol=1e-2)


def test_screen_transform_consistent_with_project(rng):
    cam = _cam()
    pts_cam = rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float32)
    pts_cam[:, 2] += 3.0
    # invert world_to_cam: p_world = (p_cam - T) @ R^T ... p_cam = p_world @ R + T
    R, T = np.asarray(cam.R), np.asarray(cam.T)
    pts_world = jnp.asarray((pts_cam - T) @ np.linalg.inv(R))
    screen = np.asarray(transform_points_screen(cam, pts_world))
    pix = np.asarray(project(cam, pts_world))
    # with the align_corners=False rectification the NDC path reduces exactly
    # to col = cx - fx*x/z (algebraic identity)
    np.testing.assert_allclose(screen[:, 0], pix[:, 0], atol=1e-2)
    np.testing.assert_allclose(screen[:, 1], pix[:, 1], atol=1e-2)
    np.testing.assert_allclose(screen[:, 2], pts_cam[:, 2], atol=1e-4)


def test_depth_positive_in_front(rng):
    cam = _cam()
    c = np.asarray(cam_pos(cam))
    ray = np.asarray(view_rays(cam, jnp.asarray([[540.0, 540.0, 1.0]])))[0]
    p = jnp.asarray((c + ray * 2.0)[None].astype(np.float32))
    z = float(world_to_cam(cam, p)[0, 2])
    assert z > 0


def test_ang_threshold_positive_small():
    cam = _cam()
    t = ang_threshold(cam, 0.5)
    assert 0 < t < 0.1  # ~ atan(0.5/910) in degrees ~ 0.03
