"""Perspective camera with the reference's rectified screen<->NDC convention.

Parity target: model/CameraMine.py (RectifiedPerspectiveCameras) — an SfM
camera with negated x/y (the pytorch3d convention), align_corners=False pixel
grid, and helpers:
  view_rays   :129-136   pixel -> world unit ray
  project     :138-142   world point -> pixel
  cam_pos     :169-170   camera center in world
  angThreshold:145-167   minimal sub-pixel angle (root-finding tolerance)
  transform_points_screen / NDC math :87-125, 172-264

Conventions (identical to the reference):
  * R is the cam->world rotation as stored (points transform world->cam via
    p_cam = p_world @ R + T, see project at CameraMine.py:139).
  * NDC: x_ndc = fx_ndc * x/z + px_ndc with fx_ndc = fx/(W/2),
    px_ndc = 1 - 1/W - cx/(W/2)   (align_corners=False rectification).
  * screen: col = cx - fx * x/z, row = cy - fy * y/z  (the double negation of
    the NDC flip; verified equivalent to transform_points_screen).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import quat2mat


@dataclass(frozen=True)
class Camera:
    """A single camera (all frames share one physical camera in this system,
    mirroring dataset/dataset.py:58-62). Arrays so they stay optimizable.
    Registered as a pytree with H/W static."""
    focal: jnp.ndarray        # (2,) fx, fy in pixels
    principal: jnp.ndarray    # (2,) cx, cy in pixels
    R: jnp.ndarray            # (3,3) cam->world coord rotation
    T: jnp.ndarray            # (3,) world->cam translation
    H: int
    W: int


jax.tree_util.register_pytree_node(
    Camera,
    lambda c: ((c.focal, c.principal, c.R, c.T), (c.H, c.W)),
    lambda aux, leaves: Camera(*leaves, H=aux[0], W=aux[1]))


def make_camera(focal, principal, quat, T, H: int, W: int) -> Camera:
    """From the dataset's camera.npz parameterization (fx,fy,cx,cy,quat,T).

    Parity: dataset.get_camera_parameters (dataset/dataset.py:125-127).
    """
    R = quat2mat(jnp.asarray(quat).reshape(1, 4))[0]
    return Camera(
        focal=jnp.asarray(focal).reshape(2),
        principal=jnp.asarray(principal).reshape(2),
        R=R, T=jnp.asarray(T).reshape(3), H=H, W=W)


def cam_pos(cam: Camera) -> jnp.ndarray:
    """Camera center in world coords: -R @ T. Parity: CameraMine.py:169-170."""
    return -(cam.R @ cam.T)


def view_rays(cam: Camera, pix: jnp.ndarray) -> jnp.ndarray:
    """pix (N, 3) = [col, row, 1] -> world-space unit rays (N, 3).

    Parity: CameraMine.py:129-136 (note the sign: camera looks down -x,-y
    flipped axes per the pytorch3d convention).
    """
    fx, fy = cam.focal[0], cam.focal[1]
    cx, cy = cam.principal[0], cam.principal[1]
    rays = jnp.stack([
        -pix[:, 0] / fx + pix[:, 2] * cx / fx,
        -pix[:, 1] / fy + pix[:, 2] * cy / fy,
        pix[:, 2],
    ], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    return rays @ cam.R.T


def project(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """World points (N,3) -> pixel coords (N,2) [col, row].

    Parity: CameraMine.py:138-142.
    """
    p = pts @ cam.R + cam.T
    x = cam.principal[0] - p[:, 0] * cam.focal[0] / p[:, 2]
    y = cam.principal[1] - p[:, 1] * cam.focal[1] / p[:, 2]
    return jnp.stack([x, y], axis=-1)


def world_to_cam(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """(N,3) world -> camera coords (z = depth)."""
    return pts @ cam.R + cam.T


def transform_points_screen(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """World -> (col, row, z_ndc) with the rectified NDC convention.

    Parity: CameraMine.py:87-125 + _get_sfm_calibration_matrix:234-263.
    screen_x = (W-1)/2 - W*x_ndc/2 (align_corners=False).
    """
    p = world_to_cam(cam, pts)
    half_w, half_h = cam.W / 2.0, cam.H / 2.0
    fx_ndc = cam.focal[0] / half_w
    fy_ndc = cam.focal[1] / half_h
    px_ndc = 1.0 - 1.0 / cam.W - cam.principal[0] / half_w
    py_ndc = 1.0 - 1.0 / cam.H - cam.principal[1] / half_h
    inv_z = 1.0 / p[:, 2]
    x_ndc = fx_ndc * p[:, 0] * inv_z + px_ndc
    y_ndc = fy_ndc * p[:, 1] * inv_z + py_ndc
    screen_x = (cam.W - 1.0) / 2.0 - cam.W * x_ndc / 2.0
    screen_y = (cam.H - 1.0) / 2.0 - cam.H * y_ndc / 2.0
    return jnp.stack([screen_x, screen_y, p[:, 2]], axis=-1)


def ang_threshold(cam: Camera, pixoffset: float = 0.4) -> float:
    """Minimal sub-pixel ray angle in degrees (host-side, static).

    Parity: CameraMine.py:145-167 (min over the four image borders).
    """
    H, W = float(cam.H), float(cam.W)
    cx = float(cam.principal[0]); cy = float(cam.principal[1])
    fx = float(cam.focal[0]); fy = float(cam.focal[1])

    def ang(r1, r2):
        r1, r2 = np.asarray(r1), np.asarray(r2)
        s = np.linalg.norm(np.cross(r1, r2)) / (np.linalg.norm(r1) * np.linalg.norm(r2))
        return float(np.arcsin(np.clip(s, 0, 1)) / np.pi * 180.0)

    cands = [
        ang([(W - cx) / fx, 0, 1], [(W + pixoffset - cx) / fx, 0, 1]),
        ang([-cx / fx, 0, 1], [(pixoffset - cx) / fx, 0, 1]),
        ang([0, (H - cy) / fy, 1], [0, (H + pixoffset - cy) / fy, 1]),
        ang([0, -cy / fy, 1], [0, (pixoffset - cy) / fy, 1]),
    ]
    return min(cands)
