"""Core math primitives shared across the framework.

All functions are pure jnp, arbitrarily differentiable, and jit/vmap-safe.
Parity targets (reference file:line cited per function) are the *equations*
of jby1993/SelfReconCode; the implementations are TPU-idiomatic (closed-form
batched linear algebra instead of CUDA kernels, `jnp.where` masking instead
of boolean indexing).
"""
from __future__ import annotations

import math as _pymath

import jax
import jax.numpy as jnp
import numpy as np


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z), shape (B,4) -> rotation matrices (B,3,3).

    Parity: utils/utils.py:21-38 of the reference (normalizes first).
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (N,3) -> rotation matrices (N,3,3) via the quaternion map.

    Parity: smpl_pytorch/util.py:35-46 (norm of theta+1e-8, half-angle quat).
    """
    l1norm = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / l1norm
    half = l1norm * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat2mat(quat)


def gm_robust(x: jnp.ndarray, c: float, square: bool = False) -> jnp.ndarray:
    """Geman-McClure robustifier. Parity: utils/utils.py:48-52."""
    if square:
        return 2.0 * x / (c * c) / (x / (c * c) + 4.0)
    return 2.0 * x * x / (c * c) / (x * x / (c * c) + 4.0)


def inv3x3(m: jnp.ndarray, det_eps: float = 1e-4):
    """Batched closed-form (cofactor) 3x3 inverse with singularity mask.

    Returns (inv, check) where check[b] is False for |det| < det_eps; the
    corresponding inverse rows are zero. Matches the semantics of the
    reference CUDA kernel FastMinv/Matrix3x3InvKernels.cu:22-61 (zero inverse
    + flag for near-singular input) but is pure jnp and arbitrarily
    differentiable, replacing the hand-written backward at
    FastMinv/M3x3Inv.cpp:38.
    """
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]
    d = m[..., 1, 0]; e = m[..., 1, 1]; f = m[..., 1, 2]
    g = m[..., 2, 0]; h = m[..., 2, 1]; i = m[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    check = jnp.abs(det) >= det_eps
    safe_det = jnp.where(check, det, 1.0)
    inv = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    ) / safe_det[..., None, None]
    inv = jnp.where(check[..., None, None], inv, jnp.zeros_like(inv))
    return inv, check


def cross_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]_x with (v x u) = cross_matrix(v) @ u.

    Parity: the inline v_cross assembly at model/network.py:757-764.
    """
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def dct_basis(k: int, n: int) -> np.ndarray:
    """Orthonormal DCT-II basis row k of length n. Parity: utils/utils.py:201-205."""
    assert k < n
    basis = np.array([np.pi * (float(i) + 0.5) * k / float(n) for i in range(n)])
    scale = 1.0 / np.sqrt(float(n)) if k == 0 else np.sqrt(2.0 / float(n))
    return (np.cos(basis) * scale).astype(np.float32)


def dct_space(k: int, n: int) -> np.ndarray:
    """First k DCT basis rows, (k, n). Parity: utils/utils.py:210-211."""
    return np.stack([dct_basis(i, n) for i in range(k)])


def dct_null_space(k: int, n: int) -> np.ndarray:
    """DCT rows k..n-1 (the high-frequency null space), (n-k, n).

    Parity: utils/utils.py:207-208; used as the temporal smoothness prior on
    posed-joint trajectories.
    """
    return np.stack([dct_basis(i, n) for i in range(k, n)])


def eigvals_sym3(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form eigenvalues of batched symmetric 3x3 matrices, ascending.

    The trigonometric (Cardano) closed form, no iterative polish (a Newton
    polish was tried and removed — see the comment below).  XLA's iterative
    eigvalsh costs 63 ms for 20k 3x3s on v5e; this is 0.2 ms and exactly as
    differentiable.
    """
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    d = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = (d * d).sum((-2, -1))
    # RELATIVE degeneracy test + safe-where division: near-isotropic inputs
    # (the common case early in training, when the deformer Jacobian ~ I)
    # must not leak inf/nan gradients through the untaken branch.  (A Newton
    # polish on the characteristic polynomial was tried and removed: f'(lam)
    # ~ 0 at repeated roots, i.e. exactly the isotropic case, and it NaN'd
    # the whole training step.)
    scale2 = (A * A).sum((-2, -1)) + eps
    degenerate = p2 <= 1e-12 * scale2
    p2_safe = jnp.where(degenerate, jnp.ones_like(p2), p2)
    p = jnp.sqrt(p2_safe / 6.0)
    B = d / p[..., None, None]
    r = jnp.clip(jnp.linalg.det(B) / 2.0, -1.0 + 1e-6, 1.0 - 1e-6)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    lam = jnp.stack([e3, e2, e1], axis=-1)    # ascending
    return jnp.where(degenerate[..., None], q[..., None], lam)


def log_singular_values_sq_sum(jac: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """sum_i log(sigma_i)^2 for batched 3x3 Jacobians.

    The reference computes torch.svd **on CPU** (model/network.py:575-576,
    "gpu svd is too slow") then log(s)^2.  On TPU: sigma_i^2 = eig(J^T J)
    via the closed-form symmetric solver (XLA's iterative eigvalsh was
    63 ms/step at fine-stage batch sizes; eigvals_sym3 is 0.2 ms).
    """
    jtj = jnp.einsum("...ji,...jk->...ik", jac, jac)
    eig = eigvals_sym3(jtj)
    eig = jnp.clip(eig, eps, None)
    logs = 0.5 * jnp.log(eig)
    return (logs * logs).sum(-1)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.clip(jnp.linalg.norm(v, axis=axis, keepdims=True), eps, None)


def make_homo(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3),(...,3) -> (...,4,4) rigid transform."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_inverse_homo(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the rigid transform (R, t) as a 4x4 matrix.

    Parity: the init-pose inverse assembly at model/Deformer.py:134-140.
    """
    Rt = jnp.swapaxes(R, -1, -2)
    return make_homo(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))
