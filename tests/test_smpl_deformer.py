import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selfreconcode_tpu.models import smpl as smpl_mod
from selfreconcode_tpu.models.skinner import (
    build_skinner, compute_lbs_weight_field, fk_transforms, posed_skeleton,
    sample_skin_weights, skinner_apply, smooth_weights)
from selfreconcode_tpu.models.deformer import (
    Deformer, deformer_apply, deformer_apply_batched, deformer_jacobian)
from selfreconcode_tpu.models.translator import TranslatorNet, init_translator_params
from selfreconcode_tpu.ops.trilinear import trilinear_sample


@pytest.fixture(scope="module")
def toy():
    return smpl_mod.toy_smpl_model(n_verts=400)


@pytest.fixture(scope="module")
def skinner_and_cloud(toy):
    shape = jnp.zeros(10)
    apose = smpl_mod.smpl_tmp_apose(1)
    return build_skinner(toy, shape, apose, resolution=(17, 25, 9))


def test_smpl_zero_pose_identity(toy):
    beta = jnp.zeros((1, 10))
    theta = jnp.zeros((1, 24, 3))
    verts, joints, Rs = smpl_mod.smpl_forward(toy, beta, theta)
    v_shaped, j_rest = smpl_mod.shaped_verts_and_joints(toy, beta)
    np.testing.assert_allclose(np.asarray(verts), np.asarray(v_shaped), atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), np.asarray(j_rest), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(Rs), np.tile(np.eye(3, dtype=np.float32), (1, 24, 1, 1)), atol=1e-5)


def test_smpl_global_rotation_is_rigid(toy):
    beta = jnp.zeros((1, 10))
    theta = jnp.zeros((24, 3)).at[0].set(jnp.array([0.0, np.pi / 2, 0.0]))[None]
    verts, joints, _ = smpl_mod.smpl_forward(toy, beta, theta)
    v0, j0 = smpl_mod.shaped_verts_and_joints(toy, beta)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0, np.pi / 2, 0]).as_matrix().astype(np.float32)
    root = np.asarray(j0)[0, 0]
    expected = (np.asarray(v0)[0] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts)[0], expected, atol=1e-4)


def test_trilinear_matches_scipy():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(2, 5, 6, 7)).astype(np.float32)
    pts = rng.uniform(-0.9, 0.9, size=(50, 3)).astype(np.float32)
    out = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(pts)))
    from scipy.interpolate import RegularGridInterpolator
    C, D, H, W = vol.shape
    # align_corners=False: voxel centers at (i+0.5)/size in [0,1]
    zc = (np.arange(D) + 0.5) / D * 2 - 1
    yc = (np.arange(H) + 0.5) / H * 2 - 1
    xc = (np.arange(W) + 0.5) / W * 2 - 1
    for c in range(C):
        interp = RegularGridInterpolator((zc, yc, xc), vol[c], bounds_error=False, fill_value=None)
        # border clamp: clip query to the center range
        q = np.stack([
            np.clip(pts[:, 2], zc[0], zc[-1]),
            np.clip(pts[:, 1], yc[0], yc[-1]),
            np.clip(pts[:, 0], xc[0], xc[-1]),
        ], axis=-1)
        np.testing.assert_allclose(out[:, c], interp(q), atol=1e-5)


def test_trilinear_is_twice_differentiable():
    vol = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4, 4)).astype(np.float32))

    def f(p):
        return trilinear_sample(vol, p[None, :])[0, 0]

    g = jax.grad(f)(jnp.array([0.1, 0.2, -0.1]))
    h = jax.hessian(f)(jnp.array([0.1, 0.2, -0.1]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.isfinite(np.asarray(h)))


def test_weight_field_normalized_and_smooth(toy):
    verts = toy.v_template
    ws = compute_lbs_weight_field(
        np.asarray(verts).min(0) - 0.1, np.asarray(verts).max(0) + 0.1,
        resolution=(9, 9, 9), smpl_verts=verts, smpl_ws=toy.weights,
        mean_neighbor=5, smooth_times=3)
    assert ws.shape == (9, 9, 9, 24)  # channel-last
    s = np.asarray(ws.sum(-1))
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-4)
    assert np.asarray(ws).min() >= -1e-6


def test_fk_apose_inverse_roundtrip(skinner_and_cloud):
    """Skinning with pose == A-pose must be identity (A = FK(A) @ FK(A)^-1)."""
    skinner, verts, faces = skinner_and_cloud
    apose = jnp.asarray(smpl_mod.smpl_tmp_apose(1)).reshape(1, 24, 3)
    A, _ = fk_transforms(skinner, apose, jnp.zeros((1, 3)))
    np.testing.assert_allclose(
        np.asarray(A), np.tile(np.eye(4, dtype=np.float32), (1, 24, 1, 1)), atol=1e-4)
    # hence skinning any points with the A-pose is the identity + trans
    pts = verts[:50]
    out = skinner_apply(skinner, pts, jnp.zeros(50, jnp.int32), apose,
                        jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts) + 1.0, atol=1e-3)


def test_posed_skeleton_matches_fk(skinner_and_cloud):
    skinner, _, _ = skinner_and_cloud
    poses = jnp.asarray(np.random.default_rng(2).normal(size=(2, 24, 3)).astype(np.float32) * 0.2)
    js = posed_skeleton(skinner, poses, jnp.zeros((2, 3)))
    assert js.shape == (2, 24, 3)
    _, results = fk_transforms(skinner, poses, jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(js), np.asarray(results[:, :, :3, 3]), atol=1e-6)


@pytest.mark.slow  # finite-difference sweep; jacfwd correctness is also pinned by
# test_deformer_batched_equals_flat + the IFT gradient FD test in test_surface
def test_deformer_jacobian_matches_fd(skinner_and_cloud, key):
    skinner, verts, _ = skinner_and_cloud
    tnet = TranslatorNet(cond_size=8, multires=2)
    tparams = init_translator_params(key, tnet)
    deformer = Deformer(tnet, skinner)
    pts = verts[:8]
    bi = jnp.zeros(8, jnp.int32)
    dcond = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8)).astype(np.float32))
    poses = jnp.asarray(smpl_mod.smpl_tmp_apose(1)).reshape(1, 24, 3) + 0.05
    trans = jnp.array([[0.1, 0.0, -0.2]])
    jac, out = deformer_jacobian(tparams, deformer, pts, bi, dcond, poses, trans, 0.5)
    out2, _ = deformer_apply(tparams, deformer, pts, bi, dcond, poses, trans, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    eps = 1e-3
    for c in range(3):
        dp = jnp.zeros_like(pts).at[:, c].add(eps)
        plus, _ = deformer_apply(tparams, deformer, pts + dp, bi, dcond, poses, trans, 0.5)
        minus, _ = deformer_apply(tparams, deformer, pts - dp, bi, dcond, poses, trans, 0.5)
        fd = (np.asarray(plus) - np.asarray(minus)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(jac[:, :, c]), fd, atol=5e-3)


def test_packed_f16_table_close_to_f32(toy):
    """The float16 corner-packed table (gather rows halved) must reproduce
    the f32 weights to ~1e-3 and keep posed vertices sub-millimeter."""
    shape = jnp.zeros(10)
    apose = smpl_mod.smpl_tmp_apose(1)
    sk16, verts, _ = build_skinner(toy, shape, apose, resolution=(17, 25, 9))
    sk32, _, _ = build_skinner(toy, shape, apose, resolution=(17, 25, 9),
                               table_dtype=jnp.float32)
    assert sk16.ws.dtype == jnp.float16
    pts = verts[:100]
    w16 = np.asarray(sample_skin_weights(sk16, pts))
    w32 = np.asarray(sample_skin_weights(sk32, pts))
    assert w16.dtype == np.float32  # upcast after the gather
    assert np.abs(w16 - w32).max() < 2e-3
    poses = jnp.asarray(apose).reshape(1, 24, 3) + 0.3
    bi = jnp.zeros(100, jnp.int32)
    o16 = np.asarray(skinner_apply(sk16, pts, bi, poses, jnp.zeros((1, 3))))
    o32 = np.asarray(skinner_apply(sk32, pts, bi, poses, jnp.zeros((1, 3))))
    assert np.abs(o16 - o32).max() < 1e-3  # < 1 mm at body scale


def test_skinner_shared_equals_tiled(skinner_and_cloud):
    """skinner_apply_shared (one weight gather for V points shared by all B
    frames) must match skinner_apply on the tiled layout, incl. gradients wrt
    the points (it sits inside the inner template-vertex SGD)."""
    from selfreconcode_tpu.models.skinner import skinner_apply_shared
    skinner, verts, _ = skinner_and_cloud
    pts = verts[:40]
    B = 3
    rng = np.random.default_rng(7)
    poses = jnp.asarray(smpl_mod.smpl_tmp_apose(1)).reshape(1, 24, 3) \
        + jnp.asarray(rng.normal(size=(B, 24, 3)).astype(np.float32) * 0.1)
    trans = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 0.3)
    flat = jnp.tile(pts, (B, 1))
    binds = jnp.repeat(jnp.arange(B), pts.shape[0])
    ref = np.asarray(skinner_apply(skinner, flat, binds, poses, trans)
                     ).reshape(B, -1, 3)
    out = np.asarray(skinner_apply_shared(skinner, pts, poses, trans))
    np.testing.assert_allclose(out, ref, atol=1e-4)

    def f_shared(p):
        return (skinner_apply_shared(skinner, p, poses, trans) ** 2).sum()

    def f_tiled(p):
        return (skinner_apply(skinner, jnp.tile(p, (B, 1)), binds, poses,
                              trans) ** 2).sum()

    g1 = np.asarray(jax.grad(f_shared)(pts))
    g2 = np.asarray(jax.grad(f_tiled)(pts))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)


def test_deformer_batched_equals_flat(skinner_and_cloud, key):
    skinner, verts, _ = skinner_and_cloud
    tnet = TranslatorNet(cond_size=8, multires=2)
    tparams = init_translator_params(key, tnet)
    deformer = Deformer(tnet, skinner)
    B, P = 2, 10
    pts_b = jnp.broadcast_to(verts[:P][None], (B, P, 3))
    dcond = jnp.asarray(np.random.default_rng(5).normal(size=(B, 8)).astype(np.float32))
    poses = jnp.asarray(np.tile(smpl_mod.smpl_tmp_apose(1)[None], (B, 1, 1)))
    trans = jnp.asarray(np.random.default_rng(6).normal(size=(B, 3)).astype(np.float32))
    out_b, off_b = deformer_apply_batched(tparams, deformer, pts_b, dcond, poses, trans, 0.5)
    flat = pts_b.reshape(-1, 3)
    bi = jnp.repeat(jnp.arange(B), P)
    out_f, off_f = deformer_apply(tparams, deformer, flat, bi, dcond, poses, trans, 0.5)
    np.testing.assert_allclose(np.asarray(out_b).reshape(-1, 3), np.asarray(out_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(off_b).reshape(-1, 3), np.asarray(off_f), atol=1e-6)
