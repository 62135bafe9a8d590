"""Gather-only (binned) rasterizers vs the scatter-based references."""
import jax
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np

from selfreconcode_tpu.render.camera import make_camera
from selfreconcode_tpu.ops.rasterize import (
    rasterize_mesh, rasterize_mesh_scatter, splat_mask, splat_mask_scatter)


def _cam(H=96, W=96):
    return make_camera(np.array([90.0, 90.0], np.float32),
                       np.array([W / 2, H / 2], np.float32),
                       np.array([1.0, 0, 0, 0], np.float32),
                       np.array([0.0, 0.0, 2.0], np.float32), H, W)


def _random_small_tri_mesh(n_faces=400, seed=0, extent=0.6, tri_size=0.04):
    """Many small triangles (MC-like) at random depths."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n_faces, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(-0.3, 0.3, n_faces)
    offs = rng.uniform(-tri_size, tri_size, (n_faces, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    faces = np.arange(3 * n_faces, dtype=np.int32).reshape(-1, 3)
    return jnp.asarray(verts), jnp.asarray(faces)


def test_mesh_v2_matches_scatter_coverage_and_depth():
    cam = _cam()
    verts, faces = _random_small_tri_mesh()
    fv = jnp.ones((faces.shape[0],), bool)
    # use_pallas=False pins the XLA fallback path (fp 10 would now dispatch
    # to the 16px-cell Pallas kernel, which has its own test below)
    a = rasterize_mesh(cam, verts, faces, fv, footprint=10, use_pallas=False)
    b = rasterize_mesh_scatter(cam, verts, faces, fv, footprint=10)
    ha = np.asarray(a.pix_to_face) >= 0
    hb = np.asarray(b.pix_to_face) >= 0
    np.testing.assert_array_equal(ha, hb)
    za, zb = np.asarray(a.zbuf), np.asarray(b.zbuf)
    np.testing.assert_allclose(za[ha], zb[hb], rtol=1e-5)
    # same winning face wherever depth separation is unambiguous
    same = np.asarray(a.pix_to_face) == np.asarray(b.pix_to_face)
    assert same[ha].mean() > 0.98  # ties on shared edges may differ
    # barycentrics agree where faces agree
    sel = ha & same
    np.testing.assert_allclose(np.asarray(a.bary)[sel],
                               np.asarray(b.bary)[sel], atol=1e-4)


def test_mesh_pallas_matches_scatter():
    """footprint<=8 dispatches to the Pallas kernel path (interpreted on
    CPU); it must agree with the scatter z-buffer like the XLA path does."""
    cam = _cam()
    verts, faces = _random_small_tri_mesh(tri_size=0.03)
    fv = jnp.ones((faces.shape[0],), bool)
    a = rasterize_mesh(cam, verts, faces, fv, footprint=8)
    b = rasterize_mesh_scatter(cam, verts, faces, fv, footprint=10)
    ha = np.asarray(a.pix_to_face) >= 0
    hb = np.asarray(b.pix_to_face) >= 0
    np.testing.assert_array_equal(ha, hb)
    za, zb = np.asarray(a.zbuf), np.asarray(b.zbuf)
    np.testing.assert_allclose(za[ha], zb[hb], rtol=1e-5)
    same = np.asarray(a.pix_to_face) == np.asarray(b.pix_to_face)
    assert same[ha].mean() > 0.98
    sel = ha & same
    np.testing.assert_allclose(np.asarray(a.bary)[sel],
                               np.asarray(b.bary)[sel], atol=1e-4)


def test_mesh_pallas_cs16_matches_scatter():
    """8 < footprint <= 16 dispatches to the 16px-cell Pallas kernel."""
    cam = _cam()
    verts, faces = _random_small_tri_mesh(tri_size=0.05)
    fv = jnp.ones((faces.shape[0],), bool)
    a = rasterize_mesh(cam, verts, faces, fv, footprint=12)
    b = rasterize_mesh_scatter(cam, verts, faces, fv, footprint=14)
    ha = np.asarray(a.pix_to_face) >= 0
    hb = np.asarray(b.pix_to_face) >= 0
    np.testing.assert_array_equal(ha, hb)
    za, zb = np.asarray(a.zbuf), np.asarray(b.zbuf)
    np.testing.assert_allclose(za[ha], zb[hb], rtol=1e-5)
    same = np.asarray(a.pix_to_face) == np.asarray(b.pix_to_face)
    assert same[ha].mean() > 0.98
    sel = ha & same
    np.testing.assert_allclose(np.asarray(a.bary)[sel],
                               np.asarray(b.bary)[sel], atol=1e-4)


def test_mesh_v2_cell_cap_overflow_is_graceful():
    cam = _cam()
    verts, faces = _random_small_tri_mesh(n_faces=50)
    fv = jnp.ones((faces.shape[0],), bool)
    tiny = rasterize_mesh(cam, verts, faces, fv, footprint=10, cell_cap=2)
    full = rasterize_mesh(cam, verts, faces, fv, footprint=10, cell_cap=64)
    # capped result covers a subset
    ha = np.asarray(tiny.pix_to_face) >= 0
    hb = np.asarray(full.pix_to_face) >= 0
    assert (ha & ~hb).sum() == 0


def test_splat_v2_matches_scatter():
    cam = _cam()
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32))
    pv = jnp.asarray(rng.random(500) > 0.1)
    a = splat_mask(cam, pts, pv, 0.05, footprint=9)
    b = splat_mask_scatter(cam, pts, pv, 0.05, footprint=9)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_splat_v2_grads_match_scatter():
    cam = _cam(48, 48)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (60, 3)).astype(np.float32))
    pv = jnp.ones((60,), bool)
    tgt = jnp.asarray(rng.random((48, 48)).astype(np.float32))

    def loss_a(p):
        return (splat_mask(cam, p, pv, 0.08, 9) * tgt).sum()

    def loss_b(p):
        return (splat_mask_scatter(cam, p, pv, 0.08, 9) * tgt).sum()

    ga = np.asarray(jax.grad(loss_a)(pts))
    gb = np.asarray(jax.grad(loss_b)(pts))
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-5)


def test_splat_bwd_scatter_mode_matches_gather(monkeypatch):
    """SRTPU_SPLAT_BWD=scatter reduces the Pallas kernel's per-candidate
    grads by scatter-add on candidate point ids instead of the per-entry
    inverse-permutation gather; both must produce identical point grads,
    including under per-cell overflow (even-stride selection)."""
    cam = _cam(64, 64)
    rng = np.random.default_rng(11)
    pts = np.zeros((600, 3), np.float32)
    pts[:, :2] = rng.uniform(-0.15, 0.15, (600, 2))  # dense -> overflow
    pts[:, 2] = rng.uniform(-0.05, 0.05, 600)
    pts = jnp.asarray(pts)
    pv = jnp.asarray(rng.random(600) > 0.05)
    tgt = jnp.asarray(rng.random((64, 64)).astype(np.float32))

    def loss(p):
        return (splat_mask(cam, p, pv, 0.05, 9) * tgt).sum()

    # jit both (fresh callables -> fresh traces); eager-vs-jit float
    # ordering would otherwise add ~1e-6 noise unrelated to the mode
    monkeypatch.delenv("SRTPU_SPLAT_BWD", raising=False)
    g_gather = np.asarray(jax.jit(jax.grad(loss))(pts))
    monkeypatch.setenv("SRTPU_SPLAT_BWD", "scatter")
    g_scatter = np.asarray(jax.jit(jax.grad(lambda p: loss(p)))(pts))
    np.testing.assert_allclose(g_gather, g_scatter, rtol=1e-6, atol=0)


def test_splat_v2_camera_grads_flow():
    cam = _cam(48, 48)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (60, 3)).astype(np.float32))
    pv = jnp.ones((60,), bool)

    def loss(T):
        from selfreconcode_tpu.render.camera import Camera
        cam2 = Camera(focal=cam.focal, principal=cam.principal, R=cam.R,
                      T=T, H=cam.H, W=cam.W)
        return splat_mask(cam2, pts, pv, 0.08, 9).sum()

    g = np.asarray(jax.grad(loss)(cam.T))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_splat_pallas_grad_fd_under_overflow():
    """Cells over _SPLAT_CAP keep an even stride of their entries; the
    backward must invert exactly that selection.  FD-check dL/dpoints on a
    dense cluster that overflows the per-cell capacity."""
    from selfreconcode_tpu.ops import rasterize as R
    cam = _cam(64, 64)
    rng = np.random.default_rng(7)
    # ~600 points projecting into a ~20x20 px area -> >>64 entries per cell
    pts = np.zeros((600, 3), np.float32)
    pts[:, :2] = rng.uniform(-0.1, 0.1, (600, 2))
    pts[:, 2] = rng.uniform(-0.05, 0.05, 600)
    pts = jnp.asarray(pts)
    pv = jnp.ones((600,), bool)
    r = 0.05  # r_pix ~ 1.6 -> Pallas path

    def loss(p):
        m = R.splat_mask(cam, p, pv, r)
        return (m * jnp.arange(64 * 64).reshape(64, 64)).sum()

    g = np.asarray(jax.grad(loss)(pts))
    eps = 2e-3
    for i in [3, 77, 311]:
        for ax in range(2):
            pp = np.asarray(pts).copy(); pp[i, ax] += eps
            pm = np.asarray(pts).copy(); pm[i, ax] -= eps
            fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (2 * eps)
            got = g[i, ax]
            assert abs(fd - got) <= 0.05 * max(1.0, abs(fd)), (i, ax, fd, got)
