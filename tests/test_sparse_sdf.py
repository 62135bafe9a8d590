import jax.numpy as jnp
import numpy as np
import pytest

from selfreconcode_tpu.ops.sparse_sdf import (
    default_caps, grid_world_coords, sparse_sdf_grid)
from selfreconcode_tpu.ops.marching_cubes import marching_cubes

RESOLUTIONS = [(9, 9, 9), (17, 17, 17), (33, 33, 33)]
B_MIN = [-1.0, -1.0, -1.0]
B_MAX = [1.0, 1.0, 1.0]


def sphere_fn(pts):
    return jnp.linalg.norm(pts, axis=-1) - 0.55


@pytest.mark.slow  # full-grid dense comparison; sweep coverage stays fast
# via test_sparse_plus_mc_sphere / test_conflict_loop_rescues_underestimated_boundary
def test_sparse_matches_dense_near_surface():
    caps = default_caps(RESOLUTIONS)
    vol = sparse_sdf_grid(sphere_fn, RESOLUTIONS, B_MIN, B_MAX, 0.0, caps)
    assert vol.shape == (33, 33, 33)
    spacing, origin = grid_world_coords((33, 33, 33), B_MIN, B_MAX)
    idx = np.stack(np.meshgrid(*[np.arange(33)] * 3, indexing="ij"), -1)
    pts = np.asarray(origin) + idx * np.asarray(spacing)
    dense = np.linalg.norm(pts, axis=-1) - 0.55
    vol = np.asarray(vol)
    # near the surface (within 2 voxels) values must be exact queries
    near = np.abs(dense) < 2 * float(spacing[0])
    np.testing.assert_allclose(vol[near], dense[near], atol=1e-5)
    # signs agree everywhere (coarse interpolation cannot flip far field)
    assert ((vol > 0) == (dense > 0)).mean() > 0.99


def test_sparse_plus_mc_sphere():
    caps = default_caps(RESOLUTIONS)
    vol = sparse_sdf_grid(sphere_fn, RESOLUTIONS, B_MIN, B_MAX, 0.0, caps)
    spacing, origin = grid_world_coords((33, 33, 33), B_MIN, B_MAX)
    res = marching_cubes(vol, origin, spacing, 0.0,
                         vcap=20000, fcap=40000, active_cap=20000)
    verts = np.asarray(res.verts)[:int(res.nv)]
    d = np.linalg.norm(verts, axis=1)
    assert len(verts) > 100
    assert np.abs(d - 0.55).max() < 0.012


def test_query_count_is_sublinear():
    calls = []

    def counting_fn(pts):
        calls.append(pts.shape[0])
        return sphere_fn(pts)

    caps = default_caps(RESOLUTIONS)
    sparse_sdf_grid(counting_fn, RESOLUTIONS, B_MIN, B_MAX, 0.0, caps)
    total = sum(calls)
    assert total < 33 ** 3  # fewer points than one dense fine pass


def test_conflict_loop_rescues_underestimated_boundary():
    """A boundary mask that under-covers (dilate=0 + a thin feature) must be
    repaired by the conflict-resolution loop (seg3d_lossless.py:348-422)."""
    def thin_fn(pts):
        # thin plate |y| - 0.04 union sphere: plate is invisible at level-0
        # spacing, so the upsample's interpolated signs conflict with truth
        plate = jnp.abs(pts[:, 1]) - 0.04
        sph = jnp.linalg.norm(pts - jnp.asarray([0.0, 0.5, 0.0]), axis=-1) - 0.3
        return jnp.minimum(plate, sph)

    res = [(9, 9, 9), (17, 17, 17), (33, 33, 33)]
    caps = default_caps(res)
    no_conf = sparse_sdf_grid(thin_fn, res, B_MIN, B_MAX, 0.0, caps,
                              dilate=0, conflict_iters=0)
    with_conf = sparse_sdf_grid(thin_fn, res, B_MIN, B_MAX, 0.0, caps,
                                dilate=0, conflict_iters=8)
    spacing, origin = grid_world_coords((33, 33, 33), B_MIN, B_MAX)
    idx = np.stack(np.meshgrid(*[np.arange(33)] * 3, indexing="ij"), -1)
    pts = np.asarray(origin) + idx * np.asarray(spacing)
    dense = np.asarray(thin_fn(jnp.asarray(pts.reshape(-1, 3)))).reshape(
        33, 33, 33)
    mism_no = ((np.asarray(no_conf) > 0) != (dense > 0)).sum()
    mism_with = ((np.asarray(with_conf) > 0) != (dense > 0)).sum()
    # the conflict loop must strictly repair sign errors the plain sweep left
    assert mism_with < mism_no or (mism_no == 0 and mism_with == 0)
    assert mism_with == 0


@pytest.mark.slow
def test_sign_exact_post_igr_body():
    """Sign-exact parity vs dense on a TRAINED (post-IGR) MLP SDF of the
    watertight body at a fine-class grid (VERDICT r1 #3 done-criterion; the
    full (321,417,225) check is tools/parity_sweep.py, run on TPU and
    recorded in PARITY.md).  A small net keeps the dense pass CPU-feasible;
    what matters is the non-analytic wiggly field, not the width."""
    import jax
    from selfreconcode_tpu.models.sdf import (SDFNet, init_sdf_params,
                                              sdf_value_only)
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model
    from selfreconcode_tpu.models.smpl import smpl_forward, smpl_tmp_apose
    from selfreconcode_tpu.engine.igr_init import igr_pretrain
    from selfreconcode_tpu.utils import meshops

    body = synthetic_body_model(n_verts=2000, res=48)
    verts, _, _ = smpl_forward(body, jnp.zeros((1, 10)),
                               jnp.asarray(smpl_tmp_apose(1))[None])
    verts = verts[0]
    fv = jnp.ones((body.faces.shape[0],), bool)
    normals = meshops.vertex_normals(verts, jnp.asarray(body.faces), fv)
    net = SDFNet(hidden=(128,) * 4, skip_in=(2,), feature_size=32)
    params = init_sdf_params(jax.random.PRNGKey(0), net)
    params, _ = igr_pretrain(jax.random.PRNGKey(7), params, net, verts,
                             normals, n_iters=200, batch_size=2000)

    margin = np.asarray([0.15, 0.15, 0.20], np.float32)
    b_min = np.asarray(verts.min(0)) - margin
    b_max = np.asarray(verts.max(0)) + margin
    resolutions = [(11, 14, 8), (21, 27, 15), (41, 53, 29), (81, 105, 57)]
    caps = default_caps(resolutions)

    def qf(p):
        return sdf_value_only(params, net, p, 1.0)

    vol = np.asarray(jax.jit(lambda: sparse_sdf_grid(
        qf, resolutions, b_min, b_max, 0.0, caps, conflict_iters=4))())

    spacing, origin = grid_world_coords(resolutions[-1], b_min, b_max)
    W, H, D = resolutions[-1]
    idx = np.stack(np.meshgrid(np.arange(W), np.arange(H), np.arange(D),
                               indexing="ij"), -1).reshape(-1, 3)
    pts = np.asarray(origin) + idx.astype(np.float32) * np.asarray(spacing)
    dense = np.empty(W * H * D, np.float32)
    fn = jax.jit(lambda p: sdf_value_only(params, net, p, 1.0))
    for s in range(0, len(pts), 1 << 18):
        dense[s:s + (1 << 18)] = np.asarray(
            fn(jnp.asarray(pts[s:s + (1 << 18)])))
    dense = dense.reshape(W, H, D)
    mism = int(((vol > 0) != (dense > 0)).sum())
    assert mism == 0, f"{mism} sign mismatches sweep vs dense"
    # "lossless" = marching cubes sees only TRUE values: every voxel adjacent
    # to a sign crossing (the only values MC vertex placement reads) must be
    # an exact query, not an interpolation.  Voxels merely near the surface
    # but not touching a crossing may stay interpolated — MC never reads them.
    sign = vol > 0
    cross = np.zeros_like(sign)
    for ax in range(3):
        s = np.swapaxes(sign, 0, ax)
        c = np.swapaxes(cross, 0, ax)
        edge = s[:-1] != s[1:]
        c[:-1] |= edge
        c[1:] |= edge
        cross = np.swapaxes(c, 0, ax)
    assert cross.sum() > 1000  # the body surface is actually in the grid
    assert np.abs(vol[cross] - dense[cross]).max() < 1e-5


def test_interp2x_boundary3d_forward_and_grad():
    """Direct pin of the fused op (VERDICT r4 missing #6): forward against an
    independent numpy trilinear upsample + 3^3 straddle test, gradient against
    the analytic parent-weight structure (each fine sample is a mean of its
    2/4/8 coarse parents — parity: MCAcc/cuda/interp2x_boundary3d_kernel.cu)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.ops.sparse_sdf import interp2x_boundary3d

    rng = np.random.default_rng(11)
    vol = rng.normal(0, 1, (5, 7, 3)).astype(np.float32)
    balance = 0.1

    up, bnd = jax.jit(lambda v: interp2x_boundary3d(v, balance))(
        jnp.asarray(vol))
    up = np.asarray(up)
    bnd = np.asarray(bnd)
    assert up.shape == (9, 13, 5) and bnd.shape == (9, 13, 5)

    # independent forward: align_corners=True trilinear = per-axis midpoints
    ref = vol.astype(np.float64)
    for ax in range(3):
        a = np.moveaxis(ref, ax, 0)
        out = np.zeros((2 * a.shape[0] - 1,) + a.shape[1:])
        out[0::2] = a
        out[1::2] = (a[:-1] + a[1:]) / 2.0
        ref = np.moveaxis(out, 0, ax)
    np.testing.assert_allclose(up, ref, atol=1e-6)

    # independent boundary: 3^3 neighborhood straddles balance, dilated once
    pad = np.pad(ref, 1, constant_values=np.nan)
    W, H, D = ref.shape
    mx = np.full(ref.shape, -np.inf)
    mn = np.full(ref.shape, np.inf)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nb = pad[1 + dx:1 + dx + W, 1 + dy:1 + dy + H,
                         1 + dz:1 + dz + D]
                ok = ~np.isnan(nb)
                mx = np.where(ok, np.maximum(mx, np.where(ok, nb, -np.inf)), mx)
                mn = np.where(ok, np.minimum(mn, np.where(ok, nb, np.inf)), mn)
    core = (mx > balance) & (mn <= balance)
    ref_bnd = np.zeros_like(core)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                sh = np.roll(core, (dx, dy, dz), (0, 1, 2))
                # roll wraps; mask wrapped lanes
                if dx == 1: sh[0] = False
                if dx == -1: sh[-1] = False
                if dy == 1: sh[:, 0] = False
                if dy == -1: sh[:, -1] = False
                if dz == 1: sh[:, :, 0] = False
                if dz == -1: sh[:, :, -1] = False
                ref_bnd |= sh
    np.testing.assert_array_equal(bnd, ref_bnd)

    # gradient: cotangent w on `up` pulls back to each parent with weight
    # sum_children w * interp_weight; check against numerical FD on a probe
    w = rng.normal(0, 1, up.shape).astype(np.float32)
    f = lambda v: (interp2x_boundary3d(v, balance)[0] * jnp.asarray(w)).sum()
    g = np.asarray(jax.grad(f)(jnp.asarray(vol)))
    eps = 1e-2
    for idx in [(0, 0, 0), (2, 3, 1), (4, 6, 2), (1, 5, 0)]:
        vp = vol.copy(); vp[idx] += eps
        vm = vol.copy(); vm[idx] -= eps
        fd = (float(f(jnp.asarray(vp))) - float(f(jnp.asarray(vm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-3, atol=2e-3)
