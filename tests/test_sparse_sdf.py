import jax.numpy as jnp
import numpy as np

from selfreconcode_tpu.ops.sparse_sdf import (
    default_caps, grid_world_coords, sparse_sdf_grid)
from selfreconcode_tpu.ops.marching_cubes import marching_cubes

RESOLUTIONS = [(9, 9, 9), (17, 17, 17), (33, 33, 33)]
B_MIN = [-1.0, -1.0, -1.0]
B_MAX = [1.0, 1.0, 1.0]


def sphere_fn(pts):
    return jnp.linalg.norm(pts, axis=-1) - 0.55


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
