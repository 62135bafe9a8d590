import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selfreconcode_tpu.ops.mc_tables import TRI_TABLE, N_TRIS, EDGES
from selfreconcode_tpu.ops.marching_cubes import marching_cubes


def test_tables_sane():
    assert N_TRIS[0] == 0 and N_TRIS[255] == 0
    # single corner inside -> one triangle
    assert N_TRIS[1] == 1
    # every referenced edge id valid
    used = TRI_TABLE[TRI_TABLE >= 0]
    assert used.max() < 12


def _sphere_mesh(n=33, r=0.6, center=(0.0, 0.0, 0.0)):
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2 + (Z - center[2]) ** 2) - r
    spacing = np.float32(2.0 / (n - 1))
    res = marching_cubes(jnp.asarray(vol), jnp.asarray([-1.0, -1.0, -1.0]),
                         jnp.asarray([spacing] * 3), 0.0,
                         vcap=20000, fcap=40000, active_cap=20000)
    nv, nf = int(res.nv), int(res.nf)
    assert 0 < nv <= 20000 and 0 < nf <= 40000
    return np.asarray(res.verts)[:nv], np.asarray(res.faces)[:nf], r, np.array(center)


def test_sphere_vertices_on_surface():
    verts, faces, r, c = _sphere_mesh()
    d = np.linalg.norm(verts - c, axis=1)
    # trilinear crossing on a 33^3 grid: within ~half a voxel of the sphere
    assert np.abs(d - r).max() < 0.01
    assert np.abs(d - r).mean() < 0.003


def test_sphere_watertight_and_euler():
    verts, faces, r, c = _sphere_mesh()
    # all face indices reference extracted verts
    assert faces.min() >= 0 and faces.max() < len(verts)
    # no degenerate faces
    assert (faces[:, 0] != faces[:, 1]).all()
    assert (faces[:, 1] != faces[:, 2]).all()
    assert (faces[:, 0] != faces[:, 2]).all()
    # every undirected edge appears exactly twice (closed 2-manifold)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    key = np.minimum(e[:, 0], e[:, 1]).astype(np.int64) * (1 << 32) + np.maximum(e[:, 0], e[:, 1])
    _, counts = np.unique(key, return_counts=True)
    assert (counts == 2).all()
    # Euler characteristic of a sphere: V - E + F = 2
    n_edges = len(key) // 2
    assert len(verts) - n_edges + len(faces) == 2
    # consistent orientation: each directed edge appears exactly once
    dkey = e[:, 0].astype(np.int64) * (1 << 32) + e[:, 1]
    _, dcounts = np.unique(dkey, return_counts=True)
    assert (dcounts == 1).all()


def test_sphere_normals_outward():
    verts, faces, r, c = _sphere_mesh()
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    centroid = (v0 + v1 + v2) / 3 - c
    dots = (n * centroid).sum(-1)
    assert (dots > 0).mean() > 0.999


def test_offset_center_and_aspect():
    verts, faces, r, c = _sphere_mesh(n=25, r=0.5, center=(0.2, -0.1, 0.15))
    d = np.linalg.norm(verts - c, axis=1)
    assert np.abs(d - r).max() < 0.02


def test_iso_shift():
    # iso=-0.1 on an SDF shrinks the surface by 0.1
    n = 33
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.6
    spacing = np.float32(2.0 / (n - 1))
    res = marching_cubes(jnp.asarray(vol), jnp.asarray([-1.0] * 3),
                         jnp.asarray([spacing] * 3), -0.1,
                         vcap=20000, fcap=40000, active_cap=20000)
    verts = np.asarray(res.verts)[:int(res.nv)]
    d = np.linalg.norm(verts, axis=1)
    assert np.abs(d - 0.5).max() < 0.01


def test_capacity_overflow_reports_true_counts():
    verts, faces, r, c = _sphere_mesh()
    true_nv = len(verts)
    xs = np.linspace(-1, 1, 33, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.6
    res = marching_cubes(jnp.asarray(vol), jnp.asarray([-1.0] * 3),
                         jnp.asarray([2.0 / 32] * 3), 0.0,
                         vcap=100, fcap=100, active_cap=20000)
    assert int(res.nv) == true_nv  # watermark exceeds capacity -> caller grows


def test_device_edge_topology_matches_host():
    """build_edge_topology_device (the jitted remesh path) must agree with
    the host/numpy builder on a real MC mesh, including face-pair sets."""
    from selfreconcode_tpu.utils.meshops import (build_edge_topology,
                                                 build_edge_topology_device)
    verts, faces, r, c = _sphere_mesh(n=21, r=0.55)
    nf = len(faces)
    fcap = nf + 37
    ecap = 3 * fcap
    faces_p = np.zeros((fcap, 3), np.int32)
    faces_p[:nf] = faces
    fv = np.zeros((fcap,), bool)
    fv[:nf] = True
    host = build_edge_topology(faces_p, nf, ecap)
    dev = jax.jit(lambda f, v: build_edge_topology_device(f, v, ecap))(
        jnp.asarray(faces_p), jnp.asarray(fv))
    ne = int(host["num_edges"])
    assert int(dev["num_edges"]) == ne
    np.testing.assert_array_equal(np.asarray(dev["edge_valid"]),
                                  host["edge_valid"])
    np.testing.assert_array_equal(np.asarray(dev["edges"])[:ne],
                                  host["edges"][:ne])
    np.testing.assert_array_equal(np.asarray(dev["ef_valid"]),
                                  host["ef_valid"])
    hf = np.sort(host["edge_faces"][:ne], axis=1)
    df = np.sort(np.asarray(dev["edge_faces"])[:ne], axis=1)
    sel = host["ef_valid"][:ne]
    np.testing.assert_array_equal(df[sel], hf[sel])
